"""Tokenizer / field-extraction / row-verification semantics.

Mirrors reference tokenizer_test.go: UniqueFields nesting/arrays/dedup
(:10-97), tokenizer edge cases (:99-173), JSON matching including the array
"information loss" contract (:175-278), and regex compile/match (:280-313).
"""

import json

import pytest

from bloomsearch_tpu import (
    basic_whitespace_lower_tokenizer,
    compile_regex_query,
    field_regex,
    new_query,
    regex_and,
    regex_or,
    row_has_field,
    row_has_field_token,
    row_matches_query,
    row_has_token,
    unique_fields,
)
from bloomsearch_tpu.utils import go_like_str

TOK = basic_whitespace_lower_tokenizer


class TestUniqueFields:
    def test_basic_nested_structure(self):
        result = unique_fields({"user": {"name": "John", "age": 30}})
        assert result == {"user.name": ["John"], "user.age": ["30"]}

    def test_array_with_different_keys(self):
        result = unique_fields(
            {"items": [{"type": "admin"}, {"role": "user"}]}
        )
        assert result == {"items.type": ["admin"], "items.role": ["user"]}

    def test_array_with_same_keys_different_values(self):
        result = unique_fields({"tags": [{"name": "red"}, {"name": "blue"}]})
        assert sorted(result["tags.name"]) == ["blue", "red"]

    def test_array_with_duplicate_values(self):
        result = unique_fields(
            {"colors": [{"value": "red"}, {"value": "red"}, {"value": "blue"}]}
        )
        assert sorted(result["colors.value"]) == ["blue", "red"]

    def test_empty_object(self):
        assert unique_fields({}) == {}

    def test_none_values_skipped(self):
        assert unique_fields({"a": None, "b": {"c": None}}) == {}

    def test_scalar_array_values(self):
        result = unique_fields({"tags": ["admin", "user"]})
        assert sorted(result["tags"]) == ["admin", "user"]


class TestBasicWhitespaceLowerTokenizer:
    @pytest.mark.parametrize(
        "value,expected",
        [
            ("hello world 123", ["hello", "world", "123"]),
            ("hello@world.com!test", ["hello@world.com!test"]),
            ("hello-world_test", ["hello-world_test"]),
            ("hello \U0001F60A world \U0001F389", ["hello", "\U0001F60A", "world", "\U0001F389"]),
            ("user@domain.com, password123!", ["user@domain.com,", "password123!"]),
            (42, ["42"]),
            (True, ["true"]),
            (False, ["false"]),
            ("", []),
            ("hello   world", ["hello", "world"]),
            ("!@#$%^&*()", ["!@#$%^&*()"]),
            ("hello\tworld\ntest", ["hello", "world", "test"]),
            ("user-name_123@example.com (active)", ["user-name_123@example.com", "(active)"]),
            ("APpLe Pie", ["apple", "pie"]),
            (25.5, ["25.5"]),
            (25.0, ["25"]),
        ],
    )
    def test_tokenize(self, value, expected):
        assert TOK(value) == expected


class TestGoLikeStr:
    def test_stringification_is_consistent_between_dict_and_json_round_trip(self):
        # The ingest path stringifies Python values; the verify path
        # stringifies values parsed back from JSON. They must agree.
        values = [30, 25.5, 25.0, True, False, "x", 1e16, -7]
        for v in values:
            round_tripped = json.loads(json.dumps(v))
            assert go_like_str(v) == go_like_str(round_tripped), v


class TestJSONMatchingField:
    def test_basic_fields(self):
        row = json.loads('{"user": {"name": "John", "age": 30}}')
        assert row_has_field(row, "user.name")
        assert row_has_field(row, "user.age")
        assert row_has_field(row, "user")
        assert not row_has_field(row, "user.email")
        assert not row_has_field(row, "nothere")

    def test_fields_in_arrays(self):
        row = json.loads(
            '{"items": [{"name": "Item1", "price": 10}, {"name": "Item2", "price": 20}]}'
        )
        assert row_has_field(row, "items.name")
        assert row_has_field(row, "items.price")
        assert not row_has_field(row, "items.category")

    def test_nested_arrays(self):
        row = json.loads(
            '{"orders": [{"items": [{"name": "A"}, {"name": "B"}]}, {"items": [{"name": "C"}]}]}'
        )
        assert row_has_field(row, "orders.items.name")


class TestJSONMatchingToken:
    def test_basic_tokens(self):
        row = json.loads('{"user": {"name": "John Doe", "age": 30}}')
        assert row_has_token(row, "john", TOK)
        assert row_has_token(row, "doe", TOK)
        assert row_has_token(row, "30", TOK)
        assert not row_has_token(row, "jane", TOK)

    def test_tokens_in_arrays(self):
        row = json.loads(
            '{"items": [{"name": "Item1"}, {"name": "Item2"}, {"name": "Item3"}]}'
        )
        for t in ("item1", "item2", "item3"):
            assert row_has_token(row, t, TOK)
        assert not row_has_token(row, "item4", TOK)

    def test_null_never_matches(self):
        row = json.loads('{"a": null}')
        assert not row_has_token(row, "null", TOK)
        assert not row_has_token(row, "<nil>", TOK)


class TestJSONMatchingFieldToken:
    def test_basic_field_token(self):
        row = json.loads('{"user": {"name": "John Doe", "role": "admin"}}')
        assert row_has_field_token(row, "user.name", "john", TOK)
        assert row_has_field_token(row, "user.name", "doe", TOK)
        assert row_has_field_token(row, "user.role", "admin", TOK)
        assert not row_has_field_token(row, "user.name", "admin", TOK)
        assert not row_has_field_token(row, "user.role", "john", TOK)
        assert not row_has_field_token(row, "user.email", "test", TOK)

    def test_arrays_with_field_token(self):
        row = json.loads(
            '{"users": [{"name": "John"}, {"name": "Jane"}], "tags": ["admin", "user"]}'
        )
        assert row_has_field_token(row, "users.name", "john", TOK)
        assert row_has_field_token(row, "users.name", "jane", TOK)
        assert row_has_field_token(row, "tags", "admin", TOK)
        assert not row_has_field_token(row, "users.name", "bob", TOK)

    def test_deeply_nested_arrays(self):
        row = json.loads(
            '{"groups": [{"users": [{"name": "John"}, {"name": "Jane"}]},'
            ' {"users": [{"name": "Bob"}]}]}'
        )
        for name in ("john", "jane", "bob"):
            assert row_has_field_token(row, "groups.users.name", name, TOK)
        assert not row_has_field_token(row, "groups.users.name", "alice", TOK)


class TestInformationLoss:
    """Array index identity is lost by design (tokenizer_test.go:238-277)."""

    def test_cross_element_matching(self):
        row = json.loads(
            '{"items": [{"name": "Item1", "category": "electronics"},'
            ' {"name": "Item2", "category": "books"}]}'
        )
        assert row_has_field_token(row, "items.name", "item1", TOK)
        assert row_has_field_token(row, "items.name", "item2", TOK)
        assert row_has_field_token(row, "items.category", "electronics", TOK)
        assert row_has_field_token(row, "items.category", "books", TOK)
        assert not row_has_field_token(row, "items.name", "item3", TOK)
        assert not row_has_field_token(row, "items.category", "furniture", TOK)

    def test_duplicate_values_across_elements(self):
        row = json.loads(
            '{"tags": [{"type": "admin"}, {"type": "user"}, {"type": "admin"}]}'
        )
        assert row_has_field_token(row, "tags.type", "admin", TOK)
        assert row_has_field_token(row, "tags.type", "user", TOK)
        assert not row_has_field_token(row, "tags.type", "guest", TOK)

    def test_mixed_data_types(self):
        row = json.loads(
            '{"records": [{"id": 1, "active": true}, {"id": 2, "active": false}]}'
        )
        assert row_has_field_token(row, "records.id", "1", TOK)
        assert row_has_field_token(row, "records.id", "2", TOK)
        assert row_has_field_token(row, "records.active", "true", TOK)
        assert row_has_field_token(row, "records.active", "false", TOK)

    def test_no_cross_contamination_between_paths(self):
        row = json.loads(
            '{"user": {"name": "John", "tags": [{"type": "admin"}, {"role": "user"}]}}'
        )
        assert row_has_field_token(row, "user.name", "john", TOK)
        assert row_has_field_token(row, "user.tags.type", "admin", TOK)
        assert row_has_field_token(row, "user.tags.role", "user", TOK)
        assert not row_has_field_token(row, "user.tags.type", "user", TOK)
        assert not row_has_field_token(row, "user.tags.role", "admin", TOK)


class TestRegexQueryMatching:
    def test_field_regex_matches_nested_values_and_non_string_primitives(self):
        query = (
            new_query()
            .match_regex(
                regex_and(
                    field_regex("users.name", "(?i)^jo"),
                    regex_or(
                        field_regex("users.active", "^true$"),
                        field_regex("users.id", "^2$"),
                    ),
                )
            )
            .build()
        )
        compiled = compile_regex_query(query.regex)
        matching = json.loads(
            '{"users":[{"id":1,"name":"John","active":true},'
            '{"id":2,"name":"Jane","active":false}]}'
        )
        non_matching = json.loads('{"users":[{"id":3,"name":"Alice","active":false}]}')
        assert row_matches_query(matching, None, compiled, ".", TOK)
        assert not row_matches_query(non_matching, None, compiled, ".", TOK)

    def test_invalid_regex_fails_compile(self):
        import re

        query = new_query().field_regex("message", "[unterminated(").build()
        with pytest.raises(re.error):
            compile_regex_query(query.regex)

    def test_regex_matches_full_value_not_tokens(self):
        # "hello world" as one value: regex sees the whole string.
        row = json.loads('{"message": "hello world"}')
        compiled = compile_regex_query(
            new_query().field_regex("message", "^hello world$").build().regex
        )
        assert row_matches_query(row, None, compiled, ".", TOK)


class TestNilRegexChildren:
    def test_nil_condition_inside_or_stays_always_true(self):
        """Wire-format regex trees may carry nil (always-true) conditions;
        compiling must keep them as true leaves — dropping them narrowed
        the OR, and an all-nil OR inverted to always-false (round-4 fix)."""
        from bloomsearch_tpu.query import RegexExpression, RegexExprType
        from bloomsearch_tpu.tokenizer import (
            compile_regex_query,
            row_matches_regex_expression,
        )

        nil = RegexExpression(RegexExprType.CONDITION, condition=None)
        never = RegexExpression.__new__(RegexExpression)

        from bloomsearch_tpu.query import RegexCondition

        zzz = RegexExpression(
            RegexExprType.CONDITION,
            condition=RegexCondition("f", "zzz"),
        )
        or_expr = RegexExpression(RegexExprType.OR, children=[nil, zzz])

        class Q:
            expression = or_expr

        compiled = compile_regex_query(Q())
        assert row_matches_regex_expression({"f": "hello"}, compiled.expression, ".")
        all_nil = RegexExpression(RegexExprType.OR, children=[nil, nil])

        class Q2:
            expression = all_nil

        compiled2 = compile_regex_query(Q2())
        assert row_matches_regex_expression({"f": "hello"}, compiled2.expression, ".")
