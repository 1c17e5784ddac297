"""Query builder + prefilter evaluation semantics.

Mirrors reference query_builder_test.go: implicit-AND building (:5-23),
nested Match trees (:25-54), post-Match AND-ing (:56-73), prefilter AND/OR
building and metadata evaluation (:75-139), strict prefilter rejection of
missing metadata (:141-167), implicit regex AND (:169-186), and regex
field-guard shape preservation (:214-256).
"""

from dataclasses import dataclass, field as dc_field

from bloomsearch_tpu import (
    BloomConditionType,
    BloomExprType,
    MinMaxIndex,
    PrefilterExpression,
    RegexExpression,
    RegexQuery,
    and_,
    evaluate_data_block_metadata,
    field,
    field_regex,
    field_token,
    min_max,
    new_query,
    numeric_between,
    numeric_greater_than_equal,
    numeric_less_than,
    or_,
    partition,
    partition_equals,
    partition_in,
    partition_not_equals,
    prefilter_and,
    prefilter_or,
    regex_and,
    regex_field_guard_bloom_query,
    regex_or,
    token,
)
from bloomsearch_tpu.query import RegexExprType


@dataclass
class FakeBlockMetadata:
    partition_id: str = ""
    min_max_indexes: dict = dc_field(default_factory=dict)


def test_new_query_defaults_to_implicit_and_expression():
    query = (
        new_query()
        .field("retry_count")
        .token("error")
        .field_token("service", "payment")
        .build()
    )
    expr = query.bloom.expression
    assert expr is not None
    assert expr.expression_type == BloomExprType.AND
    assert len(expr.children) == 3


def test_match_supports_nested_boolean_expressions():
    query = (
        new_query()
        .match(
            or_(
                and_(field("retry_count"), token("error")),
                field_token("service", "payment"),
            )
        )
        .build()
    )
    expr = query.bloom.expression
    assert expr.expression_type == BloomExprType.OR
    assert len(expr.children) == 2
    assert expr.children[0].expression_type == BloomExprType.AND


def test_field_after_match_gets_anded_with_existing_expression():
    query = new_query().match(or_(field("service"), field("level"))).token("error").build()
    expr = query.bloom.expression
    assert expr.expression_type == BloomExprType.AND
    assert len(expr.children) == 2


def test_and_or_flattening():
    expr = and_(and_(field("a"), field("b")), field("c"))
    assert expr.expression_type == BloomExprType.AND
    assert len(expr.children) == 3
    expr = or_(or_(field("a"), field("b")), or_(field("c")))
    assert expr.expression_type == BloomExprType.OR
    assert len(expr.children) == 3
    # Mixed types do NOT flatten.
    expr = and_(or_(field("a"), field("b")), field("c"))
    assert len(expr.children) == 2


def test_match_prefilter_supports_and_between_partition_and_minmax():
    query = (
        new_query()
        .match_prefilter(
            prefilter_and(
                partition(partition_equals("auth_partition")),
                partition(partition_in("api_partition", "financial_partition")),
                min_max("timestamp", numeric_between(1000, 2000)),
                min_max("response_time", numeric_less_than(1000)),
            )
        )
        .build()
    )
    expr = query.prefilter.expression
    assert expr is not None
    assert expr.expression_type.value == "AND"
    assert len(expr.children) == 4


def test_match_prefilter_supports_or_between_partition_and_minmax():
    query = (
        new_query()
        .match_prefilter(
            prefilter_or(
                partition(partition_equals("auth_partition")),
                min_max("response_time", numeric_greater_than_equal(200)),
            )
        )
        .build()
    )
    partition_branch = FakeBlockMetadata(
        partition_id="auth_partition",
        min_max_indexes={"response_time": MinMaxIndex(10, 20)},
    )
    assert evaluate_data_block_metadata(partition_branch, query.prefilter)

    minmax_branch = FakeBlockMetadata(
        partition_id="financial_partition",
        min_max_indexes={"response_time": MinMaxIndex(210, 250)},
    )
    assert evaluate_data_block_metadata(minmax_branch, query.prefilter)

    no_match = FakeBlockMetadata(
        partition_id="financial_partition",
        min_max_indexes={"response_time": MinMaxIndex(10, 20)},
    )
    assert not evaluate_data_block_metadata(no_match, query.prefilter)


def test_prefilter_partition_condition_rejects_missing_partition_metadata():
    query = new_query().match_prefilter(partition(partition_not_equals("auth_partition"))).build()
    missing = FakeBlockMetadata(partition_id="")
    assert not evaluate_data_block_metadata(missing, query.prefilter)


def test_prefilter_minmax_condition_rejects_missing_minmax_metadata():
    query = (
        new_query()
        .match_prefilter(min_max("timestamp", numeric_greater_than_equal(1000)))
        .build()
    )
    missing = FakeBlockMetadata(partition_id="auth_partition")
    assert not evaluate_data_block_metadata(missing, query.prefilter)


def test_new_query_supports_implicit_regex_and_expression():
    query = (
        new_query().field_regex("service", "^pay").field_regex("message", "timeout$").build()
    )
    expr = query.regex.expression
    assert expr is not None
    assert expr.expression_type == RegexExprType.AND
    assert len(expr.children) == 2


def test_match_regex_supports_nested_boolean_expressions():
    query = (
        new_query()
        .match_regex(
            regex_or(
                regex_and(
                    field_regex("service", "^auth$"),
                    field_regex("message", "failed"),
                ),
                field_regex("level", "^error$"),
            )
        )
        .build()
    )
    expr = query.regex.expression
    assert expr.expression_type == RegexExprType.OR
    assert len(expr.children) == 2


def test_regex_field_guard_bloom_query_preserves_boolean_shape():
    from bloomsearch_tpu.query import RegexCondition

    regex_query = RegexQuery(
        expression=RegexExpression(
            RegexExprType.OR,
            children=[
                RegexExpression(
                    RegexExprType.CONDITION,
                    condition=RegexCondition("service", "^pay"),
                ),
                RegexExpression(
                    RegexExprType.AND,
                    children=[
                        RegexExpression(
                            RegexExprType.CONDITION,
                            condition=RegexCondition("level", "^error$"),
                        ),
                        RegexExpression(
                            RegexExprType.CONDITION,
                            condition=RegexCondition("message", "timeout"),
                        ),
                    ],
                ),
            ],
        )
    )
    guard = regex_field_guard_bloom_query(regex_query)
    assert guard is not None and guard.expression is not None
    assert guard.expression.expression_type == BloomExprType.OR
    assert len(guard.expression.children) == 2
    first = guard.expression.children[0]
    assert first.condition is not None
    assert first.condition.type == BloomConditionType.FIELD
    assert first.condition.field == "service"
