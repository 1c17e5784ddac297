"""Native exact row verification (bs_verify_rows) vs the Python spec.

The native verifier walks raw serialized row bytes; tokenizer.py's
row_has_field / row_has_token / row_has_field_token over json.loads output
is the semantic spec (≙ reference tokenizer.go:107-456). For every row the
native path must either agree bit-exactly or flag the row for Python
fallback — never a silent divergence.
"""

import json
import random

import numpy as np
import pytest

from bloomsearch_tpu import native
from bloomsearch_tpu.tokenizer import (
    basic_whitespace_lower_tokenizer,
    row_has_field,
    row_has_field_token,
    row_has_token,
)

pytestmark = pytest.mark.skipif(not native.available(), reason="native lib unavailable")

KIND_FIELD, KIND_TOKEN, KIND_FIELD_TOKEN = 0, 1, 2


def _pack_rows(rows_json: list[bytes]):
    data = b"".join(rows_json)
    lengths = np.array([len(r) for r in rows_json], dtype=np.int64)
    offsets = np.zeros(len(rows_json), dtype=np.int64)
    if len(rows_json) > 1:
        np.cumsum(lengths[:-1], out=offsets[1:])
    return data, offsets, lengths


def _oracle(parsed, kind, field, token):
    if kind == KIND_FIELD:
        return row_has_field(parsed, field)
    if kind == KIND_TOKEN:
        return row_has_token(parsed, token, basic_whitespace_lower_tokenizer)
    return row_has_field_token(parsed, field, token, basic_whitespace_lower_tokenizer)


def _run(rows_json: list[bytes], conds):
    data, offsets, lengths = _pack_rows(rows_json)
    packed = [(k, f.encode(), t.encode()) for k, f, t in conds]
    res = native.verify_rows(data, offsets, lengths, packed, ord("."))
    assert res is not None
    return res


def _check_parity(rows_json: list[bytes], conds, require_native_frac=None):
    match, fallback = _run(rows_json, conds)
    native_rows = 0
    for r, raw in enumerate(rows_json):
        if fallback[r]:
            continue  # Python re-verifies these; no parity obligation
        native_rows += 1
        parsed = json.loads(raw)
        for c, (kind, field, token) in enumerate(conds):
            expected = _oracle(parsed, kind, field, token)
            assert bool(match[c, r]) == bool(expected), (
                f"row={raw!r} cond=({kind},{field!r},{token!r}) "
                f"native={bool(match[c, r])} python={expected}"
            )
    if require_native_frac is not None:
        assert native_rows >= require_native_frac * len(rows_json), (
            f"only {native_rows}/{len(rows_json)} rows verified natively"
        )
    return match, fallback


class TestDirectedCases:
    CONDS = [
        (KIND_FIELD, "a", ""),
        (KIND_FIELD, "a.b", ""),
        (KIND_FIELD, ".a", ""),
        (KIND_TOKEN, "", "hello"),
        (KIND_TOKEN, "", "42"),
        (KIND_TOKEN, "", "true"),
        (KIND_FIELD_TOKEN, "a", "hello"),
        (KIND_FIELD_TOKEN, "a.b", "world"),
        (KIND_FIELD_TOKEN, "arr.x", "deep"),
    ]

    def test_basic_shapes(self):
        rows = [
            b'{"a": "Hello World"}',
            b'{"a": {"b": "world extra"}}',
            b'{"x": 42}',
            b'{"flag": true, "other": null}',
            b'{"arr": [{"x": "deep value"}, {"y": 1}]}',
            b'{"a": null}',          # FIELD "a" matches even at null
            b'{"a": {}}',            # ... and at an empty object
            b'{"a": [1, 2, 3]}',     # FIELD "a" yes; tokens under a
            b'{}',
        ]
        _check_parity(rows, self.CONDS, require_native_frac=1.0)

    def test_empty_key_component_semantics(self):
        # {"":{"a":...}} must match field ".a" (components ["","a"]) and NOT
        # field "a" — the native joined path must keep component identity.
        rows = [
            b'{"": {"a": "tok here"}}',
            b'{"a": {"": "tok here"}}',
            b'{"": "top"}',
        ]
        conds = [
            (KIND_FIELD, "a", ""),
            (KIND_FIELD, ".a", ""),
            (KIND_FIELD, "a.", ""),
            (KIND_FIELD, "", ""),
            (KIND_TOKEN, "", "tok"),
            (KIND_TOKEN, "", "top"),
            (KIND_FIELD_TOKEN, ".a", "here"),
            (KIND_FIELD_TOKEN, "a.", "here"),
        ]
        _check_parity(rows, conds, require_native_frac=1.0)

    def test_fallback_conditions(self):
        rows = [
            '{"a": "héllo"}'.encode(),          # raw non-ASCII byte
            b'{"a": "\\u00e9cho"}',             # \u >= 0x80
            b'{"a": 1, "a": 2}',                # duplicate keys (last wins)
            b'{"a.b": 1}',                      # key containing delimiter
            b'[1, 2]',                          # non-object top level
            b'{"a": ' + b'[' * 250 + b'1' + b']' * 250 + b'}',  # deep
        ]
        conds = [(KIND_FIELD, "a", ""), (KIND_TOKEN, "", "1")]
        match, fallback = _run(rows, conds)
        assert fallback.all(), f"expected all fallback, got {fallback}"

    def test_non_canonical_numbers_verify_natively_with_spec_tokens(self):
        """Round-4: the parser COMPUTES the repr token, so legal non-spec
        spellings verify natively against the spec token (no fallback)."""
        rows = [b'{"a": 1e5}', b'{"a": 1.50}']
        match, fallback = _run(rows, [(KIND_TOKEN, "", "100000")])
        assert not fallback.any()
        assert match[0].tolist() == [True, False]
        match, fallback = _run(rows, [(KIND_TOKEN, "", "1.5")])
        assert not fallback.any()
        assert match[0].tolist() == [False, True]

    def test_duplicate_key_does_not_leak_first_occurrence(self):
        # json.loads keeps the LAST "a"; native must not silently report the
        # token from the first.
        rows = [b'{"a": "gone", "a": "kept"}']
        conds = [(KIND_TOKEN, "", "gone")]
        match, fallback = _run(rows, conds)
        assert fallback[0]  # deferred to Python, which answers False

    def test_delimiter_key_only_falls_back_with_field_conds(self):
        rows = [b'{"a.b": "tok"}']
        # TOKEN-only queries are unaffected by dotted keys: no fallback.
        match, fallback = _run(rows, [(KIND_TOKEN, "", "tok")])
        assert not fallback[0] and match[0, 0]

    def test_number_token_parity(self):
        rows = [
            b'{"n": 42}',
            b'{"n": -7}',
            b'{"n": 3.5}',
            b'{"n": 10.0}',      # repr(10.0)="10.0" -> go_like_str "10"
            b'{"n": -0.25}',
            b'{"n": 123456789012345678901234567890}',  # bignum int
            b'{"n": NaN}',
            b'{"n": Infinity}',
            b'{"n": -Infinity}',
        ]
        conds = [
            (KIND_TOKEN, "", "42"),
            (KIND_TOKEN, "", "-7"),
            (KIND_TOKEN, "", "3.5"),
            (KIND_TOKEN, "", "10"),
            (KIND_TOKEN, "", "10.0"),
            (KIND_TOKEN, "", "-0.25"),
            (KIND_TOKEN, "", "nan"),
            (KIND_TOKEN, "", "+inf"),
            (KIND_TOKEN, "", "-inf"),
            (KIND_FIELD_TOKEN, "n", "42"),
        ]
        _check_parity(rows, conds)

    def test_case_and_whitespace_tokenization(self):
        rows = [
            b'{"m": "Hello\\tWorld  FOO\\nbar"}',
            b'{"m": "  leading trailing  "}',
            b'{"m": ""}',
        ]
        conds = [
            (KIND_TOKEN, "", "hello"),
            (KIND_TOKEN, "", "world"),
            (KIND_TOKEN, "", "foo"),
            (KIND_TOKEN, "", "Hello"),  # query tokens are NOT lowered
            (KIND_TOKEN, "", "leading"),
            (KIND_FIELD, "m", ""),
        ]
        _check_parity(rows, conds, require_native_frac=1.0)


SOUP_KEYS = ["a", "b", "ab", "x1", "key", "svc", "msg", "", "UPPER"]
SOUP_TOKENS = ["alpha", "Bravo", "x", "42", "true", "-inf", "a b c", "", "z9"]


def _soup_value(rng: random.Random, depth: int):
    r = rng.random()
    if depth > 2 or r < 0.35:
        return rng.choice(
            SOUP_TOKENS
            + [rng.randrange(-100, 100), rng.uniform(-5, 5), True, False, None, 10.0, 1e16]
        )
    if r < 0.6:
        return [_soup_value(rng, depth + 1) for _ in range(rng.randrange(0, 4))]
    return {
        rng.choice(SOUP_KEYS): _soup_value(rng, depth + 1)
        for _ in range(rng.randrange(0, 4))
    }


@pytest.mark.parametrize("seed", [3, 17, 88, 123, 2024])
def test_fuzz_parity(seed):
    rng = random.Random(seed)
    rows = []
    for i in range(400):
        row = {
            rng.choice(SOUP_KEYS): _soup_value(rng, 0)
            for _ in range(rng.randrange(1, 5))
        }
        row["id"] = i
        rows.append(json.dumps(row, ensure_ascii=True).encode())
    conds = []
    for _ in range(12):
        kind = rng.randrange(3)
        field = ".".join(
            rng.choice(SOUP_KEYS) for _ in range(rng.randrange(1, 3))
        )
        token = rng.choice(["alpha", "bravo", "x", "42", "true", "10", "z9", "c"])
        conds.append((kind, field, token))
    # ASCII-only soup: most rows verify natively; the fallbacks are rows
    # whose floats serialize in exponent notation (1e+16, 5e-05 — repr
    # round-trip not provable from the raw text).
    _check_parity(rows, conds, require_native_frac=0.7)
