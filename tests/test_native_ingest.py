"""Native C++ ingest tokenizer: exact parity with the Python semantic spec.

The native path must produce byte-identical bloom filters to the Python
tokenizer for every row it does NOT flag for fallback, and must flag any row
where unicode rules could diverge.
"""

import json
import math
import random
import string

import numpy as np
import pytest

import bloomsearch_tpu as bs
from bloomsearch_tpu import native
from bloomsearch_tpu.bloom import BloomParams
from bloomsearch_tpu.bloom.hashing import hash_keys
from bloomsearch_tpu.engine import _native_tokenize
from bloomsearch_tpu.file_format import BloomFilters
from bloomsearch_tpu.tokenizer import (
    basic_whitespace_lower_tokenizer,
    make_field_token_key,
    unique_fields,
)

pytestmark = pytest.mark.skipif(not native.available(), reason="native lib unavailable")

PARAMS = BloomParams(5000, 0.001)


def python_keys(rows):
    field_keys, token_keys, ft_keys = {}, {}, {}
    for row in rows:
        for path, values in unique_fields(row).items():
            field_keys[path] = None
            for value in values:
                for tok in basic_whitespace_lower_tokenizer(value):
                    token_keys[tok] = None
                    ft_keys[make_field_token_key(path, tok)] = None
    return field_keys, token_keys, ft_keys


def build_filters_python(rows) -> BloomFilters:
    triple = BloomFilters.from_params(PARAMS)
    field_keys, token_keys, ft_keys = python_keys(rows)
    for keys, filt in (
        (field_keys, triple.field),
        (token_keys, triple.token),
        (ft_keys, triple.field_token),
    ):
        if keys:
            filt.add_hashes(hash_keys(list(keys)))
    return triple


def build_filters_native(rows) -> tuple[BloomFilters, np.ndarray]:
    serialized = [json.dumps(r, separators=(",", ":")).encode() for r in rows]
    result = _native_tokenize(serialized, ".")
    assert result is not None
    field_h, token_h, ft_h, fallback = result
    triple = BloomFilters.from_params(PARAMS)
    for hashes, filt in ((field_h, triple.field), (token_h, triple.token), (ft_h, triple.field_token)):
        if len(hashes):
            filt.add_hashes(hashes)
    # Python fallback for flagged rows (mirrors engine behavior).
    flagged = [r for r, fb in zip(rows, fallback) if fb]
    if flagged:
        fb_triple = build_filters_python(flagged)
        triple.merge(fb_triple)
    return triple, fallback


def assert_parity(rows, expect_fallback=None):
    expected = build_filters_python(rows)
    actual, fallback = build_filters_native(rows)
    if expect_fallback is not None:
        assert list(fallback) == expect_fallback, f"fallback mask: {list(fallback)}"
    assert actual == expected, "native filters diverge from Python spec"


class TestNativeIngestParity:
    def test_simple_rows(self):
        assert_parity(
            [
                {"service": "payment", "level": "error", "msg": "Connection TIMEOUT after 30s"},
                {"user": {"name": "John Doe", "age": 30}},
            ],
            expect_fallback=[False, False],
        )

    def test_nested_arrays_and_dedup(self):
        assert_parity(
            [
                {"items": [{"name": "Item1", "tags": ["a", "b"]}, {"name": "Item1"}]},
                {"groups": [{"users": [{"n": "x"}, {"n": "y"}]}, {"users": []}]},
            ],
            expect_fallback=[False, False],
        )

    def test_numbers_bools_null(self):
        assert_parity(
            [
                {"i": 42, "neg": -7, "f": 25.5, "whole": 25.0, "t": True,
                 "f2": False, "n": None, "zero": 0.0, "negzero": -0.0},
            ],
            expect_fallback=[False],
        )

    def test_exponent_numbers_native_with_spec_tokens(self):
        # Round-4: the parser computes the repr token, so exponent forms
        # index natively with exact spec parity (was: blanket fallback).
        assert_parity([{"big": 1e16, "tiny": 1.5e-8}], expect_fallback=[False])

    def test_non_canonical_numbers_stay_native(self):
        # Legal-but-non-canonical JSON via the serialized ingest path does
        # not diverge: the parser computes the repr token for every legal
        # spelling (round-4; was a fallback, now exact + native).
        serialized = [b'{"a":1.50}', b'{"b":1E5}', b'{"c":25.0}']
        result = _native_tokenize(serialized, ".")
        assert result is not None
        _, _, _, fallback = result
        assert list(fallback) == [False, False, False]

    def test_nonfinite_floats(self):
        rows = [{"inf": math.inf, "ninf": -math.inf, "nan": math.nan}]
        assert_parity(rows, expect_fallback=[False])

    def test_escapes_ascii(self):
        assert_parity(
            [
                {"msg": 'quote " backslash \\ slash / tab\tnewline\n end'},
                {"ctrl": "bell\x07 unit\x1f sep\x1c"},
            ],
            expect_fallback=[False, False],
        )

    def test_unicode_rows_fall_back(self):
        rows = [
            {"msg": "café ÉCLAIR"},
            {"emoji": "hello 😊"},
            {"plain": "ascii only"},
        ]
        expected_fb = [True, True, False]
        assert_parity(rows, expect_fallback=expected_fb)

    def test_unicode_keys_fall_back(self):
        assert_parity([{"clé": "value"}], expect_fallback=[True])

    def test_empty_string_value_records_field(self):
        assert_parity([{"emptyv": ""}], expect_fallback=[False])

    def test_whitespace_variants(self):
        assert_parity(
            [{"s": "a  b\tc\nd\x0be\x0cf\rg\x1ch\x1di\x1ej\x1fk"}],
            expect_fallback=[False],
        )

    def test_fuzz_random_ascii_rows(self):
        rng = random.Random(1234)
        charset = string.ascii_letters + string.digits + " \t_-.@#$%&*()[]{}!?"

        def rand_value(depth=0):
            r = rng.random()
            if depth < 2 and r < 0.15:
                return {self_key(): rand_value(depth + 1) for _ in range(rng.randrange(1, 3))}
            if depth < 2 and r < 0.3:
                return [rand_value(depth + 1) for _ in range(rng.randrange(1, 4))]
            if r < 0.45:
                return rng.randrange(-10000, 10000)
            if r < 0.55:
                return rng.uniform(-1000, 1000)
            if r < 0.6:
                return rng.random() < 0.5
            if r < 0.63:
                return None
            return "".join(rng.choices(charset, k=rng.randrange(0, 25)))

        def self_key():
            return "".join(rng.choices(string.ascii_lowercase, k=rng.randrange(1, 8)))

        rows = [
            {self_key(): rand_value() for _ in range(rng.randrange(1, 6))}
            for _ in range(200)
        ]
        assert_parity(rows)

    def test_engine_filters_match_python_only_engine(self, tmp_path):
        rows = [
            {"svc": "api", "msg": f"Request {i} DONE", "lat": i * 1.5}
            for i in range(50)
        ] + [{"uni": "héllo wörld"}]

        store1 = bs.FileSystemDataStore(str(tmp_path / "native"))
        e1 = bs.BloomSearchEngine(
            bs.BloomSearchEngineConfig(row_data_compression="none", probe_backend="host"),
            store1, store1,
        )
        e1.start()
        e1.ingest_rows(rows, timeout=10)
        e1.flush(timeout=10)
        e1.stop(timeout=10)

        import bloomsearch_tpu.engine as eng_mod

        store2 = bs.FileSystemDataStore(str(tmp_path / "python"))
        e2 = bs.BloomSearchEngine(
            bs.BloomSearchEngineConfig(row_data_compression="none", probe_backend="host"),
            store2, store2,
        )
        orig = eng_mod._native_ingest_available
        eng_mod._native_ingest_available = lambda: False
        try:
            e2.start()
            e2.ingest_rows(rows, timeout=10)
            e2.flush(timeout=10)
            e2.stop(timeout=10)
        finally:
            eng_mod._native_ingest_available = orig

        f1 = store1.get_maybe_files_for_query(None)[0].metadata
        f2 = store2.get_maybe_files_for_query(None)[0].metadata
        assert f1.bloom_filters == f2.bloom_filters
        with store1.open_file(store1.get_maybe_files_for_query(None)[0].pointer) as fh:
            from bloomsearch_tpu.file_format import read_bank_group

            bank1 = read_bank_group(fh, f1.bank_groups[0])
        with store2.open_file(store2.get_maybe_files_for_query(None)[0].pointer) as fh:
            from bloomsearch_tpu.file_format import read_bank_group

            bank2 = read_bank_group(fh, f2.bank_groups[0])
        np.testing.assert_array_equal(bank1, bank2)


class TestNativeRowSerializer:
    """bloomsearch_pyser.cpp: byte-exact json.dumps parity + fallbacks."""

    def setup_method(self):
        if native.serialize_rows([{"a": 1}]) is None:
            pytest.skip("native row serializer unavailable")

    def test_byte_exact_parity_fuzz(self):
        import json
        import random

        rng = random.Random(7)

        def rand_val(depth=0):
            r = rng.random()
            if depth > 2 or r < 0.3:
                return rng.choice([
                    "hello", "wörld", 'quo"te', "back\\slash", "tab\tnl\n", "",
                    "emoji 🎉 and K kelvin", "\x00\x1f\x7f", -5, 0, 2**70,
                    3.14, 42.5, 1e16, -0.0, 5.0, 1e-310, True, False, None,
                    float("inf"), float("-inf"),
                ])
            if r < 0.5:
                return [rand_val(depth + 1) for _ in range(rng.randrange(3))]
            if r < 0.6:
                return tuple(rand_val(depth + 1) for _ in range(2))
            return {f"k{i}ü": rand_val(depth + 1) for i in range(rng.randrange(3))}

        rows = [
            {f"f{j}": rand_val() for j in range(rng.randrange(1, 5))}
            for _ in range(1500)
        ]
        stream, offs, lens = native.serialize_rows(rows)
        for i, row in enumerate(rows):
            got = bytes(stream[offs[i] : offs[i] + lens[i]])
            expect = json.dumps(row, separators=(",", ":")).encode()
            assert got == expect

    def test_nan_spelling_matches_allow_nan(self):
        import json

        stream, offs, lens = native.serialize_rows([{"x": float("nan")}])
        got = bytes(stream[offs[0] : offs[0] + lens[0]])
        assert got == json.dumps({"x": float("nan")}, separators=(",", ":")).encode()

    def test_unsupported_content_falls_back(self):
        assert native.serialize_rows([{"x": object()}]) is None
        assert native.serialize_rows([{1: "non-str key"}]) is None
        assert native.serialize_rows([["not a dict"]]) is None
        cyclic: dict = {}
        cyclic["self"] = cyclic
        assert native.serialize_rows([cyclic]) is None

    def test_prefix_stream_integrity(self):
        import struct

        rows = [{"a": i, "b": "x" * i} for i in range(50)]
        stream, offs, lens = native.serialize_rows(rows)
        pos = 0
        for i in range(len(rows)):
            (length,) = struct.unpack_from("<I", stream, pos)
            assert length == lens[i] and pos + 4 == offs[i]
            pos += 4 + length
        assert pos == len(stream)


class TestNumberCanonicalityScreen:
    """Round-4 review fixes: the native lane must route every number whose
    text might differ from repr(json.loads(text)) to the Python path, and
    must REJECT grammar the spec rejects."""

    def _fb(self, raw: bytes) -> bool:
        import numpy as np

        from bloomsearch_tpu import native

        if not native.available():
            pytest.skip("native unavailable")
        res = native.ingest_tokenize(
            raw, np.array([0], dtype=np.int64), np.array([len(raw)], dtype=np.int64)
        )
        assert res is not None
        return bool(res[3][0])

    def _token_hashes(self, raw: bytes):
        import numpy as np

        from bloomsearch_tpu import native

        res = native.ingest_tokenize(
            raw, np.array([0], dtype=np.int64), np.array([len(raw)], dtype=np.int64)
        )
        assert res is not None
        assert not res[3][0], raw  # stays native
        return np.asarray(res[1])

    def test_every_legal_spelling_indexes_the_spec_token(self):
        """The native lane COMPUTES the repr token (bs_float_repr_token), so
        any legal spelling indexes exactly what the Python spec would."""
        import json

        import numpy as np

        from bloomsearch_tpu.bloom.hashing import hash_keys
        from bloomsearch_tpu.utils import go_like_str

        for raw in (
            b'{"a":1.25000000000000001}',  # non-shortest: spec token "1.25"
            b'{"a":-0}',                   # spec token "0"
            b'{"a":10000000000000000.0}',  # spec token "1e+16"
            b'{"a":0.00001}',              # spec token "1e-05"
            b'{"a":1e5}',                  # spec token "100000"
            b'{"a":1.25}', b'{"a":-0.5}', b'{"a":123}', b'{"a":0}',
            b'{"a":5.0}', b'{"a":-0.0}', b'{"a":0.0001}', b'{"a":1.5e+25}',
        ):
            got = self._token_hashes(raw)
            spec = hash_keys(
                [go_like_str(json.loads(raw)["a"]).lower().encode()]
            )
            assert got.shape[0] == 1 and (got[0] == spec[0]).all(), raw

    def test_differential_float_spelling_fuzz(self):
        """Random doubles under random legal spellings: native token hash ==
        spec token hash whenever the row stays native; spec-rejected
        grammar always flags."""
        import json
        import random

        import numpy as np

        from bloomsearch_tpu import native
        from bloomsearch_tpu.bloom.hashing import hash_keys
        from bloomsearch_tpu.utils import go_like_str

        rng = random.Random(77)
        for _ in range(800):
            kind = rng.random()
            if kind < 0.4:
                text = repr(rng.uniform(-1e3, 1e3) * (10 ** rng.randint(-8, 8)))
            elif kind < 0.6:
                text = f"{rng.uniform(-10, 10):.{rng.randint(1, 20)}f}"
            elif kind < 0.75:
                text = f"{rng.uniform(-10, 10):.{rng.randint(0, 17)}e}"
            else:
                text = str(rng.randint(-10**18, 10**18))
            raw = ("{\"a\":" + text + "}").encode()
            parsed = json.loads(raw)
            res = native.ingest_tokenize(
                raw, np.array([0], dtype=np.int64),
                np.array([len(raw)], dtype=np.int64),
            )
            if res[3][0]:
                continue  # conservative fallback: Python lane handles
            spec = hash_keys([go_like_str(parsed["a"]).lower().encode()])
            got = np.asarray(res[1])
            assert got.shape[0] == 1 and (got[0] == spec[0]).all(), text

    def test_spec_rejected_grammar_flags_row(self):
        for raw in (
            b'{"a":1-2}', b'{"a":+5}', b'{"a":1.2.3}', b'{"a":5e}',
            b'{"a":"x\ny"}',  # raw control byte in string: json.loads raises
        ):
            assert self._fb(raw), raw

    def test_minmax_does_not_trust_garbage_values(self):
        import numpy as np

        from bloomsearch_tpu import native

        if not native.available():
            pytest.skip("native unavailable")
        raw = b'{"x":@@@,"t":5}'
        res = native.extract_minmax(
            raw, np.array([0], dtype=np.int64),
            np.array([len(raw)], dtype=np.int64), "t",
        )
        if res is not None:
            _, _, status = res
            assert status[0] != 1

    def test_dict_subclass_routes_to_json_dumps(self):
        from collections import OrderedDict

        from bloomsearch_tpu import native

        if not native.available():
            pytest.skip("native unavailable")
        od = OrderedDict([("a", 1), ("b", 2)])
        od.move_to_end("a")
        out = native.serialize_rows([{"k": od}])
        if out is not None:
            import json

            stream, offs, lens = out
            got = bytes(stream[offs[0] : offs[0] + lens[0]])
            assert got == json.dumps(
                {"k": od}, separators=(",", ":")
            ).encode(), got
