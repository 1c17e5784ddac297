"""Candidate-scan pre-filter: soundness (no false negatives) + engine parity."""

import json
import random

import numpy as np
import pytest

import bloomsearch_tpu as bs
from bloomsearch_tpu import native
from bloomsearch_tpu.query import and_bloom_queries, regex_field_guard_bloom_query
from bloomsearch_tpu.scan import candidate_rows, compile_scan_plan, split_rows_arrays
from bloomsearch_tpu.file_format import encode_row
from bloomsearch_tpu.tokenizer import basic_whitespace_lower_tokenizer, row_matches_bloom_expression

pytestmark = pytest.mark.skipif(not native.available(), reason="native lib unavailable")


def rows_to_stream(rows: list[dict]) -> bytes:
    return b"".join(
        encode_row(json.dumps(r, separators=(",", ":")).encode()) for r in rows
    )


def scan_mask(query_bloom, rows):
    plan = compile_scan_plan(query_bloom)
    if plan is None:
        return None
    data = rows_to_stream(rows)
    buf, offsets, lengths = split_rows_arrays(data)
    return candidate_rows(plan, buf, offsets, lengths)


class TestScanSoundness:
    def test_no_false_negatives_random_rows(self):
        rng = random.Random(42)
        words = ["alpha", "bravo", "Charlie", "delta-9", "ECHO", "fox trot", "42", "true"]
        rows = []
        for i in range(300):
            row = {
                "id": i,
                "msg": " ".join(rng.choice(words) for _ in range(rng.randrange(1, 5))),
                "level": rng.choice(["info", "warn", "error"]),
            }
            if rng.random() < 0.3:
                row["extra"] = {"nested": rng.choice(words)}
            rows.append(row)

        queries = [
            bs.new_query().token("alpha").build(),
            bs.new_query().token("charlie").build(),  # case-insensitive
            bs.new_query().field_token("level", "error").build(),
            bs.new_query().field("extra.nested").build(),
            bs.new_query().match(
                bs.or_(bs.token("echo"), bs.and_(bs.token("42"), bs.field("msg")))
            ).build(),
        ]
        parsed_rows = [json.loads(json.dumps(r)) for r in rows]
        for q in queries:
            mask = scan_mask(q.bloom, rows)
            assert mask is not None
            for i, parsed in enumerate(parsed_rows):
                truly_matches = row_matches_bloom_expression(
                    parsed, q.bloom.expression, ".", basic_whitespace_lower_tokenizer
                )
                if truly_matches:
                    assert mask[i], f"FALSE NEGATIVE: row {i} for query {q.bloom}"

    def test_prunes_non_matching_rows(self):
        rows = [{"msg": f"word{i}"} for i in range(100)]
        rows.append({"msg": "needle here"})
        q = bs.new_query().token("needle").build()
        mask = scan_mask(q.bloom, rows)
        assert mask is not None
        assert mask.sum() == 1 and mask[100]

    def test_unusable_needles_conservative(self):
        # Quotes and non-ASCII make a needle unusable -> all rows candidates.
        rows = [{"msg": 'has "quoted" token'}, {"msg": "café open"}]
        q1 = bs.new_query().token('"quoted"').build()
        assert compile_scan_plan(q1.bloom) is None  # only condition unusable
        q2 = bs.new_query().token("café").token("open").build()
        mask = scan_mask(q2.bloom, rows)
        # 'café' can't scan (json escapes non-ASCII) but 'open' can: row 1 only.
        assert mask is not None
        assert not mask[0] and mask[1]

    def test_field_needle_matches_key_not_value(self):
        rows = [
            {"special": 1},
            {"msg": "the word special appears as a value"},
        ]
        q = bs.new_query().field("special").build()
        mask = scan_mask(q.bloom, rows)
        # Row 0 has the key; row 1 contains "special" but not '"special":'.
        assert mask[0] and not mask[1]

    def test_regex_field_guard_participates(self):
        rows = [{"target_field": "abc"}, {"other": "xyz"}]
        q = bs.new_query().field_regex("target_field", "^a").build()
        prune = and_bloom_queries(q.bloom, regex_field_guard_bloom_query(q.regex))
        mask = scan_mask(prune, rows)
        assert mask[0] and not mask[1]

    def test_hit_spanning_rows_is_conservative(self):
        # Construct rows where the needle spans the boundary bytes of two
        # rows; both get marked, neither truly matches -> exact verify culls.
        rows = [{"a": "ends with nee"}, {"b": "dle starts"}]
        q = bs.new_query().token("needledoesnotexist").build()
        mask = scan_mask(q.bloom, rows)
        assert mask is not None  # plan exists; no matches expected
        assert not mask.any()


class TestEngineScanParity:
    def test_custom_tokenizer_disables_scan_prefilter(self, tmp_path):
        """A custom tokenizer may emit tokens that never appear verbatim in
        the stored bytes (stems, n-grams, here: reversed words) — pruning on
        them as substring needles would silently drop matching rows. The
        scan pre-filter must disable itself for non-default tokenizers."""
        import bloomsearch_tpu as bs

        def reversing_tokenizer(value):
            return [w[::-1] for w in str(value).lower().split()]

        store = bs.FileSystemDataStore(str(tmp_path / "d"))
        engine = bs.BloomSearchEngine(
            bs.BloomSearchEngineConfig(
                row_data_compression="none", tokenizer=reversing_tokenizer
            ),
            store, store,
        )
        engine.start()
        try:
            engine.ingest_rows(
                [{"m": "hello world"}, {"m": "other row"}], timeout=10
            )
            engine.flush(timeout=10)
            rows = engine.query_sync(
                bs.new_query().token("olleh").build(), timeout=10
            )
            assert len(rows) == 1 and rows[0]["m"] == "hello world"
        finally:
            engine.stop(timeout=10)

    def test_results_identical_with_and_without_scan(self, tmp_path):
        store = bs.FileSystemDataStore(str(tmp_path / "data"))
        config = bs.BloomSearchEngineConfig(row_data_compression="none", probe_backend="host")
        engine = bs.BloomSearchEngine(config, store, store)
        engine.start()
        try:
            rng = random.Random(0)
            rows = [
                {"n": i, "msg": f"entry {i} " + ("MATCH-me" if i % 37 == 0 else "nothing")}
                for i in range(500)
            ]
            engine.ingest_rows(rows, timeout=10)
            engine.flush(timeout=10)
            expected = sorted(
                r["n"] for r in rows if "MATCH-me" in r["msg"]
            )
            got = sorted(
                r["n"]
                for r in engine.query_sync(bs.new_query().token("match-me").build(), timeout=10)
            )
            assert got == expected

            # Force the no-scan path and compare.
            import bloomsearch_tpu.engine as eng_mod
            from bloomsearch_tpu import scan as scan_mod

            orig = scan_mod.compile_scan_plan
            scan_mod.compile_scan_plan = lambda *a, **k: None
            try:
                got2 = sorted(
                    r["n"]
                    for r in engine.query_sync(
                        bs.new_query().token("match-me").build(), timeout=10
                    )
                )
            finally:
                scan_mod.compile_scan_plan = orig
            assert got2 == expected
        finally:
            engine.stop(timeout=10)


class TestUnprovableRows:
    """Zero-false-negative regressions: rows whose stored bytes hide needle
    bytes (non-ASCII with ASCII lowercase; \\uXXXX / \\/ escapes of printable
    ASCII) must still reach exact verification."""

    def test_kelvin_sign_lowercases_to_ascii_k(self):
        # U+212A KELVIN SIGN: .lower() == 'k', but the stored bytes are the
        # K escape — a byte scan for b'k' finds nothing.
        rows = [{"f": "K"}, {"f": "other"}]
        q = bs.new_query().token("k").build()
        mask = scan_mask(q.bloom, rows)
        assert mask is not None and mask[0], "Kelvin-sign row must stay a candidate"

    def test_raw_utf8_kelvin_sign(self):
        # Same char as raw UTF-8 bytes (serialized-ingest style).
        serialized = ['{"f":"K"}'.encode("utf-8"), b'{"f":"other"}']
        data = b"".join(encode_row(r) for r in serialized)
        buf, offsets, lengths = split_rows_arrays(data)
        q = bs.new_query().token("k").build()
        plan = compile_scan_plan(q.bloom)
        mask = candidate_rows(plan, buf, offsets, lengths)
        assert mask is not None and mask[0]

    def test_escaped_printable_ascii(self):
        # Go's encoder writes < for '<' and allows \/ for '/': the
        # needle bytes never appear literally in the row.
        serialized = [b'{"f":"a\\u003cb"}', b'{"f":"a\\/b"}', b'{"f":"plain"}']
        data = b"".join(encode_row(r) for r in serialized)
        buf, offsets, lengths = split_rows_arrays(data)
        for token, row_idx in (("a<b", 0), ("a/b", 1)):
            plan = compile_scan_plan(bs.new_query().token(token).build().bloom)
            mask = candidate_rows(plan, buf, offsets, lengths)
            assert mask is not None and mask[row_idx], token
        # Provably-absent rows still prune.
        plan = compile_scan_plan(bs.new_query().token("zebra").build().bloom)
        mask = candidate_rows(plan, buf, offsets, lengths)
        assert not mask[2]

    def test_engine_end_to_end_kelvin(self, tmp_path):
        from bloomsearch_tpu import BloomSearchEngine, BloomSearchEngineConfig, FileSystemDataStore

        store = FileSystemDataStore(str(tmp_path / "data"))
        engine = BloomSearchEngine(
            BloomSearchEngineConfig(row_data_compression="none"), store, store
        )
        engine.start()
        try:
            engine.ingest_rows([{"f": "K"}, {"f": "zz"}], timeout=10)
            engine.flush(timeout=10)
            got = engine.query_sync(bs.new_query().token("k").build(), timeout=10)
            assert got == [{"f": "K"}]
        finally:
            engine.stop(timeout=10)

    def test_engine_end_to_end_serialized_escape(self, tmp_path):
        from bloomsearch_tpu import BloomSearchEngine, BloomSearchEngineConfig, FileSystemDataStore

        store = FileSystemDataStore(str(tmp_path / "data"))
        engine = BloomSearchEngine(
            BloomSearchEngineConfig(row_data_compression="none"), store, store
        )
        engine.start()
        try:
            engine.ingest_serialized([b'{"f":"a\\u003cb"}', b'{"f":"zz"}'], timeout=10)
            engine.flush(timeout=10)
            got = engine.query_sync(bs.new_query().token("a<b").build(), timeout=10)
            assert got == [{"f": "a<b"}]
        finally:
            engine.stop(timeout=10)

    def test_rowcache_flags_unprovable_rows(self):
        from bloomsearch_tpu.rowcache import DeviceRowCache

        serialized = [
            '{"f":"K"}'.encode("utf-8"),  # raw UTF-8
            b'{"f":"a\\u003cb"}',  # \u escape of ASCII
            b'{"f":"a\\/b"}',  # \/ escape
            b'{"f":"plain"}',
        ]
        data = b"".join(encode_row(r) for r in serialized)
        buf, offsets, lengths = split_rows_arrays(data)
        cache = DeviceRowCache(16 << 20)
        pinned = cache.pin((b"f", 0), data, offsets, lengths)
        scan = cache.scan(pinned, [b"k", b"a<b", b"a/b"])
        assert scan[:, 0].all() and scan[:, 1].all() and scan[:, 2].all()
        assert not scan[:, 3].any()


class TestRegexLiteralPrefilter:
    def test_mandatory_literal_extraction(self):
        from bloomsearch_tpu.scan import regex_mandatory_literal as lit

        assert lit(r"connection\s+\w+") == "connection"
        assert lit(r"^ERROR: .*") == "error: "
        assert lit(r"time\d+out") == "time"  # longest run
        assert lit(r"x\d+timeout") == "timeout"
        assert lit(r"abc|def") is None  # branch: no top-level literal
        assert lit(r"[Tt]imeout") == "imeout"
        assert lit(r".*") is None
        assert lit(r"a") is None  # too short
        assert lit(r"CaseSensitive") == "casesensitive"  # scan lowers both sides

    def test_regex_only_query_prunes_rows(self):
        rows = [{"msg": f"row {i} filler text"} for i in range(200)]
        rows.append({"msg": "connection    timeout here"})
        q = bs.new_query().field_regex("msg", r"connection\s+timeout").build()
        from bloomsearch_tpu.scan import regex_scan_query
        from bloomsearch_tpu.query import regex_field_guard_bloom_query

        prune = and_bloom_queries(None, regex_field_guard_bloom_query(q.regex))
        scan_q = and_bloom_queries(prune, regex_scan_query(q.regex))
        mask = scan_mask(scan_q, rows)
        assert mask is not None
        assert mask[200] and mask[:200].sum() == 0, "literal should prune all fillers"

    def test_regex_or_tree_masks_correctly(self):
        rows = [
            {"m": "alpha here"},
            {"m": "bravo there"},
            {"m": "neither"},
        ]
        q = (
            bs.new_query()
            .match_regex(
                bs.regex_or(bs.field_regex("m", r"alpha\d*"), bs.field_regex("m", "bravo"))
            )
            .build()
        )
        from bloomsearch_tpu.scan import regex_scan_query
        from bloomsearch_tpu.query import regex_field_guard_bloom_query

        prune = and_bloom_queries(None, regex_field_guard_bloom_query(q.regex))
        scan_q = and_bloom_queries(prune, regex_scan_query(q.regex))
        mask = scan_mask(scan_q, rows)
        assert mask[0] and mask[1] and not mask[2]

    def test_engine_regex_only_end_to_end(self, tmp_path):
        from bloomsearch_tpu import BloomSearchEngine, BloomSearchEngineConfig, FileSystemDataStore

        store = FileSystemDataStore(str(tmp_path / "data"))
        engine = BloomSearchEngine(
            BloomSearchEngineConfig(row_data_compression="none"), store, store
        )
        engine.start()
        try:
            rows = [{"n": i, "msg": f"plain {i}"} for i in range(300)]
            rows.append({"n": -1, "msg": "connection 47 timeout"})
            engine.ingest_rows(rows, timeout=10)
            engine.flush(timeout=10)
            got = engine.query_sync(
                bs.new_query().field_regex("msg", r"connection \d+ timeout").build(),
                timeout=10,
            )
            assert got == [{"n": -1, "msg": "connection 47 timeout"}]
            # Unprovable/no-literal regexes stay exact (conservative).
            got = engine.query_sync(
                bs.new_query().field_regex("msg", r"plain (1|2)$").build(), timeout=10
            )
            assert sorted(r["n"] for r in got) == [1, 2]
        finally:
            engine.stop(timeout=10)
