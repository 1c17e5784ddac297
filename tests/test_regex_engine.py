"""Regex final-stage filtering through the full engine.

Mirrors reference coverage: regex AND/OR final-stage behavior (:1860-1913),
invalid-regex error (:1915-1942), and field-guard pruning observed through
block stats (:1944-2028).
"""

import queue

import pytest

import bloomsearch_tpu as bs
from bloomsearch_tpu import BloomSearchEngine, BloomSearchEngineConfig, FileSystemDataStore

TIMEOUT = 10.0


def make_engine(tmp_path, **overrides):
    store = FileSystemDataStore(str(tmp_path / "data"))
    config = BloomSearchEngineConfig(row_data_compression="none", **overrides)
    engine = BloomSearchEngine(config, store, store)
    engine.start()
    return engine, store


ROWS = [
    {"service": "payment", "level": "error", "message": "connection timeout after 30s"},
    {"service": "payment", "level": "info", "message": "charge completed"},
    {"service": "auth", "level": "error", "message": "login failed for user"},
    {"service": "search", "level": "warn", "message": "slow query detected"},
]


class TestRegexQueries:
    def test_field_regex_and(self, tmp_path):
        engine, _ = make_engine(tmp_path)
        try:
            engine.ingest_rows(ROWS, timeout=TIMEOUT)
            engine.flush(timeout=TIMEOUT)
            q = (
                bs.new_query()
                .field_regex("service", "^pay")
                .field_regex("message", "timeout")
                .build()
            )
            rows = engine.query_sync(q, timeout=TIMEOUT)
            assert len(rows) == 1
            assert rows[0]["message"].startswith("connection")
        finally:
            engine.stop(timeout=TIMEOUT)

    def test_regex_or_tree(self, tmp_path):
        engine, _ = make_engine(tmp_path)
        try:
            engine.ingest_rows(ROWS, timeout=TIMEOUT)
            engine.flush(timeout=TIMEOUT)
            q = (
                bs.new_query()
                .match_regex(
                    bs.regex_or(
                        bs.field_regex("message", "timeout$|timeout "),
                        bs.field_regex("level", "^warn$"),
                    )
                )
                .build()
            )
            rows = engine.query_sync(q, timeout=TIMEOUT)
            assert len(rows) == 2
            assert {r["service"] for r in rows} == {"payment", "search"}
        finally:
            engine.stop(timeout=TIMEOUT)

    def test_regex_is_final_and_stage_with_bloom(self, tmp_path):
        # Bloom narrows to level=error rows; regex further narrows by message.
        engine, _ = make_engine(tmp_path)
        try:
            engine.ingest_rows(ROWS, timeout=TIMEOUT)
            engine.flush(timeout=TIMEOUT)
            q = (
                bs.new_query()
                .field_token("level", "error")
                .field_regex("message", "^login")
                .build()
            )
            rows = engine.query_sync(q, timeout=TIMEOUT)
            assert len(rows) == 1 and rows[0]["service"] == "auth"
        finally:
            engine.stop(timeout=TIMEOUT)

    def test_regex_field_guard_prunes_blocks(self, tmp_path):
        # A regex on a field that exists only in some partitions prunes the
        # others at the bloom stage — observable via skipped block stats
        # (reference :1944-2028).
        engine, _ = make_engine(tmp_path, partition_func=lambda r: r["p"])
        try:
            engine.ingest_rows(
                [
                    {"p": "with", "special_field": "hello world"},
                    {"p": "without", "other": "nothing here"},
                ],
                timeout=TIMEOUT,
            )
            engine.flush(timeout=TIMEOUT)
            result_q: queue.Queue = queue.Queue()
            stats_q: queue.Queue = queue.Queue()
            q = bs.new_query().field_regex("special_field", "hello").build()
            engine.query(q, result_q, None, stats_q)
            rows = []
            while True:
                item = result_q.get(timeout=TIMEOUT)
                if item is None:
                    break
                rows.append(item)
            assert len(rows) == 1 and rows[0]["p"] == "with"
            stats = []
            while not stats_q.empty():
                stats.append(stats_q.get_nowait())
            skipped = [s for s in stats if s.bloom_filter_skipped]
            assert len(skipped) == 1, "field guard should prune the block lacking the field"
        finally:
            engine.stop(timeout=TIMEOUT)

    def test_regex_matches_full_value_not_tokens(self, tmp_path):
        engine, _ = make_engine(tmp_path)
        try:
            engine.ingest_rows([{"msg": "alpha beta gamma"}], timeout=TIMEOUT)
            engine.flush(timeout=TIMEOUT)
            # Pattern spans token boundaries: only possible on the full value.
            q = bs.new_query().field_regex("msg", "alpha beta").build()
            assert len(engine.query_sync(q, timeout=TIMEOUT)) == 1
            q = bs.new_query().field_regex("msg", "^beta").build()
            assert engine.query_sync(q, timeout=TIMEOUT) == []
        finally:
            engine.stop(timeout=TIMEOUT)

    def test_regex_on_numeric_values(self, tmp_path):
        engine, _ = make_engine(tmp_path)
        try:
            engine.ingest_rows([{"code": 404}, {"code": 500}], timeout=TIMEOUT)
            engine.flush(timeout=TIMEOUT)
            q = bs.new_query().field_regex("code", "^4..$").build()
            rows = engine.query_sync(q, timeout=TIMEOUT)
            assert len(rows) == 1 and rows[0]["code"] == 404
        finally:
            engine.stop(timeout=TIMEOUT)
