"""Engine warmup: banks resident + programs compiled before the first query.

Kills the cold-query cliff (the reference has none — it streams filters from
disk per query; the bank/jit design trades that for a first-touch cost that
warmup pays up front, off the query path).
"""

import queue

import pytest

import bloomsearch_tpu as bs

TIMEOUT = 30.0


def _dataset(tmp_path, rows=400):
    store = bs.FileSystemDataStore(str(tmp_path / "data"))
    engine = bs.BloomSearchEngine(
        bs.BloomSearchEngineConfig(probe_backend="host"), store, store
    )
    engine.start()
    engine.ingest_rows(
        [{"n": i, "w": f"word{i}", "tag": "all"} for i in range(rows)],
        timeout=TIMEOUT,
    )
    engine.flush(timeout=TIMEOUT)
    engine.stop(timeout=TIMEOUT)
    return store


class TestWarmup:
    def test_device_banks_resident_and_probe_compiled(self, tmp_path):
        store = _dataset(tmp_path)
        engine = bs.BloomSearchEngine(
            bs.BloomSearchEngineConfig(probe_backend="device"), store, store
        )
        engine.start()
        try:
            engine.warmup(block=True, timeout=TIMEOUT)
            st = engine.stats()
            assert st["device"]["superbank_bytes"] > 0, st
            assert st["device"]["probe_launches"] >= 1, st  # compile pass ran
            assert st["file_bank_groups"] >= 1, st
            got = engine.query_sync(bs.new_query().token("word7").build(), timeout=TIMEOUT)
            assert got == [{"n": 7, "w": "word7", "tag": "all"}]
        finally:
            engine.stop(timeout=TIMEOUT)

    def test_host_bank_cache_warmed(self, tmp_path):
        store = _dataset(tmp_path)
        engine = bs.BloomSearchEngine(
            bs.BloomSearchEngineConfig(probe_backend="host"), store, store
        )
        engine.start()
        try:
            engine.warmup(block=True, timeout=TIMEOUT)
            assert len(engine._host_bank_cache) >= 1
            got = engine.query_sync(bs.new_query().token("word42").build(), timeout=TIMEOUT)
            assert got == [{"n": 42, "w": "word42", "tag": "all"}]
        finally:
            engine.stop(timeout=TIMEOUT)

    def test_serving_mode_rows_pinned_and_scan_compiled(self, tmp_path):
        store = _dataset(tmp_path)
        engine = bs.BloomSearchEngine(
            bs.BloomSearchEngineConfig(
                probe_backend="device", row_cache_bytes=64 << 20
            ),
            store,
            store,
        )
        engine.start()
        try:
            engine.warmup(block=True, timeout=TIMEOUT)
            st = engine.stats()
            assert st["row_cache"]["pinned_blocks"] >= 1, st
            assert st["row_cache"]["scan_launches"] >= 1, st  # compile pass ran
            got = engine.query_sync(bs.new_query().token("word9").build(), timeout=TIMEOUT)
            assert got == [{"n": 9, "w": "word9", "tag": "all"}]
        finally:
            engine.stop(timeout=TIMEOUT)

    def test_warmup_on_start_config(self, tmp_path):
        store = _dataset(tmp_path)
        engine = bs.BloomSearchEngine(
            bs.BloomSearchEngineConfig(probe_backend="device", warmup_on_start=True),
            store,
            store,
        )
        engine.start()
        try:
            # The background warm races this query; both orders must work.
            got = engine.query_sync(bs.new_query().token("word3").build(), timeout=TIMEOUT)
            assert got == [{"n": 3, "w": "word3", "tag": "all"}]
            # Drain the warm thread, then residency must hold.
            engine.warmup(block=True, timeout=TIMEOUT)
            assert engine.stats()["device"]["superbank_bytes"] > 0
        finally:
            engine.stop(timeout=TIMEOUT)

    def test_warmup_empty_store(self, tmp_path):
        store = bs.FileSystemDataStore(str(tmp_path / "data"))
        engine = bs.BloomSearchEngine(
            bs.BloomSearchEngineConfig(probe_backend="host"), store, store
        )
        engine.start()
        try:
            engine.warmup(block=True, timeout=TIMEOUT)  # no-op, no crash
            assert engine.query_sync(bs.new_query().token("x").build(), timeout=TIMEOUT) == []
        finally:
            engine.stop(timeout=TIMEOUT)
