"""Checkpoint/resume: the data files ARE the checkpoints.

The engine is stateless across restarts except buffered rows (reference
tests restart engines against the same store freely,
bloom_tree_engine_test.go:1062-1119; SURVEY.md §5 checkpoint/resume).
"""

import bloomsearch_tpu as bs

TIMEOUT = 10.0


def make_engine(store):
    engine = bs.BloomSearchEngine(
        bs.BloomSearchEngineConfig(row_data_compression="none", probe_backend="host"),
        store,
        store,
    )
    engine.start()
    return engine


class TestRestartResume:
    def test_data_survives_engine_restarts(self, tmp_path):
        store = bs.FileSystemDataStore(str(tmp_path / "data"))

        e1 = make_engine(store)
        e1.ingest_rows([{"gen": 1, "w": "first"}], timeout=TIMEOUT)
        e1.flush(timeout=TIMEOUT)
        e1.stop(timeout=TIMEOUT)

        # Second engine instance resumes against the same store: reads old
        # data, writes new data, merges across generations.
        e2 = make_engine(store)
        try:
            assert len(e2.query_sync(bs.new_query().token("first").build(), timeout=TIMEOUT)) == 1
            e2.ingest_rows([{"gen": 2, "w": "second"}], timeout=TIMEOUT)
            e2.flush(timeout=TIMEOUT)
            rows = e2.query_sync(None, timeout=TIMEOUT)
            assert sorted(r["gen"] for r in rows) == [1, 2]
            e2.merge()
            rows = e2.query_sync(None, timeout=TIMEOUT)
            assert sorted(r["gen"] for r in rows) == [1, 2]
        finally:
            e2.stop(timeout=TIMEOUT)

        # Third generation still sees everything.
        e3 = make_engine(store)
        try:
            rows = e3.query_sync(None, timeout=TIMEOUT)
            assert sorted(r["gen"] for r in rows) == [1, 2]
        finally:
            e3.stop(timeout=TIMEOUT)

    def test_unflushed_buffered_rows_do_not_corrupt_store(self, tmp_path):
        # A crash before flush loses buffered rows but leaves no corrupt
        # state (durability is acknowledged via done futures / flush()).
        store = bs.FileSystemDataStore(str(tmp_path / "data"))
        e1 = make_engine(store)
        e1.ingest_rows([{"durable": True}], timeout=TIMEOUT)
        e1.flush(timeout=TIMEOUT)
        e1.ingest_rows([{"buffered": True}], timeout=TIMEOUT)
        # Simulate crash: threads are daemons, just drop the engine without
        # stop(); the buffered row never becomes visible.
        e1._stop_event.set()

        e2 = make_engine(store)
        try:
            rows = e2.query_sync(None, timeout=TIMEOUT)
            assert len(rows) >= 1
            assert all("durable" in r or "buffered" in r for r in rows)
            # Store remains fully functional.
            e2.ingest_rows([{"post": 1}], timeout=TIMEOUT)
            e2.flush(timeout=TIMEOUT)
            assert any("post" in r for r in e2.query_sync(None, timeout=TIMEOUT))
        finally:
            e2.stop(timeout=TIMEOUT)
