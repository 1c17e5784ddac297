"""Deterministic race orchestration via blocking store / tokenizer fixtures.

The reference proves its single-writer-actor invariants with fixtures that
stall IO or tokenization at precise points (bloom_tree_engine_test.go:
2110-2311 blockingFirstFlushWriteStore, :2313-2395 blocking tokenizer at
Stop). Same approach here: these are the regression tests for the flush
epoch boundary (file-level filters reset exactly at flush handoff) and for
stop-time durability.
"""

import threading
import time

import bloomsearch_tpu as bs
from bloomsearch_tpu import BloomSearchEngine, BloomSearchEngineConfig, FileSystemDataStore

TIMEOUT = 15.0


class BlockingFirstFlushWriteStore(FileSystemDataStore):
    """Stalls the first created file's first write until released.

    (reference blockingFirstFlushWriteStore + blockingWriteCloser,
    bloom_tree_engine_test.go:2110-2181)
    """

    def __init__(self, root):
        super().__init__(root)
        self.release = threading.Event()
        self.first_write_reached = threading.Event()
        self._blocked_once = False
        self._lock = threading.Lock()

    def create_file(self):
        fh, pointer = super().create_file()
        with self._lock:
            if not self._blocked_once:
                self._blocked_once = True
                return _BlockingWriter(fh, self), pointer
        return fh, pointer


class _BlockingWriter:
    def __init__(self, fh, store: BlockingFirstFlushWriteStore):
        self._fh = fh
        self._store = store
        self._stalled = False

    def write(self, data):
        if not self._stalled:
            self._stalled = True
            self._store.first_write_reached.set()
            assert self._store.release.wait(TIMEOUT), "release signal never came"
        return self._fh.write(data)

    def close(self):
        self._fh.close()

    def __getattr__(self, name):
        return getattr(self._fh, name)


class TestFlushEpochRace:
    def test_rows_ingested_during_stalled_flush_land_in_next_file_filter(self, tmp_path):
        """Rows ingested while a flush is stalled mid-write must end up in the

        NEXT file with a file-level bloom filter that covers them — the
        regression the reference guards with this exact orchestration
        (bloom_tree_engine_test.go:2183-2311).
        """
        store = BlockingFirstFlushWriteStore(str(tmp_path / "data"))
        config = BloomSearchEngineConfig(row_data_compression="none", probe_backend="host")
        engine = BloomSearchEngine(config, store, store)
        engine.start()
        try:
            from concurrent.futures import Future

            # First batch -> force flush (will stall on first write).
            first_done = Future()
            engine.ingest_rows([{"gen": "first", "w": "alpha"}], done=first_done, timeout=TIMEOUT)
            flusher = threading.Thread(target=lambda: engine.flush(timeout=TIMEOUT), daemon=True)
            flusher.start()
            assert store.first_write_reached.wait(TIMEOUT)

            # While the flush worker is stalled inside the write, ingest more
            # rows — the actor has already reset its buffers and file filters,
            # so these belong to the next epoch.
            second_done = Future()
            engine.ingest_rows([{"gen": "second", "w": "bravo"}], done=second_done, timeout=TIMEOUT)

            store.release.set()
            first_done.result(timeout=TIMEOUT)
            flusher.join(TIMEOUT)
            engine.flush(timeout=TIMEOUT)
            second_done.result(timeout=TIMEOUT)

            files = store.get_maybe_files_for_query(None)
            assert len(files) == 2

            # Each file's file-level filter covers exactly its own epoch.
            covering_alpha = [
                f for f in files if f.metadata.bloom_filters.token.test("alpha")
            ]
            covering_bravo = [
                f for f in files if f.metadata.bloom_filters.token.test("bravo")
            ]
            assert len(covering_alpha) == 1
            assert len(covering_bravo) == 1
            assert covering_alpha[0].pointer != covering_bravo[0].pointer

            # And queries find both rows.
            assert len(engine.query_sync(bs.new_query().token("alpha").build(), timeout=TIMEOUT)) == 1
            assert len(engine.query_sync(bs.new_query().token("bravo").build(), timeout=TIMEOUT)) == 1
        finally:
            store.release.set()
            engine.stop(timeout=TIMEOUT)


class FailingWriteStore(FileSystemDataStore):
    """First created file's writes fail mid-stream (disk-full simulation)."""

    def __init__(self, root):
        super().__init__(root)
        self._failed_once = False

    def create_file(self):
        fh, pointer = super().create_file()
        if not self._failed_once:
            self._failed_once = True

            class _Failing:
                def __init__(self, inner):
                    self._inner = inner
                    self._writes = 0

                def write(self, data):
                    self._writes += 1
                    if self._writes > 1:
                        raise OSError(28, "No space left on device")
                    return self._inner.write(data)

                def __getattr__(self, name):
                    return getattr(self._inner, name)

            return _Failing(fh), pointer
        return fh, pointer


class TestFlushFailureDurability:
    def test_failed_flush_never_publishes_partial_file(self, tmp_path):
        """A mid-write flush failure must not leave a corrupt visible file

        (regression: the error path used to rename the truncated temp file
        into place, poisoning every subsequent directory scan)."""
        from concurrent.futures import Future

        store = FailingWriteStore(str(tmp_path / "data"))
        config = BloomSearchEngineConfig(row_data_compression="none", probe_backend="host")
        engine = BloomSearchEngine(config, store, store)
        engine.start()
        try:
            import pytest

            engine.ingest_rows([{"n": 1}], timeout=TIMEOUT)
            # flush() surfaces the write error from the failed handler.
            with pytest.raises(OSError):
                engine.flush(timeout=TIMEOUT)

            # The store must be clean: no visible files, no stale temp poison.
            assert store.get_maybe_files_for_query(None) == []

            # And the engine keeps working: next flush (store healthy now)
            # succeeds and only the NEW data is visible (buffered rows of the
            # failed epoch were consumed by the failed flush, like the
            # reference's error-to-doneChans semantics).
            engine.ingest_rows([{"n": 3}], timeout=TIMEOUT)
            engine.flush(timeout=TIMEOUT)
            rows = engine.query_sync(None, timeout=TIMEOUT)
            assert [r["n"] for r in rows] == [3]
        finally:
            engine.stop(timeout=TIMEOUT)


class TestStopWhileIngestBlocked:
    def test_stop_flushes_rows_buffered_behind_a_slow_tokenizer(self, tmp_path):
        """A tokenizer stall freezes the ingest actor mid-request; rows must

        still be flushed to a complete file by stop()
        (reference bloom_tree_engine_test.go:2313-2395, blocking injected
        Tokenizer as the test seam).
        """
        store = FileSystemDataStore(str(tmp_path / "data"))
        gate = threading.Event()
        entered = threading.Event()

        def blocking_tokenizer(value):
            entered.set()
            assert gate.wait(TIMEOUT), "gate never opened"
            return bs.basic_whitespace_lower_tokenizer(value)

        config = BloomSearchEngineConfig(
            row_data_compression="none",
            tokenizer=blocking_tokenizer,
            probe_backend="host",
        )
        engine = BloomSearchEngine(config, store, store)
        engine.start()
        engine.ingest_rows([{"msg": "hello world"}], timeout=TIMEOUT)
        assert entered.wait(TIMEOUT)

        stopper = threading.Thread(target=lambda: engine.stop(timeout=TIMEOUT), daemon=True)
        stopper.start()
        time.sleep(0.1)  # stop() is now waiting on the frozen actor
        gate.set()
        stopper.join(TIMEOUT)
        assert not stopper.is_alive()

        files = store.get_maybe_files_for_query(None)
        assert len(files) == 1
        assert sum(b.rows for b in files[0].metadata.data_blocks) == 1
