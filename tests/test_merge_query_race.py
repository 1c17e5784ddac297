"""Merge vs in-flight query: deferred tombstones keep planned jobs readable."""

import queue
import threading
import time

import bloomsearch_tpu as bs
from bloomsearch_tpu import BloomSearchEngine, BloomSearchEngineConfig, FileSystemDataStore

TIMEOUT = 15.0


class SlowOpenStore(FileSystemDataStore):
    """Delays block reads so a merge can land mid-query."""

    def __init__(self, root):
        super().__init__(root)
        self.delay = 0.0

    def open_file(self, pointer):
        if self.delay:
            time.sleep(self.delay)
        return super().open_file(pointer)


class TestMergeDuringQuery:
    def test_query_survives_concurrent_merge(self, tmp_path):
        store = SlowOpenStore(str(tmp_path / "data"))
        config = BloomSearchEngineConfig(
            row_data_compression="none", probe_backend="host", max_query_concurrency=1
        )
        engine = BloomSearchEngine(config, store, store)
        engine.start()
        try:
            for i in range(4):
                engine.ingest_rows([{"n": i, "tag": "common"}], timeout=TIMEOUT)
                engine.flush(timeout=TIMEOUT)

            store.delay = 0.15  # each block read now takes 150ms
            result_q: queue.Queue = queue.Queue()
            error_q: queue.Queue = queue.Queue()
            engine.query(bs.new_query().token("common").build(), result_q, error_q)

            time.sleep(0.2)  # query is mid-flight
            stats = engine.merge()  # tombstones must defer, not unlink
            assert stats.files_processed == 4
            # The race actually happened: the merge deferred behind the
            # in-flight query and the replaced bytes are still readable.
            import os as _os

            assert engine._deferred_tombstones, "merge did not defer: query already drained"
            assert any(
                name.endswith(".tombstoned") for name in _os.listdir(store.root_dir)
            )

            rows = []
            while True:
                item = result_q.get(timeout=TIMEOUT)
                if item is None:
                    break
                rows.append(item)
            assert error_q.empty(), f"worker errored: {error_q.get_nowait()}"
            assert sorted(r["n"] for r in rows) == [0, 1, 2, 3]

            # After the query drained, deferred tombstones were applied:
            # only the merged file remains on disk.
            store.delay = 0.0
            files = store.get_maybe_files_for_query(None)
            assert len(files) == 1
            import os

            dat_files = [f for f in os.listdir(store.root_dir) if f.endswith(".dat")]
            assert len(dat_files) == 1, f"old files not tombstoned: {dat_files}"

            # Fresh queries see the merged file.
            rows = engine.query_sync(bs.new_query().token("common").build(), timeout=TIMEOUT)
            assert len(rows) == 4
        finally:
            engine.stop(timeout=TIMEOUT)


class TestStopDuringQuery:
    def test_stop_waits_for_inflight_query_before_tombstoning(self, tmp_path):
        """stop() must not force-apply deferred tombstones while a query
        worker still reads the replaced file (grace 0 would unlink it)."""
        store = SlowOpenStore(str(tmp_path / "data"))
        config = BloomSearchEngineConfig(
            row_data_compression="none", probe_backend="host", max_query_concurrency=1
        )
        engine = BloomSearchEngine(config, store, store)
        engine.start()
        for i in range(4):
            engine.ingest_rows([{"n": i, "tag": "common"}], timeout=TIMEOUT)
            engine.flush(timeout=TIMEOUT)

        store.delay = 0.15
        result_q: queue.Queue = queue.Queue()
        error_q: queue.Queue = queue.Queue()
        engine.query(bs.new_query().token("common").build(), result_q, error_q)
        time.sleep(0.2)  # query is mid-flight
        engine.merge()  # tombstones defer behind the query
        assert engine._deferred_tombstones

        stopped = threading.Event()

        def do_stop():
            engine.stop(timeout=TIMEOUT)
            stopped.set()

        stopper = threading.Thread(target=do_stop, daemon=True)
        stopper.start()
        # stop() must be blocked on the in-flight query, and the replaced
        # files must still be readable (renamed, not unlinked).
        time.sleep(0.1)
        assert not stopped.is_set(), "stop returned while a query was in flight"

        rows = []
        while True:
            item = result_q.get(timeout=TIMEOUT)
            if item is None:
                break
            rows.append(item)
        assert error_q.empty(), f"worker errored: {error_q.get_nowait()}"
        assert sorted(r["n"] for r in rows) == [0, 1, 2, 3]

        assert stopped.wait(TIMEOUT)
        import os

        leftovers = [
            f for f in os.listdir(store.root_dir) if f.endswith(".tombstoned")
        ]
        assert not leftovers, f"deferred tombstones not applied at stop: {leftovers}"

    def test_stop_timeout_with_stuck_query_raises(self, tmp_path):
        store = SlowOpenStore(str(tmp_path / "data"))
        config = BloomSearchEngineConfig(row_data_compression="none", probe_backend="host")
        engine = BloomSearchEngine(config, store, store)
        engine.start()
        engine.ingest_rows([{"n": 1, "tag": "x"}], timeout=TIMEOUT)
        engine.flush(timeout=TIMEOUT)

        release = threading.Event()
        orig_open = store.open_file

        def blocking_open(pointer):
            release.wait(TIMEOUT)
            return orig_open(pointer)

        store.open_file = blocking_open
        result_q: queue.Queue = queue.Queue()
        engine.query(bs.new_query().token("x").build(), result_q)
        time.sleep(0.1)
        try:
            import pytest

            with pytest.raises(TimeoutError):
                engine.stop(timeout=0.3)
        finally:
            release.set()
        while result_q.get(timeout=TIMEOUT) is not None:
            pass
        engine.stop(timeout=TIMEOUT)
