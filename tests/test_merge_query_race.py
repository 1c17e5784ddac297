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
