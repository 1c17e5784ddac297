"""Merge leases + scatter/gather query coordination."""

import queue
import threading
import time

import pytest

import bloomsearch_tpu as bs
from bloomsearch_tpu.coordination import FileLeaseCoordinator
from bloomsearch_tpu.parallel.distributed import ScatterGatherCoordinator

TIMEOUT = 10.0


class TestFileLeaseCoordinator:
    def test_exclusive_acquisition(self, tmp_path):
        coord = FileLeaseCoordinator(str(tmp_path))
        lease = coord.acquire_merge_lease()
        assert lease is not None and lease.valid()
        assert coord.acquire_merge_lease() is None  # held
        lease.release()
        assert coord.acquire_merge_lease() is not None  # free again

    def test_expired_lease_stolen(self, tmp_path):
        coord = FileLeaseCoordinator(str(tmp_path))
        stale = coord.acquire_merge_lease(ttl_seconds=0.05)
        assert stale is not None
        time.sleep(0.1)
        fresh = coord.acquire_merge_lease()
        assert fresh is not None
        # The stale holder's release must not clobber the fresh lease.
        stale.release()
        assert coord.acquire_merge_lease() is None

    def test_context_manager(self, tmp_path):
        coord = FileLeaseCoordinator(str(tmp_path))
        with coord.acquire_merge_lease() as lease:
            assert lease.valid()
            assert coord.acquire_merge_lease() is None
        assert coord.acquire_merge_lease() is not None

    def test_engine_merge_respects_lease(self, tmp_path):
        class CoordinatedFSStore(bs.FileSystemDataStore):
            def __init__(self, root):
                super().__init__(root)
                self._coordinator = FileLeaseCoordinator(root, "merge.lease")

            def acquire_merge_lease(self, ttl_seconds: float = 300.0):
                return self._coordinator.acquire_merge_lease(ttl_seconds)

        store = CoordinatedFSStore(str(tmp_path / "data"))
        engine = bs.BloomSearchEngine(
            bs.BloomSearchEngineConfig(row_data_compression="none", probe_backend="host"),
            store, store,
        )
        engine.start()
        try:
            for i in range(2):
                engine.ingest_rows([{"n": i}], timeout=TIMEOUT)
                engine.flush(timeout=TIMEOUT)

            # Someone else holds the lease: merge is a no-op.
            held = store.acquire_merge_lease()
            stats = engine.merge()
            assert stats.files_processed == 0
            assert len(store.get_maybe_files_for_query(None)) == 2
            held.release()

            # Lease free: merge proceeds and releases afterwards.
            stats = engine.merge()
            assert stats.files_processed == 2
            assert store.acquire_merge_lease() is not None
        finally:
            engine.stop(timeout=TIMEOUT)


class TestScatterGather:
    def make_peer(self, tmp_path, name, rows):
        store = bs.FileSystemDataStore(str(tmp_path / name))
        engine = bs.BloomSearchEngine(
            bs.BloomSearchEngineConfig(row_data_compression="none", probe_backend="host"),
            store, store,
        )
        engine.start()
        engine.ingest_rows(rows, timeout=TIMEOUT)
        engine.flush(timeout=TIMEOUT)
        return engine

    def test_gather_across_peers(self, tmp_path):
        peers = [
            self.make_peer(tmp_path, "p0", [{"peer": 0, "tag": "common", "u": "only0"}]),
            self.make_peer(tmp_path, "p1", [{"peer": 1, "tag": "common"}]),
            self.make_peer(tmp_path, "p2", [{"peer": 2, "tag": "other"}]),
        ]
        try:
            coordinator = ScatterGatherCoordinator(peers)
            rows = coordinator.query_sync(bs.new_query().token("common").build(), timeout=TIMEOUT)
            assert sorted(r["peer"] for r in rows) == [0, 1]
            rows = coordinator.query_sync(bs.new_query().token("only0").build(), timeout=TIMEOUT)
            assert [r["peer"] for r in rows] == [0]
            assert coordinator.query_sync(bs.new_query().token("absent").build(), timeout=TIMEOUT) == []
        finally:
            for peer in peers:
                peer.stop(timeout=TIMEOUT)

    def test_peer_error_does_not_block_completion(self, tmp_path):
        class FailingPeer:
            def query(self, q, result_queue, error_queue=None, stats_queue=None):
                raise RuntimeError("peer down")

        good = self.make_peer(tmp_path, "good", [{"x": "hit"}])
        try:
            coordinator = ScatterGatherCoordinator([good, FailingPeer()])
            result_queue: queue.Queue = queue.Queue()
            error_queue: queue.Queue = queue.Queue()
            coordinator.query(bs.new_query().token("hit").build(), result_queue, error_queue)
            rows = []
            while True:
                item = result_queue.get(timeout=TIMEOUT)
                if item is None:
                    break
                rows.append(item)
            assert len(rows) == 1
            assert isinstance(error_queue.get_nowait(), RuntimeError)
        finally:
            good.stop(timeout=TIMEOUT)


class TestLeaseHardening:
    """Round-4 review fixes: flock'd steal/release, renewal as publish guard."""

    def test_release_after_steal_does_not_delete_stealers_lease(self, tmp_path):
        coord = FileLeaseCoordinator(str(tmp_path))
        a = coord.acquire_merge_lease(ttl_seconds=0.05)
        assert a is not None
        time.sleep(0.1)  # expire A
        b = coord.acquire_merge_lease(ttl_seconds=60)
        assert b is not None  # stolen
        a.release()  # must NOT remove B's lease (id mismatch)
        assert coord.acquire_merge_lease() is None  # B still holds it
        b.release()
        assert coord.acquire_merge_lease() is not None

    def test_renew_extends_while_held(self, tmp_path):
        coord = FileLeaseCoordinator(str(tmp_path))
        lease = coord.acquire_merge_lease(ttl_seconds=0.2)
        assert lease.renew(ttl_seconds=60)
        time.sleep(0.3)  # past the ORIGINAL expiry
        assert lease.valid()
        assert coord.acquire_merge_lease() is None  # renewal held the lock
        lease.release()

    def test_renew_fails_after_steal(self, tmp_path):
        coord = FileLeaseCoordinator(str(tmp_path))
        a = coord.acquire_merge_lease(ttl_seconds=0.05)
        time.sleep(0.1)
        b = coord.acquire_merge_lease(ttl_seconds=60)
        assert b is not None
        assert not a.renew()  # lost: stolen after expiry
        b.release()

    def test_objectstore_lease_renew(self):
        from bloomsearch_tpu.objectstore import (
            InMemoryObjectStore,
            ObjectStoreMetaStore,
        )

        store = ObjectStoreMetaStore(InMemoryObjectStore())
        a = store.acquire_merge_lease(ttl_seconds=0.05)
        assert a.renew(ttl_seconds=60)
        assert store.acquire_merge_lease() is None
        time.sleep(0.1)
        assert a.valid()  # renewed past original expiry
        a.release()
        b = store.acquire_merge_lease(ttl_seconds=0.05)
        time.sleep(0.1)
        c = store.acquire_merge_lease(ttl_seconds=60)
        assert c is not None
        assert not b.renew()  # stolen: etag moved on
        c.release()

    def test_merge_aborts_publish_when_lease_lost(self, tmp_path):
        """A merger whose lease cannot be renewed must not publish (two
        mergers' outputs over the same rows = permanent duplicates)."""
        store = bs.FileSystemDataStore(str(tmp_path / "data"))

        class LosingLeaseMeta:
            """Wrap the FS store; grant a lease that immediately reports lost."""

            def __init__(self, inner):
                self._inner = inner
                self.updates = 0

            def __getattr__(self, name):
                return getattr(self._inner, name)

            def update(self, writes, deletes):
                self.updates += 1
                return self._inner.update(writes, deletes)

            def acquire_merge_lease(self, ttl_seconds: float = 300.0):
                from bloomsearch_tpu.coordination import Lease

                return Lease(
                    lambda: None, "dead", time.time() - 1,
                    renew_fn=lambda ttl: None,  # always lost
                )

        meta = LosingLeaseMeta(store)
        engine = bs.BloomSearchEngine(
            bs.BloomSearchEngineConfig(max_buffered_rows=10), meta, store
        )
        engine.start()
        try:
            for i in range(4):
                engine.ingest_rows([{"n": i, "msg": f"tok{i}"} for _ in range(20)])
                engine.flush(timeout=TIMEOUT)
            files_before = len(store.get_maybe_files_for_query(None))
            assert files_before >= 2
            updates_from_flushes = meta.updates
            engine.merge()  # lease lost -> no publish
            assert meta.updates == updates_from_flushes
            assert len(store.get_maybe_files_for_query(None)) == files_before
            # All rows still queryable (nothing tombstoned).
            assert len(engine.query_sync(bs.new_query().token("tok1").build())) == 20
        finally:
            engine.stop(timeout=TIMEOUT)
