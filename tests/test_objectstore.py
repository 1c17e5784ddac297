"""Object-store backend: client fake semantics, stores, CAS manifest, lease."""

import json
import queue
import threading

import pytest

import bloomsearch_tpu as bs
from bloomsearch_tpu.objectstore import (
    InMemoryObjectStore,
    ObjectStoreDataStore,
    ObjectStoreMetaStore,
    PreconditionFailed,
)

TIMEOUT = 15.0


def make_engine(client=None, **overrides):
    client = client or InMemoryObjectStore()
    data = ObjectStoreDataStore(client)
    meta = ObjectStoreMetaStore(client)
    config = bs.BloomSearchEngineConfig(row_data_compression="none", **overrides)
    engine = bs.BloomSearchEngine(config, meta, data)
    engine.start()
    return engine, client, data, meta


class TestInMemoryObjectStore:
    def test_conditional_put_semantics(self):
        c = InMemoryObjectStore()
        etag1 = c.put("k", b"v1")
        with pytest.raises(PreconditionFailed):
            c.put("k", b"x", if_none_match=True)
        with pytest.raises(PreconditionFailed):
            c.put("k", b"x", if_match="wrong")
        etag2 = c.put("k", b"v2", if_match=etag1)
        assert etag2 != etag1
        assert c.get("k") == (b"v2", etag2)
        with pytest.raises(PreconditionFailed):
            c.delete("k", if_match=etag1)
        c.delete("k", if_match=etag2)
        with pytest.raises(KeyError):
            c.get("k")
        c.delete("k")  # idempotent

    def test_ranged_reads(self):
        c = InMemoryObjectStore()
        c.put("k", bytes(range(100)))
        assert c.get_range("k", 10, 5) == bytes(range(10, 15))
        assert c.get_range("k", 95, 50) == bytes(range(95, 100))  # clamped


class TestDataStore:
    def test_write_read_tombstone_roundtrip(self):
        c = InMemoryObjectStore()
        ds = ObjectStoreDataStore(c)
        fh, pointer = ds.create_file()
        fh.write(b"hello ")
        fh.write(b"world")
        # Not visible until close (single-pass upload).
        assert c.list("data/") == []
        fh.close()
        with ds.open_file(pointer) as rd:
            rd.seek(6)
            assert rd.read(5) == b"world"
            rd.seek(0)
            assert rd.read() == b"hello world"
        ds.tombstone_file(pointer)
        with pytest.raises(FileNotFoundError):
            ds.open_file(pointer)

    def test_abort_never_publishes(self):
        c = InMemoryObjectStore()
        ds = ObjectStoreDataStore(c)
        fh, pointer = ds.create_file()
        fh.write(b"partial")
        fh.abort()
        assert c.list("data/") == []


class TestMetaStoreCAS:
    def test_update_is_one_atomic_step(self):
        """Writes + deletes land in a single manifest version: a reader can
        never see the new file alongside the replaced ones."""
        from test_file_format import write_sample_file
        import io

        c = InMemoryObjectStore()
        meta = ObjectStoreMetaStore(c)
        md, _ = write_sample_file(io.BytesIO())
        from bloomsearch_tpu.stores import DeleteOperation, WriteOperation

        meta.update([WriteOperation(md, b"old1", 10), WriteOperation(md, b"old2", 10)], [])
        meta.update(
            [WriteOperation(md, b"merged", 20)],
            [DeleteOperation(b"old1"), DeleteOperation(b"old2")],
        )
        pointers = {mf.pointer for mf in meta.get_maybe_files_for_query(None)}
        assert pointers == {b"merged"}
        # Every historical manifest version was either {old1,old2} or
        # {merged} — never a mix (single CAS put).
        data, _ = c.get("meta/manifest.json")
        assert set(json.loads(data)["files"]) == {"merged"}

    def test_concurrent_updates_all_land(self):
        from test_file_format import write_sample_file
        from bloomsearch_tpu.stores import WriteOperation
        import io

        c = InMemoryObjectStore()
        md, _ = write_sample_file(io.BytesIO())
        metas = [ObjectStoreMetaStore(c) for _ in range(4)]
        threads = [
            threading.Thread(
                target=lambda m=m, i=i: m.update(
                    [WriteOperation(md, f"f{i}-{j}".encode(), 1) for j in range(5)], []
                )
            )
            for i, m in enumerate(metas)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        files = ObjectStoreMetaStore(c).get_maybe_files_for_query(None)
        assert len(files) == 20  # no lost updates under CAS contention

    def test_merge_lease_acquire_steal_release(self):
        c = InMemoryObjectStore()
        meta = ObjectStoreMetaStore(c)
        lease = meta.acquire_merge_lease(ttl_seconds=300)
        assert lease is not None and lease.valid()
        assert meta.acquire_merge_lease(ttl_seconds=300) is None  # held
        lease.release()
        lease2 = meta.acquire_merge_lease(ttl_seconds=-1)  # born expired
        assert lease2 is not None
        stolen = meta.acquire_merge_lease(ttl_seconds=300)  # steals expired
        assert stolen is not None
        lease2.release()  # releasing a stolen lease is a no-op (etag CAS)
        assert meta.acquire_merge_lease() is None  # stolen one still held
        stolen.release()


class TestEngineOverObjectStore:
    def test_e2e_ingest_flush_query_merge(self):
        engine, client, data, meta = make_engine()
        try:
            for i in range(4):
                engine.ingest_rows([{"n": i, "tag": "common"}], timeout=TIMEOUT)
                engine.flush(timeout=TIMEOUT)
            assert len(client.list("data/")) == 4
            got = engine.query_sync(bs.new_query().token("common").build(), timeout=TIMEOUT)
            assert sorted(r["n"] for r in got) == [0, 1, 2, 3]

            stats = engine.merge()  # lease-coordinated automatically
            assert stats.files_processed == 4
            got = engine.query_sync(bs.new_query().token("common").build(), timeout=TIMEOUT)
            assert sorted(r["n"] for r in got) == [0, 1, 2, 3]
            assert len(meta.get_maybe_files_for_query(None)) == 1
        finally:
            engine.stop(timeout=TIMEOUT)

    def test_resume_against_same_bucket(self):
        client = InMemoryObjectStore()
        engine, _, _, _ = make_engine(client)
        engine.ingest_rows([{"msg": "persisted"}], timeout=TIMEOUT)
        engine.stop(timeout=TIMEOUT)  # stop flushes buffered rows

        engine2, _, _, _ = make_engine(client)
        try:
            got = engine2.query_sync(bs.new_query().token("persisted").build(), timeout=TIMEOUT)
            assert got == [{"msg": "persisted"}]
        finally:
            engine2.stop(timeout=TIMEOUT)

    def test_merge_skipped_while_lease_held(self):
        engine, client, data, meta = make_engine()
        try:
            for i in range(2):
                engine.ingest_rows([{"n": i, "tag": "x"}], timeout=TIMEOUT)
                engine.flush(timeout=TIMEOUT)
            foreign = ObjectStoreMetaStore(client).acquire_merge_lease()
            assert foreign is not None
            stats = engine.merge()
            assert stats.files_processed == 0  # lease held elsewhere: no-op
            foreign.release()
            stats = engine.merge()
            assert stats.files_processed == 2
        finally:
            engine.stop(timeout=TIMEOUT)


class TestLocalDirObjectStore:
    """File-backed client: same contract as the in-memory fake, across
    processes on a shared filesystem."""

    def _client(self, tmp_path):
        from bloomsearch_tpu.objectstore import LocalDirObjectStore

        return LocalDirObjectStore(str(tmp_path / "bucket"))

    def test_conditional_put_semantics(self, tmp_path):
        c = self._client(tmp_path)
        etag1 = c.put("k", b"v1")
        with pytest.raises(PreconditionFailed):
            c.put("k", b"x", if_none_match=True)
        with pytest.raises(PreconditionFailed):
            c.put("k", b"x", if_match="wrong")
        etag2 = c.put("k", b"v2", if_match=etag1)
        assert etag2 != etag1 and c.get("k") == (b"v2", etag2)
        with pytest.raises(PreconditionFailed):
            c.delete("k", if_match=etag1)
        c.delete("k", if_match=etag2)
        with pytest.raises(KeyError):
            c.get("k")
        c.delete("k")  # idempotent

    def test_nested_keys_ranged_reads_and_list(self, tmp_path):
        c = self._client(tmp_path)
        c.put("data/a/b.dat", bytes(range(100)))
        c.put("meta/manifest.json", b"{}")
        assert c.get_range("data/a/b.dat", 10, 5) == bytes(range(10, 15))
        assert c.head("data/a/b.dat")[0] == 100
        assert c.list("data/") == ["data/a/b.dat"]
        assert c.list("") == ["data/a/b.dat", "meta/manifest.json"]

    def test_cas_lock_mutual_exclusion_and_crash_release(self, tmp_path):
        # flock-based lock: a held lock is NEVER stolen (a second acquirer
        # times out — stealing from a slow LIVE holder admits two processes
        # to the CAS critical section), but a crashed holder's lock releases
        # automatically when the kernel closes its fd.
        import subprocess
        import sys

        c = self._client(tmp_path)
        held = c._cas_lock()
        held.__enter__()
        try:
            contender = c._cas_lock()
            contender.timeout = 0.2
            with pytest.raises(TimeoutError):
                contender.__enter__()
        finally:
            held.__exit__(None, None, None)

        # Released: reacquire round-trips.
        with c._cas_lock():
            pass

        # Crash-release: a child process acquires the lock and exits WITHOUT
        # releasing; the parent must acquire immediately afterwards.
        code = (
            "import sys; sys.path.insert(0, %r)\n"
            "from bloomsearch_tpu.objectstore import LocalDirObjectStore\n"
            "c = LocalDirObjectStore(%r)\n"
            "lk = c._cas_lock(); lk.__enter__()\n"
            "import os; os._exit(0)\n"
        ) % ("/root/repo", str(tmp_path / "bucket"))
        subprocess.run([sys.executable, "-c", code], check=True, timeout=TIMEOUT)
        fast = c._cas_lock()
        fast.timeout = 2.0
        fast.__enter__()
        fast.__exit__(None, None, None)

    def test_two_store_instances_cas_contention(self, tmp_path):
        # Two INSTANCES over the same directory (the cross-process shape).
        import io as iomod
        import threading

        from test_file_format import write_sample_file
        from bloomsearch_tpu.stores import WriteOperation

        md, _ = write_sample_file(iomod.BytesIO())
        c1, c2 = self._client(tmp_path), self._client(tmp_path)
        m1, m2 = ObjectStoreMetaStore(c1), ObjectStoreMetaStore(c2)
        threads = [
            threading.Thread(
                target=lambda m=m, i=i: m.update(
                    [WriteOperation(md, f"f{i}-{j}".encode(), 1) for j in range(5)], []
                )
            )
            for i, m in enumerate((m1, m2, m1, m2))
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert len(ObjectStoreMetaStore(self._client(tmp_path)).get_maybe_files_for_query(None)) == 20

    def test_engine_e2e_and_cross_instance_resume(self, tmp_path):
        import bloomsearch_tpu as bs

        c1 = self._client(tmp_path)
        e1 = bs.BloomSearchEngine(
            bs.BloomSearchEngineConfig(row_data_compression="none"),
            ObjectStoreMetaStore(c1),
            ObjectStoreDataStore(c1),
        )
        e1.start()
        e1.ingest_rows([{"msg": "durable needle"}], timeout=TIMEOUT)
        e1.stop(timeout=TIMEOUT)

        c2 = self._client(tmp_path)  # fresh instance, same directory
        e2 = bs.BloomSearchEngine(
            bs.BloomSearchEngineConfig(row_data_compression="none"),
            ObjectStoreMetaStore(c2),
            ObjectStoreDataStore(c2),
        )
        e2.start()
        try:
            got = e2.query_sync(bs.new_query().token("needle").build(), timeout=TIMEOUT)
            assert got == [{"msg": "durable needle"}]
            e2.merge()  # lease over the shared dir
        finally:
            e2.stop(timeout=TIMEOUT)

    def test_lease_across_instances(self, tmp_path):
        m1 = ObjectStoreMetaStore(self._client(tmp_path))
        m2 = ObjectStoreMetaStore(self._client(tmp_path))
        lease = m1.acquire_merge_lease()
        assert lease is not None
        assert m2.acquire_merge_lease() is None  # held by the other instance
        lease.release()
        assert m2.acquire_merge_lease() is not None

    def test_cross_process_cas(self, tmp_path):
        """True multi-process CAS through the shared-directory lock."""
        import subprocess
        import sys

        bucket = str(tmp_path / "bucket")
        script = """
import sys
sys.path.insert(0, {repo!r})
import io
from bloomsearch_tpu.objectstore import LocalDirObjectStore, ObjectStoreMetaStore
from bloomsearch_tpu.stores import WriteOperation
from bloomsearch_tpu.file_format import FileMetadata, BloomFilters
from bloomsearch_tpu.bloom.params import BloomParams

md = FileMetadata(
    bloom_filters=BloomFilters.from_params(BloomParams(10, 0.01)),
    bloom_expected_items=10, bloom_false_positive_rate=0.01,
)
meta = ObjectStoreMetaStore(LocalDirObjectStore(sys.argv[1]))
who = sys.argv[2]
for j in range(10):
    meta.update([WriteOperation(md, f"{{who}}-{{j}}".encode(), 1)], [])
print("ok")
"""
        import os

        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        procs = [
            subprocess.Popen(
                [sys.executable, "-c", script.format(repo=repo), bucket, f"p{i}"],
                stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                env={**os.environ, "JAX_PLATFORMS": "cpu"},
            )
            for i in range(3)
        ]
        for p in procs:
            out, err = p.communicate(timeout=120)
            assert p.returncode == 0, err.decode()
        from bloomsearch_tpu.objectstore import LocalDirObjectStore

        meta = ObjectStoreMetaStore(LocalDirObjectStore(bucket))
        assert len(meta.get_maybe_files_for_query(None)) == 30  # no lost updates


class TestLocalDirHardening:
    """Round-4 review fixes: key confinement + etag-first deletes."""

    def test_absolute_and_escaping_keys_rejected(self, tmp_path):
        from bloomsearch_tpu.objectstore import LocalDirObjectStore

        store = LocalDirObjectStore(str(tmp_path))
        for bad in ("/etc/passwd", "/abs", "\\abs", "a/../b", "..", ""):
            with pytest.raises(ValueError):
                store.put(bad, b"x")
            with pytest.raises((ValueError, KeyError)):
                store.get(bad)

    def test_orphan_etag_cannot_wedge_if_none_match(self, tmp_path):
        """delete removes the .etag sidecar FIRST: a crash between unlinks
        must leave 'no object', never an orphan etag that makes the merge
        lease's if_none_match put fail forever. Simulate the bad legacy
        state and verify recovery semantics too."""
        import os

        from bloomsearch_tpu.objectstore import LocalDirObjectStore

        store = LocalDirObjectStore(str(tmp_path))
        store.put("k", b"v")
        store.delete("k")
        assert not os.path.exists(tmp_path / "k.etag")
        assert not os.path.exists(tmp_path / "k")
        # Crash AFTER etag unlink, before data unlink: data file remains,
        # etag gone -> object reads as absent, if_none_match create works.
        store.put("k2", b"v2")
        os.remove(tmp_path / "k2.etag")
        with pytest.raises(KeyError):
            store.get("k2")
        store.put("k2", b"v3", if_none_match=True)
        assert store.get("k2")[0] == b"v3"
