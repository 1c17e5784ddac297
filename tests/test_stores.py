"""DataStore / MetaStore contracts: filesystem store, memory store, nulls."""

import io
import os

from bloomsearch_tpu import new_query, partition, partition_equals
from bloomsearch_tpu.stores import (
    DeleteOperation,
    FileSystemDataStore,
    MemoryMetaStore,
    NullDataStore,
    NullMetaStore,
    WriteOperation,
)

from test_file_format import write_sample_file


def write_store_file(store):
    fh, pointer = store.create_file()
    metadata, blocks = write_sample_file(fh)
    fh.close()
    return pointer, metadata


class TestFileSystemDataStore:
    def test_create_open_round_trip(self, tmp_path):
        store = FileSystemDataStore(str(tmp_path / "data"))
        pointer, metadata = write_store_file(store)
        with store.open_file(pointer) as fh:
            from bloomsearch_tpu.file_format import read_file_metadata

            read_back = read_file_metadata(fh)
        assert len(read_back.data_blocks) == 3

    def test_get_maybe_files_no_prefilter_returns_all(self, tmp_path):
        store = FileSystemDataStore(str(tmp_path / "data"))
        write_store_file(store)
        write_store_file(store)
        files = store.get_maybe_files_for_query(None)
        assert len(files) == 2
        assert all(len(f.metadata.data_blocks) == 3 for f in files)
        assert all(f.size > 0 for f in files)

    def test_get_maybe_files_applies_prefilter(self, tmp_path):
        store = FileSystemDataStore(str(tmp_path / "data"))
        write_store_file(store)
        query = new_query().match_prefilter(partition(partition_equals("p1"))).build()
        files = store.get_maybe_files_for_query(query.prefilter)
        assert len(files) == 1
        assert len(files[0].metadata.data_blocks) == 1
        assert files[0].metadata.data_blocks[0].partition_id == "p1"

        query = new_query().match_prefilter(partition(partition_equals("nope"))).build()
        assert store.get_maybe_files_for_query(query.prefilter) == []

    def test_tombstone_removes_file(self, tmp_path):
        store = FileSystemDataStore(str(tmp_path / "data"))
        pointer, _ = write_store_file(store)
        assert os.path.exists(pointer.decode())
        store.tombstone_file(pointer)
        assert not os.path.exists(pointer.decode())
        store.tombstone_file(pointer)  # idempotent

    def test_update_deletes(self, tmp_path):
        store = FileSystemDataStore(str(tmp_path / "data"))
        pointer, _ = write_store_file(store)
        store.update([], [DeleteOperation(pointer)])
        assert not os.path.exists(pointer.decode())

    def test_non_dat_files_ignored(self, tmp_path):
        root = tmp_path / "data"
        store = FileSystemDataStore(str(root))
        (root / "junk.txt").write_text("hello")
        assert store.get_maybe_files_for_query(None) == []


class TestMemoryMetaStore:
    def test_update_and_list(self, tmp_path):
        store = MemoryMetaStore()
        buf = io.BytesIO()
        metadata, _ = write_sample_file(buf)
        store.update([WriteOperation(metadata, b"file-1")], [])
        files = store.get_maybe_files_for_query(None)
        assert len(files) == 1
        assert files[0].pointer == b"file-1"

    def test_prefilter_applied(self):
        store = MemoryMetaStore()
        buf = io.BytesIO()
        metadata, _ = write_sample_file(buf)
        store.update([WriteOperation(metadata, b"file-1")], [])
        query = new_query().match_prefilter(partition(partition_equals("p2"))).build()
        files = store.get_maybe_files_for_query(query.prefilter)
        assert len(files) == 1
        assert len(files[0].metadata.data_blocks) == 1
        query = new_query().match_prefilter(partition(partition_equals("zz"))).build()
        assert store.get_maybe_files_for_query(query.prefilter) == []

    def test_atomic_delete(self):
        store = MemoryMetaStore()
        buf = io.BytesIO()
        metadata, _ = write_sample_file(buf)
        store.update([WriteOperation(metadata, b"a")], [])
        store.update([WriteOperation(metadata, b"b")], [DeleteOperation(b"a")])
        files = store.get_maybe_files_for_query(None)
        assert [f.pointer for f in files] == [b"b"]


class TestNullStores:
    def test_null_stores_noop(self):
        meta = NullMetaStore()
        data = NullDataStore()
        assert meta.get_maybe_files_for_query(None) == []
        meta.update([], [])
        data.tombstone_file(b"x")


class TestTolerantMetadataReads:
    """One unreadable file must not fail the whole scan; filter-less
    metadata passes through unprobed (reference's nil-filter stance,
    bloom_tree_engine.go:885-905)."""

    def _engine(self, tmp_path, store=None, meta=None):
        import bloomsearch_tpu as bs

        data = store or bs.FileSystemDataStore(str(tmp_path / "data"))
        engine = bs.BloomSearchEngine(
            bs.BloomSearchEngineConfig(row_data_compression="none"),
            meta or data,
            data,
        )
        engine.start()
        return engine, data

    def test_corrupt_file_skipped_not_fatal(self, tmp_path):
        import bloomsearch_tpu as bs

        engine, store = self._engine(tmp_path)
        try:
            engine.ingest_rows([{"msg": "hello world"}], timeout=10)
            engine.flush(timeout=10)
            # Drop garbage .dat files into the scanned directory.
            with open(os.path.join(store.root_dir, "bloom-junk.dat"), "wb") as fh:
                fh.write(b"not a bloomsearch file")
            with open(os.path.join(store.root_dir, "bloom-empty.dat"), "wb"):
                pass
            files = store.get_maybe_files_for_query(None)
            assert len(files) == 1
            got = engine.query_sync(bs.new_query().token("hello").build(), timeout=10)
            assert got == [{"msg": "hello world"}]
        finally:
            engine.stop(timeout=10)

    def test_nil_filters_and_bad_bank_coords_pass_through(self, tmp_path):
        import dataclasses

        import bloomsearch_tpu as bs
        from bloomsearch_tpu.file_format import FileMetadata
        from bloomsearch_tpu.stores import MemoryMetaStore, WriteOperation

        # Write a real file, then republish its metadata with the filters
        # stripped and block bank coords broken (a "foreign" footer).
        fs_engine, data_store = self._engine(tmp_path)
        try:
            fs_engine.ingest_rows([{"msg": "needle in file"}], timeout=10)
            fs_engine.flush(timeout=10)
        finally:
            fs_engine.stop(timeout=10)
        mf = data_store.get_maybe_files_for_query(None)[0]

        stripped = FileMetadata(
            bloom_filters=None,
            bloom_expected_items=mf.metadata.bloom_expected_items,
            bloom_false_positive_rate=mf.metadata.bloom_false_positive_rate,
            data_blocks=[
                dataclasses.replace(b, bank_group=99) for b in mf.metadata.data_blocks
            ],
            bank_groups=mf.metadata.bank_groups,
        )
        meta = MemoryMetaStore()
        meta.update([WriteOperation(stripped, mf.pointer, file_size=mf.size)], [])

        engine, _ = self._engine(tmp_path, store=data_store, meta=meta)
        try:
            got = engine.query_sync(bs.new_query().token("needle").build(), timeout=10)
            assert got == [{"msg": "needle in file"}]
            # Still exact: non-matching needles return nothing.
            got = engine.query_sync(bs.new_query().token("absent").build(), timeout=10)
            assert got == []
        finally:
            engine.stop(timeout=10)

    def test_from_json_tolerates_missing_filters(self):
        from bloomsearch_tpu.file_format import FileMetadata

        md = FileMetadata.from_json({"DataBlocks": [], "BankGroups": []})
        assert md.bloom_filters is None
        # Round-trips without crashing.
        assert md.to_json()["BloomFilters"] is None


import pytest

import bloomsearch_tpu as bs


class TestTombstoneGraceAndAbort:
    def test_grace_window_measured_from_tombstone_time(self, tmp_path):
        """os.replace preserves st_mtime, so an old file used to be swept
        IMMEDIATELY despite the grace window (round-4 review fix)."""
        import os
        import time

        store = bs.FileSystemDataStore(str(tmp_path), tombstone_grace_seconds=3600)
        fh, pointer = store.create_file()
        fh.write(b"payload")
        fh.close()
        path = pointer.decode()
        # Age the file far past the grace window.
        old = time.time() - 7200
        os.utime(path, (old, old))
        store.update([], [bs.DeleteOperation(pointer)])
        assert os.path.exists(path + ".tombstoned")
        # A fresh store's startup sweep must RESPECT the grace window.
        bs.FileSystemDataStore(str(tmp_path), tombstone_grace_seconds=3600)
        assert os.path.exists(path + ".tombstoned")

    def test_with_block_exception_aborts_instead_of_publishing(self, tmp_path):
        import os

        store = bs.FileSystemDataStore(str(tmp_path))
        with pytest.raises(RuntimeError):
            with store.create_file()[0] as fh:
                fh.write(b"partial")
                raise RuntimeError("disk full mid-write")
        # No truncated .dat became visible; no temp left behind.
        leftovers = [n for n in os.listdir(tmp_path) if not n.startswith(".")]
        assert leftovers == [], leftovers

    def test_object_store_with_block_exception_aborts(self):
        from bloomsearch_tpu.objectstore import (
            InMemoryObjectStore,
            ObjectStoreDataStore,
        )

        client = InMemoryObjectStore()
        ds = ObjectStoreDataStore(client)
        with pytest.raises(RuntimeError):
            with ds.create_file()[0] as fh:
                fh.write(b"partial")
                raise RuntimeError("boom")
        assert client.list("") == []
