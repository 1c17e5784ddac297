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
