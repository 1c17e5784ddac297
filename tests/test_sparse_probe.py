"""Sparse cold-probe path: targeted bank-row reads + background warms."""

import time

import numpy as np
import pytest

import bloomsearch_tpu as bs
import bloomsearch_tpu.engine as eng_mod
from bloomsearch_tpu.bloom import BloomParams
from bloomsearch_tpu.bloom.probe import (
    compile_bloom_terms,
    probe_bank_host,
    probe_rows_sparse,
    stack_filter_bank,
)
from bloomsearch_tpu.file_format import BloomFilters

TIMEOUT = 15.0


class TestSparseProbeParity:
    def test_matches_full_bank_probe(self):
        params = BloomParams(2000, 0.001)
        triples = []
        for i in range(20):
            t = BloomFilters.from_params(params)
            t.field.add_keys([f"f{i}"])
            t.token.add_keys([f"tok{i}", "shared"])
            t.field_token.add_keys([f"f{i}::tok{i}"])
            triples.append(t)
        bank = stack_filter_bank(triples)  # [3, W, B]
        flat = bank.reshape(3 * params.num_words, 20)

        q = bs.new_query().token("shared").field_token("f3", "tok3").field("f7").build()
        terms = compile_bloom_terms(q.bloom)
        expected = probe_bank_host(bank, terms, params.m_bits, params.k)

        reads = []

        def read_rows(rows):
            reads.append(len(rows))
            return flat[rows]

        got = probe_rows_sparse(read_rows, terms, params.m_bits, params.k)
        np.testing.assert_array_equal(got, expected)
        # Touched only the probed rows, not the whole bank.
        assert reads and reads[0] <= len(terms) * params.k


class TestBankRowCrcs:
    """Per-row CRC array written after each bank payload (format field
    RowCrcOffset) — the integrity contract behind sparse cold probes."""

    def _write_file(self, tmp_path):
        import io
        from bloomsearch_tpu.file_format import BloomFilters, DataFileWriter

        params = BloomParams(500, 0.001)
        buf = io.BytesIO()
        w = DataFileWriter(buf, params)
        filters = BloomFilters.from_params(params)
        filters.token.add_keys([f"t{i}" for i in range(50)])
        w.add_block(
            b"\x05\x00\x00\x00hello",
            filters,
            rows=1,
            partition_id="",
            min_max_indexes={},
            compression="none",
            uncompressed_size=9,
            created_at_ms=0,
            params=params,
        )
        meta = w.finish(BloomFilters.from_params(params))
        return buf, meta

    def test_sparse_read_matches_full_and_verifies(self, tmp_path):
        from bloomsearch_tpu.file_format import read_bank_group, read_bank_rows

        buf, meta = self._write_file(tmp_path)
        group = meta.bank_groups[0]
        assert group.row_crc_offset is not None
        full = read_bank_group(buf, group).reshape(-1, group.num_blocks)
        rows = np.array([0, 3, group.num_words, 3 * group.num_words - 1])
        got = read_bank_rows(buf, group, rows)
        np.testing.assert_array_equal(got, full[rows])

    def test_sparse_read_unsorted_duplicate_rows(self, tmp_path):
        """flat_rows may repeat (terms sharing hash rows) and arrive in any
        order; each output slot must carry ITS row, with each distinct row
        read from disk once and CRC reads coalesced (not one seek per row —
        that doubled cold-probe round-trips through object stores)."""
        import io
        from bloomsearch_tpu.file_format import read_bank_group, read_bank_rows

        buf, meta = self._write_file(tmp_path)
        group = meta.bank_groups[0]
        full = read_bank_group(buf, group).reshape(-1, group.num_blocks)
        rows = np.array([7, 0, 3, 7, 0, group.num_words, 3])

        class CountingIO(io.BytesIO):
            reads = 0

            def read(self, *a):
                type(self).reads += 1
                return super().read(*a)

        counting = CountingIO(buf.getvalue())
        got = read_bank_rows(counting, group, rows)
        np.testing.assert_array_equal(got, full[rows])
        # 4 distinct rows: 4 payload reads + 1 coalesced CRC read.
        assert counting.reads <= 5, counting.reads
        from bloomsearch_tpu.file_format import InvalidHashError, read_bank_rows

        buf, meta = self._write_file(tmp_path)
        group = meta.bank_groups[0]
        row_bytes = group.num_blocks * 4
        # Corrupt row 3's payload bytes.
        data = bytearray(buf.getvalue())
        data[group.offset + 3 * row_bytes] ^= 0xFF
        import io

        corrupted = io.BytesIO(bytes(data))
        with pytest.raises(InvalidHashError):
            read_bank_rows(corrupted, group, np.array([3]))
        # Corrupting the CRC array itself is also loud.
        data2 = bytearray(buf.getvalue())
        data2[group.row_crc_offset + 3 * 4] ^= 0xFF
        with pytest.raises(InvalidHashError):
            read_bank_rows(io.BytesIO(bytes(data2)), group, np.array([3]))

    def test_missing_row_crcs_refuses_sparse_read(self, tmp_path):
        from bloomsearch_tpu.file_format import (
            BankGroupMetadata,
            InvalidFormatError,
            read_bank_rows,
        )

        buf, meta = self._write_file(tmp_path)
        group = meta.bank_groups[0]
        # Old-format round trip: no RowCrcOffset key -> None.
        obj = group.to_json()
        del obj["RowCrcOffset"]
        old = BankGroupMetadata.from_json(obj)
        assert old.row_crc_offset is None
        with pytest.raises(InvalidFormatError):
            read_bank_rows(buf, old, np.array([0]))


def _engine(tmp_path, monkeypatch, **overrides):
    # Force every test-sized bank group onto the sparse path.
    monkeypatch.setattr(eng_mod, "SPARSE_BANK_BYTES", 0)
    store = bs.FileSystemDataStore(str(tmp_path / "data"))
    config = bs.BloomSearchEngineConfig(row_data_compression="none", **overrides)
    engine = bs.BloomSearchEngine(config, store, store)
    engine.start()
    return engine, store


class TestEngineSparsePath:
    @pytest.mark.parametrize("backend", ["host", "device"])
    def test_cold_sparse_query_exact_then_resident(self, tmp_path, monkeypatch, backend):
        engine, store = _engine(tmp_path, monkeypatch, probe_backend=backend)
        try:
            rows = [{"n": i, "w": f"word{i}", "tag": "all"} for i in range(200)]
            engine.ingest_rows(rows, timeout=TIMEOUT)
            engine.flush(timeout=TIMEOUT)
            # Drop anything warmed at flush so the first probe is cold.
            if backend == "device":
                be = engine._device_backend
                for mf in store.get_maybe_files_for_query(None):
                    be.invalidate(mf.pointer)
            got = engine.query_sync(bs.new_query().token("word42").build(), timeout=TIMEOUT)
            assert got == [{"n": 42, "w": "word42", "tag": "all"}]
            got = engine.query_sync(
                bs.new_query().match(
                    bs.or_(bs.token("word7"), bs.field_token("w", "word9"))
                ).build(),
                timeout=TIMEOUT,
            )
            assert sorted(r["n"] for r in got) == [7, 9]

            # The background warm lands and the bank becomes resident.
            deadline = time.monotonic() + TIMEOUT
            def resident():
                if backend == "host":
                    return len(engine._host_bank_cache) > 0
                return any(
                    sb.segments for sb in engine._device_backend._superbanks.values()
                )
            while not resident():
                assert time.monotonic() < deadline, "bank never warmed"
                time.sleep(0.05)
            got = engine.query_sync(bs.new_query().token("all").build(), timeout=TIMEOUT)
            assert len(got) == 200
        finally:
            engine.stop(timeout=TIMEOUT)

    @pytest.mark.parametrize("backend", ["host", "device"])
    def test_corrupt_bank_never_false_negative_on_cold_query(
        self, tmp_path, monkeypatch, backend
    ):
        """Bit rot in the bank section must never silently drop results on
        the very first (cold, sparse) query — it either raises loudly or
        the results are exact (reference guarantee: filters are only ever
        tested after CRC verification, file_format.go:121-142)."""
        from bloomsearch_tpu.file_format import InvalidHashError

        engine, store = _engine(tmp_path, monkeypatch, probe_backend=backend)
        try:
            rows = [{"n": i, "w": f"word{i}"} for i in range(300)]
            engine.ingest_rows(rows, timeout=TIMEOUT)
            engine.flush(timeout=TIMEOUT)
            mf = store.get_maybe_files_for_query(None)[0]
            group = mf.metadata.bank_groups[0]
            # Zero the whole bank region AND its per-row CRC array: without
            # verification every probe would read 0 bits -> every block
            # bloom-skipped -> silent false negatives.
            path = mf.pointer.decode()
            with open(path, "r+b") as fh:
                fh.seek(group.offset)
                fh.write(b"\x00" * group.size)
            store._metadata_cache.clear()
            if backend == "device":
                be = engine._device_backend
                be.invalidate(mf.pointer)

            try:
                got = engine.query_sync(
                    bs.new_query().token("word42").build(), timeout=TIMEOUT
                )
            except InvalidHashError:
                pass  # loud failure: acceptable and expected
            else:
                assert got == [{"n": 42, "w": "word42"}], (
                    f"cold sparse query silently returned {got!r} over a "
                    "corrupted bank (false negative)"
                )
        finally:
            engine.stop(timeout=TIMEOUT)

    def test_old_file_without_row_crcs_takes_full_verified_read(
        self, tmp_path, monkeypatch
    ):
        """Groups written before per-row CRCs existed must fall back to the
        full CRC-verified read (and still return exact results)."""
        engine, store = _engine(tmp_path, monkeypatch, probe_backend="host")
        try:
            engine.ingest_rows(
                [{"n": i, "w": f"word{i}"} for i in range(100)], timeout=TIMEOUT
            )
            engine.flush(timeout=TIMEOUT)
            # Simulate an old file: drop the row-CRC pointer from the cached
            # (immutable) metadata the engine plans against.
            for mf in store.get_maybe_files_for_query(None):
                for g in mf.metadata.bank_groups:
                    g.row_crc_offset = None
            got = engine.query_sync(
                bs.new_query().token("word7").build(), timeout=TIMEOUT
            )
            assert got == [{"n": 7, "w": "word7"}]
            # The full read populated the host bank cache (no sparse path).
            assert len(engine._host_bank_cache) > 0
        finally:
            engine.stop(timeout=TIMEOUT)

    def test_corrupt_bank_surfaces_in_background_warm(self, tmp_path, monkeypatch, caplog):
        import logging as _logging

        engine, store = _engine(tmp_path, monkeypatch, probe_backend="host")
        try:
            engine.ingest_rows([{"w": "hello"}], timeout=TIMEOUT)
            engine.flush(timeout=TIMEOUT)
            mf = store.get_maybe_files_for_query(None)[0]
            group = mf.metadata.bank_groups[0]
            # Flip a byte inside the bank region on disk.
            path = mf.pointer.decode()
            with open(path, "r+b") as fh:
                fh.seek(group.offset)
                b = fh.read(1)
                fh.seek(group.offset)
                fh.write(bytes([b[0] ^ 0xFF]))
            store._metadata_cache.clear()

            with caplog.at_level(_logging.ERROR, logger="bloomsearch_tpu.engine"):
                engine.query_sync(bs.new_query().token("hello").build(), timeout=TIMEOUT)
                deadline = time.monotonic() + TIMEOUT
                while not any("bank warm failed" in r.message for r in caplog.records):
                    assert time.monotonic() < deadline, "corruption never surfaced"
                    time.sleep(0.05)
        finally:
            engine.stop(timeout=TIMEOUT)


class TestPooledSparseFanout:
    """Round-5: sparse cold probes fan per-file seek passes over a small
    I/O pool (engine._sparse_probe_pool). Multi-file datasets must return
    exactly the serial path's results — including interleaved flush/merge
    file sets — and background warms must still dedup."""

    @pytest.mark.parametrize("backend", ["host", "device"])
    def test_many_files_cold_exact(self, tmp_path, monkeypatch, backend):
        engine, store = _engine(tmp_path, monkeypatch, probe_backend=backend)
        try:
            # 8 separate files -> the pooled (len(items) > 1) branch.
            for f in range(8):
                rows = [
                    {"n": f * 100 + i, "w": f"word{f}_{i}", "tag": "all"}
                    for i in range(50)
                ]
                engine.ingest_rows(rows, timeout=TIMEOUT)
                engine.flush(timeout=TIMEOUT)
            assert len(store.get_maybe_files_for_query(None)) == 8
            if backend == "device":
                be = engine._device_backend
                for mf in store.get_maybe_files_for_query(None):
                    be.invalidate(mf.pointer)
            # Needle in one file.
            got = engine.query_sync(
                bs.new_query().token("word5_7").build(), timeout=TIMEOUT
            )
            assert got == [{"n": 507, "w": "word5_7", "tag": "all"}]
            # Token present in EVERY file (each file's sparse result must
            # land, whatever thread probed it).
            got = engine.query_sync(
                bs.new_query().token("all").build(), timeout=TIMEOUT
            )
            assert sorted(r["n"] for r in got) == sorted(
                f * 100 + i for f in range(8) for i in range(50)
            )
        finally:
            engine.stop(timeout=TIMEOUT)

    def test_pool_shutdown_with_engine_stop(self, tmp_path, monkeypatch):
        engine, store = _engine(tmp_path, monkeypatch, probe_backend="host")
        pool = engine._sparse_probe_pool
        engine.stop(timeout=TIMEOUT)
        # Shut down: new submissions must be rejected.
        import pytest as _pytest

        with _pytest.raises(RuntimeError):
            pool.submit(lambda: None)


class TestReadBankRowsBuf:
    """read_bank_rows_buf must match read_bank_rows bit-exactly (same
    per-row CRC verification) — it's the mmap fast path under warm sparse
    probes."""

    def test_buf_matches_fh_and_verifies(self, tmp_path):
        import numpy as np

        from bloomsearch_tpu.file_format import (
            read_bank_rows,
            read_bank_rows_buf,
        )

        store = bs.FileSystemDataStore(str(tmp_path / "data"))
        cfg = bs.BloomSearchEngineConfig(row_data_compression="none")
        engine = bs.BloomSearchEngine(cfg, store, store)
        engine.start()
        try:
            engine.ingest_rows(
                [{"n": i, "w": f"word{i}"} for i in range(300)], timeout=TIMEOUT
            )
            engine.flush(timeout=TIMEOUT)
        finally:
            engine.stop(timeout=TIMEOUT)
        mf = store.get_maybe_files_for_query(None)[0]
        group = mf.metadata.bank_groups[0]
        rows = np.asarray([0, 5, 5, group.num_words * 3 - 1, 17])
        path = mf.pointer.decode("utf-8")
        with open(path, "rb") as fh:
            want = read_bank_rows(fh, group, rows)
        buf = open(path, "rb").read()
        got = read_bank_rows_buf(buf, group, rows)
        assert (want == got).all()

        # Corrupt one probed payload row -> the buf path must raise too.
        import bloomsearch_tpu.file_format as ff

        bad = bytearray(buf)
        off = group.offset + 5 * group.num_blocks * 4
        bad[off] ^= 0xFF
        with pytest.raises(ff.InvalidHashError):
            read_bank_rows_buf(bytes(bad), group, rows)

    def test_short_buffer_raises_format_error(self, tmp_path):
        import numpy as np

        from bloomsearch_tpu.file_format import read_bank_rows_buf

        store = bs.FileSystemDataStore(str(tmp_path / "data"))
        cfg = bs.BloomSearchEngineConfig(row_data_compression="none")
        engine = bs.BloomSearchEngine(cfg, store, store)
        engine.start()
        try:
            engine.ingest_rows([{"n": 1, "w": "x"}], timeout=TIMEOUT)
            engine.flush(timeout=TIMEOUT)
        finally:
            engine.stop(timeout=TIMEOUT)
        mf = store.get_maybe_files_for_query(None)[0]
        group = mf.metadata.bank_groups[0]
        buf = open(mf.pointer.decode("utf-8"), "rb").read()
        import bloomsearch_tpu.file_format as ff

        with pytest.raises(ff.InvalidFormatError):
            read_bank_rows_buf(
                buf[: group.offset + 10], group, np.asarray([2])
            )
