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
