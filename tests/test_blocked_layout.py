"""Blocked-256 bloom layout: semantics, FPR, parity, engine E2E, merge gating."""

import numpy as np
import pytest

import bloomsearch_tpu as bs
from bloomsearch_tpu import native
from bloomsearch_tpu.bloom import BloomFilter, BloomParams
from bloomsearch_tpu.bloom.hashing import hash_keys_py, positions_for_hashes_blocked
from bloomsearch_tpu.bloom.params import LAYOUT_BLOCKED256


class TestBlockedPositions:
    def test_all_positions_within_one_block(self):
        hashes = hash_keys_py([f"key{i}".encode() for i in range(100)])
        pos = positions_for_hashes_blocked(hashes, k=10, m_bits=256 * 64)
        blocks = pos // 256
        assert (blocks == blocks[:, :1]).all(), "probes must share one 256-bit block"
        assert (pos < 256 * 64).all()

    def test_positions_distinct_within_block(self):
        # Odd step means the k positions cycle without repeating for k <= 256.
        hashes = hash_keys_py([b"some-key"])
        pos = positions_for_hashes_blocked(hashes, k=10, m_bits=256 * 4)
        assert len(set(pos[0].tolist())) == 10


class TestBlockedFilter:
    def test_zero_false_negatives(self):
        f = BloomFilter.new_with_estimates(2000, 0.01, layout=LAYOUT_BLOCKED256)
        keys = [f"key-{i}" for i in range(2000)]
        f.add_keys(keys)
        assert f.test_keys(keys).all()
        assert f.m_bits % 256 == 0

    def test_empirical_fpr_matches_measured_curve(self):
        # Bounds from the measured sweep in docs/BLOCKED256.md: penalty is
        # ~1.6x at p=0.01 and ~5x at p=0.001 (scale-invariant in n). The
        # asserted ceilings leave ~40% headroom over the measurements.
        for n, p, ceiling in ((5000, 0.01, 2.5), (5000, 0.001, 8.0)):
            f = BloomFilter.new_with_estimates(n, p, layout=LAYOUT_BLOCKED256)
            f.add_keys([f"present-{i}" for i in range(n)])
            absent = [f"absent-{i}" for i in range(200_000)]
            fpr = f.test_keys(absent).mean()
            assert fpr <= ceiling * p, f"blocked FPR {fpr} vs configured {p} (n={n})"

    def test_classic_fpr_matches_configured_rate(self):
        # The reference-parity layout must deliver the configured rate
        # (zero-false-negative is tested elsewhere; this pins FPR honesty).
        p = 0.001
        f = BloomFilter.new_with_estimates(5000, p)
        f.add_keys([f"present-{i}" for i in range(5000)])
        absent = [f"absent-{i}" for i in range(200_000)]
        fpr = f.test_keys(absent).mean()
        assert fpr <= 2 * p, f"classic FPR {fpr} vs configured {p}"

    @pytest.mark.skipif(not native.available(), reason="native lib unavailable")
    def test_native_matches_numpy(self):
        keys = [f"key-{i}" for i in range(500)]
        hashes = hash_keys_py([k.encode() for k in keys])

        f_native = BloomFilter.new_with_estimates(500, 0.01, layout=LAYOUT_BLOCKED256)
        f_native.add_hashes(hashes)  # native path

        f_py = BloomFilter.new_with_estimates(500, 0.01, layout=LAYOUT_BLOCKED256)
        positions = positions_for_hashes_blocked(hashes, f_py.k, f_py.m_bits).ravel()
        word = (positions >> np.uint64(5)).astype(np.int64)
        bit = (positions & np.uint64(31)).astype(np.uint32)
        np.bitwise_or.at(f_py.words, word, np.uint32(1) << bit)
        assert f_native == f_py

        probes = hash_keys_py([k.encode() for k in keys + ["absent-1", "absent-2"]])
        np.testing.assert_array_equal(
            f_native.test_hashes(probes),  # native probe
            np.array([True] * 500 + list(f_py.test_hashes(probes)[-2:])),
        )

    def test_merge_layout_gated(self):
        a = BloomFilter.new_with_estimates(1000, 0.01, layout=LAYOUT_BLOCKED256)
        b = BloomFilter.new_with_estimates(1000, 0.01)  # classic
        with pytest.raises(ValueError):
            a.merge(b)


class TestBlockedEngine:
    def make_engine(self, tmp_path, **overrides):
        store = bs.FileSystemDataStore(str(tmp_path / "data"))
        config = bs.BloomSearchEngineConfig(
            row_data_compression="none",
            bloom_layout=LAYOUT_BLOCKED256,
            probe_backend="host",
            **overrides,
        )
        engine = bs.BloomSearchEngine(config, store, store)
        engine.start()
        return engine, store

    def test_end_to_end_query(self, tmp_path):
        engine, store = self.make_engine(tmp_path)
        try:
            rows = [{"n": i, "w": f"word{i}"} for i in range(500)]
            rows.append({"n": -1, "w": "needle"})
            engine.ingest_rows(rows, timeout=10)
            engine.flush(timeout=10)
            metadata = store.get_maybe_files_for_query(None)[0].metadata
            assert metadata.bloom_filters.field.layout == LAYOUT_BLOCKED256
            assert metadata.data_blocks[0].bloom_layout == LAYOUT_BLOCKED256
            assert metadata.bank_groups[0].params.layout == LAYOUT_BLOCKED256

            res = engine.query_sync(bs.new_query().token("needle").build(), timeout=10)
            assert len(res) == 1 and res[0]["n"] == -1
            res = engine.query_sync(bs.new_query().field_token("w", "word42").build(), timeout=10)
            assert len(res) == 1 and res[0]["n"] == 42
        finally:
            engine.stop(timeout=10)

    def test_device_backend_blocked(self, tmp_path):
        store = bs.FileSystemDataStore(str(tmp_path / "data"))
        config = bs.BloomSearchEngineConfig(
            row_data_compression="none",
            bloom_layout=LAYOUT_BLOCKED256,
            probe_backend="device",
        )
        engine = bs.BloomSearchEngine(config, store, store)
        engine.start()
        try:
            engine.ingest_rows(
                [{"a": "alpha beta"}, {"b": "gamma delta"}], timeout=10
            )
            engine.flush(timeout=10)
            res = engine.query_sync(bs.new_query().token("gamma").build(), timeout=30)
            assert len(res) == 1 and "b" in res[0]
        finally:
            engine.stop(timeout=10)

    def test_mixed_layout_files_both_queryable_but_unmergeable(self, tmp_path):
        store = bs.FileSystemDataStore(str(tmp_path / "data"))
        e_classic = bs.BloomSearchEngine(
            bs.BloomSearchEngineConfig(row_data_compression="none", probe_backend="host"),
            store, store,
        )
        e_classic.start()
        e_classic.ingest_rows([{"x": "classicrow"}], timeout=10)
        e_classic.flush(timeout=10)
        e_classic.stop(timeout=10)

        engine, _ = None, None
        e_blocked = bs.BloomSearchEngine(
            bs.BloomSearchEngineConfig(
                row_data_compression="none",
                bloom_layout=LAYOUT_BLOCKED256,
                probe_backend="host",
            ),
            store, store,
        )
        e_blocked.start()
        try:
            e_blocked.ingest_rows([{"x": "blockedrow"}], timeout=10)
            e_blocked.flush(timeout=10)
            # Queries span both layouts transparently.
            assert len(e_blocked.query_sync(bs.new_query().token("classicrow").build(), timeout=10)) == 1
            assert len(e_blocked.query_sync(bs.new_query().token("blockedrow").build(), timeout=10)) == 1
            # Merge must not combine files with different layouts.
            stats = e_blocked.merge()
            assert stats.files_processed == 0
            assert len(store.get_maybe_files_for_query(None)) == 2
        finally:
            e_blocked.stop(timeout=10)
