"""Device row cache: on-device scan parity + engine serving-mode E2E."""

import json
import random

import numpy as np
import pytest

import bloomsearch_tpu as bs
from bloomsearch_tpu import native
from bloomsearch_tpu.file_format import encode_row
from bloomsearch_tpu.rowcache import DeviceRowCache, ROW_WIDTH_CAP
from bloomsearch_tpu.scan import split_rows_arrays


def make_stream(rows):
    return b"".join(
        encode_row(json.dumps(r, separators=(",", ":")).encode()) for r in rows
    )


class TestDeviceRowCache:
    def test_scan_parity_with_native(self):
        rng = random.Random(3)
        words = ["alpha", "BRAVO", "charlie9", "x y z", "needle-one"]
        rows = [
            {"m": " ".join(rng.choice(words) for _ in range(rng.randrange(1, 4)))}
            for _ in range(200)
        ]
        data = make_stream(rows)
        buf, offsets, lengths = split_rows_arrays(data)
        needles = [b"bravo", b"needle-one", b"absent-needle"]

        cache = DeviceRowCache(64 << 20)
        pinned = cache.pin((b"f", 0), data, offsets, lengths)
        device_scan = cache.scan(pinned, needles)

        if native.available():
            host_scan = native.scan_candidates(buf, needles, offsets, lengths)
            np.testing.assert_array_equal(device_scan, host_scan)
        # Direct truth check too.
        for qi, needle in enumerate(needles):
            for i, r in enumerate(rows):
                truly = needle.decode() in json.dumps(r, separators=(",", ":")).lower()
                assert device_scan[qi, i] == truly

    def test_match_at_row_tail(self):
        # Regression: the fixed-size scan window must cover start positions
        # in the longest row's final bytes (width gets MAX_NEEDLE headroom).
        rows = [{"a": "x" * 90 + " endneedle"}, {"b": "short"}]
        data = make_stream(rows)
        _, offsets, lengths = split_rows_arrays(data)
        cache = DeviceRowCache(64 << 20)
        pinned = cache.pin((b"f", 0), data, offsets, lengths)
        scan = cache.scan(pinned, [b"endneedle"])
        assert scan[0, 0] and not scan[0, 1]

    def test_oversized_needle_conservative(self):
        rows = [{"a": "hello"}]
        data = make_stream(rows)
        _, offsets, lengths = split_rows_arrays(data)
        cache = DeviceRowCache(64 << 20)
        pinned = cache.pin((b"f", 0), data, offsets, lengths)
        scan = cache.scan(pinned, [b"x" * 64])  # > MAX_NEEDLE
        assert scan[0, 0]  # conservative: candidate

    def test_overlong_rows_always_candidates(self):
        rows = [{"big": "x" * (ROW_WIDTH_CAP + 100)}, {"small": "y"}]
        data = make_stream(rows)
        _, offsets, lengths = split_rows_arrays(data)
        cache = DeviceRowCache(64 << 20)
        pinned = cache.pin((b"f", 0), data, offsets, lengths)
        scan = cache.scan(pinned, [b"zzz-not-present"])
        assert scan[0, 0]  # overlong: conservative
        assert not scan[0, 1]

    def test_lru_eviction(self):
        rows = [{"k": "v" * 100} for _ in range(50)]
        data = make_stream(rows)
        _, offsets, lengths = split_rows_arrays(data)
        one = DeviceRowCache(0)  # capacity smaller than any block: keeps last
        one.pin((b"a", 0), data, offsets, lengths)
        one.pin((b"b", 0), data, offsets, lengths)
        assert one.get((b"a", 0)) is None
        assert one.get((b"b", 0)) is not None

    def test_invalidate_file(self):
        rows = [{"k": "v"}]
        data = make_stream(rows)
        _, offsets, lengths = split_rows_arrays(data)
        cache = DeviceRowCache(64 << 20)
        cache.pin((b"f", 0), data, offsets, lengths)
        cache.pin((b"f", 10), data, offsets, lengths)
        cache.pin((b"g", 0), data, offsets, lengths)
        cache.invalidate_file(b"f")
        assert cache.get((b"f", 0)) is None
        assert cache.get((b"f", 10)) is None
        assert cache.get((b"g", 0)) is not None


class TestEngineServingMode:
    def test_row_cache_query_parity(self, tmp_path):
        store = bs.FileSystemDataStore(str(tmp_path / "data"))
        config = bs.BloomSearchEngineConfig(
            row_data_compression="none",
            probe_backend="device",  # row cache requires the device backend
            row_cache_bytes=256 << 20,
        )
        engine = bs.BloomSearchEngine(config, store, store)
        assert engine._row_cache is not None
        engine.start()
        try:
            rows = [{"n": i, "w": f"word{i}"} for i in range(300)]
            rows.append({"n": -1, "w": "special needle"})
            engine.ingest_rows(rows, timeout=10)
            engine.flush(timeout=10)

            # First query pins the block; second scans on-device.
            for _ in range(2):
                res = engine.query_sync(bs.new_query().token("needle").build(), timeout=60)
                assert len(res) == 1 and res[0]["n"] == -1
            assert engine._row_cache.total_bytes() > 0

            res = engine.query_sync(bs.new_query().token("word42").build(), timeout=60)
            assert len(res) == 1 and res[0]["n"] == 42
        finally:
            engine.stop(timeout=10)
