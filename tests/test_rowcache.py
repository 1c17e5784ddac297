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


class TestNativePackParity:
    def test_native_pack_matches_numpy_spec(self, monkeypatch):
        """bs_pack_rows (C++ copy+lowercase+flag single pass) must produce
        the exact matrix and always-candidate flags of the vectorized-numpy
        spec path in pin(), including the adversarial cases: uppercase \\U
        escapes (lowered before the pair test), non-ASCII bytes, \\/ and
        literal backslashes, overlong rows, empty rows, and 8-byte SWAR
        boundary alignments."""
        if not native.available() or native.pack_rows(b"", np.empty(0, np.int64), np.empty(0, np.int64), 128, 0, ROW_WIDTH_CAP) is None:
            pytest.skip("native pack_rows unavailable")
        rng = random.Random(7)
        specials = ["\\u0041", "\\U0041", "\\/", "\\\\", "café", "A" * 7, "Z" * 9, ""]
        rows = []
        for i in range(300):
            parts = [
                "".join(rng.choice("abcXYZ  09_-") for _ in range(rng.randrange(0, 40)))
            ]
            if rng.random() < 0.5:
                parts.append(rng.choice(specials))
            if rng.random() < 0.02:
                parts.append("x" * (ROW_WIDTH_CAP + 5))
            rows.append({"k": "".join(parts)})
        data = make_stream(rows)
        _, offsets, lengths = split_rows_arrays(data)

        cache_native = DeviceRowCache(256 << 20, mesh_devices=1)
        pin_native = cache_native.pin((b"n", 0), data, offsets, lengths)

        from bloomsearch_tpu import rowcache as rc_mod

        monkeypatch.setattr(rc_mod._native, "pack_rows", lambda *a, **k: None)
        cache_numpy = DeviceRowCache(256 << 20, mesh_devices=1)
        pin_numpy = cache_numpy.pin((b"n", 0), data, offsets, lengths)

        np.testing.assert_array_equal(
            pin_native.always_candidate, pin_numpy.always_candidate
        )
        (wn, bn), = cache_native._buckets.items()
        (wp, bp), = cache_numpy._buckets.items()
        assert wn == wp
        np.testing.assert_array_equal(np.asarray(bn.matrix), np.asarray(bp.matrix))


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


class TestSuperbatchBuckets:
    def test_same_width_blocks_share_one_bucket(self):
        cache = DeviceRowCache(64 << 20)
        for b in range(4):
            rows = [{"m": f"blk{b} row{i} common"} for i in range(20)]
            data = make_stream(rows)
            buf, offs, lens = split_rows_arrays(data)
            cache.pin((b"f", b), data, offs, lens)
        assert len(cache._buckets) == 1
        bucket = next(iter(cache._buckets.values()))
        assert len(bucket.segments) == 4 and bucket.used == 80

    def test_scan_exact_after_eviction_and_compaction(self):
        cache = DeviceRowCache(64 << 20)
        blocks = {}
        for b in range(6):
            rows = [{"m": f"blk{b} tok{b}_{i}"} for i in range(10)]
            data = make_stream(rows)
            buf, offs, lens = split_rows_arrays(data)
            blocks[b] = cache.pin((b"f", b), data, offs, lens)
        # Invalidate the file holding... all keys share pointer b"f"; use
        # per-block pointers instead for selective eviction.
        cache2 = DeviceRowCache(64 << 20)
        blocks = {}
        for b in range(6):
            rows = [{"m": f"blk{b} tok{b}_{i}"} for i in range(10)]
            data = make_stream(rows)
            buf, offs, lens = split_rows_arrays(data)
            blocks[b] = cache2.pin((f"f{b}".encode(), 0), data, offs, lens)
        for b in (0, 1, 2, 3):
            cache2.invalidate_file(f"f{b}".encode())
        bucket = next(iter(cache2._buckets.values()))
        # dead*2 >= used triggered at least one compaction along the way;
        # exactly the two live blocks' footprints remain live (each block
        # owns whole physical rows: 10 rows round up to a slot multiple).
        S = bucket.slots
        footprint = -(-10 // S) * S
        assert len(bucket.segments) == 2
        assert bucket.used - bucket.dead == 2 * footprint
        assert bucket.used < 6 * footprint  # proof a compaction ran
        for b in (4, 5):
            scan = cache2.scan(blocks[b], [f"tok{b}_3".encode(), b"absent"])
            assert scan[0].sum() == 1 and scan[0][3]
            assert not scan[1].any()

    def test_concurrent_scans_share_launches(self):
        import threading

        cache = DeviceRowCache(64 << 20)
        pinned = {}
        for b in range(8):
            rows = [{"m": f"blk{b} tok{b}_{i}"} for i in range(15)]
            data = make_stream(rows)
            buf, offs, lens = split_rows_arrays(data)
            pinned[b] = cache.pin((f"f{b}".encode(), 0), data, offs, lens)

        # Slow the launch so concurrent requests pile behind one leader.
        orig = cache._launch_bucket_scan

        def slow(*a, **k):
            import time as _t

            _t.sleep(0.05)
            return orig(*a, **k)

        cache._launch_bucket_scan = slow
        results = {}
        errors = []

        def one(b):
            try:
                results[b] = cache.scan(pinned[b], [f"tok{b}_7".encode()])
            except Exception as exc:  # pragma: no cover
                errors.append(exc)

        launches0 = cache.launches
        threads = [threading.Thread(target=one, args=(b,)) for b in range(8)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert not errors
        assert cache.launches - launches0 < 8, "no scan batching happened"
        for b in range(8):
            assert results[b][0].sum() == 1 and results[b][0][7], b

    def test_stale_block_after_eviction_is_conservative(self):
        cache = DeviceRowCache(64 << 20)
        rows = [{"m": f"r{i}"} for i in range(5)]
        data = make_stream(rows)
        buf, offs, lens = split_rows_arrays(data)
        block = cache.pin((b"f", 0), data, offs, lens)
        cache.invalidate_file(b"f")
        scan = cache.scan(block, [b"absent"])  # stale handle
        assert scan.all(), "stale block must be conservatively all-candidate"


class TestPallasByteScanParity:
    def test_pallas_interpret_matches_xla_path(self):
        """The production byte-scan kernel (interpret mode on CPU) must
        match the XLA sliding-window path and the truth."""
        rng = random.Random(11)
        words = ["Alpha", "beta", "GAMMA-7", "needle one", "Ka", "MiXeD"]
        rows = [
            {"m": " ".join(rng.choice(words) for _ in range(rng.randrange(1, 5)))}
            for _ in range(150)
        ]
        data = make_stream(rows)
        buf, offsets, lengths = split_rows_arrays(data)
        needles = [b"alpha", b"gamma-7", b"needle one", b"absent", b"ka"]

        xla_cache = DeviceRowCache(64 << 20)
        px = xla_cache.pin((b"f", 0), data, offsets, lengths)
        xla_scan = xla_cache.scan(px, needles)

        pl_cache = DeviceRowCache(64 << 20)
        pl_cache.pallas_interpret = True
        pp = pl_cache.pin((b"f", 0), data, offsets, lengths)
        pl_scan = pl_cache.scan(pp, needles)

        np.testing.assert_array_equal(xla_scan, pl_scan)
        for qi, nd in enumerate(needles):
            for ri, r in enumerate(rows):
                raw = json.dumps(r, separators=(",", ":")).lower().encode()
                assert pl_scan[qi, ri] == (nd in raw), (nd, ri)


class TestSwarKernelFuzz:
    def test_swar_alignments_lengths_and_high_bytes(self):
        """Direct kernel fuzz vs a bytes-in oracle: every start alignment
        mod 4, needle lengths 1..32 (the packed-word spans 1..9), bytes
        >= 0x80 (sign bits in the int32 lanes), and matches flush against
        the valid-start boundary."""
        import jax.numpy as jnp

        from bloomsearch_tpu.bloom.pallas_kernels import (
            MAX_SCAN_NEEDLES,
            byte_scan_pallas_swar,
            scan_word_bucket,
        )
        from bloomsearch_tpu.rowcache import MAX_NEEDLE

        rng = np.random.default_rng(7)
        G, P = 512, 512
        rows = rng.integers(0, 256, size=(G, P), dtype=np.uint8)
        needles = []
        for ln in (1, 2, 3, 4, 5, 7, 8, 31, 32):
            nd = bytes(rng.integers(0, 256, size=ln, dtype=np.uint8))
            needles.append(nd)
        # Plant occurrences at every alignment and at the last legal start.
        for i, nd in enumerate(needles):
            for a in range(4):
                g = rng.integers(0, G)
                s = int(rng.integers(0, (P - len(nd)) // 4)) * 4 + a
                rows[g, s : s + len(nd)] = np.frombuffer(nd, np.uint8)
            g = rng.integers(0, G)
            rows[g, P - len(nd) :] = np.frombuffer(nd, np.uint8)

        rows32 = rows.view(np.int32)  # little-endian test hosts
        for base in range(0, len(needles), MAX_SCAN_NEEDLES):
            part = needles[base : base + MAX_SCAN_NEEDLES]
            n_pad = max(8, len(part))
            padded = np.zeros((n_pad, MAX_NEEDLE), dtype=np.int32)
            lens = np.zeros(n_pad, dtype=np.int32)
            for r, nd in enumerate(part):
                padded[r, : len(nd)] = np.frombuffer(nd, np.uint8)
                lens[r] = len(nd)
            packed = np.asarray(
                byte_scan_pallas_swar(
                    jnp.asarray(rows32), jnp.asarray(padded), jnp.asarray(lens),
                    n_real=len(part),
                    max_words=scan_word_bucket(max(len(nd) for nd in part)),
                    interpret=True,
                )
            )
            bits = np.unpackbits(
                packed.view(np.uint8), axis=1, bitorder="little"
            ).astype(bool)
            for r, nd in enumerate(part):
                expect = np.array([nd in rows[g].tobytes() for g in range(G)])
                np.testing.assert_array_equal(bits[r, :G], expect, err_msg=repr(nd))


class TestSlotPacking:
    @pytest.mark.parametrize("slots,width", [(2, 256), (4, 128)])
    def test_slotted_kernel_matches_oracle(self, slots, width):
        """Narrow rows packed `slots`-per-physical-row must scan exactly:
        no cross-slot matches, per-slot valid bounds, logical row order."""
        import jax.numpy as jnp

        from bloomsearch_tpu.bloom.pallas_kernels import (
            byte_scan_pallas_swar,
            scan_word_bucket,
        )
        from bloomsearch_tpu.rowcache import MAX_NEEDLE

        rng = np.random.default_rng(13 + slots)
        phys = 512
        n_logical = phys * slots
        rows = rng.integers(97, 123, size=(n_logical, width), dtype=np.uint8)
        rows[:, width - MAX_NEEDLE :] = 0  # tail headroom like pin()
        needles = [b"qq", b"abcdefg", bytes(rng.integers(97, 123, size=13, dtype=np.uint8))]
        # Plant: inside rows, flush at the last legal start, and a decoy
        # SPLIT across a slot boundary (last bytes of row 4k+s, first of
        # the next) which must NOT match.
        for nd in needles:
            for _ in range(8):
                g = int(rng.integers(0, n_logical))
                s = int(rng.integers(0, width - MAX_NEEDLE - len(nd)))
                rows[g, s : s + len(nd)] = np.frombuffer(nd, np.uint8)
            g = int(rng.integers(0, n_logical))
            rows[g, width - MAX_NEEDLE - len(nd) : width - MAX_NEEDLE] = np.frombuffer(nd, np.uint8)

        packed = rows.reshape(phys, width * slots // 4, 4)
        packed = (
            packed[..., 0].astype(np.int64)
            | (packed[..., 1].astype(np.int64) << 8)
            | (packed[..., 2].astype(np.int64) << 16)
            | (packed[..., 3].astype(np.int64) << 24)
        ).astype(np.uint32).view(np.int32)

        N = 8
        padded = np.zeros((N, MAX_NEEDLE), np.int32)
        lens = np.zeros(N, np.int32)
        for r, nd in enumerate(needles):
            padded[r, : len(nd)] = np.frombuffer(nd, np.uint8)
            lens[r] = len(nd)
        out = np.asarray(
            byte_scan_pallas_swar(
                jnp.asarray(packed), jnp.asarray(padded), jnp.asarray(lens),
                n_real=len(needles),
                max_words=scan_word_bucket(max(len(nd) for nd in needles)),
                slots=slots, interpret=True,
            )
        )
        bits = np.unpackbits(out.view(np.uint8), axis=1, bitorder="little")
        for r, nd in enumerate(needles):
            expect = np.array([nd in rows[g].tobytes() for g in range(n_logical)])
            np.testing.assert_array_equal(
                bits[r, :n_logical].astype(bool), expect, err_msg=repr(nd)
            )


class TestSparseSegmentScan:
    def test_sparse_request_on_big_bucket_is_exact(self):
        """A scan touching few blocks of a big bucket takes the
        dynamic-slice segment path; results must match the dense scan-all
        path bit for bit."""
        # mesh_devices=1: the sparse path is single-device only (a mesh
        # always scans its shards in full).
        cache = DeviceRowCache(1 << 30, mesh_devices=1)
        cache.needle_cache_enabled = False
        blocks = {}
        NB, RPB = 40, 600
        for b in range(NB):
            rows = [{"m": f"blk{b} tok{b}_{i} x"} for i in range(RPB)]
            data = make_stream(rows)
            buf, offs, lens = split_rows_arrays(data)
            blocks[b] = cache.pin((f"f{b}".encode(), 0), data, offs, lens)
        bucket = next(iter(cache._buckets.values()))
        # Requesting 1-2 blocks of this bucket must qualify as sparse.
        pn = -(-RPB // bucket.slots)
        seg_rows = max(512, 1 << (pn - 1).bit_length())
        assert 2 * seg_rows * 4 <= bucket.cap // bucket.slots, (
            "test no longer exercises the sparse path; grow the bucket")

        for b in (0, 17, NB - 1):
            scan = cache.scan(blocks[b], [f"tok{b}_7 ".encode(), b"absent", f"blk{b}".encode()])
            assert scan[0].sum() == 1 and scan[0][7], b
            assert not scan[1].any(), b
            assert scan[2].all(), b
        # Two blocks in one request (two segments, one launch).
        out = cache.scan_many([blocks[3], blocks[29]], [b"tok3_11 ", b"tok29_0 "])
        assert out[blocks[3].key][0].sum() == 1 and out[blocks[3].key][0][11]
        assert not out[blocks[3].key][1].any()
        assert out[blocks[29].key][1].sum() == 1 and out[blocks[29].key][1][0]
        # Dense path (every block requested) agrees with the sparse slices.
        dense = cache.scan_many(list(blocks.values()), [b"tok17_7 "])
        sparse = cache.scan(blocks[17], [b"tok17_7 "])
        np.testing.assert_array_equal(dense[blocks[17].key][0], sparse[0])


class TestNeedleBitmapCache:
    def test_repeat_needle_skips_launch_until_matrix_changes(self):
        cache = DeviceRowCache(64 << 20)
        rows = [{"m": f"tok{i} filler"} for i in range(40)]
        data = make_stream(rows)
        buf, offs, lens = split_rows_arrays(data)
        b0 = cache.pin((b"f0", 0), data, offs, lens)

        first = cache.scan(b0, [b"tok7"])
        launches = cache.launches
        second = cache.scan(b0, [b"tok7"])
        assert cache.launches == launches, "cached needle re-launched"
        np.testing.assert_array_equal(first, second)
        assert second[0].sum() == 1 and second[0][7]

        # New pin changes the matrix -> version bump -> cache invalid.
        rows2 = [{"m": f"other{i}"} for i in range(10)]
        data2 = make_stream(rows2)
        _, offs2, lens2 = split_rows_arrays(data2)
        cache.pin((b"f1", 0), data2, offs2, lens2)
        third = cache.scan(b0, [b"tok7"])
        assert cache.launches == launches + 1, "stale cache served after pin"
        np.testing.assert_array_equal(first, third)

    def test_disabled_cache_always_launches(self):
        cache = DeviceRowCache(64 << 20)
        cache.needle_cache_enabled = False
        rows = [{"m": f"tok{i}"} for i in range(10)]
        data = make_stream(rows)
        _, offs, lens = split_rows_arrays(data)
        b0 = cache.pin((b"f0", 0), data, offs, lens)
        cache.scan(b0, [b"tok3"])
        launches = cache.launches
        cache.scan(b0, [b"tok3"])
        assert cache.launches == launches + 1


class TestMeshShardedRowCache:
    def test_superbatch_shards_across_devices(self):
        import jax

        assert len(jax.devices()) == 8
        cache = DeviceRowCache(64 << 20)  # auto mesh over all 8 CPU devices
        assert cache.mesh is not None and cache.mesh.shape["blocks"] == 8
        blocks = {}
        for b in range(4):
            rows = [{"m": f"blk{b} tok{b}_{i}"} for i in range(25)]
            data = make_stream(rows)
            buf, offs, lens = split_rows_arrays(data)
            blocks[b] = cache.pin((f"f{b}".encode(), 0), data, offs, lens)
        bucket = next(iter(cache._buckets.values()))
        assert len(bucket.matrix.sharding.device_set) == 8, bucket.matrix.sharding
        assert bucket.cap % (512 * 8) == 0

        # Exact scans over the sharded superbatch, including after
        # tombstone-driven compaction.
        for b in (0, 1):
            cache.invalidate_file(f"f{b}".encode())
        for b in (2, 3):
            scan = cache.scan(blocks[b], [f"tok{b}_11".encode(), b"absent"])
            assert scan[0].sum() == 1 and scan[0][11]
            assert not scan[1].any()
        assert len(bucket.matrix.sharding.device_set) == 8

    def test_mesh_devices_one_disables(self):
        cache = DeviceRowCache(64 << 20, mesh_devices=1)
        assert cache.mesh is None
        rows = [{"m": "solo needle"}]
        data = make_stream(rows)
        _, offs, lens = split_rows_arrays(data)
        pinned = cache.pin((b"f", 0), data, offs, lens)
        assert cache.scan(pinned, [b"needle"])[0, 0]
