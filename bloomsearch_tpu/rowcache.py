"""Device row cache: HBM-pinned row data with on-device candidate scanning.

Serving mode for hot data. The host candidate scan (scan.py) avoids
JSON-parsing non-matching rows but still burns host CPU re-reading and
re-scanning block bytes on every query. Here a block's decompressed rows are
pinned in HBM **once** — lowercased, padded, and packed 4-bytes-per-word
into rows of a width-bucketed **superbatch matrix** ``int32[cap_rows,
width/4]`` shared by every pinned block of similar row width — and each
query's needle scan runs on the TPU as ONE SWAR kernel launch per bucket
over ALL resident rows (scan-all: XLA row gathers run ~1.3-4 GB/s on v5e,
so streaming the whole matrix beats gathering any subset):

- all of a query's needles scan together (needle axis vectorized, padded to
  a small bucket), and
- concurrent block scans coalesce through a windowless leader-drains-queue
  combiner (the same design as the probe-launch batcher in bloom/bank.py):
  the leader launches the whole bucket once with the UNION of pending
  queries' needles and every waiter slices out its blocks' rows — so a
  query touching 40 pinned blocks costs ~1 launch, not 40 (launch
  round-trips dominate through remote-TPU tunnels and still cost tens of
  µs locally).

Conservative-by-construction like scan.py: rows longer than the padding cap
are flagged always-candidate, rows whose bytes can't prove needle absence
(non-ASCII, \\uXXXX / \\/ escapes) are always-candidates, padding bytes are
zeros (never match printable needles), and the exact verification stage
still runs on every candidate.
"""

from __future__ import annotations

import sys
import threading
from typing import Optional

import numpy as np

from . import native as _native

ROW_WIDTH_CAP = 4096  # rows longer than this are always-candidates
_LANE = 128
# Physical matrix rows are 512 bytes = 128 packed int32 lanes (the SWAR
# kernel's exact lane tile). Narrow logical rows SHARE a physical row
# (slots = 512/width for width buckets 128/256) so HBM isn't wasted padding
# log-sized rows to the tile; wider buckets are 512-byte multiples.
_PHYS_ROW_BYTES = 512


def _width_bucket(real_width: int) -> tuple[int, int]:
    """-> (logical row width, slots per physical row) for a block whose
    longest row is real_width bytes (MAX_NEEDLE tail headroom included so
    fixed-size scan windows cover every start of the longest row)."""
    w = min(real_width, ROW_WIDTH_CAP) + MAX_NEEDLE
    if w <= 128:
        return 128, 4
    if w <= 256:
        return 256, 2
    return _round_up(w, _PHYS_ROW_BYTES), 1

MAX_NEEDLE = 32  # longer needles fall back to always-candidate
# Per-bucket needle-bitmap cache entries (packed ~cap/8 bytes each).
_NEEDLE_CACHE_MAX = 128
# Bucket growth increment once doubling would exceed this many bytes (the
# grow-copy holds old+new matrices concurrently in HBM).
_GROWTH_STEP_BYTES = 512 << 20


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _round_up_pow2(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


def _device_scan_fn(mesh):
    import functools

    import jax
    import jax.numpy as jnp

    def _scan_matrix(rows32, needles_padded, needle_lens, *,
                     n_real, max_words, slots, use_pallas, interpret):
        """Core dispatch: SWAR kernel on TPU, sliding windows elsewhere.
        -> packed uint32[n_real, R_phys*slots/32] over logical rows."""
        if use_pallas:
            from .bloom.pallas_kernels import byte_scan_pallas_swar

            return byte_scan_pallas_swar(
                rows32, needles_padded, needle_lens,
                n_real=n_real, max_words=max_words, slots=slots,
                interpret=interpret,
            )
        # XLA fallback (non-TPU platforms): unpack to bytes, split physical
        # rows into logical rows, and run the sliding-window formulation.
        Rp, P4 = rows32.shape
        w = rows32.astype(jnp.uint32)  # bit-identical (mod 2^32)
        b = jnp.stack(
            [(w >> jnp.uint32(8 * i)) & jnp.uint32(0xFF) for i in range(4)],
            axis=-1,
        ).astype(jnp.uint8)
        R = Rp * slots
        P = P4 * 4 // slots  # logical row width
        rows2d = b.reshape(R, P)
        W = P - MAX_NEEDLE + 1
        acc = jnp.ones((n_real, R, W), dtype=bool)
        for l in range(MAX_NEEDLE):
            window = jax.lax.dynamic_slice_in_dim(rows2d, l, W, axis=1)  # [R, W]
            cmp = (
                window[None, :, :].astype(jnp.int32)
                == needles_padded[:n_real, l, None, None]
            )
            acc = acc & jnp.where((l < needle_lens[:n_real])[:, None, None], cmp, True)
        hit = jnp.any(acc, axis=2)  # bool[n_real, R]
        # Pack to bitmap words on-device (32x smaller device->host transfer;
        # R is a multiple of the row unit).
        groups = hit.reshape(n_real, R // 32, 32)
        weights = (jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32))[None, None, :]
        return jnp.sum(jnp.where(groups, weights, jnp.uint32(0)), axis=2, dtype=jnp.uint32)

    @functools.partial(
        jax.jit,
        static_argnames=("n_real", "max_words", "slots", "use_pallas", "interpret"),
    )
    def scan_all(rows32, needles_padded, needle_lens, *,
                 n_real: int, max_words: int, slots: int,
                 use_pallas: bool, interpret: bool):
        """rows32 int32[R_phys, W4] (lowercased bucket matrix, bytes packed
        little-endian 4-per-word, `slots` logical rows per physical row),
        needles int32[N, MAX_NEEDLE] byte values, lens int32[N] -> packed
        uint32[n_real, R_phys*slots/32] hit bitmap over EVERY resident
        LOGICAL row.

        Scan-all, not gather-then-scan: XLA's row gather measures ~1.3-4
        GB/s on v5e while the SWAR kernel streams the resident matrix at
        VPU speed, and the full-residency bitmap is cacheable per needle.
        The program compiles once per (bucket cap, width, N bucket, word
        bucket), independent of which rows a query asks for. On a mesh
        each chip scans its own row shard
        (parallel.mesh.sharded_scan_all_rows).
        """
        if use_pallas and mesh is not None:
            from .parallel.mesh import sharded_scan_all_rows

            return sharded_scan_all_rows(
                mesh, rows32, needles_padded, needle_lens,
                n_real=n_real, max_words=max_words, slots=slots,
                interpret=interpret,
            )
        return _scan_matrix(
            rows32, needles_padded, needle_lens,
            n_real=n_real, max_words=max_words, slots=slots,
            use_pallas=use_pallas, interpret=interpret,
        )

    @functools.partial(
        jax.jit,
        static_argnames=(
            "n_real", "max_words", "slots", "seg_rows", "use_pallas", "interpret"
        ),
    )
    def scan_segments(rows32, seg_starts, needles_padded, needle_lens, *,
                      n_real: int, max_words: int, slots: int, seg_rows: int,
                      use_pallas: bool, interpret: bool):
        """Slice `len(seg_starts)` contiguous physical-row ranges of
        seg_rows each out of the matrix and scan only those -> packed
        uint32[n_real, n_segs*seg_rows*slots/32].

        The sparse-request path: when a query's blocks cover a small
        fraction of a big bucket (needle queries at reference scale ask
        for 3 of 240 blocks), slicing whole segments with dynamic_slice is
        memory-bound — unlike row gathers — and scans + transfers orders
        of magnitude less than full residency. Single-device only (the
        mesh path always scans its shards in full).
        """
        parts = [
            jax.lax.dynamic_slice_in_dim(rows32, seg_starts[s], seg_rows, axis=0)
            for s in range(seg_starts.shape[0])
        ]
        sub = jnp.concatenate(parts, axis=0)
        return _scan_matrix(
            sub, needles_padded, needle_lens,
            n_real=n_real, max_words=max_words, slots=slots,
            use_pallas=use_pallas, interpret=interpret,
        )

    return scan_all, scan_segments


class _PinnedBlock:
    __slots__ = (
        "key", "bucket_width", "row_start", "num_rows", "always_candidate",
        "nbytes", "data", "row_offsets", "row_lengths",
    )

    def __init__(self, key, bucket_width, row_start, num_rows, always_candidate,
                 data, row_offsets, row_lengths):
        self.key = key
        self.bucket_width = bucket_width
        self.row_start = row_start  # row offset inside the bucket matrix
        self.num_rows = num_rows
        self.always_candidate = always_candidate  # bool[num_rows]
        # Host shadow of the original bytes for candidate extraction/parsing.
        self.data = data
        self.row_offsets = row_offsets
        self.row_lengths = row_lengths
        self.nbytes = num_rows * bucket_width + len(data)


class _RowBucket:
    """One width bucket's superbatch matrix; blocks occupy row ranges."""

    __slots__ = (
        "width", "slots", "matrix", "cap", "used", "dead", "segments",
        "pending", "launch_lock", "version", "needle_cache",
    )

    def __init__(self, width: int, slots: int):
        self.width = width  # logical row bytes
        self.slots = slots  # logical rows per 512-byte physical row
        # Packed row bytes, PHYSICAL layout [cap/slots, 128] int32; cap,
        # used, dead, and segment coordinates are all in LOGICAL rows
        # (segment starts are always slot-aligned: blocks own whole
        # physical rows).
        self.matrix = None
        self.cap = 0
        self.used = 0
        self.dead = 0
        self.segments: dict[tuple, tuple[int, int]] = {}  # key -> (start, n)
        # Cross-query scan combiner state (guarded by the cache lock /
        # launch_lock — see DeviceRowCache.scan).
        self.pending: list["_PendingScan"] = []
        self.launch_lock = threading.Lock()
        # Needle-bitmap cache: scan-all computes hits for EVERY resident
        # row, so a needle's packed bitmap stays valid until the matrix
        # changes. version bumps on every matrix reassignment; entries are
        # {needle: (version, packed uint32[cap/32])}, LRU-capped.
        self.version = 0
        self.needle_cache: dict[bytes, tuple[int, np.ndarray]] = {}


class _PendingScan:
    __slots__ = ("keys", "needles", "done", "hits", "segments", "error")

    def __init__(self, keys: list[tuple], needles: tuple[bytes, ...]):
        self.keys = keys
        self.needles = needles
        self.done = threading.Event()
        # key -> {needle: bool[num_rows]} (None value: block vanished).
        self.hits: Optional[dict[tuple, Optional[dict]]] = None
        # Per-key (start, n) in the SAME matrix snapshot the hits came from —
        # compaction may move rows concurrently, so slice coordinates must
        # travel with the launch, not the block objects.
        self.segments: Optional[list[Optional[tuple[int, int]]]] = None
        self.error: Optional[BaseException] = None


class DeviceRowCache:
    """LRU cache of pinned blocks keyed by (file pointer, block offset)."""

    def __init__(self, capacity_bytes: int, mesh_devices: Optional[int] = None):
        import jax
        import jax.numpy as jnp

        self._jax = jax
        self._jnp = jnp
        self.capacity_bytes = capacity_bytes
        # Multi-chip serving: superbatch matrices shard their ROW axis over
        # a 1-D mesh (same auto policy as the filter superbanks) — pinned
        # capacity and scan compute scale linearly in chips.
        n_visible = len(jax.devices())
        want = n_visible if mesh_devices is None else mesh_devices
        if want > 1 and n_visible >= want:
            from .parallel.mesh import default_mesh

            self.mesh = default_mesh(n_devices=want)
            # 512-row kernel tile x even shard split: every local shard of
            # the packed matrix is tileable by the SWAR scan kernel.
            self._row_unit = 512 * want
        else:
            self.mesh = None
            self._row_unit = 512
        self._lock = threading.Lock()
        self._blocks: dict[tuple[bytes, int], _PinnedBlock] = {}
        self._buckets: dict[int, _RowBucket] = {}
        self._scan, self._scan_segments = _device_scan_fn(self.mesh)
        # On TPU the SWAR byte-scan kernel is the production path (the
        # byte-per-lane predecessor lost to XLA fusion; the packed-word
        # rewrite + scan-all wins — see docs/PERFORMANCE.md). Non-TPU
        # platforms use the XLA sliding-window fallback; CPU tests exercise
        # the kernel via pallas_interpret.
        self.use_pallas = jax.default_backend() == "tpu"
        self.pallas_interpret = False
        # Version-keyed needle-bitmap cache (scan-all bitmaps outlive the
        # query that computed them); benchmarks disable this to measure the
        # uncached scan path.
        self.needle_cache_enabled = True
        self.launches = 0  # observability
        self.scan_requests = 0

    # -- residency ------------------------------------------------------

    def total_bytes(self) -> int:
        with self._lock:
            return self._total_bytes_locked()

    def stats(self) -> dict:
        """Public observability snapshot (the contract engine.stats() uses)."""
        with self._lock:
            total = self._total_bytes_locked()
            pinned = len(self._blocks)
        return {
            "bytes": total,
            "pinned_blocks": pinned,
            "scan_launches": self.launches,
            "scan_requests": self.scan_requests,
            "mesh_devices": self.mesh.shape["blocks"] if self.mesh is not None else 1,
        }

    def _total_bytes_locked(self) -> int:
        bucket_bytes = sum(b.cap * b.width for b in self._buckets.values())
        host_bytes = sum(len(blk.data) for blk in self._blocks.values())
        return bucket_bytes + host_bytes

    def get(self, key: tuple[bytes, int]) -> Optional[_PinnedBlock]:
        with self._lock:
            block = self._blocks.pop(key, None)
            if block is not None:
                self._blocks[key] = block  # LRU bump
            return block

    def invalidate_file(self, pointer: bytes) -> None:
        with self._lock:
            for key in [k for k in self._blocks if k[0] == pointer]:
                self._remove_locked(key)
            self._maybe_compact_locked()

    def _remove_locked(self, key) -> None:
        block = self._blocks.pop(key, None)
        if block is None:
            return
        bucket = self._buckets.get(block.bucket_width)
        if bucket is not None:
            seg = bucket.segments.pop(key, None)
            if seg is not None:
                # The block's whole physical footprint becomes reclaimable.
                bucket.dead += -(-seg[1] // bucket.slots) * bucket.slots

    def _maybe_compact_locked(self) -> None:
        from .parallel.mesh import sharded_take_rows, sharded_zeros_rows

        jnp = self._jnp
        for bucket in self._buckets.values():
            if bucket.dead == 0 or bucket.dead * 2 < bucket.used:
                continue
            S = bucket.slots
            order = sorted(bucket.segments.items(), key=lambda kv: kv[1][0])
            phys_rows = []  # physical row indices to keep, in order
            cursor = 0  # logical
            new_segments = {}
            for key, (start, n) in order:
                pn = -(-n // S)  # physical rows this block owns
                phys_rows.extend(range(start // S, start // S + pn))
                new_segments[key] = (cursor, n)
                block = self._blocks.get(key)
                if block is not None:
                    block.row_start = cursor
                cursor += pn * S
            unit = self._row_unit * S  # logical row unit
            new_cap = max(unit, _round_up(max(cursor, 1), unit))
            if phys_rows:
                idx = jnp.asarray(np.asarray(phys_rows, dtype=np.int32))
                new_matrix = sharded_take_rows(
                    self.mesh, bucket.matrix, idx, new_cap // S
                )
            else:
                new_matrix = sharded_zeros_rows(
                    self.mesh, new_cap // S, bucket.width * S // 4, dtype=jnp.int32
                )
            bucket.matrix = new_matrix
            bucket.cap = new_cap
            bucket.used = cursor
            # dead counts only RECLAIMABLE rows (removed blocks' physical
            # footprints) — slot-padding tails inside live blocks are not
            # compactable and must not re-trigger compaction.
            bucket.dead = 0
            bucket.segments = new_segments
            bucket.version += 1
            bucket.needle_cache.clear()

    def pin(
        self,
        key: tuple[bytes, int],
        data: bytes,
        row_offsets: np.ndarray,
        row_lengths: np.ndarray,
    ) -> _PinnedBlock:
        """Build the padded lowered row matrix for a block and append it to
        its width bucket's device matrix."""
        jax = self._jax
        jnp = self._jnp
        num_rows = row_offsets.shape[0]
        overlong = np.asarray(row_lengths > ROW_WIDTH_CAP)
        width, slots = _width_bucket(int(row_lengths.max()) if num_rows else 0)
        pn = -(-num_rows // slots)  # physical rows this block will own
        n_pad = pn * slots

        nat = (
            _native.pack_rows(
                data, row_offsets, row_lengths, width, n_pad, ROW_WIDTH_CAP
            )
            if num_rows and _native.available()
            else None
        )
        if nat is not None:
            # Native single pass: copy + lowercase + conservative flags at
            # GB/s (the numpy flat scatter below runs ~8 MB/s on the index
            # arrays it materializes; parity asserted in tests).
            matrix, flags = nat
            always_candidate = overlong | flags.astype(bool)
        else:
            matrix = np.zeros((max(n_pad, 1), width), dtype=np.uint8)
            buf = np.frombuffer(data, dtype=np.uint8)
            if num_rows:
                # Vectorized fill (one flat scatter instead of a Python loop
                # per row — the loop was ~40s for a 12M-row warmup pin pass).
                lens_c = np.where(overlong, 0, row_lengths).astype(np.int64)
                total = int(lens_c.sum())
                if total:
                    row_ids = np.repeat(np.arange(num_rows, dtype=np.int64), lens_c)
                    ends = np.cumsum(lens_c)
                    pos = np.arange(total, dtype=np.int64) - np.repeat(ends - lens_c, lens_c)
                    src = np.repeat(row_offsets.astype(np.int64), lens_c) + pos
                    matrix.reshape(-1)[row_ids * width + pos] = buf[src]
            # ASCII lowercase in one vectorized pass.
            upper = (matrix >= ord("A")) & (matrix <= ord("Z"))
            matrix = np.where(upper, matrix + 32, matrix).astype(np.uint8)

            # Rows whose stored bytes cannot PROVE a needle's absence join
            # the always-candidate mask (mirrors the native scanner's rule):
            # raw non-ASCII bytes (Unicode lowercase may be pure ASCII, e.g.
            # U+212A -> 'k') and \uXXXX / \/ escapes (may hide printable-
            # ASCII needle bytes). A vectorized pair test over-approximates
            # the escape-aware walk (a literal "\\u" also flags) —
            # conservative is correct here.
            nonascii = (matrix >= 0x80).any(axis=1)
            backslash = matrix[:, :-1] == ord("\\")
            nxt = matrix[:, 1:]
            escapes = (backslash & ((nxt == ord("u")) | (nxt == ord("/")))).any(axis=1)
            always_candidate = overlong.copy()
            always_candidate |= (nonascii | escapes)[: always_candidate.shape[0]]

        # Pack 4 bytes per int32 word, little-endian (what the SWAR scan
        # kernel and its host-computed pattern words assume), and fold
        # `slots` consecutive logical rows into each 512-byte physical row.
        # A pure reinterpret+reshape on little-endian hosts.
        if sys.byteorder == "little":
            packed = matrix.view(np.int32)
        else:
            m32 = matrix.reshape(matrix.shape[0], -1, 4).astype(np.uint32)
            packed = (
                m32[..., 0] | (m32[..., 1] << 8) | (m32[..., 2] << 16) | (m32[..., 3] << 24)
            ).view(np.int32)
        if num_rows > 0:
            packed = packed.reshape(pn, width * slots // 4)

        with self._lock:
            existing = self._blocks.get(key)
            if existing is not None:
                return existing
            from .parallel.mesh import (
                sharded_pad_rows,
                sharded_update_rows,
                sharded_zeros_rows,
            )

            bucket = self._buckets.get(width)
            if bucket is None:
                bucket = _RowBucket(width, slots)
                self._buckets[width] = bucket
            unit = self._row_unit * slots  # logical row unit
            if bucket.used + n_pad > bucket.cap:
                # Growth: double while small, then bounded increments — the
                # copy in sharded_pad_rows holds old+new concurrently, and
                # unbounded doubling at multi-GB bucket sizes OOMs HBM.
                grow = min(bucket.cap, max(_GROWTH_STEP_BYTES // width, 1))
                new_cap = max(
                    _round_up(bucket.used + n_pad, unit),
                    _round_up(bucket.cap + grow, unit),
                    unit,
                )
                if bucket.matrix is None:
                    bucket.matrix = sharded_zeros_rows(
                        self.mesh, new_cap // slots, width * slots // 4,
                        dtype=jnp.int32,
                    )
                else:
                    bucket.matrix = sharded_pad_rows(
                        self.mesh, bucket.matrix, new_cap // slots
                    )
                bucket.cap = new_cap
            if num_rows > 0:
                bucket.matrix = sharded_update_rows(
                    self.mesh, bucket.matrix, jnp.asarray(packed),
                    jnp.int32(bucket.used // slots),
                )
                bucket.version += 1
                bucket.needle_cache.clear()
            block = _PinnedBlock(
                key, width, bucket.used, num_rows, always_candidate,
                data, row_offsets, row_lengths,
            )
            bucket.segments[key] = (bucket.used, num_rows)
            bucket.used += n_pad
            self._blocks[key] = block
            # LRU eviction under the byte budget.
            while (
                self._total_bytes_locked() > self.capacity_bytes
                and len(self._blocks) > 1
            ):
                oldest = next(iter(self._blocks))
                if oldest == key:
                    break
                self._remove_locked(oldest)
            self._maybe_compact_locked()
        return block

    # -- scanning ---------------------------------------------------------

    def scan(self, block: _PinnedBlock, needles: list[bytes]) -> np.ndarray:
        """-> bool[len(needles), num_rows] candidate matrix (device scan).

        Concurrent scans of blocks in the same width bucket coalesce: one
        leader launches the bucket ONCE with the union of pending needle
        sets and every waiter slices its own block's rows.
        """
        return self.scan_many([block], needles)[block.key]

    def scan_many(
        self, blocks: list[_PinnedBlock], needles: list[bytes]
    ) -> dict[tuple, np.ndarray]:
        """Scan MANY pinned blocks in (at most) one launch per width bucket.

        The query planner knows every surviving block upfront, so a warm
        serving-mode query costs ~one scan launch total instead of one per
        block. -> {block.key: bool[len(needles), num_rows]}.
        """
        out: dict[tuple, np.ndarray] = {}
        usable = tuple(n for n in needles if n and len(n) <= MAX_NEEDLE)
        by_bucket: dict[int, list[_PinnedBlock]] = {}
        for block in blocks:
            by_bucket.setdefault(block.bucket_width, []).append(block)
        for width, group in by_bucket.items():
            hits = (
                self._bucket_hits(width, [b.key for b in group], usable)
                if usable
                else {}
            )
            for block in group:
                mat = np.zeros((len(needles), block.num_rows), dtype=bool)
                block_hits = hits.get(block.key) if usable else {}
                stale = usable and (
                    block_hits is None
                    or any(len(h) != block.num_rows for h in block_hits.values())
                )
                if stale:
                    # Evicted/moved under us: conservative (exact verify
                    # still rejects false positives).
                    mat[:] = True
                else:
                    for qi, needle in enumerate(needles):
                        if not needle or len(needle) > MAX_NEEDLE:
                            mat[qi] = True  # degenerate/oversized
                        elif block_hits:
                            mat[qi] = block_hits[needle]
                if block.always_candidate.any():
                    mat[:, block.always_candidate[: block.num_rows]] = True
                out[block.key] = mat
        return out

    def _bucket_hits(
        self, width: int, keys: list[tuple], needles: tuple[bytes, ...]
    ) -> dict[tuple, Optional[dict]]:
        """Scan blocks of one bucket via the combiner ->
        {key: {needle: bool[num_rows]} | None (block vanished)}."""
        req = _PendingScan(keys, needles)
        with self._lock:
            bucket = self._buckets.get(width)
            if bucket is None or bucket.matrix is None:
                return {k: None for k in keys}
            bucket.pending.append(req)
        with bucket.launch_lock:
            if not req.done.is_set():
                with self._lock:
                    batch = bucket.pending
                    bucket.pending = []
                    # Consistent snapshot: the matrix AND every waiter's
                    # segment coordinates under one lock acquisition
                    # (compaction may move rows at any time).
                    matrix = bucket.matrix
                    version = bucket.version
                    for r in batch:
                        r.segments = [bucket.segments.get(k) for k in r.keys]
                try:
                    self._launch_bucket_scan(bucket, matrix, version, batch)
                except BaseException as exc:
                    for r in batch:
                        r.error = exc
                        r.done.set()
                    raise
        if req.error is not None:
            raise req.error
        return req.hits

    def _launch_bucket_scan(
        self, bucket: _RowBucket, matrix, version: int,
        batch: list[_PendingScan],
    ) -> None:
        """ONE launch for every pending request: scan the bucket matrix
        (all of it, or just the requested segments when they're a small
        fraction of residency) against the union of the requested needles;
        each waiter slices its blocks' spans out of the result bitmap."""
        jnp = self._jnp
        self.scan_requests += len(batch)
        union: list[bytes] = []
        seen = set()
        for r in batch:
            for n in r.needles:
                if n not in seen:
                    seen.add(n)
                    union.append(n)

        # Needle-bitmap cache: a scan-all bitmap covers every resident row,
        # so it stays valid as long as the matrix does (version-checked).
        # Repeated needles — dashboards, retried queries — skip the device
        # round-trip entirely.
        cached: dict[bytes, np.ndarray] = {}
        if self.needle_cache_enabled:
            with self._lock:
                for nd in union:
                    ent = bucket.needle_cache.get(nd)
                    if ent is not None and ent[0] == version:
                        cached[nd] = ent[1]
        missing = [nd for nd in union if nd not in cached]

        # Adaptive scan shape for needles not served from cache:
        #  - DENSE (requests cover a meaningful fraction of residency, or a
        #    mesh shards the matrix): scan EVERY resident row; the
        #    full-residency bitmap also feeds the needle cache.
        #  - SPARSE (few blocks of a big bucket — needle queries at
        #    reference scale ask for 3 of 240): dynamic-slice just the
        #    requested segments on-device and scan those; both the scanned
        #    bytes and the returned bitmap shrink by the sparsity factor.
        from .bloom.pallas_kernels import MAX_SCAN_NEEDLES, scan_word_bucket

        S = bucket.slots
        phys_cap = int(matrix.shape[0])
        # Unique requested physical ranges (phys_start, phys_rows).
        ranges = sorted(
            {
                (seg[0] // S, -(-seg[1] // S))
                for r in batch
                for seg in r.segments
                if seg is not None and seg[1] > 0
            }
        )
        seg_rows = _round_up_pow2(max((pn for _, pn in ranges), default=1))
        seg_rows = max(seg_rows, 512)  # kernel row-tile multiple
        n_segs = len(ranges)
        sparse = (
            self.mesh is None
            and n_segs > 0
            and seg_rows <= phys_cap
            and n_segs * seg_rows * 4 <= phys_cap
        )
        if sparse:
            # Clamped slice starts; each range sits at a fixed offset
            # inside its part of the concatenated sub-matrix.
            starts = np.empty(n_segs, dtype=np.int32)
            part_off: dict[tuple[int, int], tuple[int, int]] = {}
            for p, (ps, pn) in enumerate(ranges):
                cl = min(ps, phys_cap - seg_rows)
                starts[p] = cl
                part_off[(ps, pn)] = (p, ps - cl)
            starts_dev = jnp.asarray(starts)
        logical_rows = (n_segs * seg_rows if sparse else phys_cap) * S

        chunk = MAX_SCAN_NEEDLES if self.use_pallas or self.pallas_interpret else 64
        fresh: dict[bytes, np.ndarray] = {}
        if missing:
            self.launches += 1
            max_words = scan_word_bucket(max(len(n) for n in missing))
            for base in range(0, len(missing), chunk):
                part = missing[base : base + chunk]
                # >= 8: Mosaic sublane tiling on the kernel's needle axis.
                n_bucket = max(8, _round_up_pow2(len(part)))
                padded = np.zeros((n_bucket, MAX_NEEDLE), dtype=np.int32)
                lens = np.zeros(n_bucket, dtype=np.int32)
                for row, needle in enumerate(part):
                    padded[row, : len(needle)] = np.frombuffer(needle, dtype=np.uint8)
                    lens[row] = len(needle)
                common = dict(
                    n_real=len(part),
                    max_words=max_words,
                    slots=S,
                    use_pallas=self.use_pallas or self.pallas_interpret,
                    interpret=self.pallas_interpret,
                )
                if sparse:
                    packed = np.asarray(
                        self._scan_segments(
                            matrix, starts_dev,
                            jnp.asarray(padded), jnp.asarray(lens),
                            seg_rows=seg_rows, **common,
                        )
                    )
                else:
                    packed = np.asarray(
                        self._scan(
                            matrix, jnp.asarray(padded), jnp.asarray(lens), **common
                        )
                    )
                for row, needle in enumerate(part):
                    fresh[needle] = packed[row]
            # Only full-residency bitmaps are cacheable.
            if self.needle_cache_enabled and not sparse:
                with self._lock:
                    if bucket.version == version:
                        for needle, row in fresh.items():
                            # own copy: a view would pin the whole launch
                            # result array in memory
                            bucket.needle_cache[needle] = (
                                version, np.ascontiguousarray(row),
                            )
                        while len(bucket.needle_cache) > _NEEDLE_CACHE_MAX:
                            bucket.needle_cache.pop(next(iter(bucket.needle_cache)))

        cap = phys_cap * S  # logical residency
        bits: dict[bytes, tuple[bool, np.ndarray]] = {}  # needle -> (full?, bits)
        for nd in union:
            full = nd in cached
            raw = cached[nd] if full else fresh[nd]
            arr = np.unpackbits(
                np.ascontiguousarray(raw).view(np.uint8), bitorder="little"
            )[: cap if full else logical_rows].astype(bool)
            bits[nd] = (full or not sparse, arr)
        for r in batch:
            hits: dict[tuple, Optional[dict]] = {}
            for key, seg in zip(r.keys, r.segments):
                if seg is None:
                    hits[key] = None
                    continue
                start, n = seg
                per_needle = {}
                for needle in r.needles:
                    full, arr = bits[needle]
                    if full or n == 0:
                        per_needle[needle] = arr[start : start + n]
                    else:
                        p, off = part_off[(start // S, -(-n // S))]
                        base = (p * seg_rows + off) * S
                        per_needle[needle] = arr[base : base + n]
                hits[key] = per_needle
            r.hits = hits
            r.done.set()
