"""Pallas TPU kernels for bloom bank probing.

The probe is the query hot path (SURVEY.md §3.3): for T query terms with k
probe positions each, test bits across C blocks. The superbank layout
``[rows, C]`` (rows = keyspace*num_words + word, padded to a multiple of 8)
makes every (term, probe) a *contiguous row read* of C words — streamed at
HBM bandwidth instead of the word-at-a-time random gathers the reference's
per-filter ``TestString`` does (bloom_tree_engine.go:890-903).

TPU memrefs are (8, 128)-tiled, so the minimum aligned fetch is an 8-row
group. The kernel scalar-prefetches the (term, probe) row indices so the
BlockSpec index_map steers a pipelined HBM→VMEM DMA of each probe's aligned
``(8, c_tile)`` group; the body selects the probed sublane in-register and
AND-accumulates into the output tile, which stays resident in VMEM across
the k probes of a term (the grid revisits it).

Traffic: 8·T·K·c_tile·4 bytes per tile step — 8x the single-row ideal (the
tiling-aligned minimum), still orders of magnitude below refetching filters
per block, and fully overlapped with compute by the Pallas pipeline. XLA's
own gather lowering measures ~1.3 GB/s effective on v5e; this kernel
saturates a large fraction of HBM bandwidth instead.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROW_GROUP = 8  # TPU sublane tiling: minimum aligned row-group fetch

# Block-axis tile: 32K uint32 words = 128 KiB per probed row (1 MiB
# fetched per aligned group). Re-measured on v5e in round 5
# (scripts/exp_kernel_floor.py, chained-launch slopes at T=4/k=10 over a
# 32768-column bank): the PATTERN floor — a kernel with this exact
# grid/BlockSpec whose body does one OR — runs 58.2 µs at 32K vs 58.8 at
# 16K vs 69.1 at 8K (fewer output-tile flush+revisit cycles per launch),
# and the real probe kernel follows: 2.140 B probes/s at 32K (95% of its
# 2.25 B pattern floor) vs 1.974 B at 16K vs 1.623 B at 8K. VMEM stays
# comfortable: in-tile 1 MiB, out-tile <= 2 MiB at the T=16 ladder top.
DEFAULT_C_TILE = 32_768

# Above this many probes (padded_terms * k) the unrolled/gridded kernel's
# compile time outweighs the win; callers fall back to the XLA path.
MAX_UNROLLED_PROBES = 512


def pack_bitmap(match: jax.Array) -> jax.Array:
    """bool[T, C] -> uint32[T, C/32] little-endian bit packing.

    THE bitmap contract shared by every device producer (probe kernels,
    stream scan, mesh collectives) and the host-side unpack — keep the one
    copy here."""
    T, C = match.shape
    groups = match.reshape(T, C // 32, 32)
    weights = (jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32))[None, None, :]
    return jnp.sum(jnp.where(groups, weights, jnp.uint32(0)), axis=2, dtype=jnp.uint32)


def round_up_rows(rows: int) -> int:
    return ((rows + ROW_GROUP - 1) // ROW_GROUP) * ROW_GROUP


def _make_kernel(K: int, c_tile: int):
    def kernel(idx_ref, shift_ref, group_ref, out_ref):
        t = pl.program_id(1)
        j = pl.program_id(2)
        p = t * K + j
        sublane = idx_ref[p] % ROW_GROUP
        shift = shift_ref[p].astype(jnp.uint32)
        rows = group_ref[:, :]  # (8, c_tile): the aligned group holding row p
        row_ids = jax.lax.broadcasted_iota(jnp.int32, (ROW_GROUP, c_tile), 0)
        # int32 bit math: Mosaic has no unsigned reductions.
        bits_all = (jax.lax.shift_right_logical(rows, shift) & jnp.uint32(1)).astype(
            jnp.int32
        )
        bit = jnp.max(
            jnp.where(row_ids == sublane, bits_all, 0), axis=0
        )  # (c_tile,) — the probed row's bits

        @pl.when(j == 0)
        def _():
            out_ref[t, :] = bit

        @pl.when(j > 0)
        def _():
            out_ref[t, :] = out_ref[t, :] & bit

    return kernel


@functools.partial(jax.jit, static_argnames=("T", "K", "c_tile", "interpret"))
def probe_bank_pallas_tk(
    bank2d: jax.Array,  # uint32[R, C]; R multiple of 8, C multiple of 128
    row_idx: jax.Array,  # int32[T*K] — flat (keyspace*num_words + word) rows
    shift: jax.Array,  # int32[T*K] — bit index per probe
    T: int,
    K: int,
    *,
    c_tile: int = DEFAULT_C_TILE,
    interpret: bool = False,
) -> jax.Array:
    """Probe T terms × K positions against every bank column -> int32[T, C] 0/1."""
    R, C = bank2d.shape
    assert R % ROW_GROUP == 0, f"bank rows must be {ROW_GROUP}-padded, got {R}"
    c_tile = min(c_tile, C)
    if C % c_tile != 0:
        c_tile = C  # C is 128-padded; single tile if not evenly divisible

    # Column tiles OUTERMOST: the output block (0, c) covers all T rows of
    # one column tile, so every (t, j) visit to it must be CONSECUTIVE —
    # Mosaic flushes an output buffer when its block index changes and does
    # not reload it on a later revisit. The previous (T, C//c_tile, K)
    # order revisited (0, c) once per t with other tiles in between,
    # leaving T-1 garbage rows per tile whenever C > c_tile (first real
    # trigger: a 32768-column superbank; single-tile banks were unaffected
    # because all grid steps then target the one block consecutively).
    grid = (C // c_tile, T, K)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # row_idx, shift
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (ROW_GROUP, c_tile),
                # Fetch the aligned 8-row group containing probe p's row.
                lambda c, t, j, idx_ref, shift_ref: (idx_ref[t * K + j] // ROW_GROUP, c),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (T, c_tile), lambda c, t, j, idx_ref, shift_ref: (0, c), memory_space=pltpu.VMEM
        ),
    )

    return pl.pallas_call(
        _make_kernel(K, c_tile),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((T, C), jnp.int32),
        cost_estimate=pl.CostEstimate(
            flops=2 * T * K * C * ROW_GROUP,
            bytes_accessed=T * K * C * 4 * ROW_GROUP + T * C * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(row_idx, shift, bank2d)


@functools.partial(jax.jit, static_argnames=("T", "K", "use_pallas", "interpret"))
def probe_and_pack(
    bank2d: jax.Array,
    row_idx: jax.Array,
    shift: jax.Array,
    T: int,
    K: int,
    *,
    use_pallas: bool,
    interpret: bool = False,
) -> jax.Array:
    """Probe then pack the [T, C] match matrix into uint32 bitmap words.

    The packed [T, C/32] result is 32x smaller, keeping the per-query
    device→host transfer tiny (the match bitmap is the only thing the query
    planner needs back from the device).
    """
    if use_pallas:
        match = probe_bank_pallas_tk(bank2d, row_idx, shift, T, K, interpret=interpret) != 0
    else:
        match = probe_bank_xla(bank2d, row_idx, shift, K)
    return pack_bitmap(match)


@functools.partial(jax.jit, static_argnames=("T", "K", "use_pallas", "interpret"))
def probe_reduce_and_pack(
    bank2d: jax.Array,
    row_idx: jax.Array,
    shift: jax.Array,
    T: int,
    K: int,
    and_mask: jax.Array,  # bool[T]: terms participating in the AND
    *,
    use_pallas: bool,
    interpret: bool = False,
) -> jax.Array:
    """Probe + fused flat-AND reduction -> packed uint32[1, C/32] survivors.

    The single-device form of mesh.sharded_query_step's body: for the
    dominant query shape (every term AND-ed), the [T, C] match matrix never
    leaves the device — the AND over active terms happens on-chip and only
    a [C/32] survivor bitmap transfers (T× less than probe_and_pack).
    Inactive (padding) terms contribute True.
    """
    if use_pallas:
        match = probe_bank_pallas_tk(bank2d, row_idx, shift, T, K, interpret=interpret) != 0
    else:
        match = probe_bank_xla(bank2d, row_idx, shift, K)
    survives = jnp.all(match | ~and_mask[:, None], axis=0)  # bool[C]
    return pack_bitmap(survives[None, :])


@functools.partial(jax.jit, static_argnames=("T", "K", "use_pallas", "interpret"))
def probe_clauses_pack(
    bank2d: jax.Array,
    row_idx: jax.Array,
    shift: jax.Array,
    T: int,
    K: int,
    clause_mask: jax.Array,  # float32[Cl, T] — CNF clauses over terms
    member_mask: jax.Array,  # float32[M, Cl] — which clauses belong to which query
    *,
    use_pallas: bool,
    interpret: bool = False,
) -> jax.Array:
    """Probe + fused CNF evaluation -> packed uint32[M, C/32] survivors.

    Arbitrary (monotone) AND/OR trees evaluate on-device as two small MXU
    matmuls over the [T, C] match matrix: clause_or = (clause_mask @ match)
    > 0, survivors[m] = no clause of member m is false. Per combined-launch
    member only a [C/32] bitmap transfers — the same fused-transfer win
    flat-AND gets from probe_reduce_and_pack, extended to every tree shape
    compile_cnf_clauses handles. Padding clauses (all-zero member columns)
    and padding members (all-zero clause rows) are inert by construction.
    """
    if use_pallas:
        match = probe_bank_pallas_tk(bank2d, row_idx, shift, T, K, interpret=interpret) != 0
    else:
        match = probe_bank_xla(bank2d, row_idx, shift, K)
    m = match.astype(jnp.float32)  # [T, C]; counts <= T << 2^24: exact in f32
    clause_false = (clause_mask @ m) < 0.5  # [Cl, C] — true where clause FAILS
    viol = (member_mask @ clause_false.astype(jnp.float32)) > 0.5  # [M, C]
    return pack_bitmap(~viol)


@functools.partial(jax.jit, static_argnames=("K",))
def probe_bank_xla(bank2d: jax.Array, row_idx: jax.Array, shift: jax.Array, K: int) -> jax.Array:
    """Pure-XLA probe on the same 2D layout -> bool[T, C].

    Row gather expressed as an XLA gather; used on non-TPU platforms, for
    very large term counts, and as the semantic cross-check for the Pallas
    kernel (XLA's TPU gather lowering is far from bandwidth — the kernel is
    the production path on TPU).
    """
    rows = bank2d[row_idx]  # [T*K, C]
    bits = jax.lax.shift_right_logical(rows, shift[:, None].astype(jnp.uint32)) & jnp.uint32(1)
    T = row_idx.shape[0] // K
    return jnp.all(bits.reshape(T, K, -1) == 1, axis=1)


# ---------------------------------------------------------------------------
# SWAR byte-scan kernel: case-already-lowered substring scan over the HBM-
# pinned row matrix (the device row cache's hot op), 4 bytes per int32 lane.
#
# Three measured facts (v5e, through the axon tunnel) shape this design:
#   1. XLA's row gather runs ~1.3-4 GB/s — gathering a candidate subset
#      costs 10-100x more than streaming the whole resident matrix, so the
#      kernel scans ALL resident rows and callers slice span bitmaps.
#   2. Mosaic's dynamic roll is 32-bit-only; a byte-per-lane formulation
#      wastes 3/4 of every VPU op. Rows are therefore stored PACKED
#      little-endian into int32 words (free on the host via .view) and a
#      match starting at byte s = 4*lane + a becomes a masked compare over
#      the ceil((a+len)/4) words it spans, with per-(needle, alignment,
#      word) pattern/mask words precomputed on the XLA side.
#   3. The VPU, not HBM, bounds the scan, so the word loop is bounded by
#      the LAUNCH's longest needle (static, bucketed) instead of the
#      32-byte worst case — mismatch bits OR-accumulate, 3 vector ops
#      (xor/and/or) per word.
# ---------------------------------------------------------------------------

MAX_SCAN_WINDOW = 32  # must equal rowcache.MAX_NEEDLE
MAX_SCAN_NEEDLES = 8  # per-launch needle cap (callers chunk above this)
# Row tile: 512 rows x 128 packed lanes = 256 KiB per input block. Large
# tiles amortize per-grid-step overhead (the matrices stream through
# thousands of steps); VMEM worst case is the 9 rolled copies + the tile
# (~2.6 MiB), comfortably under budget. Callers pad row capacity to a
# multiple of this; the needle axis pads to 8 (Mosaic sublane tiling).
_SCAN_ROW_TILE = 512


def _scan_row_tile(P4: int) -> int:
    """Shrink the row tile for wide buckets so the W rolled tile copies
    stay within VMEM (tile bytes ~= RT * P4 * 4 * (W + 2))."""
    rt = _SCAN_ROW_TILE
    while rt > 128 and rt * P4 * 4 * 11 > 8 << 20:
        rt //= 2
    return rt

# Word-loop buckets: a needle of len L at alignment a spans ceil((a+L)/4)
# <= ceil((L+3)/4) packed words. Launches bucket their longest needle here
# so short-needle queries (the common case) compile and run a fraction of
# the 9-word worst case's VPU work (the scan kernel is VPU-issue-bound).
# Every bucket is a separate jit program per matrix shape and warmup
# pre-compiles them all; four buckets keeps that cheap while covering the
# common needle lengths tightly (e.g. a 15-byte token needs 6 words — the
# old (4, 9) bucketing burned 50% more ops on it).
SCAN_WORD_BUCKETS = (2, 4, 6, 9)


def scan_word_bucket(max_len: int) -> int:
    need = (max_len + 3 + 3) // 4
    for b in SCAN_WORD_BUCKETS:
        if need <= b:
            return b
    return SCAN_WORD_BUCKETS[-1]


def _make_byte_scan_swar_kernel(n_real: int, n_out: int, RT: int, P4: int,
                                W: int, slots: int, stream_stride: int):
    # Each physical matrix row packs `slots` logical rows of
    # slot_bytes = 4*P4/slots bytes each (narrow rows share a 512-byte
    # physical row so HBM isn't wasted on lane-tile padding). A valid start
    # never crosses its slot: s mod slot_bytes <= slot_bytes - len keeps
    # s + len inside the slot, so per-slot hits are exact.
    #
    # stream_stride > 0 switches to STREAM chunks: each physical row is a
    # chunk of a contiguous byte stream whose last (slot_bytes -
    # stream_stride) bytes duplicate the next chunk's head, so every window
    # of <= overlap+1 bytes starting in the first stream_stride bytes is
    # fully contained — valid starts are s < stream_stride, independent of
    # needle length (slots must be 1).
    slot_bytes = 4 * P4 // slots
    lanes_per_slot = P4 // slots

    def kernel(pat_ref, msk_ref, lens_ref, rows_ref, out_ref):
        tile = rows_ref[:, :]  # int32 (RT, P4) — packed row bytes
        lane4 = 4 * jax.lax.broadcasted_iota(jnp.int32, (RT, P4), 1)
        sloc = lane4 % slot_bytes  # start byte within its slot (alignment 0)
        # Lane p of rolled[w] holds word p+w (wrapped lanes are excluded by
        # the valid-start mask: s + len staying inside the slot keeps every
        # spanned word index below P4).
        rolled = [tile]
        for w in range(1, W):
            rolled.append(pltpu.roll(tile, P4 - w, 1))
        for n in range(n_out):
            if n >= n_real:
                for s in range(slots):
                    out_ref[n * slots + s, :] = jnp.zeros((RT,), jnp.int32)
                continue
            # Last valid start byte (exclusive bound via <=): stream chunks
            # accept any start in the payload region; slot rows keep
            # s + len inside the slot.
            smax = (
                stream_stride - 1 if stream_stride else slot_bytes - lens_ref[n]
            )
            # int32 masks throughout: Mosaic can't legalize vector i1
            # selects/logic on this hardware generation.
            hit = jnp.zeros((RT, P4), dtype=jnp.int32)
            for a in range(4):
                base = (n * 4 + a) * W
                # OR-accumulate mismatch bits; words beyond the needle have
                # msk == 0 and contribute nothing.
                mismatch = jnp.zeros((RT, P4), jnp.int32)
                for w in range(W):
                    mismatch = mismatch | (
                        (rolled[w] ^ pat_ref[base + w]) & msk_ref[base + w]
                    )
                # Fold alignments elementwise; one cross-lane reduction per
                # (needle, slot) below (reductions are the expensive ops).
                matched = (mismatch == 0).astype(jnp.int32)
                valid = (sloc + a <= smax).astype(jnp.int32)
                hit = hit | (matched & valid)
            for s in range(slots):
                out_ref[n * slots + s, :] = jnp.max(
                    hit[:, s * lanes_per_slot : (s + 1) * lanes_per_slot], axis=1
                )

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("n_real", "max_words", "slots", "stream_stride", "interpret"),
)
def byte_scan_pallas_swar(
    rows32: jax.Array,  # int32[G, P4]: packed LE row bytes; G % 128 == 0, P4 % 128 == 0
    needles: jax.Array,  # int32[N, MAX_SCAN_WINDOW] byte values, N <= 8
    lens: jax.Array,  # int32[N]
    *,
    n_real: int,
    max_words: int = SCAN_WORD_BUCKETS[-1],  # word-loop bound (scan_word_bucket)
    slots: int = 1,  # logical rows per physical row (narrow-row packing)
    stream_stride: int = 0,  # >0: stream-chunk mode (see kernel maker)
    interpret: bool = False,
) -> jax.Array:
    """-> packed uint32[n_real, G*slots/32] hit bitmap over LOGICAL rows.

    Physical row g packs logical rows g*slots .. g*slots+slots-1; the
    kernel emits per-(needle, slot) hits and this wrapper interleaves them
    back to logical row order on-device before bit-packing, so callers are
    slot-agnostic. With slots == 1 this is a plain per-row bitmap.

    With stream_stride > 0 (slots must be 1), physical rows are overlapped
    chunks of a byte stream and the bitmap is per CHUNK: bit g is set iff
    the needle matches at some start in chunk g's first stream_stride
    bytes (the caller maps chunk hits back to its row spans).

    Every needle in the launch must span <= max_words packed words at any
    alignment, i.e. len <= 4*max_words - 3 (callers bucket via
    scan_word_bucket on the longest needle).
    """
    G, P4 = rows32.shape
    N = needles.shape[0]
    RT = _scan_row_tile(P4)
    assert G % RT == 0 and P4 % 128 == 0 and N <= MAX_SCAN_NEEDLES
    # The pattern-word construction below can only represent needle bytes
    # 0..MAX_SCAN_WINDOW-1 (jc clips there): a wider needle matrix (e.g.
    # rowcache.MAX_NEEDLE raised without this constant) would silently
    # compare bytes past the window against byte MAX_SCAN_WINDOW-1 and
    # REJECT true matches — a false negative with no failing test.
    assert needles.shape[1] == MAX_SCAN_WINDOW, needles.shape
    assert N % 8 == 0, "pad the needle axis to 8 (Mosaic sublane tiling)"
    assert 0 < n_real <= N
    assert slots in (1, 2, 4) and P4 % (slots * 32) == 0
    assert stream_stride == 0 or (
        slots == 1 and 0 < stream_stride <= 4 * P4 - (MAX_SCAN_WINDOW - 1)
    )
    W = max_words

    # Per-(needle, alignment, word) pattern/mask words, little-endian like
    # the packed rows. Byte b of word w at alignment a is needle byte
    # 4w + b - a.
    j = (
        4 * jnp.arange(W)[None, :, None]
        + jnp.arange(4)[None, None, :]
        - jnp.arange(4)[:, None, None]
    )  # [4, W, 4]
    in_needle = (j >= 0) & (j < lens[:, None, None, None])  # [N, 4, W, 4]
    jc = jnp.clip(j, 0, MAX_SCAN_WINDOW - 1)
    nb = jnp.where(in_needle, needles[:, jc], 0)  # [N, 4, W, 4]
    pat = nb[..., 0] | (nb[..., 1] << 8) | (nb[..., 2] << 16) | (nb[..., 3] << 24)
    mb = jnp.where(in_needle, 0xFF, 0)
    msk = mb[..., 0] | (mb[..., 1] << 8) | (mb[..., 2] << 16) | (mb[..., 3] << 24)
    pat = pat.reshape(-1).astype(jnp.int32)
    msk = msk.reshape(-1).astype(jnp.int32)

    NS = N * slots
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,  # pat, msk, lens
        grid=(G // RT,),
        in_specs=[
            pl.BlockSpec(
                (RT, P4),
                lambda g, pat_ref, msk_ref, lens_ref: (g, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (NS, RT),
            lambda g, pat_ref, msk_ref, lens_ref: (0, g),
            memory_space=pltpu.VMEM,
        ),
    )
    hit = pl.pallas_call(
        _make_byte_scan_swar_kernel(n_real, N, RT, P4, W, slots, stream_stride),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((NS, G), jnp.int32),
        cost_estimate=pl.CostEstimate(
            flops=3 * n_real * 4 * W * G * P4,
            bytes_accessed=G * P4 * 4 + NS * G * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(pat, msk, lens, rows32)

    # Interleave (needle, slot, phys) -> logical row order, then pack only
    # the REAL needle rows (padding rows would multiply the device->host
    # bitmap transfer for nothing).
    hit = hit[: n_real * slots]
    logical = hit.reshape(n_real, slots, G).transpose(0, 2, 1).reshape(n_real, G * slots)
    return pack_bitmap(logical != 0)
