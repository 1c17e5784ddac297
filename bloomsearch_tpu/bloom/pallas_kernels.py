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

# Block-axis tile: 16K uint32 words = 64 KiB per probed row (512 KiB
# fetched per aligned group). Re-measured on v5e in round 2 across
# {2K..32K}: 16384 runs 53-66 µs/launch at T=4 (2.0-2.4 B probes/s) vs
# 67 µs at the old 8192, and larger tiles win further as T grows (T=16:
# 32K tile 2.1 B vs 8K tile 1.4 B) — fewer grid revisits of the output
# tile amortize better. Run-to-run tunnel variance is ±20%; 16384 was
# never worse than 8192 in any run.
DEFAULT_C_TILE = 16_384

# Above this many probes (padded_terms * k) the unrolled/gridded kernel's
# compile time outweighs the win; callers fall back to the XLA path.
MAX_UNROLLED_PROBES = 512


def round_up_rows(rows: int) -> int:
    return ((rows + ROW_GROUP - 1) // ROW_GROUP) * ROW_GROUP


def _make_kernel(K: int, c_tile: int):
    def kernel(idx_ref, shift_ref, group_ref, out_ref):
        t = pl.program_id(0)
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

    grid = (T, C // c_tile, K)  # K innermost: output tile revisited per term

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # row_idx, shift
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (ROW_GROUP, c_tile),
                # Fetch the aligned 8-row group containing probe p's row.
                lambda t, c, j, idx_ref, shift_ref: (idx_ref[t * K + j] // ROW_GROUP, c),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (T, c_tile), lambda t, c, j, idx_ref, shift_ref: (0, c), memory_space=pltpu.VMEM
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
    C = match.shape[1]
    groups = match.reshape(T, C // 32, 32)
    weights = (jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32))[None, None, :]
    return jnp.sum(jnp.where(groups, weights, jnp.uint32(0)), axis=2, dtype=jnp.uint32)


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
    C = survives.shape[0]
    groups = survives.reshape(1, C // 32, 32)
    weights = (jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32))[None, None, :]
    return jnp.sum(jnp.where(groups, weights, jnp.uint32(0)), axis=2, dtype=jnp.uint32)


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
    survives = ~viol
    M, C = survives.shape
    groups = survives.reshape(M, C // 32, 32)
    weights = (jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32))[None, None, :]
    return jnp.sum(jnp.where(groups, weights, jnp.uint32(0)), axis=2, dtype=jnp.uint32)


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
# Byte-scan kernel: case-already-lowered substring scan over HBM-pinned rows
# (the device row cache's hot op). The XLA sliding-window formulation
# re-reads each row's bytes once per window offset (MAX_SCAN_WINDOW x the
# traffic; measured ~100 ms for a 1.7 GB gather on v5e); this kernel loads
# each row tile into VMEM ONCE, lane-rolls it in-register per offset, and
# AND-accumulates per-needle match masks — traffic equals the gathered rows.
# ---------------------------------------------------------------------------

MAX_SCAN_WINDOW = 32  # must equal rowcache.MAX_NEEDLE
MAX_SCAN_NEEDLES = 8  # per-launch needle cap (callers chunk above this)
# Mosaic block tiling: the output block's last two dims must divide (8, 128),
# so the row tile is 128 and callers pad the needle axis to 8.
_SCAN_ROW_TILE = 128


def _make_byte_scan_kernel(n_real: int, n_out: int, RT: int, P: int):
    def kernel(needles_ref, lens_ref, rows_ref, out_ref):
        # int32 lanes: Mosaic's dynamic_rotate (pltpu.roll) only supports
        # 32-bit data on this hardware generation.
        tile = rows_ref[:, :].astype(jnp.int32)  # (RT, P) from uint8
        pos = jax.lax.broadcasted_iota(jnp.int32, (RT, P), 1)
        # int32 masks throughout: Mosaic can't legalize vector i1 selects on
        # this hardware generation.
        accs = [jnp.ones((RT, P), dtype=jnp.int32)] * n_real
        for l in range(MAX_SCAN_WINDOW):
            # Byte at p+l moves to lane p — a LEFT roll by l, spelled as a
            # non-negative forward roll by P - l (wrapped lanes are excluded
            # by the valid-start mask below: active l < len and start <=
            # P - len together keep p + l < P).
            rolled = pltpu.roll(tile, P - l, 1) if l else tile
            for n in range(n_real):
                match_l = (rolled == needles_ref[n * MAX_SCAN_WINDOW + l]).astype(
                    jnp.int32
                )
                active = l < lens_ref[n]
                accs[n] = accs[n] & jnp.where(active, match_l, 1)
        for n in range(n_out):
            if n < n_real:
                valid = (pos <= P - lens_ref[n]).astype(jnp.int32)
                out_ref[n, :] = jnp.max(accs[n] & valid, axis=1)
            else:
                out_ref[n, :] = jnp.zeros((RT,), jnp.int32)

    return kernel


@functools.partial(jax.jit, static_argnames=("n_real", "interpret"))
def byte_scan_pallas(
    rows: jax.Array,  # uint8[G, P]; G % 128 == 0, P % 128 == 0, rows lowered
    needles: jax.Array,  # int32[N, MAX_SCAN_WINDOW] byte values, N <= 8
    lens: jax.Array,  # int32[N]
    *,
    n_real: int,  # needles actually present; padding rows compute nothing
    interpret: bool = False,
) -> jax.Array:
    """-> packed uint32[N, G/32] hit bitmap (1 = needle occurs in the row)."""
    G, P = rows.shape
    N = needles.shape[0]
    assert G % _SCAN_ROW_TILE == 0 and P % 128 == 0 and N <= MAX_SCAN_NEEDLES
    assert N % 8 == 0, "pad the needle axis to 8 (Mosaic sublane tiling)"
    assert 0 < n_real <= N

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # needles (flattened), lens
        grid=(G // _SCAN_ROW_TILE,),
        in_specs=[
            pl.BlockSpec(
                (_SCAN_ROW_TILE, P),
                lambda g, needles_ref, lens_ref: (g, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (N, _SCAN_ROW_TILE),
            lambda g, needles_ref, lens_ref: (0, g),
            memory_space=pltpu.VMEM,
        ),
    )
    hit = pl.pallas_call(
        _make_byte_scan_kernel(n_real, N, _SCAN_ROW_TILE, P),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((N, G), jnp.int32),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_real * MAX_SCAN_WINDOW * G * P,
            bytes_accessed=G * P + N * G * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(needles.reshape(-1), lens, rows)

    match = hit != 0  # bool[N, G]
    groups = match.reshape(N, G // 32, 32)
    weights = (jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32))[None, None, :]
    return jnp.sum(jnp.where(groups, weights, jnp.uint32(0)), axis=2, dtype=jnp.uint32)


# ---------------------------------------------------------------------------
# SWAR byte-scan kernel: 4 bytes per int32 lane. The original byte_scan_pallas
# put ONE byte in each 32-bit lane (Mosaic's dynamic roll is 32-bit-only), so
# every vector op wasted 3/4 of the VPU. Here rows are packed little-endian
# into int32 words on the XLA side; a needle match starting at byte
# s = 4*lane + a is then a word-aligned masked compare over the
# ceil((a+len)/4) words it spans, with per-(needle, alignment, word) pattern
# and mask words precomputed as scalars. Mismatch bits OR-accumulate so the
# inner loop is 3 vector ops (xor/and/or) per word — ~3.5x fewer lane-ops
# than the byte-per-lane kernel, on tiles 4x narrower.
# ---------------------------------------------------------------------------

# Max packed words a needle can span: start alignment 3 + 32 bytes -> 35
# bytes -> 9 words.
_SCAN_WMAX = (MAX_SCAN_WINDOW + 3 + 3) // 4


def _make_byte_scan_swar_kernel(n_real: int, n_out: int, RT: int, P4p: int, P_real: int):
    def kernel(pat_ref, msk_ref, lens_ref, rows_ref, out_ref):
        tile = rows_ref[:, :]  # int32 (RT, P4p) — packed row bytes
        lane = jax.lax.broadcasted_iota(jnp.int32, (RT, P4p), 1)
        # Lane p of rolled[w] holds word p+w (wrapped lanes are excluded by
        # the valid-start mask: s + len <= P_real keeps every spanned word
        # index below P4p).
        rolled = [tile]
        for w in range(1, _SCAN_WMAX):
            rolled.append(pltpu.roll(tile, P4p - w, 1))
        for n in range(n_out):
            if n >= n_real:
                out_ref[n, :] = jnp.zeros((RT,), jnp.int32)
                continue
            hit_n = jnp.zeros((RT,), jnp.int32)
            for a in range(4):
                base = (n * 4 + a) * _SCAN_WMAX
                # OR-accumulate mismatch bits; words beyond the needle have
                # msk == 0 and contribute nothing.
                mismatch = jnp.zeros((RT, P4p), jnp.int32)
                for w in range(_SCAN_WMAX):
                    mismatch = mismatch | (
                        (rolled[w] ^ pat_ref[base + w]) & msk_ref[base + w]
                    )
                matched = (mismatch == 0).astype(jnp.int32)
                # Start byte s = 4*lane + a must leave room for the needle.
                valid = ((lane * 4 + a) <= (P_real - lens_ref[n])).astype(jnp.int32)
                hit_n = jnp.maximum(hit_n, jnp.max(matched & valid, axis=1))
            out_ref[n, :] = hit_n

    return kernel


@functools.partial(jax.jit, static_argnames=("n_real", "interpret"))
def byte_scan_pallas_swar(
    rows: jax.Array,  # uint8[G, P]; G % 128 == 0, P % 128 == 0, rows lowered
    needles: jax.Array,  # int32[N, MAX_SCAN_WINDOW] byte values, N <= 8
    lens: jax.Array,  # int32[N]
    *,
    n_real: int,
    interpret: bool = False,
) -> jax.Array:
    """-> packed uint32[N, G/32] hit bitmap (1 = needle occurs in the row)."""
    G, P = rows.shape
    N = needles.shape[0]
    assert G % _SCAN_ROW_TILE == 0 and P % 128 == 0 and N <= MAX_SCAN_NEEDLES
    assert N % 8 == 0, "pad the needle axis to 8 (Mosaic sublane tiling)"
    assert 0 < n_real <= N

    # Pack 4 row bytes per int32 lane, explicit little-endian (platform
    # independent; XLA fuses this into the upstream gather). Lane axis pads
    # to the 128-lane tile.
    P4 = P // 4
    r = rows.reshape(G, P4, 4).astype(jnp.int32)
    words = r[..., 0] | (r[..., 1] << 8) | (r[..., 2] << 16) | (r[..., 3] << 24)
    P4p = ((P4 + 127) // 128) * 128
    if P4p != P4:
        words = jnp.pad(words, ((0, 0), (0, P4p - P4)))

    # Per-(needle, alignment, word) pattern/mask words, same little-endian
    # convention. Byte b of word w at alignment a is needle byte 4w + b - a.
    j = (
        4 * jnp.arange(_SCAN_WMAX)[None, :, None]
        + jnp.arange(4)[None, None, :]
        - jnp.arange(4)[:, None, None]
    )  # [4, WMAX, 4]
    in_needle = (j >= 0) & (j < lens[:, None, None, None])  # [N, 4, WMAX, 4]
    jc = jnp.clip(j, 0, MAX_SCAN_WINDOW - 1)
    nb = jnp.where(in_needle, needles[:, jc], 0)  # [N, 4, WMAX, 4]
    pat = nb[..., 0] | (nb[..., 1] << 8) | (nb[..., 2] << 16) | (nb[..., 3] << 24)
    mb = jnp.where(in_needle, 0xFF, 0)
    msk = mb[..., 0] | (mb[..., 1] << 8) | (mb[..., 2] << 16) | (mb[..., 3] << 24)
    pat = pat.reshape(-1).astype(jnp.int32)
    msk = msk.reshape(-1).astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,  # pat, msk, lens
        grid=(G // _SCAN_ROW_TILE,),
        in_specs=[
            pl.BlockSpec(
                (_SCAN_ROW_TILE, P4p),
                lambda g, pat_ref, msk_ref, lens_ref: (g, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (N, _SCAN_ROW_TILE),
            lambda g, pat_ref, msk_ref, lens_ref: (0, g),
            memory_space=pltpu.VMEM,
        ),
    )
    hit = pl.pallas_call(
        _make_byte_scan_swar_kernel(n_real, N, _SCAN_ROW_TILE, P4p, P),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((N, G), jnp.int32),
        cost_estimate=pl.CostEstimate(
            flops=3 * n_real * 4 * _SCAN_WMAX * G * P4p,
            bytes_accessed=G * P4p * 4 + N * G * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(pat, msk, lens, words)

    match = hit != 0  # bool[N, G]
    groups = match.reshape(N, G // 32, 32)
    weights = (jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32))[None, None, :]
    return jnp.sum(jnp.where(groups, weights, jnp.uint32(0)), axis=2, dtype=jnp.uint32)
