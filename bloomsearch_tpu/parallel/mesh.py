"""Multi-chip probe sharding over a jax.sharding.Mesh.

The reference's only scaling dimension is data-parallelism over blocks —
a bounded worker pool on one host (SURVEY.md §2, parallelism items 3-4) and
a README-only scatter/gather design (README.md:397-418). The TPU-native
equivalent maps that dimension onto the device mesh: the superbank's block
axis shards across chips (``P(None, "blocks")``), query-term probe positions
replicate (the broadcast), each chip probes its local shard with the same
kernel (shard_map), and the packed per-block match bitmaps ride ICI back via
the all-gather XLA inserts when the sharded output is consumed replicated.

Filter banks beyond one chip's HBM therefore scale linearly in chips, and a
query still costs ONE launch per param group regardless of mesh size.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..bloom.pallas_kernels import (
    byte_scan_pallas_swar,
    pack_bitmap,
    probe_bank_pallas_tk,
    probe_bank_xla,
    round_up_rows,
)

BLOCK_AXIS = "blocks"


def default_mesh(n_devices: Optional[int] = None) -> Mesh:
    """A 1-D mesh over the block axis (the data-parallel dimension)."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (BLOCK_AXIS,))


def pad_columns_for_mesh(c: int, mesh: Mesh) -> int:
    """Columns must split evenly into 128-lane shards."""
    n = mesh.shape[BLOCK_AXIS]
    unit = 128 * n
    return ((c + unit - 1) // unit) * unit


def bank_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(None, BLOCK_AXIS))


def _constrain(x: jax.Array, mesh: Optional[Mesh]) -> jax.Array:
    return x if mesh is None else jax.lax.with_sharding_constraint(x, bank_sharding(mesh))


# --- Sharding-preserving superbank maintenance ops -------------------------
#
# The engine's Superbank (bloom/bank.py) mutates its device array on flush
# (append columns), tombstone (compaction), and growth. Each op below keeps
# the block axis sharded across the mesh so a bank larger than one chip's HBM
# stays usable; with mesh=None they lower to the plain single-device ops.
# None are on the query hot path — probes dominate; these run once per
# flush/merge.


@functools.partial(jax.jit, static_argnames=("mesh", "rows", "cols"))
def sharded_zeros(mesh: Optional[Mesh], rows: int, cols: int) -> jax.Array:
    return _constrain(jnp.zeros((rows, cols), jnp.uint32), mesh)


@functools.partial(jax.jit, static_argnames=("mesh", "new_cols"))
def sharded_pad_columns(mesh: Optional[Mesh], bank: jax.Array, new_cols: int) -> jax.Array:
    return _constrain(jnp.pad(bank, ((0, 0), (0, new_cols - bank.shape[1]))), mesh)


@functools.partial(jax.jit, static_argnames=("mesh",))
def sharded_update_columns(
    mesh: Optional[Mesh], bank: jax.Array, chunk: jax.Array, start: jax.Array
) -> jax.Array:
    out = jax.lax.dynamic_update_slice(bank, chunk, (jnp.int32(0), start))
    return _constrain(out, mesh)


@functools.partial(jax.jit, static_argnames=("mesh", "new_cols"))
def sharded_take_columns(
    mesh: Optional[Mesh], bank: jax.Array, idx: jax.Array, new_cols: int
) -> jax.Array:
    live = jnp.take(bank, idx, axis=1)
    out = jnp.zeros((bank.shape[0], new_cols), jnp.uint32)
    out = jax.lax.dynamic_update_slice(out, live, (0, 0))
    return _constrain(out, mesh)


def shard_bank(mesh: Mesh, bank2d: np.ndarray) -> jax.Array:
    """Place a host bank [rows, C] onto the mesh, block axis sharded.

    Pads rows to the sublane group and C to a lane multiple per shard.
    """
    rows, c = bank2d.shape
    rows_p = round_up_rows(rows)
    c_p = pad_columns_for_mesh(c, mesh)
    if (rows_p, c_p) != (rows, c):
        padded = np.zeros((rows_p, c_p), dtype=np.uint32)
        padded[:rows, :c] = bank2d
        bank2d = padded
    sharding = NamedSharding(mesh, P(None, BLOCK_AXIS))
    return jax.device_put(jnp.asarray(bank2d), sharding)


_pack_bitmap = pack_bitmap  # shared bitmap contract (pallas_kernels)


@functools.partial(
    jax.jit, static_argnames=("mesh", "T", "K", "use_pallas", "gather", "interpret")
)
def sharded_probe_packed(
    mesh: Mesh,
    bank2d: jax.Array,  # [rows, C] sharded P(None, "blocks")
    row_idx: jax.Array,  # int32[T*K] replicated
    shift: jax.Array,  # int32[T*K] replicated
    T: int,
    K: int,
    use_pallas: bool = False,
    gather: bool = True,
    interpret: bool = False,
) -> jax.Array:
    """Probe every shard's blocks -> packed uint32[T, C/32] match bitmap.

    Each device runs the identical probe kernel on its local block shard;
    the packed bitmaps concatenate along the block axis. With ``gather`` the
    result is replicated (XLA all-gathers the shards over ICI); otherwise it
    stays sharded for downstream sharded consumption. ``interpret`` runs the
    Pallas kernel in interpret mode (CPU validation of the production path).
    """

    def local(bank_local: jax.Array, fr: jax.Array, sh: jax.Array) -> jax.Array:
        if use_pallas:
            match = probe_bank_pallas_tk(bank_local, fr, sh, T, K, interpret=interpret) != 0
        else:
            match = probe_bank_xla(bank_local, fr, sh, K)
        return _pack_bitmap(match)

    out_spec = P(None, BLOCK_AXIS)
    shmapped = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(None, BLOCK_AXIS), P(), P()),
        out_specs=out_spec,
        # Pallas out_shapes carry no vma metadata; the body is purely
        # shard-local so the varying-across-mesh check adds nothing here.
        check_vma=False,
    )
    packed = shmapped(bank2d, row_idx, shift)
    if gather:
        packed = jax.lax.with_sharding_constraint(
            packed, NamedSharding(mesh, P())
        )
    return packed


@functools.partial(jax.jit, static_argnames=("mesh", "T", "K", "use_pallas", "interpret"))
def sharded_query_step(
    mesh: Mesh,
    bank2d: jax.Array,  # [rows, C] sharded P(None, "blocks")
    row_idx: jax.Array,
    shift: jax.Array,
    and_mask: jax.Array,  # bool[T]: terms under the top-level AND
    T: int,
    K: int,
    use_pallas: bool = False,
    interpret: bool = False,
):
    """The full sharded query step: probe + expression reduce + global stats.

    Evaluates a top-level AND over the masked terms entirely on-device
    (arbitrary AND/OR trees evaluate host-side over the packed bitmap; the
    flat-AND case — the overwhelmingly common query shape — stays fused
    here), packs the surviving-block bitmap, and psums the per-shard
    survivor count so the scheduler can size the decode worker pool without
    waiting for the bitmap transfer.

    Returns (packed_survivors uint32[C/32] replicated, total_survivors i32).
    """

    def local(bank_local, fr, sh, mask):
        if use_pallas:
            match = probe_bank_pallas_tk(bank_local, fr, sh, T, K, interpret=interpret) != 0
        else:
            match = probe_bank_xla(bank_local, fr, sh, K)
        # AND over active terms; inactive terms contribute True.
        survives = jnp.all(match | ~mask[:, None], axis=0)  # bool[C_local]
        packed = _pack_bitmap(survives[None, :])[0]  # uint32[C_local/32]
        count = jnp.sum(survives.astype(jnp.int32))
        total = jax.lax.psum(count, BLOCK_AXIS)  # ICI collective
        return packed, total

    shmapped = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(None, BLOCK_AXIS), P(), P(), P()),
        out_specs=(P(BLOCK_AXIS), P()),
        check_vma=False,
    )
    packed, total = shmapped(bank2d, row_idx, shift, and_mask)
    packed = jax.lax.with_sharding_constraint(packed, NamedSharding(mesh, P()))
    return packed, total


@functools.partial(jax.jit, static_argnames=("mesh", "T", "K", "use_pallas", "interpret"))
def sharded_probe_clauses(
    mesh: Mesh,
    bank2d: jax.Array,  # [rows, C] sharded P(None, "blocks")
    row_idx: jax.Array,
    shift: jax.Array,
    clause_mask: jax.Array,  # float32[Cl, T] replicated
    member_mask: jax.Array,  # float32[M, Cl] replicated
    T: int,
    K: int,
    use_pallas: bool = False,
    interpret: bool = False,
) -> jax.Array:
    """Sharded probe + fused CNF evaluation -> packed uint32[M, C/32].

    The multi-chip form of pallas_kernels.probe_clauses_pack: each chip
    probes its block shard and reduces the CNF locally (two small matmuls
    riding the MXU); only the per-member survivor bitmaps cross ICI when
    the replicated result gathers.
    """

    def local(bank_local, fr, sh, cmask, mmask):
        if use_pallas:
            match = probe_bank_pallas_tk(bank_local, fr, sh, T, K, interpret=interpret) != 0
        else:
            match = probe_bank_xla(bank_local, fr, sh, K)
        m = match.astype(jnp.float32)
        clause_false = (cmask @ m) < 0.5
        viol = (mmask @ clause_false.astype(jnp.float32)) > 0.5
        return _pack_bitmap(~viol)

    shmapped = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(None, BLOCK_AXIS), P(), P(), P(), P()),
        out_specs=P(None, BLOCK_AXIS),
        check_vma=False,
    )
    packed = shmapped(bank2d, row_idx, shift, clause_mask, member_mask)
    return jax.lax.with_sharding_constraint(packed, NamedSharding(mesh, P()))


def unpack_bitmap(packed: np.ndarray, num_cols: int) -> np.ndarray:
    """uint32[..., C/32] -> bool[..., num_cols]."""
    bits = np.unpackbits(
        np.ascontiguousarray(packed).view(np.uint8), axis=-1, bitorder="little"
    )
    return bits[..., :num_cols].astype(bool)


# --- Row-axis variants (serving row cache) ----------------------------------
#
# The device row cache shards its superbatch matrices along ROWS over the
# same 1-D mesh (uint8[rows, width], P("blocks", None)): pinned-row capacity
# and scan compute then scale linearly in chips, mirroring what the column
# helpers above do for filter superbanks.


def rows_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(BLOCK_AXIS, None))


def _constrain_rows(x: jax.Array, mesh: Optional[Mesh]) -> jax.Array:
    return x if mesh is None else jax.lax.with_sharding_constraint(x, rows_sharding(mesh))


@functools.partial(jax.jit, static_argnames=("mesh", "rows", "cols", "dtype"))
def sharded_zeros_rows(
    mesh: Optional[Mesh], rows: int, cols: int, dtype=jnp.uint8
) -> jax.Array:
    return _constrain_rows(jnp.zeros((rows, cols), dtype), mesh)


@functools.partial(jax.jit, static_argnames=("mesh", "new_rows"))
def sharded_pad_rows(mesh: Optional[Mesh], mat: jax.Array, new_rows: int) -> jax.Array:
    return _constrain_rows(jnp.pad(mat, ((0, new_rows - mat.shape[0]), (0, 0))), mesh)


@functools.partial(jax.jit, static_argnames=("mesh",))
def sharded_update_rows(
    mesh: Optional[Mesh], mat: jax.Array, chunk: jax.Array, start: jax.Array
) -> jax.Array:
    out = jax.lax.dynamic_update_slice(mat, chunk, (start, jnp.int32(0)))
    return _constrain_rows(out, mesh)


@functools.partial(jax.jit, static_argnames=("mesh",), donate_argnums=(1,))
def sharded_update_rows_donated(
    mesh: Optional[Mesh], mat: jax.Array, chunk: jax.Array, start: jax.Array
) -> jax.Array:
    """In-place variant of sharded_update_rows: donates ``mat`` so XLA
    aliases the output buffer instead of copying the (multi-GB at serving
    scale) stream matrix per upload piece. ONLY safe for chain
    intermediates the caller privately owns — donating the published
    matrix snapshot would invalidate it under concurrent scans
    (rowcache.pin tracks privateness explicitly)."""
    out = jax.lax.dynamic_update_slice(mat, chunk, (start, jnp.int32(0)))
    return _constrain_rows(out, mesh)


@functools.partial(jax.jit, static_argnames=("mesh", "new_rows"))
def sharded_take_rows(
    mesh: Optional[Mesh], mat: jax.Array, idx: jax.Array, new_rows: int
) -> jax.Array:
    live = jnp.take(mat, idx, axis=0)
    out = jnp.zeros((new_rows, mat.shape[1]), mat.dtype)
    out = jax.lax.dynamic_update_slice(out, live, (0, 0))
    return _constrain_rows(out, mesh)


@functools.partial(
    jax.jit,
    static_argnames=(
        "mesh", "n_real", "max_words", "slots", "stream_stride", "interpret"
    ),
)
def sharded_scan_all_rows(
    mesh: Mesh,
    rows32: jax.Array,  # int32[R, P4] packed rows, sharded P("blocks", None)
    needles: jax.Array,  # int32[N, MAX_SCAN_WINDOW]
    lens: jax.Array,  # int32[N]
    *,
    n_real: int,
    max_words: int,
    slots: int = 1,
    stream_stride: int = 0,
    interpret: bool = False,
) -> jax.Array:
    """Scan every resident row on its own chip -> packed uint32[N, R*slots/32]
    over LOGICAL rows.

    Each device runs the SWAR byte-scan kernel over its local physical-row
    shard (logical rows stay contiguous per shard, so the per-shard logical
    bitmaps concatenate along the word axis bit-for-bit with the unsharded
    kernel's output). The row cache pads capacities to 512 x mesh size
    physical rows, making every local shard kernel-tileable. With
    stream_stride > 0 physical rows are overlapped stream chunks and the
    bitmap is per chunk (rowcache.py stream mode); chunk overlap bytes are
    duplicated INTO each chunk at pack time, so shard boundaries need no
    halo exchange.
    """
    def local_scan(rows_l, needles_l, lens_l):
        return byte_scan_pallas_swar(
            rows_l, needles_l, lens_l,
            n_real=n_real, max_words=max_words, slots=slots,
            stream_stride=stream_stride, interpret=interpret,
        )

    shmapped = shard_map(
        local_scan,
        mesh=mesh,
        in_specs=(P(BLOCK_AXIS, None), P(), P()),
        out_specs=P(None, BLOCK_AXIS),
        check_vma=False,
    )
    packed = shmapped(rows32, needles, lens)
    return jax.lax.with_sharding_constraint(packed, NamedSharding(mesh, P()))
