"""Device row cache: HBM-pinned row data with on-device candidate scanning.

Serving mode for hot data. The host candidate scan (scan.py) already avoids
JSON-parsing non-matching rows, but still burns host CPU re-reading and
re-scanning block bytes on every query. Here a block's decompressed rows are
pinned in HBM **once** — lowercased and padded into a ``uint8[num_rows,
row_width]`` matrix — and each query's needle scan runs on the TPU as a
vectorized sliding-window comparison, returning only a tiny per-row bitmap.
Both filter probing (bank.py) and candidate scanning then execute on-device;
the host only JSON-parses the handful of surviving candidate rows.

Conservative-by-construction like scan.py: rows longer than the padding cap
are flagged always-candidate, padding bytes are zeros (never match printable
needles), and the exact verification stage still runs on every candidate.
"""

from __future__ import annotations

import functools
import threading
from typing import Optional

import numpy as np

ROW_WIDTH_CAP = 4096  # rows longer than this are always-candidates
_LANE = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _round_up_pow2(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


MAX_NEEDLE = 32  # longer needles fall back to always-candidate


def _device_scan_fn():
    import jax
    import jax.numpy as jnp

    @jax.jit
    def scan_rows(rows2d, needles_padded, needle_lens):
        """rows2d uint8[R, P] (lowercased), needles uint8[N, MAX_NEEDLE],

        lens int32[N] -> bool[N, R]. ALL needles scan in ONE launch (the
        per-query needle count pads to a small bucket), and the loop is
        fixed at MAX_NEEDLE slices with positions >= each needle's length
        masked true — so the program compiles once per (rows2d shape, N
        bucket) instead of once per needle/length (remote-compile
        environments pay seconds per variant, remote-execute ones pay a
        round trip per launch).
        """
        R, P = rows2d.shape
        W = P - MAX_NEEDLE + 1
        N = needles_padded.shape[0]
        acc = jnp.ones((N, R, W), dtype=bool)
        for l in range(MAX_NEEDLE):
            window = jax.lax.dynamic_slice_in_dim(rows2d, l, W, axis=1)  # [R, W]
            cmp = window[None, :, :] == needles_padded[:, l, None, None]  # [N, R, W]
            acc = acc & jnp.where((l < needle_lens)[:, None, None], cmp, True)
        return jnp.any(acc, axis=2)

    return scan_rows


class _PinnedBlock:
    __slots__ = (
        "rows2d", "num_rows", "overlong_mask", "nbytes",
        "data", "row_offsets", "row_lengths",
    )

    def __init__(self, rows2d, num_rows, overlong_mask, data, row_offsets, row_lengths):
        self.rows2d = rows2d  # jax uint8[R, P], lowercased
        self.num_rows = num_rows
        self.overlong_mask = overlong_mask  # bool[R]: always-candidates
        # Host shadow of the original bytes for candidate extraction/parsing.
        self.data = data
        self.row_offsets = row_offsets
        self.row_lengths = row_lengths
        self.nbytes = int(np.prod(rows2d.shape)) + len(data)


class DeviceRowCache:
    """LRU cache of pinned blocks keyed by (file pointer, block offset)."""

    def __init__(self, capacity_bytes: int):
        import jax
        import jax.numpy as jnp

        self._jax = jax
        self._jnp = jnp
        self.capacity_bytes = capacity_bytes
        self._lock = threading.Lock()
        self._blocks: dict[tuple[bytes, int], _PinnedBlock] = {}
        self._scan = _device_scan_fn()

    def total_bytes(self) -> int:
        with self._lock:
            return sum(b.nbytes for b in self._blocks.values())

    def get(self, key: tuple[bytes, int]) -> Optional[_PinnedBlock]:
        with self._lock:
            block = self._blocks.pop(key, None)
            if block is not None:
                self._blocks[key] = block  # LRU bump
            return block

    def invalidate_file(self, pointer: bytes) -> None:
        with self._lock:
            for key in [k for k in self._blocks if k[0] == pointer]:
                self._blocks.pop(key)

    def pin(
        self,
        key: tuple[bytes, int],
        data: bytes,
        row_offsets: np.ndarray,
        row_lengths: np.ndarray,
    ) -> _PinnedBlock:
        """Build and cache the padded lowered row matrix for a block."""
        jnp = self._jnp
        num_rows = row_offsets.shape[0]
        width = int(row_lengths.max()) if num_rows else 0
        overlong = row_lengths > ROW_WIDTH_CAP
        width = min(width, ROW_WIDTH_CAP)
        # Extra MAX_NEEDLE tail so the fixed-size scan windows cover every
        # start position of the longest row (the scan always slides a
        # MAX_NEEDLE-wide window; without headroom, matches in a row's last
        # bytes would fall outside the window range).
        width = max(_round_up(width + MAX_NEEDLE, _LANE), _LANE)
        rows_padded = _round_up(max(num_rows, 1), 8)

        matrix = np.zeros((rows_padded, width), dtype=np.uint8)
        buf = np.frombuffer(data, dtype=np.uint8)
        for i in range(num_rows):
            if overlong[i]:
                continue
            length = int(row_lengths[i])
            start = int(row_offsets[i])
            matrix[i, :length] = buf[start : start + length]
        # ASCII lowercase in one vectorized pass.
        upper = (matrix >= ord("A")) & (matrix <= ord("Z"))
        matrix = np.where(upper, matrix + 32, matrix).astype(np.uint8)

        # Rows whose stored bytes cannot PROVE a needle's absence join the
        # always-candidate mask (mirrors the native scanner's rule): raw
        # non-ASCII bytes (Unicode lowercase may be pure ASCII, e.g. U+212A
        # -> 'k') and \uXXXX / \/ escapes (may hide printable-ASCII needle
        # bytes). A vectorized pair test over-approximates the escape-aware
        # walk (a literal "\\u" also flags) — conservative is correct here.
        nonascii = (matrix >= 0x80).any(axis=1)
        backslash = matrix[:, :-1] == ord("\\")
        nxt = matrix[:, 1:]
        escapes = (backslash & ((nxt == ord("u")) | (nxt == ord("/")))).any(axis=1)
        always_candidate = np.asarray(overlong).copy()
        always_candidate |= (nonascii | escapes)[: always_candidate.shape[0]]

        block = _PinnedBlock(
            jnp.asarray(matrix), num_rows, always_candidate,
            data, row_offsets, row_lengths,
        )
        with self._lock:
            self._blocks[key] = block
            while (
                sum(b.nbytes for b in self._blocks.values()) > self.capacity_bytes
                and len(self._blocks) > 1
            ):
                oldest = next(iter(self._blocks))
                self._blocks.pop(oldest)
        return block

    def scan(self, block: _PinnedBlock, needles: list[bytes]) -> np.ndarray:
        """-> bool[len(needles), num_rows] candidate matrix (device scan).

        All usable needles run in ONE device launch; degenerate/oversized
        needles are conservatively all-candidate host-side.
        """
        jnp = self._jnp
        out = np.zeros((len(needles), block.num_rows), dtype=bool)
        usable = [
            (qi, n) for qi, n in enumerate(needles) if n and len(n) <= MAX_NEEDLE
        ]
        for qi, needle in enumerate(needles):
            if not needle or len(needle) > MAX_NEEDLE:
                out[qi] = True  # degenerate/oversized: conservative
        if usable:
            n_bucket = _round_up_pow2(len(usable))
            padded = np.zeros((n_bucket, MAX_NEEDLE), dtype=np.uint8)
            lens = np.zeros(n_bucket, dtype=np.int32)
            for row, (_qi, needle) in enumerate(usable):
                padded[row, : len(needle)] = np.frombuffer(needle, dtype=np.uint8)
                lens[row] = len(needle)
            device_hits = np.asarray(
                self._scan(block.rows2d, jnp.asarray(padded), jnp.asarray(lens))
            )
            for row, (qi, _needle) in enumerate(usable):
                out[qi] = device_hits[row, : block.num_rows]
        if block.overlong_mask.any():
            out[:, block.overlong_mask[: block.num_rows]] = True
        return out
