"""Snappy codec backed by the native C++ library (chunked stream framing).

Stream framing (our own format — files are not interchange with the Go
reference): a sequence of chunks, each ``uint32 LE compressed_len`` followed
by one raw snappy block. ``SnappyStreamCompressor`` cuts a chunk per
``compress()`` call whose cumulative input exceeds the chunk size.

Until the native snappy kernels land this module reports unavailable and the
engine's config validation rejects ``compression="snappy"``.
"""

from __future__ import annotations


def available() -> bool:
    from . import native

    return native.snappy_available() if hasattr(native, "snappy_available") else False


class SnappyStreamCompressor:
    def __init__(self):
        raise RuntimeError(
            "snappy compression requires the native library (not available)"
        )

    def compress(self, data: bytes) -> bytes:  # pragma: no cover - stub
        raise NotImplementedError

    def flush(self) -> bytes:  # pragma: no cover - stub
        raise NotImplementedError


def decompress_stream(data: bytes) -> bytes:
    raise RuntimeError("snappy decompression requires the native library (not available)")
