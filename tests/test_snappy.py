"""Native snappy codec: block round-trips, stream framing, engine E2E."""

import random

import pytest

import bloomsearch_tpu as bs
from bloomsearch_tpu import native
from bloomsearch_tpu import snappy
from bloomsearch_tpu.compression import StreamEncoder, decompress_block

pytestmark = pytest.mark.skipif(not snappy.available(), reason="native lib unavailable")


def random_bytes(rng, n):
    return bytes(rng.randrange(256) for _ in range(n))


class TestBlockRoundTrip:
    @pytest.mark.parametrize("size", [0, 1, 10, 100, 4096, 65535, 65536])
    def test_incompressible_round_trip(self, size):
        rng = random.Random(size)
        data = random_bytes(rng, size)
        compressed = native.snappy_compress_block(data)
        assert native.snappy_decompress_block(compressed) == data

    @pytest.mark.parametrize("size", [10, 1000, 65536])
    def test_compressible_round_trip(self, size):
        data = (b"abcdefgh" * (size // 8 + 1))[:size]
        compressed = native.snappy_compress_block(data)
        assert native.snappy_decompress_block(compressed) == data
        if size >= 1000:
            assert len(compressed) < size // 4, "repetitive data should compress well"

    def test_rle_run(self):
        data = b"\x00" * 50000
        compressed = native.snappy_compress_block(data)
        assert len(compressed) < 3000  # snappy copies cap at 64 bytes: ~3B per 64
        assert native.snappy_decompress_block(compressed) == data

    def test_json_like_payload(self):
        rng = random.Random(7)
        rows = [
            ('{"user": "u%d", "level": "info", "msg": "request %d ok"}' % (rng.randrange(100), i)).encode()
            for i in range(500)
        ]
        data = b"".join(rows)[:65536]
        compressed = native.snappy_compress_block(data)
        assert native.snappy_decompress_block(compressed) == data
        assert len(compressed) < len(data) // 2

    def test_corrupt_block_detected(self):
        data = b"hello world, hello world, hello world!"
        compressed = bytearray(native.snappy_compress_block(data))
        compressed[1] ^= 0xFF
        with pytest.raises(ValueError):
            # Either header or body becomes inconsistent.
            out = native.snappy_decompress_block(bytes(compressed))
            if out != data:
                raise ValueError("mismatch")


class TestStreamFraming:
    def test_multi_chunk_stream(self):
        rng = random.Random(1)
        data = random_bytes(rng, 200_000)  # > 3 chunks
        comp = snappy.SnappyStreamCompressor()
        out = comp.compress(data[:100_000])
        out += comp.compress(data[100_000:])
        out += comp.flush()
        assert snappy.decompress_stream(out) == data

    def test_stream_encoder_integration(self):
        enc = StreamEncoder("snappy")
        payload = b'{"a": 1}' * 10000
        enc.write(payload)
        compressed = enc.finish()
        assert decompress_block(compressed, "snappy") == payload
        assert enc.uncompressed_len == len(payload)


class TestEngineWithSnappy:
    def test_ingest_flush_query_round_trip(self, tmp_path):
        store = bs.FileSystemDataStore(str(tmp_path / "data"))
        config = bs.BloomSearchEngineConfig(row_data_compression="snappy")
        engine = bs.BloomSearchEngine(config, store, store)
        engine.start()
        try:
            engine.ingest_rows(
                [{"n": i, "word": f"w{i}", "tag": "all"} for i in range(200)], timeout=10
            )
            engine.flush(timeout=10)
            files = store.get_maybe_files_for_query(None)
            assert files[0].metadata.data_blocks[0].compression == "snappy"
            rows = engine.query_sync(bs.new_query().token("w42").build(), timeout=10)
            assert len(rows) == 1 and rows[0]["n"] == 42
            assert len(engine.query_sync(bs.new_query().token("all").build(), timeout=10)) == 200
        finally:
            engine.stop(timeout=10)


class TestMalformedInputSafety:
    def test_random_garbage_never_corrupts_memory(self):
        """Regression: the fixed-size fast-path slop once allowed a 32-byte
        heap overflow into tiny output buffers on malformed input. Malformed
        data must only ever raise ValueError (or decode to garbage within
        bounds) — glibc heap checks catch overflows at process exit."""
        import random

        rng = random.Random(1)
        for _ in range(4000):
            blob = bytes(rng.randrange(256) for _ in range(rng.randrange(1, 200)))
            try:
                native.snappy_decompress_block(blob)
            except ValueError:
                pass
        # Valid small uvarint headers + garbage bodies (tiny output buffers).
        for _ in range(4000):
            body = bytes(rng.randrange(256) for _ in range(rng.randrange(1, 300)))
            blob = bytes([rng.randrange(1, 128)]) + body
            try:
                native.snappy_decompress_block(blob)
            except ValueError:
                pass

    def test_truncation_fuzz_round_trip_prefixes(self):
        import random

        rng = random.Random(2)
        data = bytes(rng.randrange(32, 127) for _ in range(5000)) * 3
        comp = native.snappy_compress_block(data[:65536])
        assert native.snappy_decompress_block(comp) == data[:65536]
        for cut in range(1, len(comp), 97):
            try:
                native.snappy_decompress_block(comp[:cut])
            except ValueError:
                pass


class TestChunkIndex:
    """Random access into the chunked framing (shadow-free serving)."""

    def test_index_slices_decode_identically(self):
        import numpy as np

        from bloomsearch_tpu import snappy as sn

        if not sn.available():
            pytest.skip("native snappy unavailable")
        rng = random.Random(11)
        raw = bytes(
            rng.choice(b"abcdefgh {}:,\"0123") for _ in range(sn.CHUNK_SIZE * 3 + 777)
        )
        comp = sn.SnappyStreamCompressor()
        stream = comp.compress(raw) + comp.flush()
        idx = sn.chunk_index(stream)
        n_chunks = len(idx) - 1
        assert n_chunks == -(-len(raw) // sn.CHUNK_SIZE)
        whole = sn.decompress_stream(stream)
        assert whole == raw
        # Every chunk subrange decodes to exactly its uncompressed span.
        for c0 in range(n_chunks):
            for c1 in (c0 + 1, n_chunks):
                part = sn.decompress_chunk_run(stream[idx[c0] : idx[c1]])
                assert part == raw[c0 * sn.CHUNK_SIZE : c1 * sn.CHUNK_SIZE][: len(part)]
                assert len(part) == min(c1 * sn.CHUNK_SIZE, len(raw)) - c0 * sn.CHUNK_SIZE

    def test_truncated_stream_raises(self):
        from bloomsearch_tpu import snappy as sn

        if not sn.available():
            pytest.skip("native snappy unavailable")
        comp = sn.SnappyStreamCompressor()
        stream = comp.compress(b"hello world " * 100) + comp.flush()
        with pytest.raises(ValueError):
            sn.chunk_index(stream[:-3])


class TestNativeCompressStream:
    def test_stream_call_bit_identical_to_block_loop(self):
        import struct

        import numpy as np

        from bloomsearch_tpu import native
        from bloomsearch_tpu.snappy import CHUNK_SIZE

        if not native.available():
            import pytest

            pytest.skip("native library unavailable")
        rng = np.random.default_rng(5)
        # Compressible + incompressible mix, non-multiple of CHUNK_SIZE.
        data = (
            b"hello world " * 20_000
            + rng.integers(0, 256, size=150_000, dtype=np.uint8).tobytes()
        )
        got = native.snappy_compress_stream(data, CHUNK_SIZE)
        assert got is not None
        want = bytearray()
        for pos in range(0, len(data), CHUNK_SIZE):
            c = native.snappy_compress_block(data[pos : pos + CHUNK_SIZE])
            want += struct.pack("<I", len(c))
            want += c
        assert got == bytes(want)

    def test_empty_and_single_chunk(self):
        from bloomsearch_tpu import native
        from bloomsearch_tpu.snappy import CHUNK_SIZE

        if not native.available():
            import pytest

            pytest.skip("native library unavailable")
        assert native.snappy_compress_stream(b"", CHUNK_SIZE) == b""
        out = native.snappy_compress_stream(b"abc", CHUNK_SIZE)
        c = native.snappy_compress_block(b"abc")
        import struct

        assert out == struct.pack("<I", len(c)) + c
