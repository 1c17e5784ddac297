"""Dedicated unit tests for the small spec modules.

These modules (checksum, minmax, utils, compression) were previously covered
only through the file-format/engine integration tests; these tests pin their
reference semantics directly (min_max.go, utils.go, file_format.go:33-34,
bloom_tree_engine.go:46-80).
"""

import pytest

from bloomsearch_tpu import native
from bloomsearch_tpu.checksum import crc32c, crc32c_py
from bloomsearch_tpu.compression import (
    ALL_COMPRESSIONS,
    StreamEncoder,
    compression_available,
    decompress_block,
)
from bloomsearch_tpu.minmax import (
    MinMaxIndex,
    convert_to_int64,
    convert_to_min_max_int64,
    union_min_max_indexes,
    update_min_max_index,
)
from bloomsearch_tpu.utils import (
    INT64_MAX,
    INT64_MIN,
    clamp_int64,
    format_bytes_per_second,
    format_rate,
    go_like_str,
)


class TestCrc32c:
    def test_known_vectors(self):
        # RFC 3720 B.4 test vectors for CRC32C (Castagnoli).
        assert crc32c_py(b"") == 0
        assert crc32c_py(b"123456789") == 0xE3069283
        assert crc32c_py(b"\x00" * 32) == 0x8A9136AA
        assert crc32c_py(bytes(range(32))) == 0x46DD794E

    def test_incremental_chaining_matches_one_shot(self):
        data = bytes(range(256)) * 7
        whole = crc32c_py(data)
        crc = 0
        for i in range(0, len(data), 97):
            crc = crc32c_py(data[i : i + 97], crc)
        assert crc == whole

    def test_native_matches_python(self):
        if not native.available():
            pytest.skip("native library unavailable")
        data = bytes(range(256)) * 33 + b"tail"
        assert crc32c(data) == crc32c_py(data)
        # chained form too
        assert crc32c(data[100:], crc32c(data[:100])) == crc32c_py(data)


class TestMinMaxConversion:
    def test_int_maps_to_point_range(self):
        assert convert_to_min_max_int64(42) == (42, 42)
        assert convert_to_min_max_int64(-7) == (-7, -7)

    def test_float_widens_floor_ceil(self):
        # min_max.go:16-28: floats widen with floor/ceil.
        assert convert_to_min_max_int64(3.2) == (3, 4)
        assert convert_to_min_max_int64(-3.2) == (-4, -3)
        assert convert_to_min_max_int64(5.0) == (5, 5)

    def test_bool_is_not_numeric(self):
        # Go's type switch has no bool case even though Python bool is int.
        assert convert_to_min_max_int64(True) is None
        assert convert_to_int64(False) is None

    def test_non_finite_and_non_numeric_rejected(self):
        assert convert_to_min_max_int64(float("nan")) is None
        assert convert_to_min_max_int64(float("inf")) is None
        assert convert_to_min_max_int64("17") is None
        assert convert_to_int64(float("-inf")) is None
        assert convert_to_int64([1]) is None

    def test_convert_to_int64_rounds_half_away_from_zero(self):
        # Go math.Round semantics (min_max.go:33-44).
        assert convert_to_int64(2.5) == 3
        assert convert_to_int64(-2.5) == -3
        assert convert_to_int64(2.4) == 2
        assert convert_to_int64(-2.4) == -2

    def test_out_of_range_clamps_to_int64(self):
        assert convert_to_int64(2**80) == INT64_MAX
        assert convert_to_min_max_int64(-(2**80)) == (INT64_MIN, INT64_MIN)
        assert convert_to_min_max_int64(1e300) == (INT64_MAX, INT64_MAX)

    def test_update_and_union_widen(self):
        idx = update_min_max_index(MinMaxIndex(5, 10), 3, 8)
        assert (idx.min, idx.max) == (3, 10)
        merged = union_min_max_indexes(
            {"a": MinMaxIndex(0, 4), "b": MinMaxIndex(-2, 2)},
            {"a": MinMaxIndex(3, 9), "c": MinMaxIndex(7, 7)},
        )
        assert (merged["a"].min, merged["a"].max) == (0, 9)
        assert (merged["b"].min, merged["b"].max) == (-2, 2)
        assert (merged["c"].min, merged["c"].max) == (7, 7)

    def test_union_does_not_alias_inputs(self):
        a = {"a": MinMaxIndex(0, 4)}
        merged = union_min_max_indexes(a, {"a": MinMaxIndex(-9, 9)})
        merged["a"].min = -100
        assert a["a"].min == 0

    def test_json_round_trip(self):
        idx = MinMaxIndex(-3, 99)
        assert MinMaxIndex.from_json(idx.to_json()) == idx


class TestGoLikeStr:
    def test_bool_is_go_style(self):
        assert go_like_str(True) == "true"
        assert go_like_str(False) == "false"

    def test_integral_float_renders_like_go(self):
        # Go %v prints 25.0 as "25"; ingest and verification must agree.
        assert go_like_str(25.0) == "25"
        assert go_like_str(-3.0) == "-3"
        assert go_like_str(3.14) == "3.14"

    def test_non_finite(self):
        assert go_like_str(float("inf")) == "+Inf"
        assert go_like_str(float("-inf")) == "-Inf"
        assert go_like_str(float("nan")) == "NaN"

    def test_ints_and_strings(self):
        assert go_like_str(0) == "0"
        assert go_like_str(-12) == "-12"
        assert go_like_str("AbC") == "AbC"


class TestFormatHelpers:
    def test_format_rate_suffixes(self):
        assert format_rate(999.994) == "999.99"
        assert format_rate(1_000) == "1.00K"
        assert format_rate(2_500_000) == "2.50M"
        assert format_rate(3.1e9) == "3.10B"

    def test_format_bytes_per_second_suffixes(self):
        assert format_bytes_per_second(512) == "512.00 B/s"
        assert format_bytes_per_second(1 << 10) == "1.00 KB/s"
        assert format_bytes_per_second(5 << 20) == "5.00 MB/s"
        assert format_bytes_per_second(3 << 30) == "3.00 GB/s"

    def test_clamp_int64(self):
        assert clamp_int64(2**70) == INT64_MAX
        assert clamp_int64(-(2**70)) == INT64_MIN
        assert clamp_int64(12) == 12


class TestCompression:
    @pytest.mark.parametrize("codec", ALL_COMPRESSIONS)
    def test_stream_round_trip(self, codec):
        if not compression_available(codec):
            pytest.skip(f"{codec} unavailable")
        enc = StreamEncoder(codec)
        chunks = [b"hello world " * 100, b"", b"\x00\xff" * 333, b"tail"]
        for c in chunks:
            enc.write(c)
        payload = enc.finish()
        assert enc.uncompressed_len == sum(len(c) for c in chunks)
        joined = b"".join(chunks)
        assert decompress_block(payload, codec, len(joined)) == joined

    @pytest.mark.parametrize("codec", ALL_COMPRESSIONS)
    def test_empty_stream(self, codec):
        if not compression_available(codec):
            pytest.skip(f"{codec} unavailable")
        enc = StreamEncoder(codec)
        payload = enc.finish()
        assert decompress_block(payload, codec, 0) == b""

    def test_finish_is_idempotent(self):
        enc = StreamEncoder("none")
        enc.write(b"abc")
        assert enc.finish() == b"abc"
        assert enc.finish() == b"abc"

    def test_unknown_codec_rejected(self):
        with pytest.raises(ValueError):
            StreamEncoder("lz4")
        with pytest.raises(ValueError):
            decompress_block(b"x", "lz4")

    def test_empty_compression_string_means_none(self):
        # Tolerant metadata reads treat a missing codec field as "none".
        assert decompress_block(b"raw", "") == b"raw"
