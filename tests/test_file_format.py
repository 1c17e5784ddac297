"""File format v1: writer/reader round-trips, bank layout, integrity checks."""

import io
import struct

import numpy as np
import pytest

from bloomsearch_tpu.bloom import BloomFilter, BloomParams
from bloomsearch_tpu.compression import StreamEncoder, decompress_block
from bloomsearch_tpu.file_format import (
    MAGIC_BYTES,
    BloomFilters,
    DataFileWriter,
    InvalidFormatError,
    InvalidHashError,
    encode_row,
    extract_block_filters,
    read_bank_group,
    read_block_rows_compressed,
    read_file_metadata,
    split_rows,
)
from bloomsearch_tpu.minmax import MinMaxIndex


def make_filters(params: BloomParams, keys_per_keyspace) -> BloomFilters:
    filters = BloomFilters.from_params(params)
    filters.field.add_keys(keys_per_keyspace[0])
    filters.token.add_keys(keys_per_keyspace[1])
    filters.field_token.add_keys(keys_per_keyspace[2])
    return filters


def write_sample_file(fh, compression="none"):
    file_params = BloomParams(1000, 0.001)
    block_params = BloomParams(100, 0.001)
    writer = DataFileWriter(fh, file_params)

    blocks = []
    for i in range(3):
        rows = [f'{{"id": {i}-{j}}}'.encode() for j in range(5)]
        enc = StreamEncoder(compression)
        for r in rows:
            enc.write(encode_row(r))
        payload = enc.finish()
        filters = make_filters(
            block_params, ([f"field{i}"], [f"tok{i}"], [f"field{i}::tok{i}"])
        )
        block = writer.add_block(
            payload,
            filters,
            rows=len(rows),
            partition_id=f"p{i}",
            min_max_indexes={"ts": MinMaxIndex(i * 10, i * 10 + 9)},
            compression=compression,
            uncompressed_size=enc.uncompressed_len,
            created_at_ms=1000 + i,
            params=block_params,
        )
        blocks.append((block, rows))

    file_filters = make_filters(file_params, (["f"], ["t"], ["f::t"]))
    metadata = writer.finish(file_filters)
    return metadata, blocks


class TestFileFormatRoundTrip:
    def test_metadata_round_trip(self):
        buf = io.BytesIO()
        metadata, blocks = write_sample_file(buf)
        buf.seek(0)
        read_back = read_file_metadata(buf)

        assert read_back.bloom_expected_items == 1000
        assert read_back.bloom_false_positive_rate == 0.001
        assert len(read_back.data_blocks) == 3
        assert len(read_back.bank_groups) == 1
        assert read_back.bank_groups[0].num_blocks == 3
        b0 = read_back.data_blocks[0]
        assert b0.partition_id == "p0"
        assert b0.min_max_indexes["ts"].min == 0
        assert b0.min_max_indexes["ts"].max == 9
        assert b0.created_at_ms == 1000
        # File-level filters survive the JSON round trip.
        assert read_back.bloom_filters.field.test("f")
        assert read_back.bloom_filters.token.test("t")
        assert not read_back.bloom_filters.token.test("absent")

    def test_block_rows_round_trip_none_and_zstd(self):
        for compression in ("none", "zstd"):
            buf = io.BytesIO()
            metadata, blocks = write_sample_file(buf, compression)
            buf.seek(0)
            read_back = read_file_metadata(buf)
            for block_meta, rows in zip(read_back.data_blocks, [b[1] for b in blocks]):
                payload = read_block_rows_compressed(buf, block_meta)
                decompressed = decompress_block(
                    payload, block_meta.compression, block_meta.uncompressed_size
                )
                parsed = split_rows(decompressed, max_rows=block_meta.rows + 10)
                assert parsed == rows

    def test_bank_probe_layout(self):
        buf = io.BytesIO()
        metadata, _ = write_sample_file(buf)
        buf.seek(0)
        read_back = read_file_metadata(buf)
        group = read_back.bank_groups[0]
        bank = read_bank_group(buf, group)
        assert bank.shape == (3, group.num_words, 3)
        # Column i holds block i's filters: probe via extracted filter.
        for i, block in enumerate(read_back.data_blocks):
            triple = extract_block_filters(bank, group, block.bank_col)
            assert triple.field.test(f"field{i}")
            assert triple.token.test(f"tok{i}")
            assert triple.field_token.test(f"field{i}::tok{i}")
            assert not triple.field.test(f"field{(i + 1) % 3}")

    def test_corrupt_metadata_detected(self):
        buf = io.BytesIO()
        write_sample_file(buf)
        data = bytearray(buf.getvalue())
        # Flip a byte inside the metadata JSON (just before the footer tail).
        data[-40] ^= 0xFF
        corrupted = io.BytesIO(bytes(data))
        with pytest.raises(InvalidHashError):
            read_file_metadata(corrupted)

    def test_corrupt_rows_detected(self):
        buf = io.BytesIO()
        metadata, _ = write_sample_file(buf)
        data = bytearray(buf.getvalue())
        block = metadata.data_blocks[0]
        data[block.offset] ^= 0xFF
        corrupted = io.BytesIO(bytes(data))
        read_back = read_file_metadata(corrupted)
        with pytest.raises(InvalidHashError):
            read_block_rows_compressed(corrupted, read_back.data_blocks[0])

    def test_bad_magic_rejected(self):
        buf = io.BytesIO(b"not a bloomsearch file at all, but long enough....")
        with pytest.raises(InvalidFormatError):
            read_file_metadata(buf)

    def test_truncated_file_rejected(self):
        with pytest.raises(InvalidFormatError):
            read_file_metadata(io.BytesIO(b"tiny"))

    def test_magic_constant(self):
        assert len(MAGIC_BYTES) == 8

    def test_heterogeneous_params_get_separate_bank_groups(self):
        buf = io.BytesIO()
        writer = DataFileWriter(buf, BloomParams(1000, 0.001))
        for i, n in enumerate((100, 200)):
            params = BloomParams(n, 0.001)
            filters = make_filters(params, ([f"f{i}"], [f"t{i}"], [f"ft{i}"]))
            writer.add_block(
                encode_row(b"{}"),
                filters,
                rows=1,
                partition_id="",
                min_max_indexes={},
                compression="none",
                uncompressed_size=6,
                created_at_ms=0,
                params=params,
            )
        metadata = writer.finish(make_filters(BloomParams(1000, 0.001), ([], [], [])))
        assert len(metadata.bank_groups) == 2
        assert metadata.data_blocks[0].bank_group != metadata.data_blocks[1].bank_group


class TestSplitRows:
    def test_malformed_stream_detected(self):
        bad = struct.pack("<I", 100) + b"short"
        with pytest.raises(InvalidFormatError):
            split_rows(bad, max_rows=10)

    def test_empty_stream(self):
        assert split_rows(b"", max_rows=10) == []
