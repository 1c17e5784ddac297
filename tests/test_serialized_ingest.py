"""Serialized-rows ingest fast lane: parity with dict ingest + guards."""

import json

import numpy as np
import pytest

import bloomsearch_tpu as bs

TIMEOUT = 10.0


def make_engine(tmp_path, name="data", **overrides):
    store = bs.FileSystemDataStore(str(tmp_path / name))
    config = bs.BloomSearchEngineConfig(
        row_data_compression="none", probe_backend="host", **overrides
    )
    engine = bs.BloomSearchEngine(config, store, store)
    engine.start()
    return engine, store


ROWS = [
    {"svc": "api", "msg": "Request 1 DONE", "n": 1},
    {"svc": "db", "msg": "slow query 42ms", "n": 2},
    {"uni": "héllo unicode row"},
]


class TestSerializedIngest:
    def test_round_trip_and_query(self, tmp_path):
        engine, _ = make_engine(tmp_path)
        try:
            payloads = [json.dumps(r, separators=(",", ":")).encode() for r in ROWS]
            engine.ingest_serialized(payloads, timeout=TIMEOUT)
            engine.flush(timeout=TIMEOUT)
            rows = engine.query_sync(bs.new_query().token("done").build(), timeout=TIMEOUT)
            assert len(rows) == 1 and rows[0]["n"] == 1
            rows = engine.query_sync(bs.new_query().token("héllo").build(), timeout=TIMEOUT)
            assert len(rows) == 1 and "uni" in rows[0]
            assert len(engine.query_sync(None, timeout=TIMEOUT)) == 3
        finally:
            engine.stop(timeout=TIMEOUT)

    def test_filters_match_dict_ingest(self, tmp_path):
        payloads = [json.dumps(r, separators=(",", ":")).encode() for r in ROWS]

        e1, s1 = make_engine(tmp_path, "ser")
        e1.ingest_serialized(payloads, timeout=TIMEOUT)
        e1.flush(timeout=TIMEOUT)
        e1.stop(timeout=TIMEOUT)

        e2, s2 = make_engine(tmp_path, "dict")
        e2.ingest_rows(list(ROWS), timeout=TIMEOUT)
        e2.flush(timeout=TIMEOUT)
        e2.stop(timeout=TIMEOUT)

        m1 = s1.get_maybe_files_for_query(None)[0].metadata
        m2 = s2.get_maybe_files_for_query(None)[0].metadata
        assert m1.bloom_filters == m2.bloom_filters
        # Row payloads identical too.
        from bloomsearch_tpu.file_format import read_block_rows_compressed

        with s1.open_file(s1.get_maybe_files_for_query(None)[0].pointer) as fh:
            d1 = read_block_rows_compressed(fh, m1.data_blocks[0])
        with s2.open_file(s2.get_maybe_files_for_query(None)[0].pointer) as fh:
            d2 = read_block_rows_compressed(fh, m2.data_blocks[0])
        assert d1 == d2

    def test_rejected_with_partition_func(self, tmp_path):
        engine, _ = make_engine(tmp_path, partition_func=lambda r: "x")
        try:
            with pytest.raises(bs.InvalidConfigError):
                engine.ingest_serialized([b"{}"])
        finally:
            engine.stop(timeout=TIMEOUT)

    def test_rejected_with_minmax(self, tmp_path):
        engine, _ = make_engine(tmp_path, min_max_indexes=["ts"])
        try:
            with pytest.raises(bs.InvalidConfigError):
                engine.ingest_serialized([b"{}"])
        finally:
            engine.stop(timeout=TIMEOUT)
