"""Engine-integrated multi-chip probing over the virtual 8-device CPU mesh.

The device probe backend shards every superbank's block axis across the mesh
(bank.py Superbank(mesh=...)); an ordinary ``engine.query_sync`` then probes
all chips in one launch. These tests assert the bank is *demonstrably*
sharded (device placement) and results stay oracle-exact, including through
growth, tombstone-driven compaction, and the Pallas kernel in interpret mode
inside shard_map.
"""

import jax
import numpy as np
import pytest

import bloomsearch_tpu as bs
from bloomsearch_tpu import BloomSearchEngine, BloomSearchEngineConfig, FileSystemDataStore

TIMEOUT = 15.0


def make_engine(tmp_path, **overrides):
    store = FileSystemDataStore(str(tmp_path / "data"))
    config = BloomSearchEngineConfig(
        row_data_compression="none", probe_backend="device", **overrides
    )
    engine = BloomSearchEngine(config, store, store)
    engine.start()
    return engine, store


def dataset(n_files=4, rows_per_file=40):
    files = []
    for f in range(n_files):
        files.append(
            [
                {"n": f * rows_per_file + i, "svc": f"svc{f}", "msg": f"w{f}_{i} common"}
                for i in range(rows_per_file)
            ]
        )
    return files


class TestEngineMeshProbe:
    def test_query_over_mesh_is_oracle_exact_and_sharded(self, tmp_path):
        assert len(jax.devices()) == 8
        engine, _ = make_engine(tmp_path)
        try:
            backend = engine._device_backend
            assert backend is not None and backend.mesh is not None
            assert backend.mesh.shape["blocks"] == 8

            files = dataset()
            all_rows = [r for f in files for r in f]
            for rows in files:
                engine.ingest_rows(rows, timeout=TIMEOUT)
                engine.flush(timeout=TIMEOUT)

            # Needle: exactly one row carries w2_7.
            got = engine.query_sync(bs.new_query().token("w2_7").build(), timeout=TIMEOUT)
            assert got == [r for r in all_rows if "w2_7" in r["msg"]]

            # Common token: every row.
            got = engine.query_sync(bs.new_query().token("common").build(), timeout=TIMEOUT)
            assert sorted(r["n"] for r in got) == [r["n"] for r in all_rows]

            # AND/OR tree across keyspaces.
            q = bs.new_query().match(
                bs.or_(bs.field_token("svc", "svc1"), bs.token("w3_0"))
            ).build()
            got = sorted(r["n"] for r in engine.query_sync(q, timeout=TIMEOUT))
            expected = sorted(
                r["n"] for r in all_rows if r["svc"] == "svc1" or "w3_0 " in r["msg"] + " "
            )
            assert got == expected

            # The superbank must actually be sharded across all 8 devices.
            assert backend._superbanks, "device path not exercised"
            for sb in backend._superbanks.values():
                sharding = sb.bank2d.sharding
                assert len(sharding.device_set) == 8, sharding
                local = sb.bank2d.addressable_shards[0].data
                assert local.shape[1] == sb.capacity // 8
        finally:
            engine.stop(timeout=TIMEOUT)

    def test_growth_and_compaction_stay_sharded_and_exact(self, tmp_path):
        engine, _ = make_engine(tmp_path)
        try:
            backend = engine._device_backend
            # Many small flushes force superbank growth (capacity doubling).
            for f in range(6):
                engine.ingest_rows(
                    [{"n": f * 10 + i, "tag": f"t{f}"} for i in range(10)], timeout=TIMEOUT
                )
                engine.flush(timeout=TIMEOUT)
            before = engine.query_sync(bs.new_query().token("t4").build(), timeout=TIMEOUT)
            assert sorted(r["n"] for r in before) == list(range(40, 50))

            # Merge replaces files -> tombstones -> segment removal/compaction.
            engine.merge()
            for sb in backend._superbanks.values():
                assert len(sb.bank2d.sharding.device_set) == 8

            after = engine.query_sync(bs.new_query().token("t4").build(), timeout=TIMEOUT)
            assert sorted(r["n"] for r in after) == list(range(40, 50))
        finally:
            engine.stop(timeout=TIMEOUT)

    def test_explicit_mesh_devices_partial(self, tmp_path):
        engine, _ = make_engine(tmp_path, mesh_devices=4)
        try:
            backend = engine._device_backend
            assert backend.mesh is not None and backend.mesh.shape["blocks"] == 4
            engine.ingest_rows([{"a": "hello world"}], timeout=TIMEOUT)
            engine.flush(timeout=TIMEOUT)
            got = engine.query_sync(bs.new_query().token("hello").build(), timeout=TIMEOUT)
            assert got == [{"a": "hello world"}]
            for sb in backend._superbanks.values():
                assert len(sb.bank2d.sharding.device_set) == 4
        finally:
            engine.stop(timeout=TIMEOUT)

    def test_mesh_devices_one_disables_sharding(self, tmp_path):
        engine, _ = make_engine(tmp_path, mesh_devices=1)
        try:
            assert engine._device_backend.mesh is None
            engine.ingest_rows([{"a": "solo"}], timeout=TIMEOUT)
            engine.flush(timeout=TIMEOUT)
            got = engine.query_sync(bs.new_query().token("solo").build(), timeout=TIMEOUT)
            assert got == [{"a": "solo"}]
        finally:
            engine.stop(timeout=TIMEOUT)

    def test_mesh_devices_too_many_raises(self, tmp_path):
        store = FileSystemDataStore(str(tmp_path / "data"))
        config = BloomSearchEngineConfig(
            row_data_compression="none", probe_backend="device", mesh_devices=64
        )
        with pytest.raises(RuntimeError):
            BloomSearchEngine(config, store, store)


class TestEngineMeshPallasInterpret:
    def test_full_query_through_pallas_interpret_shard_map(self, tmp_path):
        """The production kernel (interpret mode) inside shard_map serves an
        ordinary engine query — the combination the dryrun validates."""
        engine, _ = make_engine(tmp_path)
        try:
            backend = engine._device_backend
            backend.pallas_interpret = True
            files = dataset(n_files=2, rows_per_file=20)
            for rows in files:
                engine.ingest_rows(rows, timeout=TIMEOUT)
                engine.flush(timeout=TIMEOUT)
            got = engine.query_sync(bs.new_query().token("w1_3").build(), timeout=TIMEOUT)
            assert got == [r for f in files for r in f if "w1_3" in r["msg"]]
        finally:
            engine.stop(timeout=TIMEOUT)


class TestShardMapPallasParity:
    def test_sharded_pallas_interpret_matches_host(self):
        from bloomsearch_tpu.bloom import BloomParams
        from bloomsearch_tpu.bloom.probe import (
            compile_bloom_terms,
            probe_bank_host,
            stack_filter_bank,
        )
        from bloomsearch_tpu.file_format import BloomFilters
        from bloomsearch_tpu.parallel import (
            default_mesh,
            shard_bank,
            sharded_probe_packed,
            unpack_bitmap,
        )
        import jax.numpy as jnp

        params = BloomParams(300, 0.01)
        num_blocks = 24
        triples = []
        for i in range(num_blocks):
            t = BloomFilters.from_params(params)
            t.field.add_keys([f"field{i}"])
            t.token.add_keys([f"tok{i}", "shared"])
            t.field_token.add_keys([f"field{i}::tok{i}"])
            triples.append(t)
        bank = stack_filter_bank(triples)

        mesh = default_mesh()
        bank2d = shard_bank(mesh, bank.reshape(3 * params.num_words, num_blocks))
        q = bs.new_query().token("shared").field_token("field3", "tok3").build()
        terms = compile_bloom_terms(q.bloom)
        word_idx, bit_idx = terms.positions_for(params.m_bits, params.k)
        rows = (
            terms.ks_idx[:, None].astype(np.int32) * params.num_words + word_idx
        ).reshape(-1)

        packed = sharded_probe_packed(
            mesh,
            bank2d,
            jnp.asarray(rows),
            jnp.asarray(bit_idx.reshape(-1)),
            len(terms),
            params.k,
            use_pallas=True,
            interpret=True,
        )
        match = unpack_bitmap(np.asarray(packed), num_blocks)
        expected = probe_bank_host(bank, terms, params.m_bits, params.k)
        np.testing.assert_array_equal(match, expected)


class TestFusedFlatAnd:
    def test_flat_and_reduces_on_device_and_stays_exact(self, tmp_path):
        engine, _ = make_engine(tmp_path)
        try:
            backend = engine._device_backend
            calls = []
            orig = backend.probe_groups

            def spy(requests, terms, reduce_and=False, clause_mask=None):
                calls.append(reduce_and)
                return orig(
                    requests, terms, reduce_and=reduce_and, clause_mask=clause_mask
                )

            backend.probe_groups = spy
            files = dataset(n_files=2, rows_per_file=15)
            for rows in files:
                engine.ingest_rows(rows, timeout=TIMEOUT)
                engine.flush(timeout=TIMEOUT)

            # Implicit-AND builder query: fused on-device reduction.
            q = bs.new_query().token("common").field_token("svc", "svc1").build()
            got = sorted(
                r["n"] for r in engine.query_sync(q, timeout=TIMEOUT)
            )
            assert got == [r["n"] for f in files for r in f if r["svc"] == "svc1"]
            assert calls and calls[-1] is True

            # OR tree: falls back to host expression evaluation.
            q = bs.new_query().match(bs.or_(bs.token("w0_1"), bs.token("w1_2"))).build()
            got = sorted(r["n"] for r in engine.query_sync(q, timeout=TIMEOUT))
            expected = sorted(
                r["n"] for f in files for r in f
                if "w0_1" in r["msg"].split() or "w1_2" in r["msg"].split()
            )
            assert got == expected
            assert calls[-1] is False
        finally:
            engine.stop(timeout=TIMEOUT)

    def test_is_flat_and_detection(self):
        from bloomsearch_tpu.bloom.probe import is_flat_and_expression

        assert is_flat_and_expression(bs.token("x"))
        assert is_flat_and_expression(bs.and_(bs.token("x"), bs.field("f")))
        assert not is_flat_and_expression(bs.or_(bs.token("x"), bs.field("f")))
        assert not is_flat_and_expression(
            bs.and_(bs.token("x"), bs.or_(bs.field("f"), bs.token("y")))
        )
        assert not is_flat_and_expression(None)
