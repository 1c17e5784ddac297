"""Multi-chip sharded probe over the virtual 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp

import bloomsearch_tpu as bs
from bloomsearch_tpu.bloom import BloomParams
from bloomsearch_tpu.bloom.probe import compile_bloom_terms, probe_bank_host
from bloomsearch_tpu.parallel import (
    default_mesh,
    shard_bank,
    sharded_probe_packed,
    sharded_query_step,
    unpack_bitmap,
)
from bloomsearch_tpu.file_format import BloomFilters
from bloomsearch_tpu.bloom.probe import stack_filter_bank

PARAMS = BloomParams(500, 0.01)


def build_host_bank(num_blocks: int):
    triples = []
    for i in range(num_blocks):
        t = BloomFilters.from_params(PARAMS)
        t.field.add_keys([f"field{i}"])
        t.token.add_keys([f"tok{i}", "shared"])
        t.field_token.add_keys([f"field{i}::tok{i}"])
        triples.append(t)
    return stack_filter_bank(triples)  # [3, W, B]


def flat_probes(terms):
    W = PARAMS.num_words
    word_idx, bit_idx = terms.positions_for(PARAMS.m_bits, PARAMS.k)
    rows = (terms.ks_idx[:, None].astype(np.int32) * W + word_idx).reshape(-1)
    return rows, bit_idx.reshape(-1)


class TestShardedProbe:
    def test_eight_device_mesh_available(self):
        assert len(jax.devices()) == 8

    def test_sharded_probe_matches_host(self):
        num_blocks = 50
        bank = build_host_bank(num_blocks)
        mesh = default_mesh()
        bank2d = shard_bank(mesh, bank.reshape(3 * PARAMS.num_words, num_blocks))

        q = bs.new_query().token("shared").field("field7").build()
        terms = compile_bloom_terms(q.bloom)
        rows, shifts = flat_probes(terms)
        T = len(terms)

        packed = sharded_probe_packed(
            mesh, bank2d, jnp.asarray(rows), jnp.asarray(shifts), T, PARAMS.k
        )
        match = unpack_bitmap(np.asarray(packed), num_blocks)
        expected = probe_bank_host(bank, terms, PARAMS.m_bits, PARAMS.k)
        np.testing.assert_array_equal(match, expected)
        # "shared" present in every block; "field7" only in block 7.
        assert match[0].all()
        assert match[1].sum() == 1 and match[1][7]

    def test_sharded_query_step_and_reduction(self):
        num_blocks = 40
        bank = build_host_bank(num_blocks)
        mesh = default_mesh()
        bank2d = shard_bank(mesh, bank.reshape(3 * PARAMS.num_words, num_blocks))

        q = bs.new_query().token("shared").field_token("field3", "tok3").build()
        terms = compile_bloom_terms(q.bloom)
        rows, shifts = flat_probes(terms)
        T = len(terms)
        and_mask = jnp.ones(T, dtype=bool)

        packed, total = sharded_query_step(
            mesh,
            bank2d,
            jnp.asarray(rows),
            jnp.asarray(shifts),
            and_mask,
            T,
            PARAMS.k,
        )
        survivors = unpack_bitmap(np.asarray(packed)[None, :], num_blocks)[0]
        expected = probe_bank_host(bank, terms, PARAMS.m_bits, PARAMS.k).all(axis=0)
        np.testing.assert_array_equal(survivors, expected)
        assert int(total) == int(expected.sum())
        assert survivors[3] and survivors.sum() == 1

    def test_partial_mesh(self):
        # Sharding must work on any device count, not just the full host.
        num_blocks = 10
        bank = build_host_bank(num_blocks)
        mesh = default_mesh(n_devices=4)
        bank2d = shard_bank(mesh, bank.reshape(3 * PARAMS.num_words, num_blocks))
        q = bs.new_query().token("shared").build()
        terms = compile_bloom_terms(q.bloom)
        rows, shifts = flat_probes(terms)
        packed = sharded_probe_packed(
            mesh, bank2d, jnp.asarray(rows), jnp.asarray(shifts), len(terms), PARAMS.k
        )
        match = unpack_bitmap(np.asarray(packed), num_blocks)
        assert match[0].all()
