"""CNF compilation of bloom expressions + fused device clause evaluation.

Arbitrary monotone AND/OR trees must evaluate on-device identically to the
host evaluate_match_expression spec (reference semantics
bloom_tree_engine.go:854-870: empty OR false, empty AND true, nil passes).
"""

import random

import numpy as np
import pytest

import bloomsearch_tpu as bs
from bloomsearch_tpu.bloom.probe import (
    MAX_CNF_CLAUSES,
    compile_bloom_terms,
    compile_cnf_clauses,
    evaluate_cnf_mask,
    evaluate_match_expression,
)

TIMEOUT = 20.0


def _random_tree(rng: random.Random, depth: int = 0):
    r = rng.random()
    if depth >= 3 or r < 0.45:
        kind = rng.randrange(3)
        if kind == 0:
            return bs.field(f"f{rng.randrange(6)}")
        if kind == 1:
            return bs.token(f"t{rng.randrange(6)}")
        return bs.field_token(f"f{rng.randrange(4)}", f"t{rng.randrange(4)}")
    children = [_random_tree(rng, depth + 1) for _ in range(rng.randrange(1, 4))]
    return bs.or_(*children) if r < 0.75 else bs.and_(*children)


class TestCnfCompilation:
    @pytest.mark.parametrize("seed", [1, 7, 42, 99, 1234])
    def test_matches_expression_evaluation(self, seed):
        rng = random.Random(seed)
        np_rng = np.random.default_rng(seed)
        for _ in range(60):
            q = bs.new_query().match(_random_tree(rng)).build()
            terms = compile_bloom_terms(q.bloom)
            mask = compile_cnf_clauses(q.bloom.expression, terms)
            match = np_rng.random((len(terms), 37)) < 0.5
            expected = evaluate_match_expression(
                q.bloom.expression, terms, match, 37
            )
            if mask is None:
                continue  # blowup: host fallback, nothing to compare
            got = evaluate_cnf_mask(mask, match)
            np.testing.assert_array_equal(got, np.asarray(expected))

    def test_flat_and_is_identity(self):
        q = bs.new_query().token("a").token("b").field("f").build()
        terms = compile_bloom_terms(q.bloom)
        mask = compile_cnf_clauses(q.bloom.expression, terms)
        np.testing.assert_array_equal(mask, np.eye(3, dtype=bool))

    def test_or_is_single_clause(self):
        q = bs.new_query().match(bs.or_(bs.token("a"), bs.token("b"))).build()
        terms = compile_bloom_terms(q.bloom)
        mask = compile_cnf_clauses(q.bloom.expression, terms)
        np.testing.assert_array_equal(mask, np.ones((1, 2), dtype=bool))

    def test_or_of_ands_distributes(self):
        q = bs.new_query().match(
            bs.or_(bs.and_(bs.token("a"), bs.token("b")),
                   bs.and_(bs.token("c"), bs.token("d")))
        ).build()
        terms = compile_bloom_terms(q.bloom)
        mask = compile_cnf_clauses(q.bloom.expression, terms)
        assert mask is not None and mask.shape == (4, 4)
        match = np.array([[1, 1, 0, 0], [0, 0, 1, 1], [1, 0, 0, 1], [0, 0, 0, 0]],
                         dtype=bool).T  # [T=4 terms, B=4 blocks]
        got = evaluate_cnf_mask(mask, match)
        np.testing.assert_array_equal(got, [True, True, False, False])

    def test_blowup_returns_none(self):
        # OR of 8 ANDs of 3 distinct terms each -> 3^8 = 6561 clauses >> cap.
        ands = [
            bs.and_(*[bs.token(f"t{i}_{j}") for j in range(3)]) for i in range(8)
        ]
        q = bs.new_query().match(bs.or_(*ands)).build()
        terms = compile_bloom_terms(q.bloom)
        assert compile_cnf_clauses(q.bloom.expression, terms) is None
        assert MAX_CNF_CLAUSES < 3**8

    def test_absorption_minimizes(self):
        # a AND (a OR b) == a: the (a|b) clause is absorbed by {a}.
        q = bs.new_query().match(
            bs.and_(bs.token("a"), bs.or_(bs.token("a"), bs.token("b")))
        ).build()
        terms = compile_bloom_terms(q.bloom)
        mask = compile_cnf_clauses(q.bloom.expression, terms)
        assert mask.shape[0] == 1


class TestDeviceClauseFusion:
    def _engine(self, tmp_path, **overrides):
        store = bs.FileSystemDataStore(str(tmp_path / "data"))
        config = bs.BloomSearchEngineConfig(
            row_data_compression="none", probe_backend="device", **overrides
        )
        engine = bs.BloomSearchEngine(config, store, store)
        engine.start()
        return engine, store

    def test_or_query_fused_on_device(self, tmp_path):
        engine, store = self._engine(tmp_path)
        try:
            rows = [{"n": i, "w": f"word{i}", "grp": f"g{i % 5}"} for i in range(300)]
            engine.ingest_rows(rows, timeout=TIMEOUT)
            engine.flush(timeout=TIMEOUT)
            q = bs.new_query().match(
                bs.or_(bs.token("word17"), bs.and_(bs.token("word42"), bs.field("grp")))
            ).build()
            got = engine.query_sync(q, timeout=TIMEOUT)
            assert sorted(r["n"] for r in got) == [17, 42]
            # Nested OR-of-ANDs shape.
            q2 = bs.new_query().match(
                bs.or_(
                    bs.and_(bs.field_token("grp", "g3"), bs.token("word3")),
                    bs.and_(bs.field_token("grp", "g4"), bs.token("word9")),
                )
            ).build()
            got2 = engine.query_sync(q2, timeout=TIMEOUT)
            assert sorted(r["n"] for r in got2) == [3, 9]
        finally:
            engine.stop(timeout=TIMEOUT)

    def test_blowup_shape_still_exact_on_device(self, tmp_path):
        engine, store = self._engine(tmp_path)
        try:
            rows = [{"n": i, "w": f"word{i}"} for i in range(100)]
            engine.ingest_rows(rows, timeout=TIMEOUT)
            engine.flush(timeout=TIMEOUT)
            ands = [
                bs.and_(bs.token(f"none{i}a"), bs.token(f"none{i}b"), bs.token(f"none{i}c"))
                for i in range(7)
            ] + [bs.and_(bs.token("word5"), bs.field("w"), bs.field("n"))]
            q = bs.new_query().match(bs.or_(*ands)).build()
            got = engine.query_sync(q, timeout=TIMEOUT)
            assert [r["n"] for r in got] == [5]
        finally:
            engine.stop(timeout=TIMEOUT)
