"""Oracle fuzz: random engine operation sequences vs a naive reference.

The oracle keeps every ingested row in memory and evaluates queries with the
exact row-verification semantics (tokenizer.py — the semantic spec). The
engine, with its bloom pruning, candidate scans, merges, partitions, and
minmax indexes, must return exactly the oracle's rows: any false negative
(over-pruning) or false positive (under-verification) fails the fuzz.
"""

import json
import random
import string

import pytest

import bloomsearch_tpu as bs
from bloomsearch_tpu.query import and_bloom_queries  # noqa: F401 (doc import)
from bloomsearch_tpu.tokenizer import (
    basic_whitespace_lower_tokenizer,
    compile_regex_query,
    row_matches_query,
)

TIMEOUT = 20.0

WORDS = [
    "alpha", "bravo", "Charlie", "delta", "écho", "fox-7", "golf", "42",
    "true", "hotel india", "x", "",
]
FIELDS = ["svc", "msg", "level", "nested", "num", "arr"]


def random_row(rng: random.Random, i: int) -> dict:
    row = {"id": i, "part": f"{rng.randrange(3)}"}
    for _ in range(rng.randrange(1, 4)):
        f = rng.choice(FIELDS)
        r = rng.random()
        if f == "nested" or r < 0.15:
            row["nested"] = {"inner": rng.choice(WORDS)}
        elif f == "arr" or r < 0.3:
            row["arr"] = [rng.choice(WORDS) for _ in range(rng.randrange(1, 3))]
        elif f == "num" or r < 0.45:
            row["num"] = rng.choice([rng.randrange(-50, 50), rng.uniform(-5, 5), 1e16])
        else:
            row[f] = " ".join(rng.choice(WORDS) for _ in range(rng.randrange(1, 3)))
    return row


def random_query(rng: random.Random):
    builder = bs.new_query()
    kind = rng.random()
    def _random_token():
        tokens = rng.choice(WORDS).lower().split()
        return bs.token(tokens[0] if tokens else "alpha")

    leaf_makers = [
        _random_token,
        lambda: bs.field(rng.choice(["svc", "msg", "nested.inner", "arr", "num", "absent"])),
        lambda: bs.field_token(rng.choice(["svc", "msg", "nested.inner"]), rng.choice(["alpha", "bravo", "charlie", "zzz"])),
    ]

    def leaf():
        return rng.choice(leaf_makers)()

    if kind < 0.4:
        builder.token(rng.choice(["alpha", "bravo", "charlie", "écho", "42", "true", "zzz"]))
    elif kind < 0.6:
        builder.match(bs.or_(leaf(), bs.and_(leaf(), leaf())))
    elif kind < 0.8:
        builder.field_token("svc", rng.choice(["alpha", "bravo", "x"]))
        builder.token(rng.choice(["alpha", "delta", "golf"]))
    else:
        builder.match(bs.or_(leaf(), leaf(), leaf()))
    if rng.random() < 0.3:
        builder.field_regex(rng.choice(["msg", "svc", "nested.inner"]), rng.choice(["^al", "a.*a", "7$", "zzz"]))
    if rng.random() < 0.25:
        builder.match_prefilter(bs.partition(bs.partition_in("0", "1")))
    if rng.random() < 0.25:
        builder.match_prefilter(bs.min_max("num", bs.numeric_between(-10, 20)))
    return builder.build()


def _has_minmax_condition(expr) -> bool:
    from bloomsearch_tpu.query import PrefilterConditionType, PrefilterExprType

    if expr is None:
        return False
    if expr.expression_type == PrefilterExprType.CONDITION:
        return (
            expr.condition is not None
            and expr.condition.condition_type == PrefilterConditionType.MINMAX
        )
    return any(_has_minmax_condition(c) for c in expr.children)


def oracle_results(all_rows, q, apply_prefilter=True):
    """Rows matching bloom+regex, optionally with the per-row prefilter.

    Minmax prefilters prune at BLOCK granularity in the engine (reference
    semantics — a passing block returns all its bloom-matching rows, even
    ones whose own value is outside the range), so for queries with minmax
    conditions the engine's exact result set depends on physical block
    boundaries. The fuzz asserts subset bounds in that case:
    oracle(with per-row prefilter)  ⊆  engine  ⊆  oracle(no prefilter).
    Partition prefilters ARE row-exact (a block's partition is its rows').
    """
    compiled = compile_regex_query(q.regex)
    out = []
    for row in all_rows:
        parsed = json.loads(json.dumps(row))
        if apply_prefilter and not _row_passes_prefilter(row, q.prefilter):
            continue
        if row_matches_query(parsed, q.bloom, compiled, ".", basic_whitespace_lower_tokenizer):
            out.append(row)
    return out


def _row_passes_prefilter(row, prefilter):
    from bloomsearch_tpu.minmax import MinMaxIndex, convert_to_min_max_int64
    from bloomsearch_tpu.query import evaluate_data_block_metadata

    class _Meta:
        partition_id = row.get("part", "")
        min_max_indexes = {}

    bounds = convert_to_min_max_int64(row.get("num")) if "num" in row else None
    if bounds is not None:
        _Meta.min_max_indexes = {"num": MinMaxIndex(*bounds)}
    return evaluate_data_block_metadata(_Meta, prefilter)


def _check(engine, all_rows, q, label):
    got = sorted(r["id"] for r in engine.query_sync(q, timeout=TIMEOUT))
    if _has_minmax_condition(q.prefilter.expression if q.prefilter else None):
        lower = sorted(r["id"] for r in oracle_results(all_rows, q, apply_prefilter=True))
        upper = sorted(r["id"] for r in oracle_results(all_rows, q, apply_prefilter=False))
        assert set(lower) <= set(got), f"{label}: FALSE NEGATIVES {set(lower)-set(got)}\nquery={q}"
        assert set(got) <= set(upper), f"{label}: impossible rows {set(got)-set(upper)}\nquery={q}"
    else:
        expected = sorted(r["id"] for r in oracle_results(all_rows, q))
        assert got == expected, f"{label}: engine {got} != oracle {expected}\nquery={q}"


def _weird_json(rng: random.Random, value) -> str:
    """Serialize to VALID but non-canonical JSON text.

    Exercises the verbatim-bytes soundness rules: \\uXXXX escapes of
    printable ASCII, escaped solidus, and legal-but-different number
    spellings ("1e2" for 100) — exactly the spellings whose bytes need
    not contain their tokens (scan.py rows_canonical / _numeric_unsafe).
    The oracle parses these same bytes, so engine-vs-oracle equality
    still means zero false negatives AND zero false positives.
    """
    if isinstance(value, bool):
        return "true" if value else "false"
    if isinstance(value, int):
        pick = rng.random()
        if pick < 0.25:
            return f"{value}e0"  # parses as float(value)
        if pick < 0.5:
            return f"{value}.0"
        return str(value)
    if isinstance(value, float):
        # random_row floats are finite; repr/exponent forms are valid JSON.
        if rng.random() < 0.4:
            return f"{value:.6e}"
        return repr(value)
    if isinstance(value, str):
        out = ['"']
        for ch in value:
            o = ord(ch)
            if ch in '"\\':
                out.append("\\" + ch)
            elif o < 0x20:
                out.append(f"\\u{o:04x}")
            elif ch == "/" and rng.random() < 0.5:
                out.append("\\/")
            elif o < 128 and ch.isalpha() and rng.random() < 0.15:
                out.append(f"\\u{o:04x}")
            elif o >= 128:
                out.append(json.dumps(ch)[1:-1])  # \uXXXX (+ surrogate pairs)
            else:
                out.append(ch)
        out.append('"')
        return "".join(out)
    if isinstance(value, dict):
        return (
            "{"
            + ",".join(
                f"{_weird_json(rng, k)}:{_weird_json(rng, v)}"
                for k, v in value.items()
            )
            + "}"
        )
    if isinstance(value, list):
        return "[" + ",".join(_weird_json(rng, v) for v in value) + "]"
    raise TypeError(f"unserializable fuzz value: {value!r}")


def run_fuzz(tmp_path, seed, store_kind, backend, serialized_frac=0.0):
    """One randomized engine-vs-oracle episode (shared by tests + soak)."""
    rng = random.Random(seed)
    if store_kind == "fs":
        store = bs.FileSystemDataStore(str(tmp_path / "data"))
        meta_store = data_store = store
    else:
        from bloomsearch_tpu.objectstore import (
            InMemoryObjectStore,
            ObjectStoreDataStore,
            ObjectStoreMetaStore,
        )

        client = InMemoryObjectStore()
        data_store = ObjectStoreDataStore(client)
        meta_store = ObjectStoreMetaStore(client)
    config = bs.BloomSearchEngineConfig(
        row_data_compression=rng.choice(["none", "zstd", "snappy"]),
        partition_func=lambda r: r["part"],
        min_max_indexes=["num"],
        probe_backend="device" if backend == "serving" else backend,
        row_cache_bytes=(64 << 20) if backend == "serving" else 0,
        max_buffered_rows=rng.choice([50, 1000]),
        bloom_layout=rng.choice(["classic", "blocked256"]),
    )
    engine = bs.BloomSearchEngine(config, meta_store, data_store)
    engine.start()
    all_rows: list[dict] = []
    next_id = 0
    try:
        for step in range(12):
            op = rng.random()
            if op < 0.5 or not all_rows:
                batch = [random_row(rng, next_id + j) for j in range(rng.randrange(5, 40))]
                next_id += len(batch)
                if rng.random() < serialized_frac:
                    # Verbatim fast lane: one explicit partition per batch
                    # (partition_func configured => partition_id required),
                    # rows serialized with non-canonical spellings. The
                    # oracle sees the PARSED bytes — what the engine must
                    # return.
                    part = f"{rng.randrange(3)}"
                    for r in batch:
                        r["part"] = part
                    payload = [
                        _weird_json(rng, r).encode("utf-8") for r in batch
                    ]
                    all_rows.extend(json.loads(b) for b in payload)
                    engine.ingest_serialized(
                        payload, timeout=TIMEOUT, partition_id=part
                    )
                else:
                    all_rows.extend(batch)
                    engine.ingest_rows(batch, timeout=TIMEOUT)
                engine.flush(timeout=TIMEOUT)
            elif op < 0.65:
                engine.merge()
            else:
                q = random_query(rng)
                _check(engine, all_rows, q, f"seed={seed} step={step}")
        # Final sweep: several queries against the final state.
        engine.merge()
        for _ in range(8):
            q = random_query(rng)
            _check(engine, all_rows, q, f"seed={seed} final")
    finally:
        engine.stop(timeout=TIMEOUT)


@pytest.mark.parametrize(
    "seed,store_kind,backend",
    [
        (7, "fs", "host"),
        (23, "fs", "host"),
        (99, "fs", "host"),
        (7, "object", "host"),
        (42, "object", "host"),
        # Sharded device probe path (8-device CPU mesh) + fused flat-AND +
        # cross-query batching must ALSO be oracle-exact.
        (13, "fs", "device"),
        (57, "object", "device"),
        # Serving mode: mesh-sharded row cache + batched planner scans.
        (31, "fs", "serving"),
    ],
)
def test_engine_matches_oracle(tmp_path, seed, store_kind, backend):
    run_fuzz(tmp_path, seed, store_kind, backend)


@pytest.mark.parametrize(
    "seed,store_kind,backend",
    [
        # Mixed verbatim fast-lane ingest with non-canonical spellings:
        # stresses rows_canonical gating (numeric needles must not prune
        # verbatim blocks), byte-level minmax extraction, and the
        # always-candidate escape rules across probe backends.
        (311, "fs", "host"),
        (313, "fs", "device"),
        (317, "fs", "serving"),
    ],
)
def test_engine_matches_oracle_serialized_mix(tmp_path, seed, store_kind, backend):
    run_fuzz(tmp_path, seed, store_kind, backend, serialized_frac=0.6)
