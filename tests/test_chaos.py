"""Concurrency chaos: ingest + queries + merges all at once, then exactness.

Guards the interacting machinery (flush pipeline, deferred tombstones, bank
caches, lease-less merges) against deadlocks and corruption under load.
"""

import queue
import random
import threading

import pytest

import bloomsearch_tpu as bs

# Generous: the kitchen-sink variant jit-compiles sharded probe programs on
# a 1-core container, and under full-suite load compile storms alone can eat
# tens of seconds. A real deadlock still fails — just later.
TIMEOUT = 120.0


@pytest.mark.parametrize("store_kind", ["fs", "object"])
def test_concurrent_ingest_query_merge(tmp_path, store_kind):
    if store_kind == "fs":
        store = bs.FileSystemDataStore(str(tmp_path / "data"))
        meta_store = data_store = store
    else:
        client = bs.InMemoryObjectStore()
        meta_store = bs.ObjectStoreMetaStore(client)
        data_store = bs.ObjectStoreDataStore(client)
    config = bs.BloomSearchEngineConfig(
        row_data_compression="snappy",
        probe_backend="host",
        max_buffered_rows=200,
        merge_interval_seconds=0.1,  # background compaction churning
    )
    engine = bs.BloomSearchEngine(config, meta_store, data_store)
    engine.start()
    errors: list[BaseException] = []
    total_rows = 3000
    try:
        def ingester():
            rng = random.Random(1)
            try:
                for i in range(0, total_rows, 100):
                    engine.ingest_rows(
                        [
                            {"n": i + j, "w": f"w{(i + j) % 97}", "tag": "chaos"}
                            for j in range(100)
                        ],
                        timeout=TIMEOUT,
                    )
            except BaseException as exc:
                errors.append(exc)

        def querier():
            rng = random.Random(2)
            try:
                for _ in range(25):
                    q = bs.new_query().token(f"w{rng.randrange(97)}").build()
                    result_q: queue.Queue = queue.Queue()
                    error_q: queue.Queue = queue.Queue()
                    engine.query(q, result_q, error_q)
                    while result_q.get(timeout=TIMEOUT) is not None:
                        pass
                    if not error_q.empty():
                        errors.append(error_q.get_nowait())
            except BaseException as exc:
                errors.append(exc)

        threads = [threading.Thread(target=ingester, daemon=True)] + [
            threading.Thread(target=querier, daemon=True) for _ in range(3)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join(TIMEOUT)
            assert not t.is_alive(), "chaos thread deadlocked"
        assert not errors, f"chaos errors: {errors[:3]}"

        engine.flush(timeout=TIMEOUT)
        # Exactness after the dust settles: every row present exactly once.
        rows = engine.query_sync(bs.new_query().token("chaos").build(), timeout=TIMEOUT)
        assert sorted(r["n"] for r in rows) == list(range(total_rows))
    finally:
        engine.stop(timeout=TIMEOUT)


def test_kitchen_sink_chaos(tmp_path):
    """Everything on at once: sharded device backend, serving-mode row
    cache, auto block sizing, background merge, sparse cold probes (forced),
    TTL predicate, concurrent ingest + queries. Ends with an exactness
    sweep — the machinery may race, the answers may not."""
    import bloomsearch_tpu.engine as eng_mod

    store = bs.FileSystemDataStore(str(tmp_path / "data"))
    config = bs.BloomSearchEngineConfig(
        row_data_compression="snappy",
        probe_backend="device",           # 8-way sharded superbanks (CPU mesh)
        row_cache_bytes=256 << 20,        # serving mode
        block_bloom_expected_items="auto",
        max_buffered_rows=300,
        merge_interval_seconds=0.1,
        ttl_predicate=bs.prefilter_expiry(bs.partition(bs.partition_equals("expired"))),
        partition_func=lambda r: r.get("part", ""),
    )
    engine = bs.BloomSearchEngine(config, store, store)
    orig_sparse = eng_mod.SPARSE_BANK_BYTES
    eng_mod.SPARSE_BANK_BYTES = 0  # every cold group takes the sparse path
    engine.start()
    errors: list[BaseException] = []
    total_rows = 1500
    try:
        def ingester():
            try:
                for i in range(0, total_rows, 100):
                    batch = [
                        {"n": i + j, "w": f"w{(i + j) % 53}", "tag": "live", "part": "keep"}
                        for j in range(100)
                    ]
                    batch.append({"junk": i, "part": "expired", "tag": "doomed"})
                    engine.ingest_rows(batch, timeout=TIMEOUT)
            except BaseException as exc:
                errors.append(exc)

        def querier(seed):
            rng = random.Random(seed)
            try:
                for _ in range(15):
                    q = bs.new_query().token(f"w{rng.randrange(53)}").build()
                    result_q: queue.Queue = queue.Queue()
                    error_q: queue.Queue = queue.Queue()
                    engine.query(q, result_q, error_q)
                    while result_q.get(timeout=TIMEOUT) is not None:
                        pass
                    if not error_q.empty():
                        errors.append(error_q.get_nowait())
            except BaseException as exc:
                errors.append(exc)

        threads = [threading.Thread(target=ingester, daemon=True)] + [
            threading.Thread(target=querier, args=(s,), daemon=True) for s in (1, 2, 3)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join(TIMEOUT)
            assert not t.is_alive(), "chaos thread deadlocked"
        assert not errors, f"chaos errors: {errors[:3]}"

        engine.flush(timeout=TIMEOUT)
        rows = engine.query_sync(bs.new_query().token("live").build(), timeout=TIMEOUT)
        assert sorted(r["n"] for r in rows) == list(range(total_rows))
        # TTL predicate drops the expired partition during merges (some may
        # already be gone; force one more pass then check).
        engine.merge()
        doomed = engine.query_sync(bs.new_query().token("doomed").build(), timeout=TIMEOUT)
        assert doomed == []
        # The mesh really is under the superbanks.
        for sb in engine._device_backend._superbanks.values():
            assert len(sb.bank2d.sharding.device_set) == 8
    finally:
        eng_mod.SPARSE_BANK_BYTES = orig_sparse
        engine.stop(timeout=TIMEOUT)
