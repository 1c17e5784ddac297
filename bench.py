"""Headline benchmark: bloom probe throughput per chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The probed metric is membership probes/sec/chip on an HBM-resident filter
bank at the reference's default block bloom params (10k rows @ 0.1% FPR ->
m=143776, k=10; bloom_tree_engine.go:204-229). The north-star target is 1e9
probes/sec/chip (BASELINE.md), so vs_baseline = value / 1e9.

Methodology: the per-launch time is measured as the slope between chained
executions of N_small and N_large distinct probe batches inside single jit
programs, with completion forced by fetching a data-dependent scalar. This
removes host dispatch and (on tunneled TPU setups) transfer-handshake
overhead from the measurement. Diagnostics go to stderr; stdout carries only
the JSON line.
"""

import json
import sys
import time


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def main() -> None:
    import numpy as np
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, ".")
    from bloomsearch_tpu.bloom import BloomParams
    from bloomsearch_tpu.bloom.pallas_kernels import (
        probe_bank_pallas_tk,
        probe_bank_xla,
        round_up_rows,
    )

    backend = jax.default_backend()
    use_pallas = backend == "tpu"
    log(f"backend={backend} use_pallas={use_pallas}")

    # Warm up device->host transfer (first d2h through a TPU tunnel can take
    # minutes; all timed sections below depend on fast value fetches).
    t0 = time.perf_counter()
    float(jnp.ones((8, 128)).sum())
    log(f"d2h warmup: {time.perf_counter() - t0:.0f}s")

    params = BloomParams(10_000, 0.001)
    w = params.num_words
    rows = round_up_rows(3 * w)
    k = params.k
    t_terms = 4

    # Bank sized to the platform: ~1.8 GB on TPU, small on CPU.
    num_blocks = 32_768 if backend == "tpu" else 2_048
    rng = np.random.default_rng(0)
    bank2d = jax.device_put(
        jnp.asarray(rng.integers(0, 2**32, size=(rows, num_blocks), dtype=np.uint32))
    )
    bank2d.block_until_ready()
    log(f"bank uploaded: rows={rows} blocks={num_blocks} ({rows * num_blocks * 4 / 1e9:.2f} GB)")

    def probe(bank, fr, sh):
        if use_pallas:
            return probe_bank_pallas_tk(bank, fr, sh, t_terms, k)
        return probe_bank_xla(bank, fr, sh, k).astype(jnp.int32)

    def make_chained(n):
        @jax.jit
        def chained(bank, frs, shs):
            total = jnp.zeros((), jnp.int32)
            for i in range(n):
                # Serialize launches: without the barrier XLA may overlap
                # independent kernels and the slope under-counts per-launch
                # time (observed: impossible >HBM-bandwidth readings).
                fr_i, _ = jax.lax.optimization_barrier((frs[i], total))
                out = probe(bank, fr_i, shs[i])
                total = total + out[0, 0] + out[-1, -1]
            return total

        return chained

    def run(n: int) -> float:
        frs = jnp.asarray(rng.integers(0, 3 * w, size=(n, t_terms * k)).astype(np.int32))
        shs = jnp.asarray(rng.integers(0, 32, size=(n, t_terms * k)).astype(np.int32))
        fn = make_chained(n)
        float(fn(bank2d, frs, shs))  # compile + warm
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(fn(bank2d, frs, shs))
            best = min(best, time.perf_counter() - t0)
        return best

    n_small, n_large = 4, 128
    t_small = run(n_small)
    t_large = run(n_large)
    per_launch = max((t_large - t_small) / (n_large - n_small), 1e-9)
    probes_per_sec = t_terms * num_blocks / per_launch
    log(
        f"per-launch: {per_launch * 1e6:.1f} us | {probes_per_sec / 1e9:.3f} B probes/s"
    )

    print(
        json.dumps(
            {
                "metric": "bloom_probes_per_sec_per_chip",
                "value": probes_per_sec,
                "unit": "probes/s",
                "vs_baseline": probes_per_sec / 1e9,
            }
        )
    )


if __name__ == "__main__":
    main()
