"""Experiment: attribute the probe kernel's gap to its achievable floor.

BENCH_r04: probe kernel 1.998 B probes/s vs a 2.31 B "achievable" floor
(sequential-stream HBM measured ~740 GB/s). But the kernel's access
pattern is NOT a sequential stream — it's index_map-steered DMAs of
(8, c_tile) row groups chosen by scalar-prefetched probe indices. This
script measures the speed of light FOR THAT PATTERN:

 1. stream_floor: sequential chunked reduce over the same bank (the 740
    GB/s number, re-measured).
 2. dma_floor: a Pallas kernel with the probe kernel's exact grid +
    BlockSpec (same index_map, same scalar prefetch, same revisit order)
    whose body does only `out |= row0` — one VPU op, no probe math. Any
    gap between this and stream_floor is the pattern cost (DMA issue
    rate, 8-row-group granularity, output-tile revisits), not the probe.
 3. probe kernel at c_tile {8192, 16384, 32768} — does a bigger tile
    close the gap?

All timings by chained-launch slope (lax.scan with optimization_barrier),
best-of-reps, same methodology as bench.py's kernel phase.

Usage: nohup python scripts/exp_kernel_floor.py > /tmp/exp_floor.log 2>&1 &
(claims the TPU; never run while bench.py is running)
"""

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(msg: str) -> None:
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main() -> None:
    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from bloomsearch_tpu.bloom import BloomParams
    from bloomsearch_tpu.bloom.pallas_kernels import (
        ROW_GROUP,
        probe_bank_pallas_tk,
        round_up_rows,
    )

    backend = jax.default_backend()
    log(f"backend={backend}")
    t0 = time.perf_counter()
    float(jnp.ones((8, 128)).sum())
    log(f"d2h warmup: {time.perf_counter() - t0:.0f}s")

    params = BloomParams(10_000, 0.001)
    w, k = params.num_words, params.k
    rows = round_up_rows(3 * w)
    T = 4
    num_blocks = 32_768 if backend == "tpu" else 2_048
    rng = np.random.default_rng(0)
    bank2d = jax.device_put(
        jnp.asarray(rng.integers(0, 2**32, size=(rows, num_blocks), dtype=np.uint32))
    )
    bank2d.block_until_ready()
    bank_gb = rows * num_blocks * 4 / 1e9
    log(f"bank: rows={rows} C={num_blocks} ({bank_gb:.2f} GB) T={T} k={k}")

    def slope(fn, n_small=32, n_large=2048, reps=5):
        """Per-launch seconds by chained-launch slope."""

        @jax.jit
        def chained(bank, frs, shs):
            def body(total, fs):
                fr_i, sh_i = fs
                fr_i, _ = jax.lax.optimization_barrier((fr_i, total))
                out = fn(bank, fr_i, sh_i)
                return total + out[0, 0] + out[-1, -1], ()

            total, _ = jax.lax.scan(body, jnp.zeros((), jnp.int32), (frs, shs))
            return total

        def run(n):
            frs = jnp.asarray(
                rng.integers(0, 3 * w, size=(n, T * k)).astype(np.int32)
            )
            shs = jnp.asarray(
                rng.integers(0, 32, size=(n, T * k)).astype(np.int32)
            )
            float(chained(bank2d, frs, shs))
            best = float("inf")
            for _ in range(reps):
                t0 = time.perf_counter()
                float(chained(bank2d, frs, shs))
                best = min(best, time.perf_counter() - t0)
            return best

        return (run(n_large) - run(n_small)) / (n_large - n_small)

    # --- 1. sequential stream floor -------------------------------------
    @jax.jit
    def stream_reduce(bank):
        return jnp.sum(bank, dtype=jnp.uint32)

    float(stream_reduce(bank2d))
    walls = []
    for _ in range(7):
        t0 = time.perf_counter()
        float(stream_reduce(bank2d))
        walls.append(time.perf_counter() - t0)
    # Single-launch fetch cost rides the tunnel RTT; subtract the measured
    # fetch floor like bench.py does for e2e.
    zero = jnp.zeros((8, 128))
    fetches = []
    for _ in range(7):
        t0 = time.perf_counter()
        float(zero.sum())
        fetches.append(time.perf_counter() - t0)
    rtt = statistics.median(fetches)
    stream_s = statistics.median(walls) - rtt
    stream_gbps = bank_gb / stream_s
    log(f"stream floor: {stream_gbps:.0f} GB/s (rtt {rtt*1e3:.1f} ms)")

    # --- 2. DMA-pattern floor kernel ------------------------------------
    def make_dma_kernel(c_tile: int):
        def kernel(idx_ref, shift_ref, group_ref, out_ref):
            t = pl.program_id(1)
            j = pl.program_id(2)
            row0 = group_ref[0, :].astype(jnp.int32)

            @pl.when(j == 0)
            def _():
                out_ref[t, :] = row0

            @pl.when(j > 0)
            def _():
                out_ref[t, :] = out_ref[t, :] | row0

        def call(bank, fr, sh):
            R, C = bank.shape
            ct = min(c_tile, C)
            if C % ct:
                ct = C
            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=(C // ct, T, k),
                in_specs=[
                    pl.BlockSpec(
                        (ROW_GROUP, ct),
                        lambda c, t, j, idx_ref, shift_ref: (
                            idx_ref[t * k + j] // ROW_GROUP,
                            c,
                        ),
                        memory_space=pltpu.VMEM,
                    ),
                ],
                out_specs=pl.BlockSpec(
                    (T, ct),
                    lambda c, t, j, idx_ref, shift_ref: (0, c),
                    memory_space=pltpu.VMEM,
                ),
            )
            return pl.pallas_call(
                kernel,
                grid_spec=grid_spec,
                out_shape=jax.ShapeDtypeStruct((T, C), jnp.int32),
                cost_estimate=pl.CostEstimate(
                    flops=T * k * C,
                    bytes_accessed=T * k * C * 4 * ROW_GROUP + T * C * 4,
                    transcendentals=0,
                ),
            )(fr, sh, bank)

        return call

    traffic_bytes = 8 * T * k * num_blocks * 4  # per launch, input side

    for ct in (8192, 16384, 32768):
        try:
            per = slope(make_dma_kernel(ct))
            gbps = traffic_bytes / per / 1e9
            probes_equiv = T * num_blocks / per / 1e9
            log(
                f"dma floor c_tile={ct}: {per*1e6:.1f} us/launch = "
                f"{gbps:.0f} GB/s fetched = {probes_equiv:.3f} B probes/s equiv"
            )
        except Exception as exc:
            log(f"dma floor c_tile={ct} failed: {exc!r}")

    # --- 3. real probe kernel, c_tile sweep -----------------------------
    for ct in (8192, 16384, 32768):
        try:
            per = slope(
                lambda bank, fr, sh, _ct=ct: probe_bank_pallas_tk(
                    bank, fr, sh, T, k, c_tile=_ct
                )
            )
            log(
                f"probe c_tile={ct}: {per*1e6:.1f} us/launch = "
                f"{T * num_blocks / per / 1e9:.3f} B probes/s"
            )
        except Exception as exc:
            log(f"probe c_tile={ct} failed: {exc!r}")


if __name__ == "__main__":
    main()
