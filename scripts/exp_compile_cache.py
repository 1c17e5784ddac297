"""Experiment: persistent jit-cache behavior through the axon tunnel.

Answers three questions that shape the restart/warmup design:
 1. Does ~/.cache/bloomsearch-tpu-jit populate and hit across processes?
 2. Does .lower().compile() (AOT, no execution) prepopulate the cache so a
    later plain call is fast?
 3. How long is a cached re-read vs a cold compile for a representative
    probe program?

Run twice: first run = cold compiles, second run = should be all hits.
Usage: python scripts/exp_compile_cache.py [aot]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(msg: str) -> None:
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main() -> None:
    aot = "aot" in sys.argv[1:]
    import numpy as np
    import jax
    import jax.numpy as jnp

    from bloomsearch_tpu.bloom.bank import _enable_persistent_jit_cache
    from bloomsearch_tpu.bloom import pallas_kernels as pk

    _enable_persistent_jit_cache(jax)
    cache_dir = jax.config.jax_compilation_cache_dir
    log(f"backend={jax.default_backend()} cache_dir={cache_dir}")
    log(f"cache entries before: {len(os.listdir(cache_dir)) if cache_dir and os.path.isdir(cache_dir) else 0}")

    t0 = time.perf_counter()
    float(jnp.ones((8, 128)).sum())
    log(f"d2h warmup: {time.perf_counter() - t0:.1f}s")

    rng = np.random.default_rng(0)
    rows = pk.round_up_rows(3 * 4494)
    bank = jnp.asarray(rng.integers(0, 2**32, size=(rows, 512), dtype=np.uint32))
    bank.block_until_ready()

    # Three distinct programs (distinct T so each is its own compile).
    # AOT mode uses T values not exercised by the plain mode, so its
    # programs are cold in the persistent cache on first AOT run.
    for T in (3, 5, 6) if aot else (2, 4, 8):
        fr = jnp.asarray(rng.integers(0, rows, size=(T * 10,)).astype(np.int32))
        sh = jnp.asarray(rng.integers(0, 32, size=(T * 10,)).astype(np.int32))
        if aot:
            t0 = time.perf_counter()
            lowered = pk.probe_bank_pallas_tk.lower(bank, fr, sh, T, 10)
            compiled = lowered.compile()
            log(f"T={T}: AOT lower+compile {time.perf_counter() - t0:.2f}s")
            t0 = time.perf_counter()
            out = pk.probe_bank_pallas_tk(bank, fr, sh, T, 10)
            float(out.sum())
            log(f"T={T}: plain call after AOT {time.perf_counter() - t0:.2f}s")
        else:
            t0 = time.perf_counter()
            out = pk.probe_bank_pallas_tk(bank, fr, sh, T, 10)
            float(out.sum())
            log(f"T={T}: first call (compile+exec) {time.perf_counter() - t0:.2f}s")
        t0 = time.perf_counter()
        out = pk.probe_bank_pallas_tk(bank, fr, sh, T, 10)
        float(out.sum())
        log(f"T={T}: warm call {time.perf_counter() - t0:.3f}s")

    log(f"cache entries after: {len(os.listdir(cache_dir)) if cache_dir and os.path.isdir(cache_dir) else 0}")


if __name__ == "__main__":
    main()
