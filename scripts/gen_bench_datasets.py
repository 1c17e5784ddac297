"""Pre-generate the bench dataset caches (refscale 1.6 GB, xlscale 8 GB).

CPU-only (never claims the TPU tunnel). Matches bench.py's cache paths and
seeds exactly so the driver's bench run reuses them instead of paying
generation time. Safe to re-run: completed caches are left alone.
"""

import json
import os
import shutil
import sys
import time

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bloomsearch_tpu import perf  # noqa: E402
from bloomsearch_tpu.engine import _default_compression  # noqa: E402


def log(msg: str) -> None:
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)


def ensure(name: str, target_mb: int, seed: int) -> None:
    comp = _default_compression()
    cache = os.path.expanduser(
        f"~/.cache/bloomsearch-{name}/v1-{comp}-{target_mb}mb"
    )
    marker = os.path.join(cache, "GENERATION_COMPLETE")
    if os.path.exists(marker):
        log(f"{name} already generated: {cache}")
        return
    shutil.rmtree(cache, ignore_errors=True)
    os.makedirs(cache, exist_ok=True)
    t0 = time.perf_counter()
    gen = perf.generate_fast(cache, target_mb, seed=seed, compression=comp, log=log)
    with open(marker, "w") as fh:
        json.dump(gen, fh)
    log(f"{name} generated in {time.perf_counter() - t0:.0f}s: {gen}")


def main() -> None:
    ensure("refscale", 1600, seed=0)
    ensure("xlscale", 8192, seed=1)


if __name__ == "__main__":
    main()
