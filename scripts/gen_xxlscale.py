"""Generate (once) and cache the xxlscale bench dataset (~30 GB raw).

CPU-only: pins JAX to the host platform so it never claims the TPU tunnel
(one claimant at a time on this machine). Safe to re-run; a completed
cache (GENERATION_COMPLETE marker) is left alone.

Usage: python scripts/gen_xxlscale.py [target_mb]
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

TARGET_MB = int(sys.argv[1]) if len(sys.argv) > 1 else 30720


def log(msg: str) -> None:
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)


def main() -> None:
    comp = _default_compression()
    cache = os.path.expanduser(
        f"~/.cache/bloomsearch-xxlscale/v1-{comp}-{TARGET_MB}mb"
    )
    marker = os.path.join(cache, "GENERATION_COMPLETE")
    if os.path.exists(marker):
        log(f"already generated: {cache}")
        return
    shutil.rmtree(cache, ignore_errors=True)
    os.makedirs(cache, exist_ok=True)
    t0 = time.perf_counter()
    gen = perf.generate_fast(cache, TARGET_MB, seed=2, compression=comp, log=log)
    with open(marker, "w") as fh:
        json.dump(gen, fh)
    log(f"xxlscale dataset generated in {time.perf_counter() - t0:.0f}s: {gen}")


if __name__ == "__main__":
    main()
