"""Test configuration.

Forces JAX onto a virtual 8-device CPU platform (before any jax import) so
multi-chip sharding paths are exercised without TPU hardware, mirroring how
the driver dry-runs the multichip path.
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

# Repo root on sys.path so `import bloomsearch_tpu` works without install.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
