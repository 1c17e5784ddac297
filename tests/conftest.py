"""Test configuration.

Forces JAX onto a virtual 8-device CPU platform so multi-chip sharding paths
are exercised without TPU hardware, mirroring how the driver dry-runs the
multichip path.

The environment may pre-register a remote-TPU PJRT plugin (sitecustomize)
that overrides JAX_PLATFORMS, so the env var alone is not enough — we import
jax here (before any test module does) and pin the platform via jax.config,
which wins over the plugin's registration. Without this, every jit in the
test suite round-trips through the remote TPU compile service.
"""

import os
import sys

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", jax.default_backend()

# Repo root on sys.path so `import bloomsearch_tpu` works without install.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
