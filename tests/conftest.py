"""Test configuration: run on a virtual 8-device CPU mesh.

Must set env vars before jax is imported anywhere (reference CI runs the
whole suite CPU-only as well, .github/workflows/linux-build.yml:44-99).
A persistent compilation cache keeps re-runs fast.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()
import jax  # noqa: E402  (after env setup, before any compilation)

# The axon sitecustomize force-registers the TPU tunnel and overrides
# jax_platforms to "axon,cpu" regardless of the environment; pin the test
# suite back to the virtual CPU mesh.
jax.config.update("jax_platforms", "cpu")
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.abspath(
        os.path.join(os.path.dirname(__file__), os.pardir, ".jax_cache")))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
