"""Test configuration: run on a virtual 8-device CPU mesh.

The moral equivalent of the reference's serial MPI stub (src/STUBS/mpi.c):
multi-device code paths are exercised on one host by forcing XLA to expose
8 virtual CPU devices.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The environment may pre-import jax with an accelerator plugin registered
# (sitecustomize) before this conftest runs, in which case the env var above
# is too late; the config update below wins regardless of import order.
jax.config.update("jax_platforms", "cpu")

# f64 on CPU so physics tests can compare against exact references; the
# production path stays f32 (dtype follows the state arrays).
jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: the suite compiles ~100 XLA programs; caching
# them across runs/processes cuts repeat wall time severalfold.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
