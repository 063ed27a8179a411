"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Real-TPU execution is exercised by bench.py / __graft_entry__.py; the test
suite validates numerics and sharding on the host platform so it runs
anywhere (and so multi-chip sharding is testable without a pod slice).

NOTE: in the axon environment the JAX_PLATFORMS *env var* is ignored (a TPU
platform plugin takes priority); ``jax.config.update('jax_platforms', ...)``
is authoritative, so that is what we use -- before any backend is touched.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Persistent compile cache: the limb-arithmetic graphs are large and XLA-CPU
# compiles them slowly; cache across test runs.
_cache_dir = os.path.join(os.path.dirname(__file__), "..", ".jax_cache_cpu")
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_cache_dir))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
