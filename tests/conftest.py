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


# ---- tier auto-marking ----
# Modules that jit-compile XLA programs get the `device` marker so the
# default host tier (pytest.ini addopts) skips them; see Makefile tiers.
import pytest  # noqa: E402

_DEVICE_TEST_MODULES = {
    "test_batch_exp.py",
    "test_fp_red.py",
    "test_groth16.py",
    "test_msm.py",
    "test_msm_red.py",
    "test_ntt.py",
    "test_ops_fp.py",
    "test_ops_hash.py",
    "test_ops_jubjub.py",
    "test_sha256_batch.py",
    "test_sharded_prover.py",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        if os.path.basename(str(item.fspath)) in _DEVICE_TEST_MODULES:
            item.add_marker(pytest.mark.device)
