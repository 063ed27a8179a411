"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Real-TPU execution is exercised by bench.py / __graft_entry__.py; the test
suite validates numerics and sharding on the host platform so it runs
anywhere (and so multi-chip sharding is testable without a pod slice).
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
