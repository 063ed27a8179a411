#!/usr/bin/env python
"""Hardware validation + timing for the fused Pallas MSM stages.

Runs msm_g1_fused at a small size against the host oracle, then times it.
Usage: python tools/validate_fused_msm.py [log_n] [c]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from ethsnarks_tpu.bn254 import G1_GEN, CURVE_ORDER, multiply, add
from ethsnarks_tpu.ops import curve as curve_ops
from ethsnarks_tpu.ops import msm as msm_ops
from ethsnarks_tpu.ops import pallas_msm


def main():
    log_n = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    c = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    n = 1 << log_n
    print(f"backend={jax.default_backend()} n=2^{log_n} c={c}", flush=True)

    n_base = 64
    base_pts = [multiply(G1_GEN, j + 1) for j in range(n_base)]
    base_dev = curve_ops.g1_to_device(base_pts)
    import jax.numpy as jnp
    points = tuple(jnp.tile(jnp.asarray(cd), (1, n // n_base))
                   for cd in base_dev)

    rng = np.random.default_rng(7)
    # full-range scalars (uniform mod r): narrow scalars leave all-zero top
    # windows, which exercise only the skip/fallback paths
    scalars = [int.from_bytes(rng.bytes(32), 'little') % CURVE_ORDER
               for _ in range(n)]
    digits = msm_ops.window_digits_host_np(scalars, c)

    want = None
    for j in range(n_base):
        cls = sum(scalars[j::n_base]) % CURVE_ORDER
        want = add(want, multiply(base_pts[j], cls))

    which = os.environ.get("VALIDATE_WHICH", "both")
    rc = 0

    if which in ("both", "staged"):
        t0 = time.perf_counter()
        got = pallas_msm.msm_g1_fused(points, digits, c)
        t_first = time.perf_counter() - t0
        ok = (got == want)
        print(f"staged first-run (incl compile): {t_first:.2f}s correct={ok}",
              flush=True)
        if not ok:
            print("STAGED MISMATCH", got, want)
            rc = 1
        else:
            times = []
            for _ in range(3):
                t0 = time.perf_counter()
                got = pallas_msm.msm_g1_fused(points, digits, c)
                times.append(time.perf_counter() - t0)
            dt = min(times)
            print(f"staged steady: {dt*1e3:.1f}ms -> {n/dt:,.0f} points/s",
                  flush=True)

    if which in ("both", "allwin"):
        t0 = time.perf_counter()
        got = pallas_msm.msm_g1_dense_allwin(points, digits, c)
        t_first = time.perf_counter() - t0
        ok = (got == want)
        print(f"allwin first-run (incl compile): {t_first:.2f}s correct={ok}",
              flush=True)
        if not ok:
            print("ALLWIN MISMATCH", got, want)
            rc = 1
        else:
            times = []
            for _ in range(3):
                t0 = time.perf_counter()
                got = pallas_msm.msm_g1_dense_allwin(points, digits, c)
                times.append(time.perf_counter() - t0)
            dt = min(times)
            print(f"allwin steady: {dt*1e3:.1f}ms -> {n/dt:,.0f} points/s "
                  f"correct={got == want}", flush=True)

    if which in ("both", "onejit"):
        t0 = time.perf_counter()
        got = pallas_msm.msm_g1_fused_onejit(points, digits, c)
        t_first = time.perf_counter() - t0
        ok = (got == want)
        print(f"onejit first-run (incl compile): {t_first:.2f}s correct={ok}",
              flush=True)
        if not ok:
            print("ONEJIT MISMATCH", got, want)
            rc = 1
        else:
            times = []
            for _ in range(3):
                t0 = time.perf_counter()
                got = pallas_msm.msm_g1_fused_onejit(points, digits, c)
                times.append(time.perf_counter() - t0)
            dt = min(times)
            print(f"onejit steady: {dt*1e3:.1f}ms -> {n/dt:,.0f} points/s "
                  f"correct={got == want}", flush=True)
    return rc


if __name__ == "__main__":
    sys.exit(main())
