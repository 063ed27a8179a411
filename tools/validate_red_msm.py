#!/usr/bin/env python
"""Hardware validation + timing for the red-core dense MSM (ops/msm_red.py).

Validates msm_g1_dense_red / msm_g2_dense_red against the exact host oracle
(class-sum construction: tiled distinct base points, full-range scalars),
then times steady-state throughput.

Usage: python tools/validate_red_msm.py [log_n] [c] [g1|g2|both]
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

import jax.numpy as jnp
from ethsnarks_tpu.bn254 import (
    G1_GEN, G2_GEN, CURVE_ORDER, multiply, add)
from ethsnarks_tpu.ops import msm as msm_ops
from ethsnarks_tpu.ops import msm_red


def run_group(name, gen, to_dev, msm_fn, n, c, scalars, digits, reps=3):
    n_base = 64
    base_pts = [multiply(gen, j + 1) for j in range(n_base)]
    dev = to_dev(base_pts)
    pts = tuple(
        tuple(jnp.tile(a, (1, n // n_base)) for a in coord)
        if isinstance(coord, tuple)
        else jnp.tile(coord, (1, n // n_base))
        for coord in dev)

    want = None
    for j in range(n_base):
        cls = sum(scalars[j::n_base]) % CURVE_ORDER
        want = add(want, multiply(base_pts[j], cls))

    t0 = time.perf_counter()
    got = msm_fn(pts, digits, c)
    t_first = time.perf_counter() - t0
    ok = (got == want)
    print(f"{name} first-run (incl compile): {t_first:.2f}s correct={ok}",
          flush=True)
    if not ok:
        print(f"{name} MISMATCH", got, want)
        return 1
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        got = msm_fn(pts, digits, c)
        times.append(time.perf_counter() - t0)
    dt = min(times)
    print(f"{name} steady: {dt*1e3:.1f}ms -> {n/dt:,.0f} points/s "
          f"correct={got == want}", flush=True)
    return 0


def main():
    log_n = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    c = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    which = sys.argv[3] if len(sys.argv) > 3 else "g1"
    n = 1 << log_n
    print(f"backend={jax.default_backend()} n=2^{log_n} c={c}", flush=True)

    rng = np.random.default_rng(7)
    scalars = [int.from_bytes(rng.bytes(32), 'little') % CURVE_ORDER
               for _ in range(n)]
    digits = msm_ops.window_digits_host_np(scalars, c)

    rc = 0
    if which in ("g1", "both"):
        rc |= run_group("red-G1", G1_GEN, msm_red.g1_to_red,
                        msm_red.msm_g1_dense_red, n, c, scalars, digits)
    if which in ("g2", "both"):
        rc |= run_group("red-G2", G2_GEN, msm_red.g2_to_red,
                        msm_red.msm_g2_dense_red, n, c, scalars, digits)
    return rc


if __name__ == "__main__":
    sys.exit(main())
