#!/usr/bin/env python
"""G2 (B-query) MSM benchmark on the current accelerator.

The B-query is the most expensive per-point MSM in the prover (Fq2 doubles
the limb work; reference hot path tcc:498-507).  Same honesty rules as
bench.py: 128 DISTINCT base points tiled across the lanes (runtime data),
scalars uniform < r decomposed with the prover's own digit helper, exact
closed-form check over residue classes, timed region includes the host
readback.

Usage: python tools/bench_msm_g2.py [log_n] [reps]   (default 2^18, 3)
Prints ONE JSON line like bench.py.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from ethsnarks_tpu.ops import msm_red, msm as msm_ops
from ethsnarks_tpu.ops.msm_red import best_c, _dense_red_driver
from ethsnarks_tpu.bn254 import G2_GEN, multiply, add
from ethsnarks_tpu.field import SNARK_SCALAR_FIELD as R


def main():
    log_n = int(sys.argv[1]) if len(sys.argv) > 1 else 18
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    n = 1 << log_n
    c = int(os.environ.get("BENCH_MSM_C", "0")) or best_c(n)

    n_base = 128
    base = [multiply(G2_GEN, j + 1) for j in range(n_base)]
    pts = [base[i % n_base] for i in range(n)]
    rng = np.random.default_rng(424242)
    scalars = [int.from_bytes(rng.bytes(32), 'big') % R for _ in range(n)]
    red = msm_red.g2_to_red(pts)
    digits = np.asarray(msm_ops.window_digits_host(scalars, c))

    lanes = 1 << 22
    out = _dense_red_driver(red, digits, c, True, lanes, static_plan=True)

    cls = [0] * n_base
    for i, s in enumerate(scalars):
        cls[i % n_base] = (cls[i % n_base] + s) % R
    exp = None
    for j in range(n_base):
        exp = add(exp, multiply(base[j], cls[j]))
    correct = out == exp

    best = float('inf')
    for _ in range(reps):
        t0 = time.perf_counter()
        out = _dense_red_driver(red, digits, c, True, lanes,
                                static_plan=True)
        best = min(best, time.perf_counter() - t0)
    print(json.dumps({
        "metric": "msm_g2_points_per_sec_per_chip",
        "value": round(n / best, 1),
        "unit": "points/s (2^%d G2 points, c=%d, red-dense-static, %s, "
                "correct=%s)" % (log_n, c, jax.default_backend(), correct),
        "vs_baseline": round((n / best) / 350000.0, 4),
    }), flush=True)
    return 0 if correct else 1


if __name__ == "__main__":
    sys.exit(main())
