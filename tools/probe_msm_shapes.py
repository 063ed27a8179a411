#!/usr/bin/env python
"""Hardware correctness probe for the dense red MSM at arbitrary shapes.

Checks the full host-planned (or static) pipeline at a given (b, c)
against a closed-form host expectation: points are 128 DISTINCT base
multiples tiled across b lanes (runtime data - XLA cannot collapse them),
so the exact result is sum_j class_j * (j+1) * G over 128 residue classes.

This caught the (n_slots_pad=8192, capacity=128) backend miscompile that
corrupted exactly one slot of the halving tree (round 4); run it whenever
the pipeline layout, the field core, or the toolchain changes:

    python tools/probe_msm_shapes.py 48871:10 65536:10 65536:11s

(suffix 's' = static plan; default shapes cover the prover's A/L/H query
classes at 2^16-scale circuits).
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

from ethsnarks_tpu.ops import msm_red, msm as msm_ops
from ethsnarks_tpu.ops.msm_red import _dense_red_driver
from ethsnarks_tpu.bn254 import G1_GEN, multiply, add
from ethsnarks_tpu.field import SNARK_SCALAR_FIELD as R


def probe(b, c, static):
    n_base = 128
    base = [multiply(G1_GEN, j + 1) for j in range(n_base)]
    pts = [base[i % n_base] for i in range(b)]
    rng = np.random.default_rng(777)
    scalars = [int.from_bytes(rng.bytes(32), 'big') % R for _ in range(b)]
    red = msm_red.g1_to_red(pts)
    digits = np.asarray(msm_ops.window_digits_host(scalars, c))
    t0 = time.time()
    out = _dense_red_driver(red, digits, c, False, 1 << 23,
                            static_plan=static)
    cls = [0] * n_base
    for i, s in enumerate(scalars):
        cls[i % n_base] = (cls[i % n_base] + s) % R
    exp = None
    for j in range(n_base):
        exp = add(exp, multiply(base[j], cls[j]))
    ok = out == exp
    print('b=%d c=%d static=%s: correct=%s (%.1fs)'
          % (b, c, static, ok, time.time() - t0), flush=True)
    return ok


def main():
    specs = sys.argv[1:] or ['48871:10', '65536:10', '65536:11s']
    ok = True
    for spec in specs:
        bs, cs = spec.split(':')
        static = cs.endswith('s')
        ok &= probe(int(bs), int(cs.rstrip('s')), static)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
