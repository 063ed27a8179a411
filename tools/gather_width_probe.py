#!/usr/bin/env python
"""Does TPU row-gather cost scale with the table row WIDTH or the row
COUNT?  Times jnp.take((b, W), idx(M), axis=0) for W in {32, 64, 128, 256}
at the dense-MSM index count.  Decides whether packing the G1 table (67
used rows) tighter / splitting the G2 table (134 used of 256) is worth it.

Usage: python tools/gather_width_probe.py [log_n] [log_m]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def timeit(label, fn, reps=3):
    out = fn()
    np.asarray(jax.tree_util.tree_leaves(out)[0][..., :1])
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        np.asarray(jax.tree_util.tree_leaves(out)[0][..., :1])
        times.append(time.perf_counter() - t0)
    print(f"{label:44s} {min(times)*1e3:9.2f} ms", flush=True)


def main():
    log_n = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    log_m = int(sys.argv[2]) if len(sys.argv) > 2 else 22
    b, M = 1 << log_n, 1 << log_m
    rng = np.random.default_rng(5)
    idx = jnp.asarray(rng.integers(0, b, size=(M,), dtype=np.int32))
    print(f"backend={jax.default_backend()} table rows={b} indices={M}",
          flush=True)

    for w in (32, 64, 128, 256):
        rows = jnp.asarray(
            rng.integers(0, 1 << 12, size=(b, w), dtype=np.uint32))

        def f(rows=rows):
            return jnp.take(rows, idx, axis=0)

        timeit(f"take (b,{w}) x {M} rows", jax.jit(f))
    return 0


if __name__ == "__main__":
    sys.exit(main())
