#!/usr/bin/env python
"""Probe TPU gather layouts + searchsorted alternatives for the dense MSM.

A) lane-axis gather (current): take((L,b), idx, axis=1) -> (L,M)
B) row-major gather: take((b,64), idx, axis=0) -> (M,64), then transpose
C) searchsorted vs manual binary search via take
Usage: python tools/gather_probe.py [log_n] [c]
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

L = 20


def timeit(label, fn, reps=3):
    out = fn()
    jax.tree_util.tree_map(lambda a: np.asarray(a[..., :1]), out)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        jax.tree_util.tree_map(lambda a: np.asarray(a[..., :1]), out)
        times.append(time.perf_counter() - t0)
    print(f"{label:40s} {min(times)*1e3:9.2f} ms", flush=True)


def main():
    log_n = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    c = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    b = 1 << log_n
    n_win = (254 + c - 1) // c
    k = max(2 * (b >> c), 2)
    M = n_win * (1 << c) * k
    print(f"backend={jax.default_backend()} b=2^{log_n} M={M}", flush=True)

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.integers(0, 1 << 13, size=(L, b), dtype=np.uint32))
    y = jnp.asarray(rng.integers(0, 1 << 13, size=(L, b), dtype=np.uint32))
    z = jnp.asarray(rng.integers(0, 1 << 13, size=(L, b), dtype=np.uint32))
    rows = jnp.asarray(
        rng.integers(0, 1 << 13, size=(b, 64), dtype=np.uint32))
    idx = jnp.asarray(rng.integers(0, b, size=(M,), dtype=np.int32))

    @jax.jit
    def lane_gather(x, y, z, idx):
        return (jnp.take(x, idx, axis=1), jnp.take(y, idx, axis=1),
                jnp.take(z, idx, axis=1))
    timeit("A lane gather x3 -> (L,M)", lambda: lane_gather(x, y, z, idx))

    @jax.jit
    def row_gather(rows, idx):
        g = jnp.take(rows, idx, axis=0)            # (M, 64)
        t = g.T                                    # (64, M)
        return t[:L], t[L:2*L], t[2*L:3*L]
    timeit("B row gather (M,64) + transpose", lambda: row_gather(rows, idx))

    @jax.jit
    def row_gather_nt(rows, idx):
        return jnp.take(rows, idx, axis=0)
    timeit("B' row gather only (no transpose)",
           lambda: row_gather_nt(rows, idx))

    # C: bounds
    n_slots = n_win << c
    sk = jnp.asarray(np.sort(rng.integers(0, n_slots, size=(n_win * b,))
                             .astype(np.int32)))
    slots = jnp.arange(n_slots, dtype=jnp.int32)

    @jax.jit
    def ss(sk):
        return (jnp.searchsorted(sk, slots, side='left'),
                jnp.searchsorted(sk, slots, side='right'))
    timeit("C searchsorted both sides", lambda: ss(sk))

    nbits = int(np.ceil(np.log2(n_win * b)))

    @jax.jit
    def manual(sk):
        total = sk.shape[0]

        def bs(pred):
            lo = jnp.zeros((n_slots,), jnp.int32)
            for i in range(nbits - 1, -1, -1):
                step = jnp.int32(1 << i)
                mid = lo + step
                ok = mid <= total
                v = jnp.take(sk, jnp.clip(mid - 1, 0, total - 1))
                go = jnp.logical_and(ok, pred(v))
                lo = jnp.where(go, mid, lo)
            return lo

        starts = bs(lambda v: v < slots)
        ends = bs(lambda v: v <= slots)
        return starts, ends
    timeit("C' manual binary search (take)", lambda: manual(sk))

    s1, e1 = jax.device_get(ss(sk))
    s2, e2 = jax.device_get(manual(sk))
    print("bounds agree:", bool(np.all(s1 == s2) and np.all(e1 == e2)),
          flush=True)

    # D: batched per-window sort vs flat composite sort
    dig = jnp.asarray(rng.integers(0, 1 << c, size=(n_win, b),
                                   dtype=np.int32))

    @jax.jit
    def flat_sort(dg):
        woff = (jnp.arange(n_win, dtype=jnp.int32) << c)[:, None]
        flat = (dg + woff).reshape(-1)
        iota = jnp.arange(n_win * b, dtype=jnp.int32)
        return jax.lax.sort_key_val(flat, iota)
    timeit("D flat composite sort", lambda: flat_sort(dig))

    @jax.jit
    def row_sort(dg):
        iota = jnp.broadcast_to(jnp.arange(b, dtype=jnp.int32),
                                (n_win, b))
        return jax.lax.sort_key_val(dg, iota, dimension=1)
    timeit("D' batched row sort", lambda: row_sort(dig))


if __name__ == "__main__":
    sys.exit(main())
