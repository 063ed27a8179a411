#!/usr/bin/env python
"""Per-stage timing of the dense MSM pipeline on the real chip.

Times (with host-transfer sync) each stage of _jit_msm_dense_allwin in
isolation: key sort, searchsorted, the big point gather, the halving add
reduction, K_fold_grid, K_horner_all.  Identifies where the wall-clock goes.
Usage: python tools/msm_stage_profile.py [log_n] [c]
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

from ethsnarks_tpu.bn254 import G1_GEN, multiply
from ethsnarks_tpu.ops import curve as curve_ops
from ethsnarks_tpu.ops.pallas_ops import L, g1_point_add_pallas
from ethsnarks_tpu.ops import pallas_msm


def timeit(label, fn, reps=3):
    out = fn()
    jax.tree_util.tree_map(lambda a: np.asarray(a[..., :1]), out)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        jax.tree_util.tree_map(lambda a: np.asarray(a[..., :1]), out)
        times.append(time.perf_counter() - t0)
    dt = min(times)
    print(f"{label:34s} {dt*1e3:9.2f} ms", flush=True)
    return dt


def main():
    log_n = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    c = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    b = 1 << log_n
    n_buckets = 1 << c
    n_win = (254 + c - 1) // c
    k = max(2 * (b >> c), 2)
    M = n_win * n_buckets * k
    print(f"backend={jax.default_backend()} b=2^{log_n} c={c} k={k} "
          f"n_win={n_win} dense_lanes={M}", flush=True)

    n_base = 64
    base = [multiply(G1_GEN, j + 1) for j in range(n_base)]
    bd = curve_ops.g1_to_device(base)
    pts = tuple(jnp.tile(jnp.asarray(a), (1, b // n_base)) for a in bd)

    rng = np.random.default_rng(3)
    digits = rng.integers(0, n_buckets, size=(n_win, b)).astype(np.uint32)
    digits_d = jnp.asarray(digits)

    woff = (np.arange(n_win, dtype=np.int32) << c)[:, None]
    comp_np = digits.astype(np.int32) + woff

    # stage 1: composite sort
    @jax.jit
    def s_sort(dg):
        comp = dg.astype(jnp.int32) + jnp.asarray(woff)
        flat = comp.reshape(-1)
        iota = jnp.arange(n_win * b, dtype=jnp.int32)
        return jax.lax.sort_key_val(flat, iota)
    timeit("sort 2^%d*%d keys" % (log_n, n_win), lambda: s_sort(digits_d))

    sk_np = np.sort(comp_np.reshape(-1))
    order_np = np.argsort(comp_np.reshape(-1), kind='stable')
    sk_d = jnp.asarray(sk_np.astype(np.int32))
    order_d = jnp.asarray(order_np.astype(np.int32))

    # stage 2: searchsorted run bounds
    @jax.jit
    def s_bounds(sk):
        slots = jnp.arange(n_win * n_buckets, dtype=jnp.int32)
        return (jnp.searchsorted(sk, slots, side='left'),
                jnp.searchsorted(sk, slots, side='right'))
    timeit("searchsorted bounds", lambda: s_bounds(sk_d))

    starts_np = np.searchsorted(sk_np, np.arange(n_win * n_buckets), 'left')
    ends_np = np.searchsorted(sk_np, np.arange(n_win * n_buckets), 'right')
    j = np.arange(k)
    src_sorted = starts_np[:, None] + j[None, :]
    valid_np = (src_sorted < ends_np[:, None]).reshape(-1)
    src_orig_np = order_np[np.clip(src_sorted.reshape(-1), 0,
                                   n_win * b - 1)] % b
    src_d = jnp.asarray(src_orig_np.astype(np.int32))
    valid_d = jnp.asarray(valid_np)

    # stage 3: the big dense gather (3 coords)
    one = pallas_msm._one_mont_col()

    @jax.jit
    def s_gather(x, y, z, src, valid):
        zero_u = jnp.uint32(0)
        onej = jnp.asarray(one, dtype=jnp.uint32)
        return (jnp.where(valid[None], jnp.take(x, src, axis=1), zero_u),
                jnp.where(valid[None], jnp.take(y, src, axis=1), onej),
                jnp.where(valid[None], jnp.take(z, src, axis=1), zero_u))
    timeit("dense gather %d lanes x3" % M,
           lambda: s_gather(*pts, src_d, valid_d))

    dense_host = None

    # stage 4: halving reduce chain (log2(k) pallas adds)
    dx, dy, dz = s_gather(*pts, src_d, valid_d)
    dx, dy, dz = jnp.asarray(dx), jnp.asarray(dy), jnp.asarray(dz)

    @jax.jit
    def s_reduce(x, y, z):
        dense = (x, y, z)
        per = k
        while per > 1:
            half = per // 2
            resh = tuple(a.reshape(L, n_win * n_buckets, per) for a in dense)
            lhs = tuple(a[:, :, :half].reshape(L, -1) for a in resh)
            rhs = tuple(a[:, :, half:].reshape(L, -1) for a in resh)
            dense = g1_point_add_pallas(lhs, rhs)
            per = half
        return dense
    timeit("halving reduce (%d adds)" % (M - n_win * n_buckets),
           lambda: s_reduce(dx, dy, dz))

    bx, by, bz = s_reduce(dx, dy, dz)
    bx, by, bz = jnp.asarray(bx), jnp.asarray(by), jnp.asarray(bz)

    # stage 5: gridded fold + whole-group horner
    consts = jnp.asarray(pallas_msm._g1_consts())

    @jax.jit
    def s_fold(x, y, z):
        folded = pallas_msm._k_fold_grid(c, n_win)(consts, x, y, z)
        w128 = tuple(a.reshape(L, n_win, n_buckets)[:, :, :128]
                     .reshape(L, -1) for a in folded)
        return pallas_msm._k_horner_all(c, n_win)(consts, *w128)
    timeit("fold_grid + horner_all", lambda: s_fold(bx, by, bz))

    # reference: one full-width add at 2^16 lanes
    q = tuple(a[:, :b] for a in (dx, dy, dz))
    r = tuple(a[:, b:2 * b] if a.shape[1] >= 2 * b else a[:, :b]
              for a in (dx, dy, dz))

    @jax.jit
    def s_add1(p1, p2):
        return g1_point_add_pallas(p1, p2)
    dt = timeit("single add @2^%d lanes" % log_n, lambda: s_add1(q, r))
    print(f"  -> {b/dt/1e6:.1f}M adds/s", flush=True)


if __name__ == "__main__":
    sys.exit(main())
