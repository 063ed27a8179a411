#!/usr/bin/env python
"""Stage-level timing of the red dense MSM pipeline on the real chip.

Times isolated jits of each pipeline stage (composite-key sort, run-bound
searchsorted, dense gather, halving add tree, bucket fold + Horner) at the
bench shape, so perf work targets the actual bottleneck instead of the
VPU-op model.  Every timed region includes a host transfer (the axon
tunnel's block_until_ready returns at enqueue).

Usage: python tools/profile_msm_stages.py [log_n] [c]
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
from ethsnarks_tpu.bn254 import G1_GEN, CURVE_ORDER, multiply
from ethsnarks_tpu.ops import msm_red
from ethsnarks_tpu.ops.msm import window_digits_host_np
from ethsnarks_tpu.ops.msm_red import RL, _pow2ceil


def timed(tag, fn, *args, reps=3):
    """Time fn; fn must return a SMALL array (the tunnel readback of a
    large output would dominate the timing)."""
    out = fn(*args)                       # compile
    jax.tree_util.tree_map(np.asarray, out)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.tree_util.tree_map(np.asarray, out)   # host transfer = fence
        times.append(time.perf_counter() - t0)
    print(f"{tag:28s} {min(times)*1e3:9.1f} ms", flush=True)
    return min(times)


def main():
    log_n = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    c = int(sys.argv[2]) if len(sys.argv) > 2 else 11
    n = 1 << log_n
    print(f"backend={jax.default_backend()} n=2^{log_n} c={c}", flush=True)

    rng = np.random.default_rng(3)
    n_base = 64
    base_pts = [multiply(G1_GEN, j + 1) for j in range(n_base)]
    base_red = msm_red.g1_to_red(base_pts)
    pts = tuple(jnp.tile(a, (1, n // n_base)) for a in base_red)
    scalars = [int.from_bytes(rng.bytes(32), 'little') % CURVE_ORDER
               for _ in range(n)]
    digits = window_digits_host_np(scalars, c)

    # mirror the driver's merged plan
    plan = msm_red.static_msm_plan(n, c)
    dm, dt = msm_red.merge_top_window_np(digits, c, plan)
    nw = plan['main_nw']
    k = plan['main_k']
    b = n
    n_buckets = 1 << c
    nw_pad = _pow2ceil(nw)
    n_slots = nw * n_buckets
    n_slots_pad = nw_pad * n_buckets
    dg = jnp.asarray(dm[:nw])             # one group's digits

    print(f"plan: main_nw={nw} n_groups={plan['n_groups']} k={k} "
          f"merged={plan['merged']} tc={plan['tc']}", flush=True)

    # Cumulative prefixes, each ending in a tiny checksum (a large output
    # would be readback-dominated on the tunnel); stage costs are the
    # DIFFERENCES between consecutive prefixes.

    def _sort(d):
        woff = (jnp.arange(nw, dtype=jnp.int32) << c)[:, None]
        comp = d.astype(jnp.int32) + woff
        flat = comp.reshape(-1)
        iota = jnp.arange(nw * b, dtype=jnp.int32)
        return jax.lax.sort_key_val(flat, iota)

    def _bounds(sk):
        total = nw * b
        slots = jnp.arange(n_slots_pad, dtype=jnp.int32)
        real = slots < n_slots
        q = jnp.minimum(slots, n_slots - 1)
        starts = jnp.where(real, jnp.searchsorted(sk, q, side='left'),
                           total)
        ends = jnp.where(real, jnp.searchsorted(sk, q, side='right'),
                         total)
        return starts, ends

    def _gather(points, starts, ends, order):
        total = nw * b
        orig = order % b
        j = jnp.arange(k, dtype=jnp.int32)
        src_sorted = starts[:, None] + j[None, :]
        vflat = (src_sorted < ends[:, None]).reshape(-1).astype(jnp.int32)
        src_orig = jnp.take(
            orig, jnp.clip(src_sorted.reshape(-1), 0, total - 1))
        src_safe = src_orig * vflat + (1 - vflat) * jnp.int32(b)
        rows = jnp.concatenate(list(points), axis=0)
        ident = np.zeros((3 * RL, 1), dtype=np.int32)
        ident[RL:2 * RL, 0] = msm_red._one_red_col()[:, 0]
        rows = jnp.concatenate([rows, jnp.asarray(ident)], axis=1)
        rows = jnp.pad(rows, ((0, 128 - 3 * RL), (0, 0))).T
        return jnp.take(rows.astype(jnp.uint32), src_safe,
                        axis=0).T.astype(jnp.int32)

    def _tree(g):
        consts = jnp.asarray(msm_red._g1_consts_red())
        dense = tuple(g[ci * RL:(ci + 1) * RL] for ci in range(3))
        per = k
        while per > 1:
            half = per // 2
            resh = tuple(a.reshape(RL, n_slots_pad, per) for a in dense)
            lhs = tuple(a[:, :, :half].reshape(RL, -1) for a in resh)
            rhs = tuple(a[:, :, half:].reshape(RL, -1) for a in resh)
            dense = msm_red._g1_add_red_dev(consts, lhs, rhs)
            per = half
        return dense

    def _fold(dense):
        consts = jnp.asarray(msm_red._g1_consts_red())
        if msm_red.use_pallas():
            folded = msm_red._pairfold(consts, None, dense, c, nw_pad,
                                       False)
            return list(msm_red._k_horner_all_red(c, nw_pad)(
                consts, *folded))
        folded = msm_red._pairfold_ref(consts, None, dense, c, nw_pad,
                                       False)
        res = msm_red._horner_ref(consts, msm_red._nest(folded, False),
                                  c, nw_pad)
        return list(msm_red._leaves(res, False))

    def ck(a):
        return jnp.sum(a.astype(jnp.int64).reshape(-1)[::4097])

    p_upload = jax.jit(lambda d: d[0, :8])
    p1 = jax.jit(lambda d: ck(_sort(d)[0]))
    p2 = jax.jit(lambda d: ck(_bounds(_sort(d)[0])[0]))

    @jax.jit
    def p3(points, d):
        sk, order = _sort(d)
        starts, ends = _bounds(sk)
        return ck(_gather(points, starts, ends, order))

    @jax.jit
    def p4(points, d):
        sk, order = _sort(d)
        starts, ends = _bounds(sk)
        dense = _tree(_gather(points, starts, ends, order))
        return ck(dense[0])

    @jax.jit
    def p5(points, d):
        sk, order = _sort(d)
        starts, ends = _bounds(sk)
        dense = _tree(_gather(points, starts, ends, order))
        return [a[:, :1] for a in _fold(dense)]

    dm_host = np.asarray(dm[:nw])
    t_up = timed("digit upload (host numpy)", p_upload, dm_host)
    t1 = timed("+ sort", p1, dg)
    t2 = timed("+ bounds", p2, dg)
    t3 = timed("+ gather", p3, pts, dg)
    t4 = timed("+ tree", p4, pts, dg)
    t5 = timed("+ fold/horner (1 group)", p5, pts, dg)
    print(f"{'stage deltas':28s} sort={t1*1e3:.0f} "
          f"bounds={(t2-t1)*1e3:.0f} gather={(t3-t2)*1e3:.0f} "
          f"tree={(t4-t3)*1e3:.0f} fold={(t5-t4)*1e3:.0f} ms", flush=True)

    def full():
        return msm_red.msm_g1_dense_red(pts, digits, c)

    r = full()
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        r = full()
        times.append(time.perf_counter() - t0)
    t_full = min(times)
    print(f"{'FULL MSM (driver, host digits)':28s} {t_full*1e3:7.1f} ms "
          f"-> {n/t_full:,.0f} points/s", flush=True)
    print(f"{'driver overhead vs p5':28s} {(t_full-t5)*1e3:7.1f} ms "
          f"(host planning + digit upload + tail + readback)", flush=True)


if __name__ == "__main__":
    sys.exit(main())
