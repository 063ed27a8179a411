#!/usr/bin/env python
"""Stage-level debug of the red dense MSM at a failing shape.

Runs the pipeline through the halving tree only (bucket sums), for both the
affine and the general plane construction, pulls the (RL, slots) results and
diffs them slot by slot; mismatching slots are then checked against the
exact host bucket sum to see which side is wrong.

Usage: python tools/debug_red_stage.py [log_n] [c]
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp
from ethsnarks_tpu.bn254 import G1_GEN, CURVE_ORDER, multiply, add
from ethsnarks_tpu.ops import msm as msm_ops
from ethsnarks_tpu.ops import msm_red
from ethsnarks_tpu.ops.msm_red import (
    RL, _g1_consts_red, _one_red_col, _pow2ceil, _g1_add_red_dev)


def build_tree_jit(b, c, k, nw, redirect):
    """redirect=True: identity substitution by gather redirect (the shipped
    pipeline); False: identity substitution by coordinate-plane wheres (the
    formulation shown to corrupt the tail slot at 2^22 lanes)."""
    n_buckets = 1 << c
    nw_pad = _pow2ceil(nw)
    n_slots = nw * n_buckets
    n_slots_pad = nw_pad * n_buckets
    consts_np = _g1_consts_red()
    rows_used = 3 * RL
    rows_pad = max(128, _pow2ceil(rows_used))
    ident_np = np.zeros((rows_used, 1), dtype=np.int32)
    ident_np[RL:2 * RL, 0] = _one_red_col()[:, 0]

    @jax.jit
    def run(points, digits_grp):
        consts = jnp.asarray(consts_np)
        one = jnp.asarray(_one_red_col())
        rows = jnp.concatenate(list(points), axis=0)
        rows = jnp.concatenate([rows, jnp.asarray(ident_np)], axis=1)
        rows = jnp.pad(rows, ((0, rows_pad - rows_used), (0, 0))).T
        woff = (jnp.arange(nw, dtype=jnp.int32) << c)[:, None]
        comp = digits_grp.astype(jnp.int32) + woff
        flat = comp.reshape(-1)
        iota = jnp.arange(nw * b, dtype=jnp.int32)
        sk, order = jax.lax.sort_key_val(flat, iota)
        orig = order % b
        total = nw * b
        slots = jnp.arange(n_slots_pad, dtype=jnp.int32)
        real = slots < n_slots
        q = jnp.minimum(slots, n_slots - 1)
        starts = jnp.where(real, jnp.searchsorted(sk, q, side='left'),
                           total)
        ends = jnp.where(real, jnp.searchsorted(sk, q, side='right'),
                         total)
        j = jnp.arange(k, dtype=jnp.int32)
        src_sorted = starts[:, None] + j[None, :]
        src_orig = jnp.take(
            orig, jnp.clip(src_sorted.reshape(-1), 0, total - 1))
        zero_i = jnp.int32(0)
        if redirect:
            vflat = (src_sorted < ends[:, None]).reshape(-1) \
                .astype(jnp.int32)
            src_safe = src_orig * vflat + (1 - vflat) * jnp.int32(b)
            g = jnp.take(rows.astype(jnp.uint32), src_safe,
                         axis=0).T.astype(jnp.int32)
            dense = (g[:RL], g[RL:2 * RL], g[2 * RL:3 * RL])
        else:
            valid = (src_sorted < ends[:, None]).reshape(-1)[None]
            g = jnp.take(rows.astype(jnp.uint32), src_orig,
                         axis=0).T.astype(jnp.int32)

            def plane(ci, ident):
                return jnp.where(valid, g[ci * RL:(ci + 1) * RL], ident)

            dense = (plane(0, zero_i), plane(1, one), plane(2, zero_i))
        per = k

        while per > 1:
            half = per // 2
            resh = tuple(a.reshape(RL, n_slots_pad, per) for a in dense)
            lhs = tuple(a[:, :, :half].reshape(RL, -1) for a in resh)
            rhs = tuple(a[:, :, half:].reshape(RL, -1) for a in resh)
            dense = _g1_add_red_dev(consts, lhs, rhs)
            per = half
        return dense

    return run


def main():
    log_n = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    c = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    n = 1 << log_n
    n_base = 64
    base_pts = [multiply(G1_GEN, j + 1) for j in range(n_base)]
    dev = msm_red.g1_to_red(base_pts)
    pts = tuple(jnp.tile(a, (1, n // n_base)) for a in dev)
    rng = np.random.default_rng(7)
    scalars = [int.from_bytes(rng.bytes(32), 'little') % CURVE_ORDER
               for _ in range(n)]
    digits = msm_ops.window_digits_host_np(scalars, c)

    # main part of the plan at default max_lanes (31 windows + phantom)
    ks = msm_red._window_ks(n, c, digits)
    (main_nw, n_groups, main_k, tail_start, tail_nw, tail_k, m) = \
        msm_red._plan(ks, c, 1 << 23)
    print(f"plan: main_nw={main_nw} groups={n_groups} k={main_k} "
          f"tail={tail_nw}@{tail_k} m={m}", flush=True)
    assert n_groups == 1
    dm = np.concatenate(
        [digits[:m], np.zeros((main_nw * n_groups - m, n), digits.dtype)])

    outs = {}
    for redirect in (True, False):
        run = build_tree_jit(n, c, main_k, main_nw, redirect)
        dense = run(pts, jnp.asarray(dm))
        outs[redirect] = [np.asarray(a) for a in dense]
        print(f"redirect={redirect}: dense pulled", flush=True)

    diff_slots = []
    for i in range(3):
        neq = (outs[True][i] != outs[False][i]).any(axis=0)
        diff_slots.append(np.nonzero(neq)[0])
    all_diff = sorted(set(np.concatenate(diff_slots).tolist()))
    print(f"slots differing (coord-wise raw digits): {len(all_diff)}",
          flush=True)

    # raw digits may differ legitimately (redundant representation):
    # compare as curve points instead
    def slot_points(out):
        return msm_red.g1_from_red(tuple(a for a in out))

    pa = slot_points(outs[True])
    pb = slot_points(outs[False])
    real_diff = [s for s in range(len(pa)) if pa[s] != pb[s]]
    print(f"slots differing as POINTS: {len(real_diff)}", flush=True)
    if real_diff:
        print("first 40:", real_diff[:40], flush=True)
        win = sorted(set(s >> c for s in real_diff))
        buck = sorted(set(s & ((1 << c) - 1) for s in real_diff))
        print("windows:", win[:40], flush=True)
        print("buckets involved (first 40):", buck[:40], flush=True)
        # host truth for up to 4 mismatched slots
        for s in real_diff[:4]:
            w, bk = s >> c, s & ((1 << c) - 1)
            acc = None
            for lane in range(n):
                if w < digits.shape[0] and digits[w, lane] == bk and bk != 0:
                    acc = add(acc, base_pts[lane % n_base])
            okA = pa[s] == acc
            okB = pb[s] == acc
            print(f"slot {s} (w={w} b={bk}): redirectOK={okA} "
                  f"whereOK={okB}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
