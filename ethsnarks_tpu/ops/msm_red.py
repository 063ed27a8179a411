"""Dense all-windows Pippenger MSM on the signed-redundant field core (v2).

Same pipeline as :mod:`ethsnarks_tpu.ops.pallas_msm` (composite-key sort ->
searchsorted run bounds -> identity-padded dense gather -> halving add tree
-> gridded weighted bucket fold -> whole-group window Horner) with the point
bodies swapped from the v1 canonical-limb core (13-bit x 20 uint32 limbs,
Kogge-Stone carries, conditional subtracts) to the v2 redundant core
(:mod:`ethsnarks_tpu.ops.fp_red`: 12-bit x 22 signed int32 digits, one relax
pass per add, REDC without conditional subtraction) - roughly half the VPU
ops per field multiply, measured int32 mul == add on v5e
(tools/probe_vpu.py).

Differences from the v1 pipeline besides the core:

 - **Affine gather**: PK query points and benchmark bases are affine, so the
   dense gather moves only (x, y) rows - 2*22 = 44 rows padded to 64 - and
   synthesizes z from the validity mask (z = one where valid else 0).  The
   general (projective-input) path would need 3*22 = 66 rows padded to 128,
   doubling gather traffic.  G2 affine moves 4*22 = 88 -> 128 instead of
   6*22 = 132 -> 256.
 - **No generic-path fallback**: per-window capacities are computed from the
   actual digits, so the overflow flag can only fire when an executable
   cached for smaller capacities is reused; the driver then retries with
   exact capacities instead of falling back to another formulation.

Pow2-shape discipline carried over from v1 (NON-NEGOTIABLE - see the
lowering-bug note in pallas_msm._jit_msm_dense_allwin): capacities and
padded window counts are powers of two.

Replaces the reference's multi-exp engine (BDLO12 Pippenger,
/root/reference/src/r1cs_gg_ppzksnark_zok/r1cs_gg_ppzksnark_zok.tcc:487-531
via libff) - see SURVEY.md §2.9.

Off-TPU the pallas stages are replaced by jnp reference stages with the
identical field math (fp_red is plain traced jnp), so the whole pipeline is
CPU-testable; the pallas kernels themselves are validated on hardware by
tools/validate_red_msm.py.
"""

from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp

from .fp_red import (
    RL, red_field, mk_red_ops, g1_add_red, g1_double_red,
    g2_add_red, g2_double_red)
from .pallas_ops import _HAS_PALLAS, use_pallas
from ..bn254 import FIELD_MODULUS

if _HAS_PALLAS:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

_BATCH_TILE = 1024


@lru_cache(maxsize=None)
def _fq_red():
    return red_field(FIELD_MODULUS)


@lru_cache(maxsize=None)
def _g1_consts_red():
    """(RL, 8) int32 constants block (col 0=N, 1=N', 2=RHO, 3=one_mont)."""
    return _fq_red().packed_consts()


@lru_cache(maxsize=None)
def _g2_b3_red():
    """(RL, 2) int32 Montgomery digits of 3*b_twist (Fq2 coefficients)."""
    from . import fp2
    f = _fq_red()
    out = np.zeros((RL, 2), dtype=np.int32)
    for col, coeff in enumerate(fp2.B3_COEFFS):
        out[:, col:col + 1] = f.to_mont([coeff])
    return out


def _one_red_col():
    return _fq_red().one_mont.reshape(RL, 1).astype(np.int32)


# ---------------- host <-> device conversions ----------------

def g1_to_red(points):
    """List of host affine G1 points (bn254 (Fq, Fq) tuples or None) ->
    (X, Y, Z) Montgomery digit arrays (RL, n) int32.  Infinity -> (0,1,0)."""
    f = _fq_red()
    xs, ys, zs = [], [], []
    for p in points:
        if p is None:
            xs.append(0)
            ys.append(1)
            zs.append(0)
        else:
            xs.append(p[0].n)
            ys.append(p[1].n)
            zs.append(1)
    return (jnp.asarray(f.to_mont(xs)), jnp.asarray(f.to_mont(ys)),
            jnp.asarray(f.to_mont(zs)))


def g1_from_red(p):
    """Device red (X, Y, Z) -> list of host affine points (None = inf)."""
    from ..bn254 import Fq as HostFq
    f = _fq_red()
    X = f.from_mont(np.asarray(p[0]))
    Y = f.from_mont(np.asarray(p[1]))
    Z = f.from_mont(np.asarray(p[2]))
    out = []
    for x, y, z in zip(X.reshape(-1), Y.reshape(-1), Z.reshape(-1)):
        if z == 0:
            out.append(None)
        else:
            zi = pow(int(z), -1, FIELD_MODULUS)
            out.append((HostFq(int(x) * zi), HostFq(int(y) * zi)))
    return out


def g2_to_red(points):
    """List of host G2 points ((Fq2, Fq2) or None) -> red coordinate pairs
    ((X0,X1),(Y0,Y1),(Z0,Z1)) of (RL, n) int32."""
    f = _fq_red()
    cols = [[], [], [], [], [], []]
    for p in points:
        if p is None:
            vals = (0, 0, 1, 0, 0, 0)
        else:
            vals = (p[0].coeffs[0], p[0].coeffs[1],
                    p[1].coeffs[0], p[1].coeffs[1], 1, 0)
        for c, v in zip(cols, vals):
            c.append(v)
    arrs = [jnp.asarray(f.to_mont(c)) for c in cols]
    return ((arrs[0], arrs[1]), (arrs[2], arrs[3]), (arrs[4], arrs[5]))


def g2_from_red(p):
    from ..bn254 import Fq2 as HostFq2
    f = _fq_red()
    leaves = [p[0][0], p[0][1], p[1][0], p[1][1], p[2][0], p[2][1]]
    vals = [f.from_mont(np.asarray(a)).reshape(-1) for a in leaves]
    out = []
    for x0, x1, y0, y1, z0, z1 in zip(*vals):
        if (int(z0), int(z1)) == (0, 0):
            out.append(None)
        else:
            zi = HostFq2([int(z0), int(z1)]).inv()
            out.append((HostFq2([int(x0), int(x1)]) * zi,
                        HostFq2([int(y0), int(y1)]) * zi))
    return out


# ---------------- pallas kernels (TPU) ----------------

@lru_cache(maxsize=None)
def _g1_add_kernel_red(batch, tile):
    """Tiled complete G1 add on (RL, batch) int32 red digits."""

    def kernel(consts, x1, y1, z1, x2, y2, z2, ox, oy, oz):
        ops = mk_red_ops(consts[:])
        rx, ry, rz = g1_add_red(ops, (x1[:], y1[:], z1[:]),
                                (x2[:], y2[:], z2[:]))
        ox[:], oy[:], oz[:] = rx, ry, rz

    grid = (batch // tile,)
    spec = pl.BlockSpec((RL, tile), lambda i: (0, i), memory_space=pltpu.VMEM)
    cspec = pl.BlockSpec((RL, 8), lambda i: (0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[cspec] + [spec] * 6,
        out_specs=[spec] * 3,
        out_shape=[jax.ShapeDtypeStruct((RL, batch), jnp.int32)] * 3,
    )


@lru_cache(maxsize=None)
def _g2_add_kernel_red(batch, tile):
    def kernel(consts, b3, x10, x11, y10, y11, z10, z11,
               x20, x21, y20, y21, z20, z21,
               ox0, ox1, oy0, oy1, oz0, oz1):
        ops = mk_red_ops(consts[:])
        b3p = (b3[:, 0:1], b3[:, 1:2])
        rx, ry, rz = g2_add_red(
            ops, b3p,
            ((x10[:], x11[:]), (y10[:], y11[:]), (z10[:], z11[:])),
            ((x20[:], x21[:]), (y20[:], y21[:]), (z20[:], z21[:])))
        ox0[:], ox1[:] = rx
        oy0[:], oy1[:] = ry
        oz0[:], oz1[:] = rz

    grid = (batch // tile,)
    spec = pl.BlockSpec((RL, tile), lambda i: (0, i), memory_space=pltpu.VMEM)
    cspec = pl.BlockSpec((RL, 8), lambda i: (0, 0), memory_space=pltpu.VMEM)
    bspec = pl.BlockSpec((RL, 2), lambda i: (0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[cspec, bspec] + [spec] * 12,
        out_specs=[spec] * 6,
        out_shape=[jax.ShapeDtypeStruct((RL, batch), jnp.int32)] * 6,
    )


def _pick_tile(total):
    if total <= _BATCH_TILE:
        return total
    return _BATCH_TILE if total % _BATCH_TILE == 0 else 128


def _g1_add_red_dev(consts, p, q):
    """Full-width complete add, pallas on TPU / plain jnp elsewhere.
    Coords are (RL, B) with B a multiple of 128."""
    if use_pallas():
        b = p[0].shape[1]
        return _g1_add_kernel_red(b, _pick_tile(b))(consts, *p, *q)
    ops = mk_red_ops(consts)
    return g1_add_red(ops, p, q)


def _g2_add_red_dev(consts, b3, p, q):
    if use_pallas():
        b = p[0][0].shape[1]
        leaves = [p[0][0], p[0][1], p[1][0], p[1][1], p[2][0], p[2][1],
                  q[0][0], q[0][1], q[1][0], q[1][1], q[2][0], q[2][1]]
        o = _g2_add_kernel_red(b, _pick_tile(b))(consts, b3, *leaves)
        return ((o[0], o[1]), (o[2], o[3]), (o[4], o[5]))
    ops = mk_red_ops(consts)
    b3p = (b3[:, 0:1], b3[:, 1:2])
    return g2_add_red(ops, b3p, p, q)


@lru_cache(maxsize=None)
def _k_fold_grid_red(c, n_win):
    """Weighted bucket fold, one grid step per window (red core).

    Input (RL, n_win*2^c) coord planes; output same shape with window w's
    weighted sum sum_b b*S_b in lane w*2^c.  Bit-plane formulation (MSB
    first): c planes, each a roll-halving masked tree + Horner double/add."""
    n_buckets = 1 << c

    def kernel(consts, x, y, z, ox, oy, oz):
        ops = mk_red_ops(consts[:])
        bx, by, bz = x[:], y[:], z[:]
        zero = bx * 0
        one_full = zero + consts[:RL, 3:4]
        idx = jax.lax.broadcasted_iota(jnp.int32, (1, n_buckets), 1)
        levels = c

        def plane(kk, acc):
            bit = jnp.int32(c - 1) - kk
            mask = ((idx >> bit) & 1) != 0
            px = jnp.where(mask, bx, zero)
            py = jnp.where(mask, by, one_full)
            pz = jnp.where(mask, bz, zero)

            def tree_level(i, cur):
                half = jnp.int32(n_buckets) >> (i + 1)
                shift = jnp.int32(n_buckets) - half
                cx2, cy2, cz2 = cur
                rx = pltpu.roll(cx2, shift, 1)
                ry = pltpu.roll(cy2, shift, 1)
                rz = pltpu.roll(cz2, shift, 1)
                return g1_add_red(ops, (cx2, cy2, cz2), (rx, ry, rz))

            cur = jax.lax.fori_loop(0, levels, tree_level, (px, py, pz))
            a2 = g1_double_red(ops, acc)
            return g1_add_red(ops, a2, cur)

        acc = (zero, one_full, zero)
        acc = jax.lax.fori_loop(0, c, plane, acc)
        ox[:], oy[:], oz[:] = acc

    cspec = pl.BlockSpec((RL, 8), lambda i: (0, 0), memory_space=pltpu.VMEM)
    spec = pl.BlockSpec((RL, n_buckets), lambda i: (0, i),
                        memory_space=pltpu.VMEM)
    total = n_win * n_buckets
    return pl.pallas_call(
        kernel,
        grid=(n_win,),
        in_specs=[cspec, spec, spec, spec],
        out_specs=[spec] * 3,
        out_shape=[jax.ShapeDtypeStruct((RL, total), jnp.int32)] * 3,
    )


@lru_cache(maxsize=None)
def _k_horner_all_red(c, n_win):
    """Whole window-Horner in one kernel (red core): acc <- 2^c*acc + S_w,
    MSB window first.  Input (RL, n_win*128) with window w's value in lane
    w*128; output (RL, 128), lane 0 live."""
    nb = 128
    total = n_win * nb

    def kernel(consts, wx, wy, wz, ox, oy, oz):
        ops = mk_red_ops(consts[:])
        zero = wx[:, :nb] * 0
        one128 = zero + consts[:RL, 3:4]
        rx = pltpu.roll(wx[:], nb, 1)
        ry = pltpu.roll(wy[:], nb, 1)
        rz = pltpu.roll(wz[:], nb, 1)

        def win(i, st):
            ax, ay, az, qx, qy, qz = st

            def d(_, cur):
                return g1_double_red(ops, cur)

            a = jax.lax.fori_loop(0, c, d, (ax, ay, az))
            a = g1_add_red(ops, a, (qx[:, :nb], qy[:, :nb], qz[:, :nb]))
            return (a[0], a[1], a[2], pltpu.roll(qx, nb, 1),
                    pltpu.roll(qy, nb, 1), pltpu.roll(qz, nb, 1))

        st = jax.lax.fori_loop(0, n_win, win,
                               (zero, one128, zero, rx, ry, rz))
        ox[:], oy[:], oz[:] = st[0], st[1], st[2]

    cspec = pl.BlockSpec((RL, 8), lambda: (0, 0), memory_space=pltpu.VMEM)
    spec = pl.BlockSpec((RL, total), lambda: (0, 0), memory_space=pltpu.VMEM)
    ospec = pl.BlockSpec((RL, nb), lambda: (0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        in_specs=[cspec] + [spec] * 3,
        out_specs=[ospec] * 3,
        out_shape=[jax.ShapeDtypeStruct((RL, nb), jnp.int32)] * 3,
    )


@lru_cache(maxsize=None)
def _k_double_n_add_red(n_doubles):
    """acc <- 2^n * p + q at 128-lane ballast width (lane 0 live): n
    doublings under fori_loop then one add.  Used to fold a tail group
    (different dense capacity) into the main accumulator on device."""
    nb = 128

    def kernel(consts, px, py, pz, qx, qy, qz, ox, oy, oz):
        ops = mk_red_ops(consts[:])

        def d(_, cur):
            return g1_double_red(ops, cur)

        a = jax.lax.fori_loop(0, n_doubles, d, (px[:], py[:], pz[:]))
        a = g1_add_red(ops, a, (qx[:], qy[:], qz[:]))
        ox[:], oy[:], oz[:] = a

    cspec = pl.BlockSpec((RL, 8), lambda: (0, 0), memory_space=pltpu.VMEM)
    spec = pl.BlockSpec((RL, nb), lambda: (0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        in_specs=[cspec] + [spec] * 6,
        out_specs=[spec] * 3,
        out_shape=[jax.ShapeDtypeStruct((RL, nb), jnp.int32)] * 3,
    )


@lru_cache(maxsize=None)
def _k_double_n_add_red_g2(n_doubles):
    nb = 128

    def kernel(consts, b3, px0, px1, py0, py1, pz0, pz1,
               qx0, qx1, qy0, qy1, qz0, qz1,
               ox0, ox1, oy0, oy1, oz0, oz1):
        ops = mk_red_ops(consts[:])
        b3p = (b3[:, 0:1], b3[:, 1:2])

        def d(_, cur):
            return g2_double_red(ops, b3p, cur)

        a = jax.lax.fori_loop(
            0, n_doubles, d,
            ((px0[:], px1[:]), (py0[:], py1[:]), (pz0[:], pz1[:])))
        a = g2_add_red(ops, b3p, a,
                       ((qx0[:], qx1[:]), (qy0[:], qy1[:]),
                        (qz0[:], qz1[:])))
        ox0[:], ox1[:] = a[0]
        oy0[:], oy1[:] = a[1]
        oz0[:], oz1[:] = a[2]

    cspec = pl.BlockSpec((RL, 8), lambda: (0, 0), memory_space=pltpu.VMEM)
    bspec = pl.BlockSpec((RL, 2), lambda: (0, 0), memory_space=pltpu.VMEM)
    spec = pl.BlockSpec((RL, nb), lambda: (0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        in_specs=[cspec, bspec] + [spec] * 12,
        out_specs=[spec] * 6,
        out_shape=[jax.ShapeDtypeStruct((RL, nb), jnp.int32)] * 6,
    )


@lru_cache(maxsize=None)
def _k_fold_grid_red_g2(c, n_win):
    n_buckets = 1 << c

    def kernel(consts, b3, x0, x1, y0, y1, z0, z1,
               ox0, ox1, oy0, oy1, oz0, oz1):
        ops = mk_red_ops(consts[:])
        b3p = (b3[:, 0:1], b3[:, 1:2])
        bx = (x0[:], x1[:])
        by = (y0[:], y1[:])
        bz = (z0[:], z1[:])
        zero = x0[:] * 0
        one0 = zero + consts[:RL, 3:4]
        idx = jax.lax.broadcasted_iota(jnp.int32, (1, n_buckets), 1)
        levels = c

        def sel(mask, p, q):
            return tuple(jnp.where(mask, a, b) for a, b in zip(p, q))

        def plane(kk, acc):
            bit = jnp.int32(c - 1) - kk
            mask = ((idx >> bit) & 1) != 0
            px = sel(mask, bx, (zero, zero))
            py = sel(mask, by, (one0, zero))
            pz = sel(mask, bz, (zero, zero))

            def roll2(p, shift):
                return (pltpu.roll(p[0], shift, 1),
                        pltpu.roll(p[1], shift, 1))

            def tree_level(i, cur):
                half = jnp.int32(n_buckets) >> (i + 1)
                shift = jnp.int32(n_buckets) - half
                cx2, cy2, cz2 = cur
                return g2_add_red(ops, b3p, (cx2, cy2, cz2),
                                  (roll2(cx2, shift), roll2(cy2, shift),
                                   roll2(cz2, shift)))

            cur = jax.lax.fori_loop(0, levels, tree_level, (px, py, pz))
            a2 = g2_double_red(ops, b3p, acc)
            return g2_add_red(ops, b3p, a2, cur)

        acc = ((zero, zero), (one0, zero), (zero, zero))
        acc = jax.lax.fori_loop(0, c, plane, acc)
        ox0[:], ox1[:] = acc[0]
        oy0[:], oy1[:] = acc[1]
        oz0[:], oz1[:] = acc[2]

    cspec = pl.BlockSpec((RL, 8), lambda i: (0, 0), memory_space=pltpu.VMEM)
    bspec = pl.BlockSpec((RL, 2), lambda i: (0, 0), memory_space=pltpu.VMEM)
    spec = pl.BlockSpec((RL, n_buckets), lambda i: (0, i),
                        memory_space=pltpu.VMEM)
    total = n_win * n_buckets
    return pl.pallas_call(
        kernel,
        grid=(n_win,),
        in_specs=[cspec, bspec] + [spec] * 6,
        out_specs=[spec] * 6,
        out_shape=[jax.ShapeDtypeStruct((RL, total), jnp.int32)] * 6,
    )


@lru_cache(maxsize=None)
def _k_horner_all_red_g2(c, n_win):
    nb = 128
    total = n_win * nb

    def kernel(consts, b3, wx0, wx1, wy0, wy1, wz0, wz1,
               ox0, ox1, oy0, oy1, oz0, oz1):
        ops = mk_red_ops(consts[:])
        b3p = (b3[:, 0:1], b3[:, 1:2])
        zero = wx0[:, :nb] * 0
        one0 = zero + consts[:RL, 3:4]
        q = [pltpu.roll(a[:], nb, 1)
             for a in (wx0, wx1, wy0, wy1, wz0, wz1)]

        def win(i, st):
            a = (st[0], st[1], st[2])
            qq = st[3:]

            def d(_, cur):
                return g2_double_red(ops, b3p, cur)

            a = jax.lax.fori_loop(0, c, d, a)
            a = g2_add_red(ops, b3p, a,
                           ((qq[0][:, :nb], qq[1][:, :nb]),
                            (qq[2][:, :nb], qq[3][:, :nb]),
                            (qq[4][:, :nb], qq[5][:, :nb])))
            return (a[0], a[1], a[2]) + tuple(
                pltpu.roll(x, nb, 1) for x in qq)

        acc = ((zero, zero), (one0, zero), (zero, zero))
        st = jax.lax.fori_loop(0, n_win, win,
                               (acc[0], acc[1], acc[2]) + tuple(q))
        ox0[:], ox1[:] = st[0]
        oy0[:], oy1[:] = st[1]
        oz0[:], oz1[:] = st[2]

    cspec = pl.BlockSpec((RL, 8), lambda: (0, 0), memory_space=pltpu.VMEM)
    bspec = pl.BlockSpec((RL, 2), lambda: (0, 0), memory_space=pltpu.VMEM)
    spec = pl.BlockSpec((RL, total), lambda: (0, 0), memory_space=pltpu.VMEM)
    ospec = pl.BlockSpec((RL, nb), lambda: (0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        in_specs=[cspec, bspec] + [spec] * 6,
        out_specs=[ospec] * 6,
        out_shape=[jax.ShapeDtypeStruct((RL, nb), jnp.int32)] * 6,
    )


# ---------------- jnp reference stages (CPU test path) ----------------

def _fold_ref(consts, coords, c, n_win, g2=False, b3=None):
    """jnp bit-plane weighted fold over (RL, n_win*2^c) planes; returns the
    same layout as the gridded kernel (window sums in lane w*2^c)."""
    ops = mk_red_ops(consts)
    n_buckets = 1 << c
    if g2:
        b3p = (b3[:, 0:1], b3[:, 1:2])
        addf = lambda p, q: g2_add_red(ops, b3p, p, q)
        dblf = lambda p: g2_double_red(ops, b3p, p)
    else:
        addf = lambda p, q: g1_add_red(ops, p, q)
        dblf = lambda p: g1_double_red(ops, p)

    def resh(a):
        return a.reshape(RL, n_win, n_buckets)

    def cmap(f, p):
        if g2:
            return tuple((f(a[0]), f(a[1])) for a in p)
        return tuple(f(a) for a in p)

    planes = cmap(resh, coords)
    zero = jnp.zeros((RL, n_win, n_buckets), jnp.int32)
    one = zero + jnp.asarray(_one_red_col()).reshape(RL, 1, 1)
    ident = (((zero, zero), (one, zero), (zero, zero)) if g2
             else (zero, one, zero))
    zero1 = jnp.zeros((RL, n_win, 1), jnp.int32)
    one1 = zero1 + jnp.asarray(_one_red_col()).reshape(RL, 1, 1)
    ident1 = (((zero1, zero1), (one1, zero1), (zero1, zero1)) if g2
              else (zero1, one1, zero1))
    idx = jnp.arange(n_buckets)

    def sel(mask, p, q):
        if g2:
            return tuple(
                (jnp.where(mask, a[0], b[0]), jnp.where(mask, a[1], b[1]))
                for a, b in zip(p, q))
        return tuple(jnp.where(mask, a, b) for a, b in zip(p, q))

    acc = ident1
    for plane_i in range(c):
        bit = c - 1 - plane_i
        mask = ((idx >> bit) & 1) != 0
        cur = sel(mask[None, None, :], planes, ident)
        half = n_buckets
        while half > 1:
            half //= 2
            lhs = cmap(lambda a: a[:, :, :half], cur)
            rhs = cmap(lambda a: a[:, :, half:2 * half], cur)
            cur = addf(lhs, rhs)
        acc = addf(dblf(acc), cur)
    # place window sums at lane w*n_buckets like the kernel output
    pad = n_buckets - 1

    def place(a):
        return jnp.pad(a, ((0, 0), (0, 0), (0, pad))).reshape(RL, -1)

    return cmap(place, acc)


def _horner_ref(consts, w128, c, n_win, g2=False, b3=None):
    """jnp window Horner over (RL, n_win*128) planes -> (RL, 1) coords."""
    ops = mk_red_ops(consts)
    if g2:
        b3p = (b3[:, 0:1], b3[:, 1:2])
        addf = lambda p, q: g2_add_red(ops, b3p, p, q)
        dblf = lambda p: g2_double_red(ops, b3p, p)
    else:
        addf = lambda p, q: g1_add_red(ops, p, q)
        dblf = lambda p: g1_double_red(ops, p)

    def pick(a, w):
        return jax.lax.dynamic_slice(a, (0, w * 128), (RL, 1))

    def cmap(f, p, *extra):
        if g2:
            return tuple((f(a[0], *extra), f(a[1], *extra)) for a in p)
        return tuple(f(a, *extra) for a in p)

    zero = jnp.zeros((RL, 1), jnp.int32)
    one = zero + jnp.asarray(_one_red_col())
    acc = (((zero, zero), (one, zero), (zero, zero)) if g2
           else (zero, one, zero))
    for w in range(n_win - 1, -1, -1):
        for _ in range(c):
            acc = dblf(acc)
        acc = addf(acc, cmap(pick, w128, w))
    return acc


# ---------------- the fused dense pipeline ----------------

# ---------------- the fused dense pipeline ----------------

def _pow2ceil(n):
    return max(1, 1 << (int(n) - 1).bit_length())


def _window_ks(b, c, digits_np):
    """Per-window pow2 dense capacity.  Bucket 0 is EXCLUDED from the counts
    (its weight in the fold is zero, so its slot may silently truncate):
    all-zero windows and the zero-heavy top window of narrow scalar ranges
    cost the uniform floor capacity instead of blowing up the plan."""
    import math
    n_buckets = 1 << c
    mean = max(1, b >> c)
    floor = mean + 4 * int(math.isqrt(mean)) + 8
    ks = []
    for w in range(digits_np.shape[0]):
        counts = np.bincount(digits_np[w], minlength=n_buckets)
        mx = int(counts[1:].max())
        need = max(mx + 4 * int(math.isqrt(mx)) + 8, floor) \
            if mx > floor else floor
        ks.append(_pow2ceil(need))
    return ks


def _leaves(p, g2):
    if g2:
        return [p[0][0], p[0][1], p[1][0], p[1][1], p[2][0], p[2][1]]
    return list(p)


def _nest(leaves, g2):
    if g2:
        return ((leaves[0], leaves[1]), (leaves[2], leaves[3]),
                (leaves[4], leaves[5]))
    return tuple(leaves)


def _pipeline(consts, b3, rows, one, digits_grp, b, c, k, nw, affine, g2):
    """One dense group: digits_grp (nw, b) -> ((RL, 128)-ballast coord
    leaves with lane 0 live, overflow flag).  Traced (called under jit)."""
    n_buckets = 1 << c
    nw_pad = _pow2ceil(nw)
    n_slots = nw * n_buckets
    n_slots_pad = nw_pad * n_buckets
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
    starts = jnp.where(real, jnp.searchsorted(sk, q, side='left'), total)
    ends = jnp.where(real, jnp.searchsorted(sk, q, side='right'), total)
    live = real & ((slots & (n_buckets - 1)) != 0)
    ovf = jnp.any(jnp.where(live, ends - starts, 0) > k)
    j = jnp.arange(k, dtype=jnp.int32)
    src_sorted = starts[:, None] + j[None, :]
    valid = (src_sorted < ends[:, None]).reshape(-1)[None]
    src_orig = jnp.take(
        orig, jnp.clip(src_sorted.reshape(-1), 0, total - 1))
    g = jnp.take(rows, src_orig, axis=0).T
    zero_i = jnp.int32(0)

    def plane(ci, ident):
        return jnp.where(valid, g[ci * RL:(ci + 1) * RL], ident)

    if g2:
        if affine:
            zc0 = jnp.where(valid, one, zero_i)
            planes = [plane(0, zero_i), plane(1, zero_i),
                      plane(2, one), plane(3, zero_i),
                      zc0, jnp.zeros_like(zc0)]
        else:
            planes = [plane(0, zero_i), plane(1, zero_i),
                      plane(2, one), plane(3, zero_i),
                      plane(4, zero_i), plane(5, zero_i)]
        dense = _nest(planes, True)
    else:
        if affine:
            zc = jnp.where(valid, one, zero_i)
            dense = (plane(0, zero_i), plane(1, one), zc)
        else:
            dense = (plane(0, zero_i), plane(1, one), plane(2, zero_i))

    def cmap(f, p):
        if g2:
            return tuple((f(a[0]), f(a[1])) for a in p)
        return tuple(f(a) for a in p)

    per = k
    while per > 1:
        half = per // 2
        resh = cmap(lambda a: a.reshape(RL, n_slots_pad, per), dense)
        lhs = cmap(lambda a: a[:, :, :half].reshape(RL, -1), resh)
        rhs = cmap(lambda a: a[:, :, half:].reshape(RL, -1), resh)
        if g2:
            dense = _g2_add_red_dev(consts, b3, lhs, rhs)
        else:
            dense = _g1_add_red_dev(consts, lhs, rhs)
        per = half

    if use_pallas():
        if g2:
            f = _k_fold_grid_red_g2(c, nw_pad)(consts, b3, *_leaves(dense, True))
            folded = _nest(list(f), True)
        else:
            folded = _k_fold_grid_red(c, nw_pad)(consts, *dense)
    else:
        folded = _fold_ref(consts, dense, c, nw_pad, g2=g2, b3=b3)

    w128 = cmap(lambda a: a.reshape(RL, nw_pad, n_buckets)[:, :, :128]
                .reshape(RL, -1), folded)
    if use_pallas():
        if g2:
            h = _k_horner_all_red_g2(c, nw_pad)(consts, b3, *_leaves(w128, True))
            return list(h), ovf
        h = _k_horner_all_red(c, nw_pad)(consts, *w128)
        return list(h), ovf
    res = _horner_ref(consts, w128, c, nw_pad, g2=g2, b3=b3)
    return [jnp.pad(a, ((0, 0), (0, 127))) for a in _leaves(res, g2)], ovf


def _group_horner(consts, b3, stacked, c_per, n_groups, g2):
    """Combine per-group results R_g (leaves of (n_groups, RL, 128)) into
    sum_g 2^(c_per*g) R_g at (RL, 128) ballast width."""
    w = [jnp.moveaxis(a, 0, 1).reshape(RL, n_groups * 128) for a in stacked]
    if use_pallas():
        if g2:
            return list(_k_horner_all_red_g2(c_per, n_groups)(
                consts, b3, *w))
        return list(_k_horner_all_red(c_per, n_groups)(consts, *w))
    res = _horner_ref(consts, _nest(w, g2), c_per, n_groups, g2=g2, b3=b3)
    return [jnp.pad(a, ((0, 0), (0, 127))) for a in _leaves(res, g2)]


def _double_n_add(consts, b3, p_leaves, q_leaves, n_doubles, g2):
    """2^n * P + Q at (RL, 128) ballast width."""
    if use_pallas():
        if g2:
            return list(_k_double_n_add_red_g2(n_doubles)(
                consts, b3, *(p_leaves + q_leaves)))
        return list(_k_double_n_add_red(n_doubles)(
            consts, *(p_leaves + q_leaves)))
    ops = mk_red_ops(consts)
    if g2:
        b3p = (b3[:, 0:1], b3[:, 1:2])
        acc = _nest(p_leaves, True)
        for _ in range(n_doubles):
            acc = g2_double_red(ops, b3p, acc)
        acc = g2_add_red(ops, b3p, acc, _nest(q_leaves, True))
        return _leaves(acc, True)
    acc = _nest(p_leaves, False)
    for _ in range(n_doubles):
        acc = g1_double_red(ops, acc)
    acc = g1_add_red(ops, acc, _nest(q_leaves, False))
    return _leaves(acc, False)


@lru_cache(maxsize=None)
def _jit_msm_dense_multi(b, c, affine, g2, main_nw, n_groups, main_k,
                         tail_start, tail_nw, tail_k):
    """The whole MSM in ONE jit / one device dispatch.

    Windows [0, n_groups*main_nw) (zero-padded above the real top main
    window) run as a lax.scan over uniform groups of main_nw windows with
    capacity main_k; the remaining tail_nw windows (the structurally skewed
    top window) run once at capacity tail_k and are shifted into place with
    c*tail_start on-device doublings.  digits_main: (n_groups*main_nw, b);
    digits_tail: (tail_nw, b)."""
    n_planes = 6 if g2 else 3
    n_gather = n_planes - (2 if (affine and g2) else 1 if affine else 0)
    rows_used = n_gather * RL
    rows_pad = max(64, _pow2ceil(rows_used))
    consts_np = _g1_consts_red()
    b3_np = _g2_b3_red() if g2 else None

    @jax.jit
    def run(points, digits_main, digits_tail):
        consts = jnp.asarray(consts_np)
        b3 = jnp.asarray(b3_np) if g2 else None
        one = jnp.asarray(_one_red_col())
        leaves = _leaves(points, g2)[:n_gather]
        rows = jnp.concatenate(leaves, axis=0)
        rows = jnp.pad(rows, ((0, rows_pad - rows_used), (0, 0))).T

        ovf = jnp.bool_(False)
        res_m = None
        if n_groups == 1:
            res_m, o = _pipeline(consts, b3, rows, one, digits_main,
                                 b, c, main_k, main_nw, affine, g2)
            ovf |= o
        elif n_groups > 1:
            dg = digits_main.reshape(n_groups, main_nw, b)

            def step(carry, d):
                r, o = _pipeline(consts, b3, rows, one, d,
                                 b, c, main_k, main_nw, affine, g2)
                return carry, (r, o)

            _, (rs, ovfs) = jax.lax.scan(step, jnp.int32(0), dg)
            res_m = _group_horner(consts, b3, rs, c * main_nw,
                                  n_groups, g2)
            ovf |= jnp.any(ovfs)
        if tail_nw:
            res_t, o = _pipeline(consts, b3, rows, one, digits_tail,
                                 b, c, tail_k, tail_nw, affine, g2)
            ovf |= o
            if res_m is None:
                res = res_t
            else:
                res = _double_n_add(consts, b3, res_t, res_m,
                                    c * tail_start, g2)
        else:
            res = res_m
        out = _nest([a[:, :1] for a in res], g2)
        return out, ovf

    return run


def _static_plan_ks(b, c, n_windows, scalar_bits=254):
    """Distribution-free per-window capacities for uniform-random scalars
    (e.g. the H query's iFFT outputs): no host digit inspection needed, so
    device-resident digits never cross the tunnel.  The overflow flag backs
    this up - on the (astronomically rare) overflow the driver replans from
    host digits."""
    import math
    mean = max(1, b >> c)
    k_uni = _pow2ceil(mean + 4 * int(math.isqrt(mean)) + 8)
    ks = [k_uni] * n_windows
    top_bits = scalar_bits - (n_windows - 1) * c
    if n_windows > 1 and 0 < top_bits < c:
        mean_top = max(1, b >> top_bits)
        ks[-1] = _pow2ceil(2 * mean_top + 6 * int(math.isqrt(mean_top)) + 16)
    return ks


def _plan(ks, c, max_lanes):
    """(main_nw, n_groups, main_k, tail_start, tail_nw, tail_k, m)."""
    n_windows = len(ks)
    main_k = max(ks[:-1]) if n_windows > 1 else ks[0]
    if n_windows > 1 and ks[-1] > main_k:
        tail_nw, tail_k, tail_start = 1, ks[-1], n_windows - 1
    else:
        tail_nw, tail_k, tail_start = 0, 0, 0
        main_k = max(ks)
    m = n_windows - tail_nw
    budget_nw = max(1, max_lanes // ((1 << c) * main_k))
    main_nw = min(1 << (budget_nw.bit_length() - 1), _pow2ceil(m))
    n_groups = -(-m // main_nw)
    return main_nw, n_groups, main_k, tail_start, tail_nw, tail_k, m


def _dense_red_driver(points, digits, c, affine, g2, max_lanes, ks=None):
    n_windows, b = digits.shape
    if ks is None:
        digits = np.asarray(digits)
        ks = _window_ks(b, c, digits)
    main_nw, n_groups, main_k, tail_start, tail_nw, tail_k, m = \
        _plan(ks, c, max_lanes)
    pad_rows = n_groups * main_nw - m
    xp = np if isinstance(digits, np.ndarray) else jnp
    dm = digits[:m]
    if pad_rows:
        dm = xp.concatenate(
            [dm, xp.zeros((pad_rows, b), dtype=digits.dtype)])
    dt = digits[m:] if tail_nw else xp.zeros((1, b), digits.dtype)
    run = _jit_msm_dense_multi(b, c, affine, g2, main_nw, n_groups,
                               main_k, tail_start, tail_nw, tail_k)
    res, ovf = run(points, jnp.asarray(dm), jnp.asarray(dt))
    if bool(ovf):
        # static plan undershot (or stale cached capacities): replan from
        # the actual digits
        digits_np = np.asarray(digits)
        exact = _window_ks(b, c, digits_np)
        if exact == list(ks):
            raise AssertionError("dense MSM capacity overflow (plan bug)")
        return _dense_red_driver(points, digits_np, c, affine, g2,
                                 max_lanes, ks=exact)
    from_dev = g2_from_red if g2 else g1_from_red
    return from_dev(res)[0]


def msm_g1_dense_red(points, digits, c, affine=True, max_lanes=1 << 23,
                     static_plan=False):
    """Dense all-windows G1 MSM on the red core; host affine result.

    points: red (X, Y, Z) device arrays from :func:`g1_to_red` (Z ignored
    when ``affine`` - the caller promises no infinity inputs).

    static_plan: skip host digit inspection and use distribution-free
    capacities (keeps device-resident digits on-chip; use for uniform
    scalars like the prover's H query)."""
    ks = (_static_plan_ks(digits.shape[1], c, digits.shape[0])
          if static_plan else None)
    return _dense_red_driver(points, digits, c, affine, False, max_lanes,
                             ks=ks)


def msm_g2_dense_red(points, digits, c, affine=True, max_lanes=1 << 22,
                     static_plan=False):
    """Dense all-windows G2 MSM on the red core; host (Fq2, Fq2) result."""
    ks = (_static_plan_ks(digits.shape[1], c, digits.shape[0])
          if static_plan else None)
    return _dense_red_driver(points, digits, c, affine, True, max_lanes,
                             ks=ks)
