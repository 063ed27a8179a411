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

 - **One dispatch per MSM**: all window groups run inside a single jit
   (lax.scan over uniform groups + on-device group Horner + tail combine),
   so each MSM costs one host round trip on the axon tunnel instead of one
   per group.
 - **Identity substitution by gather redirect, never by select**: the
   point table carries one extra identity entry (0, 1, 0) at index b, and
   out-of-run lanes gather it via an arithmetic index blend.  Selects that
   substitute identity coordinates at 2^22-lane widths silently fail on
   the tail lanes on this stack (one corrupted slot, bit-identical across
   four graph variants - diagnosed with tools/debug_red_stage.py); the
   redirect also deletes three full-width where ops from the graph.
 - **Pairfold bucket reduction**: sum_b b*S_b via the split-half recursion
   W(S over B) = W(S_lo + S_hi over B/2) + (B/2)*total(S_hi), ~2*2^c point
   adds per window composed from tiled kernels at shrinking widths, vs the
   v1 single-kernel bit-plane fold's c^2*2^c full-width lane-adds (whose
   VMEM appetite capped c at 10).
 - **Bucket 0 excluded from capacity planning** (its fold weight is zero,
   so its slot may silently truncate): all-zero windows and the zero-heavy
   top window of narrow scalar ranges cost the uniform floor capacity.
 - **No generic-path fallback**: per-window capacities are computed from
   the actual digits (or a distribution-free static plan for uniform
   scalars, keeping device-resident digits on-chip); on the rare overflow
   the driver replans from host digits instead of switching formulation.

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
    ops = mk_red_ops(consts, engine='xla')
    return g1_add_red(ops, p, q)


def _g2_add_red_dev(consts, b3, p, q):
    if use_pallas():
        b = p[0][0].shape[1]
        leaves = [p[0][0], p[0][1], p[1][0], p[1][1], p[2][0], p[2][1],
                  q[0][0], q[0][1], q[1][0], q[1][1], q[2][0], q[2][1]]
        o = _g2_add_kernel_red(b, _pick_tile(b))(consts, b3, *leaves)
        return ((o[0], o[1]), (o[2], o[3]), (o[4], o[5]))
    ops = mk_red_ops(consts, engine='xla')
    b3p = (b3[:, 0:1], b3[:, 1:2])
    return g2_add_red(ops, b3p, p, q)


@lru_cache(maxsize=None)
def _g1_double_kernel_red(batch, tile):
    def kernel(consts, x, y, z, ox, oy, oz):
        ops = mk_red_ops(consts[:])
        rx, ry, rz = g1_double_red(ops, (x[:], y[:], z[:]))
        ox[:], oy[:], oz[:] = rx, ry, rz

    grid = (batch // tile,)
    spec = pl.BlockSpec((RL, tile), lambda i: (0, i), memory_space=pltpu.VMEM)
    cspec = pl.BlockSpec((RL, 8), lambda i: (0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[cspec] + [spec] * 3,
        out_specs=[spec] * 3,
        out_shape=[jax.ShapeDtypeStruct((RL, batch), jnp.int32)] * 3,
    )


@lru_cache(maxsize=None)
def _g2_double_kernel_red(batch, tile):
    def kernel(consts, b3, x0, x1, y0, y1, z0, z1,
               ox0, ox1, oy0, oy1, oz0, oz1):
        ops = mk_red_ops(consts[:])
        b3p = (b3[:, 0:1], b3[:, 1:2])
        rx, ry, rz = g2_double_red(
            ops, b3p, ((x0[:], x1[:]), (y0[:], y1[:]), (z0[:], z1[:])))
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
        in_specs=[cspec, bspec] + [spec] * 6,
        out_specs=[spec] * 6,
        out_shape=[jax.ShapeDtypeStruct((RL, batch), jnp.int32)] * 6,
    )


def _cmapf(f, p, g2):
    if g2:
        return tuple((f(a[0]), f(a[1])) for a in p)
    return tuple(f(a) for a in p)


def _padded_add(consts, b3, p, q, g2):
    """Complete add at any lane width (pads below the 128-lane minimum)."""
    w = (p[0][0] if g2 else p[0]).shape[1]
    pad = 128 - w if w < 128 else 0
    if pad:
        p = _cmapf(lambda a: jnp.pad(a, ((0, 0), (0, pad))), p, g2)
        q = _cmapf(lambda a: jnp.pad(a, ((0, 0), (0, pad))), q, g2)
    r = (_g2_add_red_dev(consts, b3, p, q) if g2
         else _g1_add_red_dev(consts, p, q))
    if pad:
        r = _cmapf(lambda a: a[:, :w], r, g2)
    return r


def _padded_dbl(consts, b3, p, g2):
    w = (p[0][0] if g2 else p[0]).shape[1]
    pad = 128 - w if w < 128 else 0
    if pad:
        p = _cmapf(lambda a: jnp.pad(a, ((0, 0), (0, pad))), p, g2)
    if use_pallas():
        wt = w + pad
        if g2:
            o = _g2_double_kernel_red(wt, _pick_tile(wt))(
                consts, b3, *_leaves(p, True))
            r = _nest(list(o), True)
        else:
            r = _g1_double_kernel_red(wt, _pick_tile(wt))(consts, *p)
    else:
        ops = mk_red_ops(consts, engine='xla')
        if g2:
            b3p = (b3[:, 0:1], b3[:, 1:2])
            r = g2_double_red(ops, b3p, p)
        else:
            r = g1_double_red(ops, p)
    if pad:
        r = _cmapf(lambda a: a[:, :w], r, g2)
    return r


def _pairfold(consts, b3, dense, c, nw_pad, g2):
    """Weighted bucket reduction sum_b b*S_b for every window: ~2*2^c point
    adds per window (vs c^2*2^c lane-adds for the bit-plane fold kernel),
    via the split-half recursion

        W(S over B buckets) = W(S_lo + S_hi over B/2) + (B/2) * total(S_hi)

    composed from the tiled add/double kernels at shrinking widths (XLA
    reshapes between calls are free).  dense: (RL, nw_pad*2^c) coord
    planes; returns leaves at the window-Horner layout (RL, nw_pad*128)
    with window w's weighted sum in lane w*128."""
    width = 1 << c
    cur = dense
    totals = []
    for _ in range(c):
        half = width // 2
        resh = _cmapf(lambda a: a.reshape(RL, nw_pad, width), cur, g2)
        lo = _cmapf(lambda a: a[:, :, :half].reshape(RL, -1), resh, g2)
        hi = _cmapf(lambda a: a[:, :, half:].reshape(RL, -1), resh, g2)
        t = hi
        w2 = half
        while w2 > 1:
            tr = _cmapf(lambda a: a.reshape(RL, nw_pad, w2), t, g2)
            tl = _cmapf(lambda a: a[:, :, :w2 // 2].reshape(RL, -1), tr, g2)
            th = _cmapf(lambda a: a[:, :, w2 // 2:].reshape(RL, -1), tr, g2)
            t = _padded_add(consts, b3, tl, th, g2)
            w2 //= 2
        totals.append(t)               # (RL, nw_pad): total of high half
        cur = _padded_add(consts, b3, lo, hi, g2)
        width = half
    # W = sum_i 2^(c-1-i) * T_i  (Horner, T_0 = most significant)
    zero = jnp.zeros((RL, nw_pad), jnp.int32)
    onec = zero + jnp.asarray(_one_red_col())
    acc = (((zero, zero), (onec, zero), (zero, zero)) if g2
           else (zero, onec, zero))
    for t in totals:
        acc = _padded_dbl(consts, b3, acc, g2)
        acc = _padded_add(consts, b3, acc, t, g2)
    return [jnp.pad(a.reshape(RL, nw_pad, 1), ((0, 0), (0, 0), (0, 127)))
            .reshape(RL, nw_pad * 128) for a in _leaves(acc, g2)]


def _pairfold_ref(consts, b3, dense, c, nw_pad, g2):
    """Value-equivalent bucket reduction for the OFF-TPU reference path:
    the classic Pippenger running-sum scan, W = sum_b suffix_sum(b), i.e.
    scanning b = 2^c-1 .. 1 with acc_sum += S_b; W += acc_sum - two point
    adds per bucket inside ONE lax.scan body.  The unrolled pairfold emits
    ~c^2/2 full point-formula graphs (hundreds of thousands of MLIR ops at
    prover widths), which XLA:CPU traces and compiles for tens of minutes;
    the scan body is two adds.  Same output layout as _pairfold."""
    width = 1 << c
    resh = _cmapf(lambda a: a.reshape(RL, nw_pad, width), dense, g2)

    zero = jnp.zeros((RL, nw_pad), jnp.int32)
    onec = zero + jnp.asarray(_one_red_col())
    ident = (((zero, zero), (onec, zero), (zero, zero)) if g2
             else (zero, onec, zero))

    def body(carry, b):
        s, wacc = carry
        sb = _cmapf(
            lambda a: jax.lax.dynamic_slice(
                a, (0, 0, b), (RL, nw_pad, 1)).reshape(RL, nw_pad),
            resh, g2)
        s = _padded_add(consts, b3, s, sb, g2)
        wacc = _padded_add(consts, b3, wacc, s, g2)
        return (s, wacc), None

    bs = jnp.arange(width - 1, 0, -1, dtype=jnp.int32)
    (_, wacc), _ = jax.lax.scan(body, (ident, ident), bs)
    return [jnp.pad(a.reshape(RL, nw_pad, 1), ((0, 0), (0, 0), (0, 127)))
            .reshape(RL, nw_pad * 128) for a in _leaves(wacc, g2)]


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

def _horner_ref(consts, w128, c, n_win, g2=False, b3=None):
    """jnp window Horner over (RL, n_win*128) planes -> (RL, 1) coords.

    Rolled as a lax.scan over windows (each step: c fori_loop doublings +
    one add): a python unroll emits n_win*(c+1) point-formula graphs -
    ~10^6 HLO ops at prover shapes - which XLA:CPU compiles for tens of
    minutes.  The pallas TPU path uses the compact in-kernel Horner."""
    ops = mk_red_ops(consts, engine='xla')
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

    def step(acc, w):
        acc = jax.lax.fori_loop(0, c, lambda _, p: dblf(p), acc)
        acc = addf(acc, cmap(pick, w128, w))
        return acc, None

    ws = jnp.arange(n_win - 1, -1, -1, dtype=jnp.int32)
    acc, _ = jax.lax.scan(step, acc, ws)
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


def _pipeline(consts, b3, rows, digits_grp, b, c, k, nw, g2):
    """One dense group: digits_grp (nw, b) -> ((RL, 128)-ballast coord
    leaves with lane 0 live, overflow flag).  Traced (called under jit).

    rows is the EXTENDED gather table (b+1, rows_pad): entry b is the
    identity point (0, 1, 0).  Out-of-run lanes gather it via an arithmetic
    index blend - NEVER via a select/where on the coordinate planes:
    identity-substituting wheres at 2^22-lane widths silently fail on the
    tail lanes on this stack (one corrupted slot, bit-identical across four
    different graph variants; see tools/debug_red_stage.py)."""
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
    # Capacity-MAJOR dense layout (lane order (j, slot), NOT (slot, j)):
    # the halving tree then slices the contiguous MAJOR axis.  With the
    # slot-major layout the tree slices half of a 128-wide minor dim, and
    # at (slots=8192, per=128) this stack miscompiles that pattern -
    # exactly ONE slot comes back corrupted (reproduced with identical
    # points and no sort/gather in the graph; same backend-miscompile
    # class as the select-lowering hazard above).  Major-axis slices are
    # layout-clean and verified correct at (8192,128)/(16384,64)/
    # (32768,256).
    src_sorted = starts[None, :] + j[:, None]        # (k, n_slots_pad)
    vflat = (src_sorted < ends[None, :]).reshape(-1).astype(jnp.int32)
    src_orig = jnp.take(
        orig, jnp.clip(src_sorted.reshape(-1), 0, total - 1))
    # arithmetic blend (immune to the select-lowering hazard): invalid
    # lanes fetch the identity entry at table index b
    src_safe = src_orig * vflat + (1 - vflat) * jnp.int32(b)
    # uint32 view: int32 gathers from narrow tables corrupt lanes at 2^22
    # indices on this stack; digits at rest are canonical [0, 4095]
    g = jnp.take(rows.astype(jnp.uint32), src_safe,
                 axis=0).T.astype(jnp.int32)

    def cmap(f, p):
        if g2:
            return tuple((f(a[0]), f(a[1])) for a in p)
        return tuple(f(a) for a in p)

    planes = [g[ci * RL:(ci + 1) * RL] for ci in range(6 if g2 else 3)]
    dense = _nest(planes, g2)

    per = k
    while per > 1:
        half = per // 2
        resh = cmap(lambda a: a.reshape(RL, per, n_slots_pad), dense)
        lhs = cmap(lambda a: a[:, :half].reshape(RL, -1), resh)
        rhs = cmap(lambda a: a[:, half:].reshape(RL, -1), resh)
        if g2:
            dense = _g2_add_red_dev(consts, b3, lhs, rhs)
        else:
            dense = _g1_add_red_dev(consts, lhs, rhs)
        per = half

    if use_pallas():
        folded = _pairfold(consts, b3, dense, c, nw_pad, g2)
    else:
        folded = _pairfold_ref(consts, b3, dense, c, nw_pad, g2)
    if use_pallas():
        if g2:
            h = _k_horner_all_red_g2(c, nw_pad)(consts, b3, *folded)
            return list(h), ovf
        h = _k_horner_all_red(c, nw_pad)(consts, *folded)
        return list(h), ovf
    res = _horner_ref(consts, _nest(folded, g2), c, nw_pad, g2=g2, b3=b3)
    return [jnp.pad(a, ((0, 0), (0, 127))) for a in _leaves(res, g2)], ovf


def _pipeline_emb(consts, b3, rows, digits_grp, b, c, k_sub, nw, h_split,
                  g2):
    """Embedded-index variant of :func:`_pipeline`: each window's b columns
    split into ``h_split`` contiguous sub-rows of bs = b/h_split, sorted
    ROW-WISE on a single uint32 key (digit << log2(bs) | column) - half the
    sort bytes of the composite key+value pair sort, no value operand, and
    a shorter sort network (log2(bs) < log2(nw*b) passes).  The original
    point index is recovered arithmetically from the sorted key, so the
    whole (key, iota) value channel disappears.

    Requires c + log2(bs) <= 32 and pow2 b.  k_sub is the PER-SUB-ROW
    dense capacity; the halving tree runs one level shallower and the two
    half-sums are folded with one extra full-bucket-width add before the
    pairfold.  Identity-redirect, capacity-major layout and bucket-0
    exclusion are identical to _pipeline."""
    n_buckets = 1 << c
    nw_pad = _pow2ceil(nw)
    bs = b // h_split
    log2bs = bs.bit_length() - 1
    assert c + log2bs <= 32 and (1 << log2bs) == bs
    nsub = nw * h_split
    nsub_pad = nw_pad * h_split
    n_slots = nsub * n_buckets
    n_slots_pad = nsub_pad * n_buckets

    dsub = digits_grp.reshape(nw, h_split, bs).reshape(nsub, bs)
    keys = ((dsub.astype(jnp.uint32) << log2bs)
            | jnp.arange(bs, dtype=jnp.uint32)[None, :])
    skeys = jax.lax.sort(keys, dimension=1)
    # original point index per sorted position (flattened (nsub*bs,))
    offs = ((jnp.arange(nsub, dtype=jnp.int32) % h_split) * bs)[:, None]
    orig = ((skeys & jnp.uint32(bs - 1)).astype(jnp.int32)
            + offs).reshape(-1)
    total = nsub * bs

    qs = (jnp.arange(n_buckets, dtype=jnp.uint32) << log2bs)
    starts_r = jax.vmap(
        lambda row: jnp.searchsorted(row, qs, side='left'))(skeys)
    ends_r = jnp.concatenate(
        [starts_r[:, 1:], jnp.full((nsub, 1), bs, jnp.int32)], axis=1)
    base = (jnp.arange(nsub, dtype=jnp.int32) * bs)[:, None]
    starts_flat = (starts_r + base).reshape(-1)
    ends_flat = (ends_r + base).reshape(-1)
    # pad sub-rows beyond nsub with empty runs at `total`
    pad_slots = n_slots_pad - n_slots
    if pad_slots:
        starts_flat = jnp.concatenate(
            [starts_flat, jnp.full((pad_slots,), total, jnp.int32)])
        ends_flat = jnp.concatenate(
            [ends_flat, jnp.full((pad_slots,), total, jnp.int32)])
    slots = jnp.arange(n_slots_pad, dtype=jnp.int32)
    live = (slots < n_slots) & ((slots & (n_buckets - 1)) != 0)
    ovf = jnp.any(jnp.where(live, ends_flat - starts_flat, 0) > k_sub)

    j = jnp.arange(k_sub, dtype=jnp.int32)
    src_sorted = starts_flat[None, :] + j[:, None]    # (k_sub, n_slots_pad)
    vflat = (src_sorted < ends_flat[None, :]).reshape(-1).astype(jnp.int32)
    src_orig = jnp.take(
        orig, jnp.clip(src_sorted.reshape(-1), 0, total - 1))
    src_safe = src_orig * vflat + (1 - vflat) * jnp.int32(b)
    g = jnp.take(rows.astype(jnp.uint32), src_safe,
                 axis=0).T.astype(jnp.int32)

    def cmap(f, p):
        if g2:
            return tuple((f(a[0]), f(a[1])) for a in p)
        return tuple(f(a) for a in p)

    planes = [g[ci * RL:(ci + 1) * RL] for ci in range(6 if g2 else 3)]
    dense = _nest(planes, g2)

    per = k_sub
    while per > 1:
        half = per // 2
        resh = cmap(lambda a: a.reshape(RL, per, n_slots_pad), dense)
        lhs = cmap(lambda a: a[:, :half].reshape(RL, -1), resh)
        rhs = cmap(lambda a: a[:, half:].reshape(RL, -1), resh)
        if g2:
            dense = _g2_add_red_dev(consts, b3, lhs, rhs)
        else:
            dense = _g1_add_red_dev(consts, lhs, rhs)
        per = half

    # fold the h_split half-sums per (window, bucket): sub-rows are
    # window-major (w*h_split + h), so the major axis reshapes cleanly
    while h_split > 1:
        half = h_split // 2
        resh = cmap(
            lambda a: a.reshape(RL, nw_pad, h_split, n_buckets), dense)
        lhs = cmap(lambda a: a[:, :, :half].reshape(RL, -1), resh)
        rhs = cmap(lambda a: a[:, :, half:].reshape(RL, -1), resh)
        if g2:
            dense = _g2_add_red_dev(consts, b3, lhs, rhs)
        else:
            dense = _g1_add_red_dev(consts, lhs, rhs)
        h_split = half

    if use_pallas():
        folded = _pairfold(consts, b3, dense, c, nw_pad, g2)
    else:
        folded = _pairfold_ref(consts, b3, dense, c, nw_pad, g2)
    if use_pallas():
        if g2:
            h = _k_horner_all_red_g2(c, nw_pad)(consts, b3, *folded)
            return list(h), ovf
        h = _k_horner_all_red(c, nw_pad)(consts, *folded)
        return list(h), ovf
    res = _horner_ref(consts, _nest(folded, g2), c, nw_pad, g2=g2, b3=b3)
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
    ops = mk_red_ops(consts, engine='xla')
    # fori_loop, not a python unroll: n_doubles is c*tail_start (can be
    # 200+), and an unrolled graph takes XLA:CPU tens of minutes to compile
    if g2:
        b3p = (b3[:, 0:1], b3[:, 1:2])
        acc = jax.lax.fori_loop(
            0, n_doubles, lambda _, p: g2_double_red(ops, b3p, p),
            _nest(p_leaves, True))
        acc = g2_add_red(ops, b3p, acc, _nest(q_leaves, True))
        return _leaves(acc, True)
    acc = jax.lax.fori_loop(
        0, n_doubles, lambda _, p: g1_double_red(ops, p),
        _nest(p_leaves, False))
    acc = g1_add_red(ops, acc, _nest(q_leaves, False))
    return _leaves(acc, False)


def _ident_table_np(g2):
    """(rows_used, 1) identity table column: x = 0, y = one_mont, z = 0."""
    n_planes = 6 if g2 else 3
    rows_used = n_planes * RL
    ident_np = np.zeros((rows_used, 1), dtype=np.int32)
    y0_row = 2 * RL if g2 else RL
    ident_np[y0_row:y0_row + RL, 0] = _one_red_col()[:, 0]
    return ident_np


def _msm_scan_accum(points, digits, b, c, g2):
    """Exact scan-accumulate Pippenger for SMALL batches off-TPU.

    Sequentially folds each point into bucket digit[w, i] of every window
    with ONE complete-add body under lax.scan (buckets (RL, nw, 2^c); the
    gather/scatter per step touches one bucket per window), then the usual
    pairfold + window Horner.  No sort, no dense gather, no capacity
    planning - and therefore NO overflow/replan path: exact for any digit
    distribution (digits must only honor the < 2^c row contract).

    Why it exists: the dense single-dispatch pipeline inlines ~25 point-
    formula bodies whose XLA:CPU optimization takes minutes per MSM
    executable - a cold 8-device dryrun on a 2-core CI box blows the
    driver budget (MULTICHIP_r03 rc=124).  This variant compiles in
    seconds.  Runtime is O(b * nw) sequential lane-adds, so it only makes
    sense for small per-shard batches (the virtual-mesh dryrun, CI tests);
    the TPU production path keeps the dense pipeline + Pallas kernels.

    Returns (nested (RL, 1) coords, ovf=False scalar)."""
    nw = digits.shape[0]
    n_buckets = 1 << c
    consts = jnp.asarray(_g1_consts_red())
    b3 = jnp.asarray(_g2_b3_red()) if g2 else None
    ops = mk_red_ops(consts, engine='xla')
    if g2:
        b3p = (b3[:, 0:1], b3[:, 1:2])
        addf = lambda p, q: g2_add_red(ops, b3p, p, q)
    else:
        addf = lambda p, q: g1_add_red(ops, p, q)

    def cmap(f, p):
        if g2:
            return tuple((f(a[0]), f(a[1])) for a in p)
        return tuple(f(a) for a in p)

    zero = jnp.zeros((RL, nw, n_buckets), jnp.int32)
    onec = zero + jnp.asarray(_one_red_col())[:, :, None]
    buckets0 = (((zero, zero), (onec, zero), (zero, zero)) if g2
                else (zero, onec, zero))
    warr = jnp.arange(nw, dtype=jnp.int32)
    pts_cols = cmap(lambda a: jnp.moveaxis(a, 0, 1), points)  # (b, RL)
    dcols = digits.T.astype(jnp.int32)                        # (b, nw)

    def step(buckets, x):
        dcol, pcols = x
        cur = cmap(lambda a: a[:, warr, dcol], buckets)       # (RL, nw)
        pt = cmap(lambda a: jnp.broadcast_to(a[:, None], (RL, nw)), pcols)
        new = addf(cur, pt)
        buckets = jax.tree_util.tree_map(
            lambda bk, nv: bk.at[:, warr, dcol].set(nv), buckets, new)
        return buckets, None

    buckets, _ = jax.lax.scan(step, buckets0, (dcols, pts_cols))
    dense = cmap(lambda a: a.reshape(RL, nw * n_buckets), buckets)
    folded = _pairfold_ref(consts, b3, dense, c, nw, g2)
    res = _horner_ref(consts, _nest(folded, g2), c, nw, g2=g2, b3=b3)
    out = _nest([a[:, :1] for a in _leaves(res, g2)], g2)
    return out, jnp.bool_(False)


def _msm_dense_traced(points, digits_main, digits_tail, b, c, g2, main_nw,
                      n_groups, main_k, tail_start, tail_nw, tail_k,
                      tail_c, h_split=1):
    """Traced whole-MSM body (shared by the single-chip jit wrapper and the
    shard_map sharded driver).

    Windows [0, n_groups*main_nw) (zero-padded above the real top main
    window) run as a lax.scan over uniform groups of main_nw windows with
    capacity main_k; the remaining tail_nw windows (the structurally skewed
    top window) run once at capacity tail_k and are shifted into place with
    c*tail_start on-device doublings.  The tail runs at its OWN bucket
    width 2^tail_c (the top window of 254-bit scalars spans only
    254 - (n_win-1)*c bits; at the shared width its dense matrix would be
    2^c slots x a huge capacity, nearly all identity ballast).
    digits_main: (n_groups*main_nw, b); digits_tail: (tail_nw, b).

    Returns (nested (RL, 1) coords, overflow flag)."""
    n_planes = 6 if g2 else 3
    rows_used = n_planes * RL
    rows_pad = _pow2ceil(rows_used)
    consts = jnp.asarray(_g1_consts_red())
    b3 = jnp.asarray(_g2_b3_red()) if g2 else None
    leaves = _leaves(points, g2)
    rows = jnp.concatenate(leaves, axis=0)                 # (used, b)
    rows = jnp.concatenate([rows, jnp.asarray(_ident_table_np(g2))],
                           axis=1)
    rows = jnp.pad(rows, ((0, rows_pad - rows_used), (0, 0))).T

    def one_group(d):
        if h_split > 1:
            return _pipeline_emb(consts, b3, rows, d, b, c, main_k,
                                 main_nw, h_split, g2)
        return _pipeline(consts, b3, rows, d, b, c, main_k, main_nw, g2)

    ovf = jnp.bool_(False)
    res_m = None
    if n_groups == 1:
        res_m, o = one_group(digits_main)
        ovf |= o
    elif n_groups > 1:
        dg = digits_main.reshape(n_groups, main_nw, b)

        def step(carry, d):
            r, o = one_group(d)
            return carry, (r, o)

        _, (rs, ovfs) = jax.lax.scan(step, jnp.int32(0), dg)
        res_m = _group_horner(consts, b3, rs, c * main_nw,
                              n_groups, g2)
        ovf |= jnp.any(ovfs)
    if tail_nw:
        res_t, o = _pipeline(consts, b3, rows, digits_tail,
                             b, tail_c, tail_k, tail_nw, g2)
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


@lru_cache(maxsize=None)
def _jit_msm_dense_multi(b, c, g2, main_nw, n_groups, main_k,
                         tail_start, tail_nw, tail_k, tail_c, h_split=1):
    """The whole MSM in ONE jit / one device dispatch (see
    :func:`_msm_dense_traced` for the pipeline layout)."""

    @jax.jit
    def run(points, digits_main, digits_tail):
        return _msm_dense_traced(points, digits_main, digits_tail, b, c,
                                 g2, main_nw, n_groups, main_k, tail_start,
                                 tail_nw, tail_k, tail_c, h_split)

    return run


# ---------------- split-dispatch variant ----------------
#
# The single-dispatch module inlines the whole pipeline (group scan +
# pairfold + Horner + tail + combine).  For G2 the Fq2 point bodies triple
# the module size and the remote compile service rejects it at prover
# scales (HTTP 413 / AOT rejection - see PROVE_r04.json).  The split
# variant issues the SAME computation as a handful of small executables -
# one per window group (all groups share one compiled program), one tail
# pipeline, one group-Horner combine, one shift-and-add - trading a few
# host round trips on the axon tunnel for tractable module sizes.  This is
# the same medicine that fixed the 2^20 witness map (split per-transform
# dispatches, round 4).

@lru_cache(maxsize=None)
def _jit_rows_table(g2):
    """Points -> extended transposed gather table (b+1 rows incl. the
    identity entry; see _pipeline's docstring)."""
    n_planes = 6 if g2 else 3
    rows_used = n_planes * RL
    rows_pad = _pow2ceil(rows_used)
    ident_np = _ident_table_np(g2)

    @jax.jit
    def run(points):
        leaves = _leaves(points, g2)
        rows = jnp.concatenate(leaves, axis=0)
        rows = jnp.concatenate([rows, jnp.asarray(ident_np)], axis=1)
        return jnp.pad(rows, ((0, rows_pad - rows_used), (0, 0))).T

    return run


@lru_cache(maxsize=None)
def _jit_group_pipeline(b, c, k, nw, g2):
    """ONE dense group as its own executable (reused across groups)."""

    @jax.jit
    def run(rows, digits_grp):
        consts = jnp.asarray(_g1_consts_red())
        b3 = jnp.asarray(_g2_b3_red()) if g2 else None
        return _pipeline(consts, b3, rows, digits_grp, b, c, k, nw, g2)

    return run


@lru_cache(maxsize=None)
def _jit_groups_combine(c_per, n_groups, g2):
    """Stack per-group results and run the group Horner."""

    @jax.jit
    def run(group_leaves):
        consts = jnp.asarray(_g1_consts_red())
        b3 = jnp.asarray(_g2_b3_red()) if g2 else None
        stacked = [jnp.stack([g[i] for g in group_leaves], axis=0)
                   for i in range(len(group_leaves[0]))]
        return _group_horner(consts, b3, stacked, c_per, n_groups, g2)

    return run


@lru_cache(maxsize=None)
def _jit_shift_add(n_doubles, g2):
    """res = 2^n_doubles * p + q at (RL, 128) ballast width."""

    @jax.jit
    def run(p_leaves, q_leaves):
        consts = jnp.asarray(_g1_consts_red())
        b3 = jnp.asarray(_g2_b3_red()) if g2 else None
        return _double_n_add(consts, b3, list(p_leaves), list(q_leaves),
                             n_doubles, g2)

    return run


def _msm_dense_split(points, dm, dt, b, c, g2, main_nw, n_groups, main_k,
                     tail_start, tail_nw, tail_k, tail_c):
    """Split-dispatch twin of _jit_msm_dense_multi: identical math and
    layout contract, one executable per stage.  Returns (nested (RL, 1)
    coords, python-bool overflow flag)."""
    rows = _jit_rows_table(g2)(points)
    ovfs = []
    res_m = None
    if n_groups >= 1:
        grp = _jit_group_pipeline(b, c, main_k, main_nw, g2)
        outs = []
        for gi in range(n_groups):
            r, o = grp(rows, jnp.asarray(dm[gi * main_nw:
                                            (gi + 1) * main_nw]))
            outs.append(r)
            ovfs.append(o)
        if n_groups == 1:
            res_m = outs[0]
        else:
            res_m = _jit_groups_combine(c * main_nw, n_groups, g2)(
                tuple(tuple(o) for o in outs))
    if tail_nw:
        r_t, o = _jit_group_pipeline(b, tail_c, tail_k, tail_nw, g2)(
            rows, jnp.asarray(dt))
        ovfs.append(o)
        if res_m is None:
            res = r_t
        else:
            res = _jit_shift_add(c * tail_start, g2)(
                tuple(r_t), tuple(res_m))
    else:
        res = res_m
    out = _nest([a[:, :1] for a in res], g2)
    # one sync at the end: the per-group dispatches stream asynchronously
    ovf = any(bool(o) for o in ovfs)
    return out, ovf


def best_c(n):
    """Window bits minimizing dense-pipeline work for n uniform scalars.

    Per-window tree+gather work is ~2n lanes whenever the expected bucket
    occupancy n/2^c stays >= 32 (capacity k = pow2ceil(mean + 4*sqrt(mean)
    + 8) = 2*mean there; below that the pow2 rounding pushes k to 4*mean),
    and the pairfold adds only ~2*2^c per window - so total work is
    ~2n * ceil(254/c): maximize c subject to mean >= 32.  Capped at 13 so
    device-side digit extraction (window_digits_device, one 13-bit limb
    pair per window) keeps working."""
    import math
    return min(13, max(7, int(math.log2(max(2, n))) - 5))


def _est_k(mean):
    """Static pow2 capacity estimate for uniform occupancy `mean`."""
    import math
    mean = max(1, int(mean))
    return _pow2ceil(mean + 4 * int(math.isqrt(mean)) + 8)


def _should_merge_top(b, c, top_bits):
    """Merge the narrow (< 7-bit) top window into the window below it IFF
    the merged tail (2^(c+top_bits) buckets at normal occupancy) is cheaper
    than the unmerged tail (2^max(7,top_bits) buckets at b/2^top_bits
    occupancy).  Merging wins at large b (a 2^16/c=11 run allocated a ~4GB
    gather unmerged); at small b the pow2 capacity floor inverts the
    tradeoff and the skewed-but-small top window is cheaper left alone."""
    merged_cost = (1 << (c + top_bits)) * _est_k(b >> (c + top_bits))
    unmerged_cost = (1 << max(7, top_bits)) * _est_k(b >> top_bits)
    return merged_cost < unmerged_cost


def _static_plan_ks(b, c, n_windows, tail_bits):
    """Distribution-free per-window capacities for uniform-random scalars
    (e.g. the H query's iFFT outputs): no host digit inspection needed, so
    device-resident digits never cross the tunnel.  The overflow flag backs
    this up - on the (astronomically rare) overflow the driver replans from
    host digits.  tail_bits: bit span of the (possibly merged) top window."""
    import math
    from ..bn254 import CURVE_ORDER
    mean = max(1, b >> c)
    k_uni = _pow2ceil(mean + 4 * int(math.isqrt(mean)) + 8)
    ks = [k_uni] * n_windows
    if n_windows > 1 and tail_bits != c:
        # the top window's digits are uniform over [0, r >> (254-bits)],
        # not over the full 2^bits range
        n_top = max(1, CURVE_ORDER >> (254 - tail_bits))
        mean_top = max(1, b // n_top)
        ks[-1] = _pow2ceil(mean_top + 5 * int(math.isqrt(mean_top)) + 16)
    return ks


def _plan(ks, c, max_lanes, force_tail=False):
    """(main_nw, n_groups, main_k, tail_start, tail_nw, tail_k, m).

    force_tail is MANDATORY whenever the top window's digits can exceed
    2^c (merged tail): scheduling such a window into the main scan would
    spill its composite keys into the next window's bucket range and
    silently corrupt the result."""
    n_windows = len(ks)
    if n_windows > 1:
        main_k = max(ks[:-1])
        tail = force_tail or ks[-1] > main_k
    else:
        main_k = ks[0]
        tail = force_tail
    if tail:
        tail_nw, tail_k, tail_start = 1, ks[-1], n_windows - 1
    else:
        tail_nw, tail_k, tail_start = 0, 0, 0
        main_k = max(ks)
    m = n_windows - tail_nw
    if m == 0:
        return 1, 0, 0, tail_start, tail_nw, tail_k, 0
    budget_nw = max(1, max_lanes // ((1 << c) * main_k))
    cap = min(1 << (budget_nw.bit_length() - 1), _pow2ceil(m))
    # Group width: every padded row costs a full 2^c * main_k dense slab
    # in the gather + tree (the dominant device stages - measured 2^16/
    # c=11: 23 real windows padded to 32 wasted ~28% of the tree).  Pick
    # the LARGEST pow2 width whose total padded rows stay within ~12% of
    # m; scan-step overhead is small next to a slab.
    slack = max(1, m // 8)
    main_nw = 1
    w = cap
    while w >= 1:
        if (-(-m // w)) * w - m <= slack:
            main_nw = w
            break
        w //= 2
    n_groups = -(-m // main_nw)
    return main_nw, n_groups, main_k, tail_start, tail_nw, tail_k, m


def static_msm_plan(b, c, max_lanes=1 << 23, ks=None):
    """Distribution-free full plan for a b-point MSM over full 254-bit
    digit stacks (ceil(254/c) windows): the shape contract shared by the
    single-chip static path and the sharded driver.

    Returns a dict: n_windows_full (pre-merge digit rows expected), merged,
    tail_bits, ks, tc, and the _plan tuple fields."""
    nw_full = (254 + c - 1) // c
    top_bits = max(1, 254 - (nw_full - 1) * c)
    merged = (nw_full >= 2 and top_bits < 7
              and _should_merge_top(b, c, top_bits))
    n_windows = nw_full - 1 if merged else nw_full
    tail_bits = (c + top_bits if merged
                 else (top_bits if nw_full > 1 else c))
    if ks is None:
        ks = _static_plan_ks(b, c, n_windows, tail_bits)
    main_nw, n_groups, main_k, tail_start, tail_nw, tail_k, m = \
        _plan(ks, c, max_lanes, force_tail=merged)
    cap = tail_bits if merged else min(tail_bits, c)
    tc = max(7, cap) if tail_nw else 7
    return dict(n_windows_full=nw_full, n_windows=n_windows, merged=merged,
                tail_bits=tail_bits, ks=ks, main_nw=main_nw,
                n_groups=n_groups, main_k=main_k, tail_start=tail_start,
                tail_nw=tail_nw, tail_k=tail_k, m=m, tc=tc)


def merge_top_window_np(digits, c, plan):
    """Apply the plan's top-window merge to a host (nw_full, b) digit array
    and split into (digits_main zero-padded to n_groups*main_nw rows,
    digits_tail)."""
    assert digits.shape[0] == plan['n_windows_full'], \
        (digits.shape, plan['n_windows_full'])
    b = digits.shape[1]
    if plan['merged']:
        row = digits[-2] + (digits[-1].astype(np.uint32) << c)
        digits = np.concatenate([digits[:-2], row[None]], axis=0)
    m = plan['m']
    dm = digits[:m]
    pad_rows = plan['n_groups'] * plan['main_nw'] - m
    if pad_rows:
        dm = np.concatenate(
            [dm, np.zeros((pad_rows, b), dtype=digits.dtype)])
    dt = (digits[m:] if plan['tail_nw']
          else np.zeros((1, b), digits.dtype))
    return dm, dt


@lru_cache(maxsize=None)
def _jit_ones_sum(npad, g2):
    """Plain sum of the points selected by a (npad,) index vector (-1 =
    skip): gather-redirect to an identity table entry + halving add tree.
    Used for scalar==1 columns (ubiquitous in bit-decomposition circuits:
    the reference's multi_exp_with_mixed_addition filters them the same
    way, libsnark) - running them through Pippenger would blow the dense
    capacity of bucket 1."""
    consts_np = _g1_consts_red()
    b3_np = _g2_b3_red() if g2 else None
    n_planes = 6 if g2 else 3
    rows_used = n_planes * RL
    ident_np = np.zeros((rows_used, 1), dtype=np.int32)
    y0_row = 2 * RL if g2 else RL
    ident_np[y0_row:y0_row + RL, 0] = _one_red_col()[:, 0]

    @jax.jit
    def run(points, idx):
        consts = jnp.asarray(consts_np)
        b3 = jnp.asarray(b3_np) if g2 else None
        leaves = _leaves(points, g2)
        b = leaves[0].shape[1]
        rows = jnp.concatenate(leaves, axis=0)
        rows = jnp.concatenate([rows, jnp.asarray(ident_np)], axis=1).T
        sel = (idx >= 0).astype(jnp.int32)
        safe = jnp.maximum(idx, 0) * sel + (1 - sel) * jnp.int32(b)
        g = jnp.take(rows.astype(jnp.uint32), safe,
                     axis=0).T.astype(jnp.int32)
        cur = _nest([g[ci * RL:(ci + 1) * RL] for ci in range(n_planes)],
                    g2)
        w = npad
        while w > 1:
            half = w // 2
            lhs = _cmapf(lambda a: a[:, :half], cur, g2)
            rhs = _cmapf(lambda a: a[:, half:], cur, g2)
            cur = _padded_add(consts, b3, lhs, rhs, g2)
            w = half
        return cur

    return run


def _ones_sum_red(points, idx, g2):
    """Device sum of points[idx]; host point result."""
    npad = _pow2ceil(max(2, len(idx)))
    full = np.full(npad, -1, dtype=np.int32)
    full[:len(idx)] = idx
    res = _jit_ones_sum(npad, g2)(points, jnp.asarray(full))
    return (g2_from_red if g2 else g1_from_red)(
        _cmapf(lambda a: a[:, :1], res, g2))[0]


@lru_cache(maxsize=None)
def _jit_scan_accum(b, nw, c, g2):
    @jax.jit
    def run(points, digits):
        return _msm_scan_accum(points, digits, b, c, g2)
    return run


def _spill_dense_overflow(points, digits_np, b, c, g2, cap_target,
                          merged):
    """Bound the dense per-bucket capacity by routing the columns beyond
    ``cap_target`` of any overloaded (main-window, bucket) pair through
    the exact scan-accumulate MSM (no capacity planning at all).

    The duplicate-GROUP filter can't catch floods of DISTINCT values that
    merely share one window digit; this can, at O(spill) sequential adds.
    Returns (filtered digits, extra host point or None)."""
    spill_mask = np.zeros(b, dtype=bool)
    for w in range(max(1, digits_np.shape[0] - 1)):   # main rows
        counts = np.bincount(digits_np[w], minlength=1 << c)
        for bucket in (np.nonzero(counts[1:] > cap_target)[0] + 1):
            cols = np.nonzero(digits_np[w] == bucket)[0]
            spill_mask[cols[cap_target:]] = True
    if not spill_mask.any():
        return digits_np, None
    idx = np.nonzero(spill_mask)[0]
    sdig = digits_np[:, idx].astype(np.int32)
    if merged:
        # un-merge the top row: the scan contract needs every row < 2^c
        low = sdig[-1] & ((1 << c) - 1)
        top = sdig[-1] >> c
        sdig = np.concatenate([sdig[:-1], low[None], top[None]], axis=0)
    sel_dev = jnp.asarray(idx.astype(np.int32))
    spts = _cmapf(lambda a: jnp.take(a, sel_dev, axis=1), points, g2)
    res, _ = _jit_scan_accum(len(idx), sdig.shape[0], c, g2)(
        spts, jnp.asarray(sdig))
    part = (g2_from_red if g2 else g1_from_red)(res)[0]
    out = digits_np.copy()
    out[:, idx] = 0
    return out, part


def _filter_heavy_groups(points, digits_np, b, c, g2):
    """Route over-popular scalar values around the dense pipeline.

    Groups identical digit COLUMNS (host, void-view unique); every group
    with more than max(64, 4*mean) members is removed from the digit
    matrix and its contribution value * sum(group points) is computed via
    the device point-sum + one host scalar multiply.  Returns (filtered
    digits (a copy when anything was filtered), extra host point or
    None).  The all-zero column group is skipped (it contributes
    nothing)."""
    from ..bn254 import add as host_add, multiply as host_mul
    nw = digits_np.shape[0]
    colsT = np.ascontiguousarray(digits_np.T).astype(np.uint32)
    void = colsT.view([('', np.uint32)] * nw).reshape(-1)
    uniq, inverse, counts = np.unique(void, return_inverse=True,
                                      return_counts=True)
    thresh = max(64, 4 * max(1, b >> c))
    heavy = np.nonzero(counts > thresh)[0]
    if len(heavy) == 0:
        return digits_np, None
    if len(heavy) > 128:
        # pathological many-duplicates input: route only the heaviest 128
        # (one device dispatch each); the remainder stays dense with
        # correspondingly larger exact capacities
        heavy = heavy[np.argsort(counts[heavy])[::-1][:128]]
    digits_out = digits_np.copy()
    extra = None
    for gi in heavy:
        idx = np.nonzero(inverse == gi)[0].astype(np.int32)
        col = digits_np[:, idx[0]]            # (nw,) digit stack
        if not col.any():
            continue                          # zero scalar: contributes 0
        value = 0
        for w in range(nw - 1, -1, -1):
            value = (value << c) | int(col[w])
        s = _ones_sum_red(points, idx, g2)
        digits_out[:, idx] = 0
        part = host_mul(s, value) if s is not None else None
        if part is not None:
            extra = host_add(extra, part) if extra is not None else part
    return (digits_out, extra) if extra is not None else (digits_np, None)
    """Raise on digits violating the decomposition contract instead of
    silently corrupting the MSM: every window must hold < 2^c, and the top
    window additionally < 2^(254 - (n_windows-1)*c) so the implied scalar
    stays below 2^254 (the merged-tail planner's bucket-width bound).
    Cheap vectorized numpy pass; only run on host-visible digits."""
    n_windows = digits_np.shape[0]
    row_max = digits_np.max(axis=1).astype(np.uint64)
    limit = np.uint64(1 << c)
    bad = np.nonzero(row_max[:-1] >= limit)[0]
    if bad.size:
        raise ValueError(
            "MSM digit contract violation: window %d max digit %d >= 2^%d"
            % (int(bad[0]), int(row_max[bad[0]]), c))
    top_allow = min(c, max(1, 254 - (n_windows - 1) * c))
    if int(row_max[-1]) >> top_allow:
        raise ValueError(
            "MSM digit contract violation: top window max digit %d spans "
            "more than %d bits (implied scalar >= 2^254); decompose "
            "scalars < r with window_digits_host_np/from_limbs_np"
            % (int(row_max[-1]), top_allow))


def _emb_split(b, c, g2, static_plan, main_k):
    """Pick the embedded-index sort split (h_split, per-sub-row capacity)
    for the main window groups, or (1, main_k) for the classic composite
    sort.  G1 static-plan pow2 problems only (the host-planned path's
    per-window exact capacities are per-FULL-window; on overflow the
    driver replans through the classic path anyway).

    Env: ETHSNARKS_MSM_EMB=0 disables, =1 forces where legal (default
    on)."""
    import math
    import os
    env = os.environ.get('ETHSNARKS_MSM_EMB', '')
    if env == '0' or g2 or not static_plan or b < (1 << 12) \
            or (b & (b - 1)) != 0:
        return 1, main_k
    h = max(2, _pow2ceil(max(1, b >> (32 - c))))   # c + log2(b/h) <= 32
    mean_sub = max(1, (b // h) >> c)
    k_emb = _pow2ceil(mean_sub + 4 * int(math.isqrt(mean_sub)) + 8)
    if k_emb * h > main_k and env != '1':
        # the sub-row pow2 capacity ceiling would add tree/gather work -
        # only take the cheaper sort when the dense volume stays equal
        # (=1 forces it anyway, for tests/experiments)
        return 1, main_k
    return h, k_emb


def _want_split(b, c, g2, split_dispatch):
    """Resolve the split-dispatch choice: explicit beats env beats auto.

    Auto: split the G2 B query at prover scales (the Fq2 single-dispatch
    module is the one the remote compile service rejects); G1 keeps the
    single-dispatch default (one round trip, known-good compiles)."""
    import os
    if split_dispatch is not None and split_dispatch != 'auto':
        return bool(split_dispatch)
    env = os.environ.get('ETHSNARKS_MSM_SPLIT')
    if env in ('0', '1'):
        return env == '1'
    return g2 and b >= (1 << 18)


def _dense_red_driver(points, digits, c, g2, max_lanes,
                      static_plan=False, ks=None, tail_bits=None,
                      merged=None, split_dispatch=None):
    n_windows, b = digits.shape
    host_planned = not static_plan
    already_merged = merged is not None
    ones_part = None
    if host_planned and ks is None:
        digits = np.asarray(digits)
        if not already_merged:
            _validate_digit_contract(digits, c)
        # scalar==1 columns (bit-decomposition circuits) pile onto bucket 1
        # of window 0 and would dominate its dense capacity: route them
        # through a plain device point-sum instead (the reference's
        # mixed-addition filtering, libsnark multi_exp_with_mixed_addition)
        is_one = (digits[0] == 1) & (digits[1:] == 0).all(axis=0) \
            if n_windows > 1 else (digits[0] == 1)
        n_ones = int(is_one.sum())
        if n_ones > 4 * max(1, b >> c) + 64:
            idx = np.nonzero(is_one)[0].astype(np.int32)
            ones_part = _ones_sum_red(points, idx, g2)
            digits = digits.copy()
            digits[:, idx] = 0

    # A narrow top window (254-bit scalars rarely split evenly into c-bit
    # windows) is MERGED into the window below it: the tail then runs at
    # bucket width 2^(c + top_bits) with normal occupancy, instead of 128
    # padded slots x a b/2^top_bits capacity (a 2^16/c=11 run allocated a
    # ~4GB gather for a 1-bit top window before this).
    xp = np if isinstance(digits, np.ndarray) else jnp
    if already_merged:
        # Replan recursion: digits arrive with the top-window merge already
        # applied; `merged` and tail_bits carry the prior state.  A merged
        # row's tail MUST stay forced: it exceeds the 2^c main bucket
        # width, and scheduling it into the main scan spills its composite
        # keys into the next window's bucket range - silent corruption.
        pass
    else:
        top_bits = max(1, 254 - (n_windows - 1) * c)
        merged = (n_windows >= 2 and top_bits < 7
                  and _should_merge_top(b, c, top_bits))
        if merged:
            row = digits[-2] + (digits[-1].astype(xp.uint32) << c)
            digits = xp.concatenate([digits[:-2], row[None]], axis=0)
            n_windows -= 1
            tail_bits = c + top_bits
        else:
            tail_bits = top_bits if n_windows > 1 else c

    if ks is None:
        if host_planned:
            ks = _window_ks(b, c, digits)
        else:
            ks = _static_plan_ks(b, c, n_windows, tail_bits)
    main_nw, n_groups, main_k, tail_start, tail_nw, tail_k, m = \
        _plan(ks, c, max_lanes, force_tail=merged)
    dt = digits[m:] if tail_nw else xp.zeros((1, b), digits.dtype)
    if tail_nw:
        # Tail bucket width: a merged row spans exactly tail_bits = c +
        # top_bits; a non-merged top window holds digits < 2^min(tail_bits,
        # c) by contract (tail_bits may be huge for shallow digit stacks -
        # scalars far below 2^254 - where it only means "unconstrained").
        cap = tail_bits if merged else min(tail_bits, c)
        if host_planned:
            bits = int(np.asarray(dt).max()).bit_length()
            tc = max(7, min(cap, bits))
        else:
            tc = max(7, cap)
    else:
        tc = 7
    # Capacity guard: a window slab is (rows_pad, 2^c * k) int32; G2's 256
    # coord rows put a 2^23-lane slab at 8GB of HLO temp (measured compile
    # OOM on a duplicate-heavy B query) - fail fast into the generic
    # fallback instead.  G1 (128 rows) tolerates one notch more.
    lane_cap = 1 << (21 if g2 else 26)
    if (1 << c) * main_k > lane_cap or \
            (tail_nw and (1 << tc) * tail_k > lane_cap):
        raise ValueError(
            "dense MSM capacity explosion (k=%d/%d at c=%d/tc=%d): "
            "extremely repetitive scalar distribution - reduce c or extend "
            "the mixed-addition filtering in _dense_red_driver" %
            (main_k, tail_k, c, tc))
    pad_rows = n_groups * main_nw - m
    dm = digits[:m]
    if pad_rows:
        dm = xp.concatenate(
            [dm, xp.zeros((pad_rows, b), dtype=digits.dtype)])
    if _want_split(b, c, g2, split_dispatch):
        res, ovf_b = _msm_dense_split(points, dm, dt, b, c, g2, main_nw,
                                      n_groups, main_k, tail_start,
                                      tail_nw, tail_k, tc)
        ovf = jnp.bool_(ovf_b)
    else:
        h_split, k_emb = _emb_split(b, c, g2, static_plan, main_k)
        run = _jit_msm_dense_multi(b, c, g2, main_nw, n_groups,
                                   k_emb if h_split > 1 else main_k,
                                   tail_start, tail_nw, tail_k, tc,
                                   h_split)
        res, ovf = run(points, jnp.asarray(dm), jnp.asarray(dt))
    if bool(ovf):
        # static plan undershot (or stale cached capacities): replan from
        # the actual digits.  The merge has already been applied to them,
        # so the recursion carries tail_bits through (it both skips the
        # re-merge and keeps the tail forced for merged rows).
        digits_np = np.asarray(digits)
        # Duplicate-scalar filtering (the general form of the reference's
        # multi_exp_with_mixed_addition): an overflowing static plan is a
        # skewed distribution - bit variables flooding bucket 1, or EQUAL
        # witness values (shared IVs, default tree nodes) flooding an
        # arbitrary bucket - and exact-replanning around the flood makes
        # that bucket's dense capacity (hence the gather slab) explode
        # (measured: an 8GB G2 gather compile-OOM on a 2^20 Merkle B
        # query, k=1024 from ~900 equal values).  Each heavy group of
        # identical digit-columns contributes value * sum(points): the
        # point sum runs on device (_ones_sum_red), the single scalar
        # multiply on host.
        digits_np, extra = _filter_heavy_groups(points, digits_np, b, c,
                                                g2)
        exact = _window_ks(b, c, digits_np)
        # Distinct values sharing one window digit can still flood a
        # bucket past the slab budget (measured k=1024 on the Merkle B
        # query AFTER group filtering); spill the excess columns of any
        # overloaded bucket to the exact scan-accumulate MSM.
        import os as _os
        cap_k = int(_os.environ.get('ETHSNARKS_MSM_SPILL_CAP', '0')) \
            or ((1 << (21 if g2 else 23)) >> c)
        if max(exact[:-1] if len(exact) > 1 else exact) > cap_k:
            digits_np, spill = _spill_dense_overflow(
                points, digits_np, b, c, g2, max(64, cap_k // 2), merged)
            if spill is not None:
                from ..bn254 import add as _host_add
                extra = spill if extra is None else _host_add(extra, spill)
                exact = _window_ks(b, c, digits_np)
        if exact == list(ks) and extra is None:
            raise AssertionError("dense MSM capacity overflow (plan bug)")
        out = _dense_red_driver(points, digits_np, c, g2, max_lanes,
                                ks=exact, tail_bits=tail_bits,
                                merged=merged, split_dispatch=split_dispatch)
        if extra is not None:
            from ..bn254 import add as host_add
            out = host_add(out, extra)
    else:
        from_dev = g2_from_red if g2 else g1_from_red
        out = from_dev(res)[0]
    if ones_part is not None:
        from ..bn254 import add as host_add
        out = host_add(out, ones_part)
    return out


def msm_g1_dense_red(points, digits, c, max_lanes=1 << 23,
                     static_plan=False, affine=None, split_dispatch=None):
    """Dense all-windows G1 MSM on the red core; host affine result.

    points: red (X, Y, Z) device arrays from :func:`g1_to_red` (infinity
    entries are fine - they are already the (0, 1, 0) identity).

    static_plan: skip host digit inspection and use distribution-free
    capacities (keeps device-resident digits on-chip; use for uniform
    scalars like the prover's H query).

    affine: accepted for API compatibility, ignored (the gather table
    always carries z; identity substitution happens by gather redirect).

    split_dispatch: None/'auto' (env ETHSNARKS_MSM_SPLIT, else split only
    large G2), True (one executable per pipeline stage - small modules for
    the remote compile service), False (single dispatch)."""
    return _dense_red_driver(points, digits, c, False, max_lanes,
                             static_plan=static_plan,
                             split_dispatch=split_dispatch)


def msm_g2_dense_red(points, digits, c, max_lanes=1 << 22,
                     static_plan=False, affine=None, split_dispatch=None):
    """Dense all-windows G2 MSM on the red core; host (Fq2, Fq2) result."""
    return _dense_red_driver(points, digits, c, True, max_lanes,
                             static_plan=static_plan,
                             split_dispatch=split_dispatch)
