"""Pallas TPU kernels for the hot curve/field inner loops.

Why: the jnp limb-arithmetic expands to ~4k HLO per EC point addition;
MSM graphs contain dozens of additions (associative scans, bucket folds),
blowing XLA compile times to tens of minutes and leaving every intermediate
limb tensor in HBM.  Each Pallas kernel here compiles once under Mosaic and
keeps all ~250 limb ops of a Montgomery multiply in VMEM/registers.

Kernels are generated per field context (Fq/Fr closures) and per shape
(static specialization).  The math is identical to ops/fp.py (separated-REDC
Montgomery multiply, Kogge-Stone carries) and ops/curve.py (complete RCB15
addition); tests pin them against the jnp path bit-for-bit.

Enable/disable with ``ethsnarks_tpu.ops.pallas_ops.USE_PALLAS`` (defaults to
True when the default JAX backend is TPU; the jnp path remains the oracle on
CPU).
"""

from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False

LIMB_BITS = 13
LIMB_MASK = (1 << LIMB_BITS) - 1
L = 20

_BATCH_TILE = 1024


def default_use_pallas():
    try:
        return jax.default_backend() == 'tpu'
    except Exception:
        return False


USE_PALLAS = None  # resolved lazily; set True/False to force


def use_pallas():
    global USE_PALLAS
    if USE_PALLAS is None:
        USE_PALLAS = _HAS_PALLAS and default_use_pallas()
    return USE_PALLAS


# ---------------- in-kernel limb arithmetic (traced inside pallas) ----------

def _shift_up(c):
    return jnp.concatenate([jnp.zeros_like(c[:1]), c[:-1]], axis=0)


def _carry_exact(t, extra):
    # NOTE: carry/propagate masks are uint32 (0/1), not bool - Mosaic's TPU
    # lowering rejects boolean concatenates.
    for _ in range(extra):
        t = jnp.concatenate([t, jnp.zeros_like(t[:1])], axis=0)
    for _ in range(3):
        t = (t & LIMB_MASK) + _shift_up(t >> LIMB_BITS)
    g = (t >> LIMB_BITS)
    p = (t == LIMB_MASK).astype(jnp.uint32)
    shift = 1
    K = t.shape[0]
    while shift < K:
        g = g | (p & jnp.concatenate(
            [jnp.zeros_like(g[:shift]), g[:-shift]], axis=0))
        p = p & jnp.concatenate(
            [jnp.zeros_like(p[:shift]), p[:-shift]], axis=0)
        shift *= 2
    carry_in = _shift_up(g)
    return (t + carry_in) & LIMB_MASK


def _ks_borrow(d):
    """Kogge-Stone borrow resolution on int32 digits d in [-8191, 8191].

    Returns (result limbs uint32, underflow flag as (1, B) int32)."""
    K = d.shape[0]
    g = (d < 0).astype(jnp.int32)
    p = (d == 0).astype(jnp.int32)
    shift = 1
    while shift < K:
        g = g | (p & jnp.concatenate(
            [jnp.zeros_like(g[:shift]), g[:-shift]], axis=0))
        p = p & jnp.concatenate(
            [jnp.zeros_like(p[:shift]), p[:-shift]], axis=0)
        shift *= 2
    borrow_in = jnp.concatenate([jnp.zeros_like(g[:1]), g[:-1]], axis=0)
    r = ((d - borrow_in) & LIMB_MASK).astype(jnp.uint32)
    return r, g[-1:]


def _ks_sub_const(x, y_col):
    """x (K, B) minus a (K, 1) jnp constant column."""
    return _ks_borrow(x.astype(jnp.int32) - y_col.astype(jnp.int32))


def _ks_sub_var(x, y):
    return _ks_borrow(x.astype(jnp.int32) - y.astype(jnp.int32))


class _FieldConsts(object):
    """Field constants packed as one (L+1, 8) uint32 array passed to kernels:
    column 0 = N (padded), 1 = N', 2 = N (21 limbs), 3..6 = 8N,4N,2N,1N,
    7 = Montgomery one (R mod N)."""

    def __init__(self, fp_ctx):
        self.modulus = fp_ctx.modulus
        packed = np.zeros((L + 1, 8), dtype=np.uint32)
        packed[:L, 0] = fp_ctx.n_limbs
        packed[:L, 1] = fp_ctx.nprime_limbs
        packed[:L + 1, 2] = np.array(_int_to_limbs(fp_ctx.modulus, L + 1),
                                     dtype=np.uint32)
        for k, mult in enumerate((8, 4, 2, 1)):
            packed[:L + 1, 3 + k] = np.array(
                _int_to_limbs(mult * fp_ctx.modulus, L + 1), dtype=np.uint32)
        packed[:L, 7] = fp_ctx.one_mont_limbs
        self.packed = packed


def _mk_field_ops(consts_val):
    """In-kernel add/sub/mul/b3 closures over the packed constants array."""
    n_col = consts_val[:L, 0:1]
    nprime_col = consts_val[:L, 1:2]
    n_ext_col = consts_val[:L + 1, 2:3]
    mult_cols = [consts_val[:L + 1, 3 + k:4 + k] for k in range(4)]

    def cond_sub_n(t):
        d, underflow = _ks_sub_const(t, n_ext_col)
        return jnp.where(underflow != 0, t[:L], d[:L])

    def f_add(a, b):
        return cond_sub_n(_carry_exact(a + b, extra=1))

    def f_sub(a, b):
        r, underflow = _ks_sub_var(a, b)
        plus_n = _carry_exact(r + n_col, extra=0)
        return jnp.where(underflow != 0, plus_n, r)

    def _shifted(rows, i, total):
        """Place a (k, B) block at row offset i within `total` rows.
        Mosaic-safe: scatter (.at[].add) does not lower in Pallas, so column
        accumulation uses explicit concatenation instead."""
        parts = []
        if i > 0:
            parts.append(jnp.zeros((i,) + rows.shape[1:], dtype=rows.dtype))
        parts.append(rows)
        tail = total - i - rows.shape[0]
        if tail > 0:
            parts.append(jnp.zeros((tail,) + rows.shape[1:], dtype=rows.dtype))
        return jnp.concatenate(parts, axis=0) if len(parts) > 1 else parts[0]

    def f_mul(a, b):
        cols = _shifted(a[0] * b, 0, 2 * L - 1)
        for i in range(1, L):
            cols = cols + _shifted(a[i] * b, i, 2 * L - 1)
        t_lo = _carry_exact(cols[:L], extra=0)
        mcols = _shifted(t_lo[0] * nprime_col[:L], 0, L)
        for i in range(1, L):
            mcols = mcols + _shifted(t_lo[i] * nprime_col[:L - i], i, L)
        m = _carry_exact(mcols, extra=0)
        u = _shifted(cols, 0, 2 * L)
        for i in range(L):
            u = u + _shifted(m[i] * n_col, i, 2 * L)
        uc = _carry_exact(u, extra=1)
        return cond_sub_n(uc[L:])

    def f_mul9(a):
        t = _carry_exact(a * jnp.uint32(9), extra=1)
        for col in mult_cols:
            d, underflow = _ks_sub_const(t, col)
            t = jnp.where(underflow != 0, t, d)
        return t[:L]

    return f_add, f_sub, f_mul, f_mul9


def _int_to_limbs(value, n):
    return [(value >> (LIMB_BITS * i)) & LIMB_MASK for i in range(n)]


# ---------------- point op bodies ----------------

def _g1_add_body(consts_val):
    f_add, f_sub, f_mul, f_mul9 = _mk_field_ops(consts_val)

    def body(x1, y1, z1, x2, y2, z2):
        t0 = f_mul(x1, x2)
        t1 = f_mul(y1, y2)
        t2 = f_mul(z1, z2)
        t3 = f_mul(f_add(x1, y1), f_add(x2, y2))
        t4 = f_add(t0, t1)
        t3 = f_sub(t3, t4)
        t4 = f_mul(f_add(y1, z1), f_add(y2, z2))
        x3 = f_add(t1, t2)
        t4 = f_sub(t4, x3)
        x3 = f_mul(f_add(x1, z1), f_add(x2, z2))
        y3 = f_add(t0, t2)
        y3 = f_sub(x3, y3)
        x3 = f_add(t0, t0)
        t0 = f_add(x3, t0)
        t2 = f_mul9(t2)
        z3 = f_add(t1, t2)
        t1 = f_sub(t1, t2)
        y3 = f_mul9(y3)
        x3 = f_mul(t4, y3)
        t2 = f_mul(t3, t1)
        x3 = f_sub(t2, x3)
        y3 = f_mul(y3, t0)
        t1 = f_mul(t1, z3)
        y3 = f_add(t1, y3)
        t0 = f_mul(t0, t3)
        z3 = f_mul(z3, t4)
        z3 = f_add(z3, t0)
        return x3, y3, z3

    return body


@lru_cache(maxsize=None)
def _g1_add_kernel(batch, tile):
    """pallas_call for G1 point add on (L, batch) coords, tiled over lanes."""

    def kernel(consts, x1, y1, z1, x2, y2, z2, ox, oy, oz):
        body = _g1_add_body(consts[:])
        rx, ry, rz = body(x1[:], y1[:], z1[:], x2[:], y2[:], z2[:])
        ox[:] = rx
        oy[:] = ry
        oz[:] = rz

    grid = (batch // tile,)
    spec = pl.BlockSpec((L, tile), lambda i: (0, i),
                        memory_space=pltpu.VMEM)
    cspec = pl.BlockSpec((L + 1, 8), lambda i: (0, 0),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[cspec] + [spec] * 6,
        out_specs=[spec] * 3,
        out_shape=[jax.ShapeDtypeStruct((L, batch), jnp.uint32)] * 3,
    )


@lru_cache(maxsize=None)
def _g1_consts():
    # numpy (not jnp): caching a traced array under jit would leak tracers.
    from .fp import Fq as FqCtx
    return _FieldConsts(FqCtx).packed


def g1_point_add_pallas(p, q):
    """(X,Y,Z) x2 with (L, B) uint32 coords -> pallas-fused complete add.
    Small batches are padded to 128 lanes (garbage lanes sliced away)."""
    flat, batch, shape, pad = _flatten_pad(tuple(p) + tuple(q))
    total = batch + pad
    tile = _pick_tile(total)
    fn = _g1_add_kernel(total, tile)
    outs = fn(_g1_consts(), *flat)
    return tuple(o[:, :batch].reshape(shape) for o in outs)


def _g1_double_body(consts_val):
    f_add, f_sub, f_mul, f_mul9 = _mk_field_ops(consts_val)

    def body(x, y, z):
        t0 = f_mul(y, y)
        z3 = f_add(t0, t0)
        z3 = f_add(z3, z3)
        z3 = f_add(z3, z3)
        t1 = f_mul(y, z)
        t2 = f_mul(z, z)
        t2 = f_mul9(t2)
        x3 = f_mul(t2, z3)
        y3 = f_add(t0, t2)
        z3 = f_mul(t1, z3)
        t1 = f_add(t2, t2)
        t2 = f_add(t1, t2)
        t0 = f_sub(t0, t2)
        y3 = f_mul(t0, y3)
        y3 = f_add(x3, y3)
        t1 = f_mul(x, y)
        x3 = f_mul(t0, t1)
        x3 = f_add(x3, x3)
        return x3, y3, z3

    return body


def _mk_fq2_ops(consts_val, b3_col):
    """Fq2 = Fq[u]/(u^2+1) ops built on the Fq closures; elements are
    (c0, c1) pairs of (L, B) arrays.  b3_col: (L, 2) Montgomery coeffs of
    3*b_twist."""
    f_add, f_sub, f_mul, _ = _mk_field_ops(consts_val)

    def e_add(a, b):
        return (f_add(a[0], b[0]), f_add(a[1], b[1]))

    def e_sub(a, b):
        return (f_sub(a[0], b[0]), f_sub(a[1], b[1]))

    def e_mul(a, b):
        m0 = f_mul(a[0], b[0])
        m1 = f_mul(a[1], b[1])
        m2 = f_mul(f_add(a[0], a[1]), f_add(b[0], b[1]))
        return (f_sub(m0, m1), f_sub(f_sub(m2, m0), m1))

    def e_mul_b3(a):
        b3 = (b3_col[:, 0:1], b3_col[:, 1:2])
        return e_mul(a, b3)

    return e_add, e_sub, e_mul, e_mul_b3


def _g2_add_body(consts_val, b3_col):
    e_add, e_sub, e_mul, e_mul_b3 = _mk_fq2_ops(consts_val, b3_col)

    def body(x1, y1, z1, x2, y2, z2):
        t0 = e_mul(x1, x2)
        t1 = e_mul(y1, y2)
        t2 = e_mul(z1, z2)
        t3 = e_mul(e_add(x1, y1), e_add(x2, y2))
        t4 = e_add(t0, t1)
        t3 = e_sub(t3, t4)
        t4 = e_mul(e_add(y1, z1), e_add(y2, z2))
        x3 = e_add(t1, t2)
        t4 = e_sub(t4, x3)
        x3 = e_mul(e_add(x1, z1), e_add(x2, z2))
        y3 = e_add(t0, t2)
        y3 = e_sub(x3, y3)
        x3 = e_add(t0, t0)
        t0 = e_add(x3, t0)
        t2 = e_mul_b3(t2)
        z3 = e_add(t1, t2)
        t1 = e_sub(t1, t2)
        y3 = e_mul_b3(y3)
        x3 = e_mul(t4, y3)
        t2 = e_mul(t3, t1)
        x3 = e_sub(t2, x3)
        y3 = e_mul(y3, t0)
        t1 = e_mul(t1, z3)
        y3 = e_add(t1, y3)
        t0 = e_mul(t0, t3)
        z3 = e_mul(z3, t4)
        z3 = e_add(z3, t0)
        return x3, y3, z3

    return body


def _g2_double_body(consts_val, b3_col):
    e_add, e_sub, e_mul, e_mul_b3 = _mk_fq2_ops(consts_val, b3_col)

    def body(x, y, z):
        t0 = e_mul(y, y)
        z3 = e_add(t0, t0)
        z3 = e_add(z3, z3)
        z3 = e_add(z3, z3)
        t1 = e_mul(y, z)
        t2 = e_mul(z, z)
        t2 = e_mul_b3(t2)
        x3 = e_mul(t2, z3)
        y3 = e_add(t0, t2)
        z3 = e_mul(t1, z3)
        t1 = e_add(t2, t2)
        t2 = e_add(t1, t2)
        t0 = e_sub(t0, t2)
        y3 = e_mul(t0, y3)
        y3 = e_add(x3, y3)
        t1 = e_mul(x, y)
        x3 = e_mul(t0, t1)
        x3 = e_add(x3, x3)
        return x3, y3, z3

    return body


# ---------------- kernel wrappers ----------------

@lru_cache(maxsize=None)
def _g1_double_kernel(batch, tile):
    def kernel(consts, x, y, z, ox, oy, oz):
        body = _g1_double_body(consts[:])
        rx, ry, rz = body(x[:], y[:], z[:])
        ox[:] = rx
        oy[:] = ry
        oz[:] = rz

    grid = (batch // tile,)
    spec = pl.BlockSpec((L, tile), lambda i: (0, i), memory_space=pltpu.VMEM)
    cspec = pl.BlockSpec((L + 1, 8), lambda i: (0, 0),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[cspec] + [spec] * 3,
        out_specs=[spec] * 3,
        out_shape=[jax.ShapeDtypeStruct((L, batch), jnp.uint32)] * 3,
    )


def _pick_tile(total):
    """Largest supported lane-tile that divides total (multiples of 128)."""
    if total <= _BATCH_TILE:
        return total
    return _BATCH_TILE if total % _BATCH_TILE == 0 else 128


def _flatten_pad(coords, min_lanes=128):
    """coords: tuple of (L, *batch) arrays -> (flat list, batch, shape, pad)."""
    shape = coords[0].shape
    batch = int(np.prod(shape[1:])) if len(shape) > 1 else 1
    flat = [c.reshape(L, batch) for c in coords]
    pad = 0
    if batch < min_lanes:
        pad = min_lanes - batch
    elif batch % min_lanes:
        pad = min_lanes - batch % min_lanes
    if pad:
        flat = [jnp.pad(c, ((0, 0), (0, pad))) for c in flat]
    return flat, batch, shape, pad


def g1_point_double_pallas(p):
    flat, batch, shape, pad = _flatten_pad(p)
    total = batch + pad
    tile = _pick_tile(total)
    fn = _g1_double_kernel(total, tile)
    outs = fn(_g1_consts(), *flat)
    return tuple(o[:, :batch].reshape(shape) for o in outs)


@lru_cache(maxsize=None)
def _g2_consts():
    from .fp import Fq as FqCtx
    from . import fp2
    packed = _FieldConsts(FqCtx).packed
    b3 = np.zeros((L, 2), dtype=np.uint32)
    for col, coeff in enumerate(fp2.B3_COEFFS):
        m = (coeff % FqCtx.modulus) * FqCtx.R_mod % FqCtx.modulus
        for i in range(L):
            b3[i, col] = (m >> (LIMB_BITS * i)) & LIMB_MASK
    return packed, b3


@lru_cache(maxsize=None)
def _g2_add_kernel(batch, tile):
    def kernel(consts, b3, x10, x11, y10, y11, z10, z11,
               x20, x21, y20, y21, z20, z21,
               ox0, ox1, oy0, oy1, oz0, oz1):
        body = _g2_add_body(consts[:], b3[:])
        (rx, ry, rz) = body((x10[:], x11[:]), (y10[:], y11[:]),
                            (z10[:], z11[:]), (x20[:], x21[:]),
                            (y20[:], y21[:]), (z20[:], z21[:]))
        ox0[:], ox1[:] = rx
        oy0[:], oy1[:] = ry
        oz0[:], oz1[:] = rz

    grid = (batch // tile,)
    spec = pl.BlockSpec((L, tile), lambda i: (0, i), memory_space=pltpu.VMEM)
    cspec = pl.BlockSpec((L + 1, 8), lambda i: (0, 0), memory_space=pltpu.VMEM)
    bspec = pl.BlockSpec((L, 2), lambda i: (0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[cspec, bspec] + [spec] * 12,
        out_specs=[spec] * 6,
        out_shape=[jax.ShapeDtypeStruct((L, batch), jnp.uint32)] * 6,
    )


@lru_cache(maxsize=None)
def _g2_double_kernel(batch, tile):
    def kernel(consts, b3, x0, x1, y0, y1, z0, z1,
               ox0, ox1, oy0, oy1, oz0, oz1):
        body = _g2_double_body(consts[:], b3[:])
        (rx, ry, rz) = body((x0[:], x1[:]), (y0[:], y1[:]), (z0[:], z1[:]))
        ox0[:], ox1[:] = rx
        oy0[:], oy1[:] = ry
        oz0[:], oz1[:] = rz

    grid = (batch // tile,)
    spec = pl.BlockSpec((L, tile), lambda i: (0, i), memory_space=pltpu.VMEM)
    cspec = pl.BlockSpec((L + 1, 8), lambda i: (0, 0), memory_space=pltpu.VMEM)
    bspec = pl.BlockSpec((L, 2), lambda i: (0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[cspec, bspec] + [spec] * 6,
        out_specs=[spec] * 6,
        out_shape=[jax.ShapeDtypeStruct((L, batch), jnp.uint32)] * 6,
    )


def _g2_flatten(p):
    # p: ((x0,x1),(y0,y1),(z0,z1)) with (L, *batch) leaves
    leaves = [p[0][0], p[0][1], p[1][0], p[1][1], p[2][0], p[2][1]]
    return leaves


def g2_point_add_pallas(p, q):
    leaves = _g2_flatten(p) + _g2_flatten(q)
    flat, batch, shape, pad = _flatten_pad(tuple(leaves))
    total = batch + pad
    tile = _pick_tile(total)
    consts, b3 = _g2_consts()
    outs = _g2_add_kernel(total, tile)(consts, b3, *flat)
    outs = [o[:, :batch].reshape(shape) for o in outs]
    return ((outs[0], outs[1]), (outs[2], outs[3]), (outs[4], outs[5]))


def g2_point_double_pallas(p):
    flat, batch, shape, pad = _flatten_pad(tuple(_g2_flatten(p)))
    total = batch + pad
    tile = _pick_tile(total)
    consts, b3 = _g2_consts()
    outs = _g2_double_kernel(total, tile)(consts, b3, *flat)
    outs = [o[:, :batch].reshape(shape) for o in outs]
    return ((outs[0], outs[1]), (outs[2], outs[3]), (outs[4], outs[5]))
