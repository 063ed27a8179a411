"""Branch-free BN254 point arithmetic on TPU (G1 over Fq, G2 over Fq2).

Uses the *complete* projective addition formulas of Renes-Costello-Batina
2015 (algorithm 7, a=0 curves): one code path handles P+Q, P+P, P+infinity
and infinity+Q identically - exactly what SIMD/XLA execution wants (no
data-dependent branches anywhere).  Cost: 12 field muls + 2 mul-by-b3.

Points are homogeneous projective (X : Y : Z), identity (0 : 1 : 0).
A "field adapter" bundles the per-field callables so the same formulas
drive G1 (Fq limbs) and G2 (Fq2 limb pairs).
"""

import numpy as np
import jax.numpy as jnp

from .fp import Fq as FqCtx
from . import fp2
from ..bn254 import FIELD_MODULUS


class _G1Field(object):
    """Fq adapter: coordinates are (L, *batch) uint32 Montgomery arrays."""

    @staticmethod
    def add(a, b):
        return FqCtx.add(a, b)

    @staticmethod
    def sub(a, b):
        return FqCtx.sub(a, b)

    @staticmethod
    def mul(a, b):
        return FqCtx.mul(a, b)

    @staticmethod
    def select(cond, a, b):
        return FqCtx.select(cond, a, b)

    @staticmethod
    def zero_like(a):
        # a * 0 rather than zeros_like: keeps sharding/varying lineage so
        # shard_map scan carries typecheck (see parallel/msm_sharded.py).
        return a * jnp.uint32(0)

    @staticmethod
    def one_like(a):
        one = FqCtx.one_mont_limbs.reshape((FqCtx.L,) + (1,) * (a.ndim - 1))
        return a * jnp.uint32(0) + one.astype(jnp.uint32)

    @staticmethod
    def mul_b3(a):
        """x * 9 (b3 for y^2 = x^3 + 3) via limb scaling + reduction."""
        t = FqCtx._carry(a * jnp.uint32(9))
        t = FqCtx._cond_sub_multiple(t, 8)
        t = FqCtx._cond_sub_multiple(t, 4)
        t = FqCtx._cond_sub_multiple(t, 2)
        t = FqCtx._cond_sub_multiple(t, 1)
        return t[:FqCtx.L]


class _G2Field(object):
    """Fq2 adapter: coordinates are (c0, c1) pairs of Fq arrays."""

    add = staticmethod(fp2.add)
    sub = staticmethod(fp2.sub)
    mul = staticmethod(fp2.mul)
    select = staticmethod(fp2.select)

    @staticmethod
    def zero_like(a):
        return (_G1Field.zero_like(a[0]), _G1Field.zero_like(a[1]))

    @staticmethod
    def one_like(a):
        return (_G1Field.one_like(a[0]), _G1Field.zero_like(a[1]))

    @staticmethod
    def mul_b3(a):
        batchless = a[0].ndim - 1
        c = fp2.constant(fp2.B3_COEFFS[0], fp2.B3_COEFFS[1],
                         a[0].shape[1:])
        return fp2.mul(a, c)


G1F = _G1Field()
G2F = _G2Field()


def point_add(F, p, q):
    """Complete addition (RCB15 alg. 7, a=0): p, q are (X, Y, Z) triples.

    On TPU backends the addition routes through the fused Pallas kernels
    (ops/pallas_ops.py) - one custom call instead of ~4k HLO."""
    from . import pallas_ops
    if pallas_ops.use_pallas():
        if F is G1F:
            return pallas_ops.g1_point_add_pallas(p, q)
        if F is G2F:
            return pallas_ops.g2_point_add_pallas(p, q)
    x1, y1, z1 = p
    x2, y2, z2 = q
    t0 = F.mul(x1, x2)
    t1 = F.mul(y1, y2)
    t2 = F.mul(z1, z2)
    t3 = F.mul(F.add(x1, y1), F.add(x2, y2))
    t4 = F.add(t0, t1)
    t3 = F.sub(t3, t4)                     # X1Y2 + X2Y1
    t4 = F.mul(F.add(y1, z1), F.add(y2, z2))
    x3 = F.add(t1, t2)
    t4 = F.sub(t4, x3)                     # Y1Z2 + Y2Z1
    x3 = F.mul(F.add(x1, z1), F.add(x2, z2))
    y3 = F.add(t0, t2)
    y3 = F.sub(x3, y3)                     # X1Z2 + X2Z1
    x3 = F.add(t0, t0)
    t0 = F.add(x3, t0)                     # 3*X1X2
    t2 = F.mul_b3(t2)
    z3 = F.add(t1, t2)
    t1 = F.sub(t1, t2)
    y3 = F.mul_b3(y3)
    x3 = F.mul(t4, y3)
    t2 = F.mul(t3, t1)
    x3 = F.sub(t2, x3)
    y3 = F.mul(y3, t0)
    t1 = F.mul(t1, z3)
    y3 = F.add(t1, y3)
    t0 = F.mul(t0, t3)
    z3 = F.mul(z3, t4)
    z3 = F.add(z3, t0)
    return (x3, y3, z3)


def point_double(F, p):
    """Complete doubling (RCB15 alg. 9, a=0): 6M + 2S + 1 b3-mul."""
    from . import pallas_ops
    if pallas_ops.use_pallas():
        if F is G1F:
            return pallas_ops.g1_point_double_pallas(p)
        if F is G2F:
            return pallas_ops.g2_point_double_pallas(p)
    x, y, z = p
    t0 = F.mul(y, y)
    z3 = F.add(t0, t0)
    z3 = F.add(z3, z3)
    z3 = F.add(z3, z3)                     # 8Y^2
    t1 = F.mul(y, z)
    t2 = F.mul(z, z)
    t2 = F.mul_b3(t2)
    x3 = F.mul(t2, z3)
    y3 = F.add(t0, t2)
    z3 = F.mul(t1, z3)
    t1 = F.add(t2, t2)
    t2 = F.add(t1, t2)
    t0 = F.sub(t0, t2)
    y3 = F.mul(t0, y3)
    y3 = F.add(x3, y3)
    t1 = F.mul(x, y)
    x3 = F.mul(t0, t1)
    x3 = F.add(x3, x3)
    return (x3, y3, z3)


def point_select(F, cond, p, q):
    return tuple(F.select(cond, a, b) for a, b in zip(p, q))


def point_identity_like(F, p):
    return (F.zero_like(p[0]), F.one_like(p[1]), F.zero_like(p[2]))


# ------------- host <-> device conversions -------------

def g1_to_device(points):
    """List of host G1 points (bn254 affine tuples or None) -> (X, Y, Z)."""
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
    X = FqCtx.to_mont_jit(FqCtx.to_limbs(xs))
    Y = FqCtx.to_mont_jit(FqCtx.to_limbs(ys))
    Z = FqCtx.to_mont_jit(FqCtx.to_limbs(zs))
    return (X, Y, Z)


def g1_from_device(p):
    """Device (X, Y, Z) -> list of host affine G1 points (None = infinity)."""
    from ..bn254 import Fq as HostFq
    X = FqCtx.from_limbs(np.asarray(FqCtx.from_mont_jit(p[0])))
    Y = FqCtx.from_limbs(np.asarray(FqCtx.from_mont_jit(p[1])))
    Z = FqCtx.from_limbs(np.asarray(FqCtx.from_mont_jit(p[2])))
    if isinstance(X, int):
        X, Y, Z = [X], [Y], [Z]
    out = []
    for x, y, z in zip(X, Y, Z):
        if z == 0:
            out.append(None)
        else:
            zi = pow(z, -1, FIELD_MODULUS)
            out.append((HostFq(x * zi), HostFq(y * zi)))
    return out


def g2_to_device(points):
    """List of host G2 points ((Fq2, Fq2) or None) -> ((X0,X1),(Y0,Y1),(Z0,Z1))."""
    xs, ys, zs = [], [], []
    for p in points:
        if p is None:
            xs.append((0, 0))
            ys.append((1, 0))
            zs.append((0, 0))
        else:
            xs.append((p[0].coeffs[0], p[0].coeffs[1]))
            ys.append((p[1].coeffs[0], p[1].coeffs[1]))
            zs.append((1, 0))
    return (fp2.to_limbs_batch(xs), fp2.to_limbs_batch(ys),
            fp2.to_limbs_batch(zs))


def g2_from_device(p):
    """Device G2 (X, Y, Z) -> list of host (Fq2, Fq2) points / None.

    One Montgomery batch inversion over the Fq2 norms (z0^2 + z1^2)
    replaces a per-point Fq2.inv() - at the generator's 2^20 G2 query the
    per-point modular pows dominated the whole B-query phase."""
    from ..bn254 import Fq2 as HostFq2
    q = FIELD_MODULUS
    X = fp2.from_limbs_batch(p[0])
    Y = fp2.from_limbs_batch(p[1])
    Z = fp2.from_limbs_batch(p[2])
    norms, idxs = [], []
    for i, (z0, z1) in enumerate(Z):
        if z0 or z1:
            norms.append((z0 * z0 + z1 * z1) % q)
            idxs.append(i)
    prefix = []
    acc = 1
    for n in norms:
        acc = acc * n % q
        prefix.append(acc)
    out = [None] * len(Z)
    if not norms:
        return out
    inv = pow(acc, -1, q)
    for j in range(len(norms) - 1, -1, -1):
        i = idxs[j]
        before = prefix[j - 1] if j else 1
        t = inv * before % q          # norms[j]^-1
        inv = inv * norms[j] % q
        z0, z1 = Z[i]
        zi0, zi1 = z0 * t % q, -z1 * t % q
        x0, x1 = X[i]
        y0, y1 = Y[i]
        out[i] = (HostFq2([(x0 * zi0 - x1 * zi1) % q,
                           (x0 * zi1 + x1 * zi0) % q]),
                  HostFq2([(y0 * zi0 - y1 * zi1) % q,
                           (y0 * zi1 + y1 * zi0) % q]))
    return out
