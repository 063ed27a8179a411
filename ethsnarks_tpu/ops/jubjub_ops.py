"""Batched Baby-JubJub kernels: ETEC point ops, scalar muls, Pedersen, EdDSA.

TPU-native stage-3 of the build plan (SURVEY.md §7): vectorized extended
twisted Edwards arithmetic over the Fr context (JubJub's base field), with
window tables precomputed host-side.  Everything is branch-free: the HWCD
unified addition is complete for this curve (a square, d non-square), so
scalar multiplication is a fixed 254-step select-and-add scan.

Points on device are ETEC 4-tuples (X, Y, T, Z) of (L, B) Montgomery limbs.
Equality checks cross-multiply (no inversions); only Pedersen's x-extraction
does one batched Fermat inversion.

Oracle: ethsnarks_tpu.jubjub / pedersen / eddsa (host).
"""

from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from .fp import Fr
from ..jubjub import (
    Point, JUBJUB_A, JUBJUB_D, JUBJUB_Q)
from ..pedersen import pedersen_hash_basepoint, N_WINDOWS_PER_BASEPOINT

L = Fr.L


def _const(v, batch_shape):
    return jnp.broadcast_to(
        jnp.asarray(Fr.constant_mont(v, batch_shape)),
        (L,) + tuple(batch_shape)).astype(jnp.uint32)


def etec_identity(batch_shape):
    return (Fr.zero(batch_shape), _const(1, batch_shape),
            Fr.zero(batch_shape), _const(1, batch_shape))


def etec_identity_like(p):
    zero = p[0] * jnp.uint32(0)
    one = zero + Fr.one_mont_limbs.reshape(
        (L,) + (1,) * (p[0].ndim - 1)).astype(np.uint32)
    return (zero, one, zero, one)


def etec_select(cond, p, q):
    return tuple(jnp.where(cond[None], a, b) for a, b in zip(p, q))


def etec_neg(p):
    return (Fr.neg(p[0]), p[1], Fr.neg(p[2]), p[3])


def etec_add(p, q):
    """HWCD'08 3.1 unified addition (complete on this curve)."""
    x1, y1, t1, z1 = p
    x2, y2, t2, z2 = q
    batch = x1.shape[1:]
    a_c = _const(JUBJUB_A, batch)
    d_c = _const(JUBJUB_D, batch)
    x1x2 = Fr.mul(x1, x2)
    y1y2 = Fr.mul(y1, y2)
    dt1t2 = Fr.mul(Fr.mul(d_c, t1), t2)
    z1z2 = Fr.mul(z1, z2)
    e = Fr.sub(Fr.sub(Fr.mul(Fr.add(x1, y1), Fr.add(x2, y2)), x1x2), y1y2)
    f = Fr.sub(z1z2, dt1t2)
    g = Fr.add(z1z2, dt1t2)
    h = Fr.sub(y1y2, Fr.mul(a_c, x1x2))
    return (Fr.mul(e, f), Fr.mul(g, h), Fr.mul(e, h), Fr.mul(f, g))


def etec_double(p):
    """dbl-2008-hwcd."""
    x, y, t, z = p
    batch = x.shape[1:]
    a_c = _const(JUBJUB_A, batch)
    aa = Fr.mul(x, x)
    bb = Fr.mul(y, y)
    zz = Fr.mul(z, z)
    cc = Fr.add(zz, zz)
    dd = Fr.mul(a_c, aa)
    xy = Fr.add(x, y)
    e = Fr.sub(Fr.sub(Fr.mul(xy, xy), aa), bb)
    g = Fr.add(dd, bb)
    f = Fr.sub(g, cc)
    h = Fr.sub(dd, bb)
    return (Fr.mul(e, f), Fr.mul(g, h), Fr.mul(e, h), Fr.mul(f, g))


def etec_equal(p, q):
    """Projective equality: x1 z2 == x2 z1 and y1 z2 == y2 z1; (B,) bool."""
    x_ok = Fr.equal(Fr.mul(p[0], q[3]), Fr.mul(q[0], p[3]))
    y_ok = Fr.equal(Fr.mul(p[1], q[3]), Fr.mul(q[1], p[3]))
    return jnp.logical_and(x_ok, y_ok)


def etec_to_affine_x(p):
    """Affine x via batched Fermat inversion of Z: (L, B) plain-domain...
    returns Montgomery-form affine x (L, B)."""
    z_inv = Fr.inv(p[3])
    return Fr.mul(p[0], z_inv)


def scalar_mult_bits(point, bits):
    """Variable-base mult: point ETEC (L,B); bits (nbits, B) uint32 LSB-first.

    Fixed double-and-add scan: acc += bit ? base : 0; base = 2*base."""
    def step(carry, bit):
        acc, base = carry
        added = etec_add(acc, base)
        acc = etec_select(bit != 0, added, acc)
        base = etec_double(base)
        return (acc, base), None

    acc0 = etec_identity_like(point)
    (acc, _), _ = lax.scan(step, (acc0, point), bits)
    return acc


def point_to_device(points):
    """Host affine Points -> device ETEC tuple."""
    xs = [int(p.x) for p in points]
    ys = [int(p.y) for p in points]
    ts = [(int(p.x) * int(p.y)) % JUBJUB_Q for p in points]
    x = jnp.asarray(Fr.to_mont_jit(Fr.to_limbs(xs)))
    y = jnp.asarray(Fr.to_mont_jit(Fr.to_limbs(ys)))
    t = jnp.asarray(Fr.to_mont_jit(Fr.to_limbs(ts)))
    z = _const(1, (len(points),))
    return (x, y, t, z)


def device_to_points(p):
    """Device ETEC -> host affine Points."""
    from ..field import FQ
    z_inv = Fr.inv_jit(p[3])
    xs = Fr.from_limbs_fast(np.asarray(
        Fr.from_mont_jit(Fr.mul_jit(p[0], z_inv))))
    ys = Fr.from_limbs_fast(np.asarray(
        Fr.from_mont_jit(Fr.mul_jit(p[1], z_inv))))
    return [Point(FQ(int(x)), FQ(int(y))) for x, y in zip(xs.ravel(),
                                                          ys.ravel())]


# ---------------- Pedersen hash ----------------

@lru_cache(maxsize=None)
def _pedersen_tables(name, n_windows):
    """(n_windows, 4, 3, L) Montgomery limbs: per window the 4 positive
    multiples' affine (x, y, t=x*y); signs applied on device."""
    if isinstance(name, bytes):
        name_b = name
    else:
        name_b = name.encode('ascii')
    out = np.zeros((n_windows, 4, 3, L), dtype=np.uint32)
    current = None
    for j in range(n_windows):
        if j % N_WINDOWS_PER_BASEPOINT == 0:
            current = pedersen_hash_basepoint(
                name_b, j // N_WINDOWS_PER_BASEPOINT)
        else:
            current = current.double().double().double().double()
        for w in range(4):
            pt = (current * (w + 1)).as_point()
            for k, v in enumerate((int(pt.x), int(pt.y),
                                   int(pt.x) * int(pt.y) % JUBJUB_Q)):
                m = v * Fr.R_mod % Fr.modulus
                for i in range(L):
                    out[j, w, k, i] = (m >> (Fr.W * i)) & ((1 << Fr.W) - 1)
    return out


def pedersen_hash_bits_device(name, bits):
    """Batched Pedersen hash: bits (nbits, B) uint32 (nbits % 3 == 0).

    Returns the ETEC result (call etec_to_affine_x / device_to_points)."""
    nbits, batch = bits.shape
    assert nbits % 3 == 0
    n_windows = nbits // 3
    tables = jnp.asarray(_pedersen_tables(
        name if isinstance(name, bytes) else name.encode('ascii'), n_windows))
    b0 = bits[0::3]
    b1 = bits[1::3]
    b2 = bits[2::3]

    def step(acc, inp):
        tbl, s0, s1, s2 = inp   # tbl (4, 3, L); s* (B,)
        # select magnitude: index = s0 + 2 s1 in {0..3}
        idx = (s0 + 2 * s1).astype(jnp.int32)          # (B,)
        sel = jnp.take(tbl, idx, axis=0)               # (B, 3, L)
        sel = jnp.transpose(sel, (1, 2, 0))            # (3, L, B)
        x, y, t = sel[0], sel[1], sel[2]
        # sign: negate x and t when s2 == 1
        x = jnp.where((s2 != 0)[None], Fr.neg(x), x)
        t = jnp.where((s2 != 0)[None], Fr.neg(t), t)
        z = x * jnp.uint32(0) + Fr.one_mont_limbs.reshape(
            (L,) + (1,) * (x.ndim - 1)).astype(np.uint32)
        return etec_add(acc, (x, y, t, z)), None

    acc0 = etec_identity(bits.shape[1:])
    acc, _ = lax.scan(step, acc0, (tables, b0, b1, b2))
    return acc


# ---------------- fixed-base scalar mult (generator tables) ----------------

@lru_cache(maxsize=None)
def _fixed_base_tables(px, py, n_windows=127):
    """2-bit windows of a fixed point: (n_windows, 4, 3, L); entry 0 is the
    identity (0, 1, t=0)."""
    from ..field import FQ
    base = Point(FQ(px), FQ(py)).as_etec()
    out = np.zeros((n_windows, 4, 3, L), dtype=np.uint32)
    current = base
    for j in range(n_windows):
        table = [Point(FQ(0), FQ(1)), current.as_point(),
                 current.double().as_point(),
                 (current.double() + current).as_point()]
        for w, pt in enumerate(table):
            for k, v in enumerate((int(pt.x), int(pt.y),
                                   int(pt.x) * int(pt.y) % JUBJUB_Q)):
                m = v * Fr.R_mod % Fr.modulus
                for i in range(L):
                    out[j, w, k, i] = (m >> (Fr.W * i)) & ((1 << Fr.W) - 1)
        current = current.double().double()
    return out


def fixed_base_mult_device(base_point, bits):
    """bits (nbits, B) LSB-first -> bits . base_point via 2-bit windows."""
    nbits, batch = bits.shape
    n_windows = (nbits + 1) // 2
    tables = jnp.asarray(_fixed_base_tables(
        int(base_point.x), int(base_point.y), n_windows))
    if nbits % 2:
        bits = jnp.concatenate(
            [bits, jnp.zeros((1, batch), dtype=bits.dtype)], axis=0)
    b0 = bits[0::2]
    b1 = bits[1::2]

    def step(acc, inp):
        tbl, s0, s1 = inp
        idx = (s0 + 2 * s1).astype(jnp.int32)
        sel = jnp.take(tbl, idx, axis=0)
        sel = jnp.transpose(sel, (1, 2, 0))
        x, y, t = sel[0], sel[1], sel[2]
        z = x * jnp.uint32(0) + Fr.one_mont_limbs.reshape(
            (L,) + (1,) * (x.ndim - 1)).astype(np.uint32)
        return etec_add(acc, (x, y, t, z)), None

    acc0 = etec_identity(bits.shape[1:])
    acc, _ = lax.scan(step, acc0, (tables, b0, b1))
    return acc


# ---------------- bit decomposition on device ----------------

def mont_to_bits(x_mont, nbits=254):
    """Montgomery (L, B) -> LSB-first bits (nbits, B) uint32."""
    plain = Fr.from_mont(x_mont)
    rows = []
    for i in range(nbits):
        limb = plain[i // Fr.W]
        rows.append((limb >> (i % Fr.W)) & 1)
    return jnp.stack(rows)
