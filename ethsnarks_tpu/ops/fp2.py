"""Batched Fq2 arithmetic on TPU (G2 coordinate field).

Fq2 = Fq[u]/(u^2 + 1), matching the host tower in
:mod:`ethsnarks_tpu.bn254`.  Elements are pairs ``(c0, c1)`` of Fq limb
arrays (each (L, *batch), Montgomery form); multiplication is Karatsuba
(3 Fq muls)."""

import numpy as np
import jax.numpy as jnp

from .fp import Fq, _int_to_limbs
from ..bn254 import FIELD_MODULUS


def add(a, b):
    return (Fq.add(a[0], b[0]), Fq.add(a[1], b[1]))


def sub(a, b):
    return (Fq.sub(a[0], b[0]), Fq.sub(a[1], b[1]))


def neg(a):
    return (Fq.neg(a[0]), Fq.neg(a[1]))


def mul(a, b):
    """(a0 + a1 u)(b0 + b1 u) with u^2 = -1; Karatsuba."""
    m0 = Fq.mul(a[0], b[0])
    m1 = Fq.mul(a[1], b[1])
    m2 = Fq.mul(Fq.add(a[0], a[1]), Fq.add(b[0], b[1]))
    real = Fq.sub(m0, m1)
    imag = Fq.sub(Fq.sub(m2, m0), m1)
    return (real, imag)


def square(a):
    return mul(a, a)


def select(cond, a, b):
    return (Fq.select(cond, a[0], b[0]), Fq.select(cond, a[1], b[1]))


def is_zero(a):
    return jnp.logical_and(Fq.is_zero(a[0]), Fq.is_zero(a[1]))


def zero(batch_shape=()):
    return (Fq.zero(batch_shape), Fq.zero(batch_shape))


def one(batch_shape=()):
    return (Fq.mont_one(batch_shape), Fq.zero(batch_shape))


def constant(c0, c1, batch_shape=()):
    """Host ints -> broadcast Montgomery Fq2 constant."""
    return (jnp.asarray(Fq.constant_mont(c0, batch_shape)),
            jnp.asarray(Fq.constant_mont(c1, batch_shape)))


def to_limbs_batch(values):
    """List of (c0, c1) int pairs -> Fq2 Montgomery limb pair (L, B) each."""
    c0 = Fq.to_mont_jit(Fq.to_limbs([v[0] for v in values]))
    c1 = Fq.to_mont_jit(Fq.to_limbs([v[1] for v in values]))
    return (c0, c1)


def from_limbs_batch(a):
    """Montgomery Fq2 pair -> list of (c0, c1) ints."""
    c0 = Fq.from_limbs(np.asarray(Fq.from_mont_jit(a[0])))
    c1 = Fq.from_limbs(np.asarray(Fq.from_mont_jit(a[1])))
    return list(zip(c0, c1))


# b3 for the G2 twist: 3 * (3 / (9+u)) in Fq2.
_B2_C = pow(9 ** 2 + 1, -1, FIELD_MODULUS)
B2_COEFFS = (3 * 9 * _B2_C % FIELD_MODULUS,
             (-3 * _B2_C) % FIELD_MODULUS)
B3_COEFFS = (3 * B2_COEFFS[0] % FIELD_MODULUS,
             3 * B2_COEFFS[1] % FIELD_MODULUS)
