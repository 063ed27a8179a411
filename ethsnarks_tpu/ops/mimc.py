"""Batched MiMC permutation / Miyaguchi-Preneel hash on TPU.

TPU-native equivalent of the reference's MiMC gadget witness path and native
helpers (src/gadgets/mimc.hpp:357-418, ethsnarks/mimc/permutation.py): one
``lax.scan`` over the 91 (e7) or 110 (e5) rounds, each round doing a handful
of batched Montgomery muls, with the round-constant chain precomputed
host-side (Keccak stays on host - it is setup-time only).

All inputs/outputs are Montgomery-form Fr limb arrays of shape (L, B).
Oracle: :func:`ethsnarks_tpu.mimc.mimc` (tests pin batched random vectors).
"""

from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from .fp import Fr
from ..mimc.permutation import _constants_list, DEFAULT_SEED, DEFAULT_ROUNDS, \
    DEFAULT_EXPONENT
from ..field import SNARK_SCALAR_FIELD


@lru_cache(maxsize=None)
def _round_constants_mont(seed=DEFAULT_SEED, R=DEFAULT_ROUNDS):
    """(R, L) uint32 array of Montgomery-form round constants."""
    consts = _constants_list(seed, SNARK_SCALAR_FIELD, R)
    mont = [(c % SNARK_SCALAR_FIELD) * Fr.R_mod % SNARK_SCALAR_FIELD
            for c in consts]
    out = np.zeros((R, Fr.L), dtype=np.uint32)
    for r, v in enumerate(mont):
        for i in range(Fr.L):
            out[r, i] = (v >> (Fr.W * i)) & ((1 << Fr.W) - 1)
    return out


def mimc_permutation(x, k, constants, e=DEFAULT_EXPONENT):
    """E_k(x): x, k are (L, B) Montgomery Fr arrays; constants (R, L) uint32.

    Traceable; rounds run under lax.scan so the compiled program is one
    round body regardless of R."""
    def round_fn(state, c):
        c_col = c[:, None]  # (L, 1) broadcast over batch
        t = Fr.add(Fr.add(state, k), jnp.broadcast_to(c_col, state.shape))
        return Fr.pow_const(t, e), None

    out, _ = lax.scan(round_fn, x, constants)
    return Fr.add(out, k)


def mimc_hash_batch(xs, k, seed=DEFAULT_SEED, e=DEFAULT_EXPONENT,
                    R=DEFAULT_ROUNDS):
    """Miyaguchi-Preneel over a sequence of message columns.

    xs: (n_msgs, L, B) Montgomery Fr; k: (L, B) initial key.
    Returns (L, B)."""
    constants = jnp.asarray(_round_constants_mont(seed, R))

    def block(key, x_i):
        r = mimc_permutation(x_i, key, constants, e)
        return Fr.add(Fr.add(key, x_i), r), None

    out, _ = lax.scan(block, k, xs)
    return out


@jax.jit
def _mimc_e7_mp_jit(xs, k):
    return mimc_hash_batch(xs, k)


def mimc_hash_device(msgs, k=0):
    """Host convenience: list-of-lists of ints -> batched MP hash -> ints.

    msgs: sequence of message tuples (each the same length); k: shared int key.
    Returns list of hash ints.  Used by tests and the Merkle batch builder."""
    n = len(msgs)
    width = len(msgs[0])
    cols = []
    for j in range(width):
        col = Fr.to_mont_jit(Fr.to_limbs([m[j] for m in msgs]))
        cols.append(col)
    xs = jnp.stack(cols)  # (width, L, B)
    km = Fr.to_mont_jit(Fr.to_limbs([int(k)] * n))
    out = _mimc_e7_mp_jit(xs, km)
    return Fr.from_limbs(np.asarray(Fr.from_mont_jit(out)))


def mimc_permutation_trace(x, k, constants, e=DEFAULT_EXPONENT):
    """Like mimc_permutation but also returns the per-round intermediate
    values the circuit gadget allocates (t2, t4[, t6], round output) -
    the device-side witness generator for templated MiMC circuits.

    Returns (final, trace) with trace shape (R, n_aux, L, B), n_aux = 4 for
    e=7 (t2, t4, t6, out) or 3 for e=5 (t2, t4, out); the last round's "out"
    entry includes the +k (matching the gadget's add_k_to_result)."""
    R = constants.shape[0]

    def round_fn(carry, inp):
        state, idx = carry
        c = inp
        c_col = c[:, None]
        t = Fr.add(Fr.add(state, k), jnp.broadcast_to(c_col, state.shape))
        t2 = Fr.mul(t, t)
        t4 = Fr.mul(t2, t2)
        if e == 7:
            t6 = Fr.mul(t2, t4)
            out = Fr.mul(t6, t)
        else:
            out = Fr.mul(t4, t)
        is_last = (idx == R - 1)
        out_k = Fr.add(out, k)
        out_final = jnp.where(is_last, out_k, out)
        if e == 7:
            aux = jnp.stack([t2, t4, t6, out_final])
        else:
            aux = jnp.stack([t2, t4, out_final])
        return (out_final, idx + 1), aux

    (final, _), trace = lax.scan(round_fn, (x, jnp.int32(0)), constants)
    return final, trace


def mimc_mp_witness_device(left, right, iv, seed=DEFAULT_SEED,
                           R=DEFAULT_ROUNDS):
    """Vectorized witness for one MiMC-MP(left, right) tree level.

    left/right: (L, B) Montgomery Fr; iv: int or (L, B) Montgomery array.
    Returns (out (L,B) Montgomery, aux (8R+2, L, B)): both cipher traces
    plus the two MP chaining values - exactly the variables
    MiyaguchiPreneel_OWF allocates, in allocation order."""
    constants = jnp.asarray(_round_constants_mont(seed, R))
    if isinstance(iv, int):
        k0 = Fr.constant_mont(iv, left.shape[1:])
        k0 = jnp.broadcast_to(jnp.asarray(k0), left.shape).astype(jnp.uint32)
    else:
        k0 = iv
    c1, tr1 = mimc_permutation_trace(left, k0, constants)
    mp1 = Fr.add(Fr.add(k0, left), c1)
    c2, tr2 = mimc_permutation_trace(right, mp1, constants)
    out = Fr.add(Fr.add(mp1, right), c2)
    # aux order: cipher1 rounds (R,4), mp1, cipher2 rounds, mp2(=out)
    aux = jnp.concatenate([
        tr1.reshape(R * 4, *left.shape),
        mp1[None],
        tr2.reshape(R * 4, *left.shape),
        out[None],
    ], axis=0)
    return out, aux
