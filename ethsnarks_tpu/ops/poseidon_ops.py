"""Batched Poseidon permutation on TPU.

TPU-native equivalent of the reference Poseidon gadget witness path
(src/gadgets/poseidon.hpp; python oracle ethsnarks/poseidon/permutation.py).
Structure: three ``lax.scan`` phases (first full rounds / partial rounds /
last full rounds); the MDS mix runs as ONE batched Montgomery multiply over
a (L, t, t, B) broadcast followed by a lazy modular row-sum, which keeps the
VPU busy instead of looping 36 scalar muls.

State layout: (L, t, B) Montgomery-form Fr limbs.
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from .fp import Fr
from ..poseidon.permutation import DefaultParams
from ..field import SNARK_SCALAR_FIELD


def _to_mont_np(values):
    """List of ints -> (n, L) uint32 Montgomery limbs (host-side)."""
    out = np.zeros((len(values), Fr.L), dtype=np.uint32)
    for r, v in enumerate(values):
        m = (int(v) % SNARK_SCALAR_FIELD) * Fr.R_mod % SNARK_SCALAR_FIELD
        for i in range(Fr.L):
            out[r, i] = (m >> (Fr.W * i)) & ((1 << Fr.W) - 1)
    return out


_PARAMS_CACHE = {}


def _params_device(params=None):
    """Round constants (nRounds, L) and MDS matrix (t, t, L), Montgomery.

    Cached per params object (id-keyed; the cache pins the params so ids
    cannot be recycled) - PoseidonParamsType holds lists so it is not
    hashable for lru_cache."""
    params = DefaultParams if params is None else params
    hit = _PARAMS_CACHE.get(id(params))
    if hit is not None:
        return hit[1], hit[2]
    C = _to_mont_np(params.constants_C)
    t = params.t
    M = np.zeros((t, t, Fr.L), dtype=np.uint32)
    for i in range(t):
        M[i] = _to_mont_np(params.constants_M[i])
    _PARAMS_CACHE[id(params)] = (params, C, M)
    return C, M


def _mix(state, M_dev):
    """MDS matrix-vector product over the state axis.

    state: (L, t, B); M_dev: (t, t, L).
    Result[i] = sum_j M[i][j] * state[j]."""
    t = state.shape[1]
    # Broadcast to (L, t_out, t_in, B) and do one big batched montmul.
    m = jnp.transpose(jnp.asarray(M_dev), (2, 0, 1))[:, :, :, None]  # (L,t,t,1)
    s = state[:, None, :, :]                                          # (L,1,t,B)
    prods = Fr.mul(jnp.broadcast_to(m, (Fr.L, t, t) + state.shape[2:]),
                   jnp.broadcast_to(s, (Fr.L, t, t) + state.shape[2:]))
    return Fr.sum_axis(prods, axis=2)  # (L, t, B)


def poseidon_permutation(state, params=None):
    """Full Poseidon-pi permutation; state (L, t, B) Montgomery Fr."""
    params = params or DefaultParams
    C, M = _params_device(params)
    C = jnp.asarray(C)
    half_F = params.nRoundsF // 2
    e = params.e
    n_p = params.nRoundsP

    def full_round(s, c):
        s = Fr.add(s, jnp.broadcast_to(c[:, None, None], s.shape))
        s = Fr.pow_const(s, e)
        return _mix(s, M), None

    def partial_round(s, c):
        s = Fr.add(s, jnp.broadcast_to(c[:, None, None], s.shape))
        s0 = Fr.pow_const(s[:, 0], e)
        s = s.at[:, 0].set(s0)
        return _mix(s, M), None

    # Constants are (nRounds, L); scan bodies take (L,) rows.
    c_first = jnp.transpose(C[:half_F], (0, 1))
    c_mid = C[half_F:half_F + n_p]
    c_last = C[half_F + n_p:]

    state, _ = lax.scan(full_round, state, c_first)
    state, _ = lax.scan(partial_round, state, c_mid)
    state, _ = lax.scan(full_round, state, c_last)
    return state


@jax.jit
def _poseidon_default_jit(state):
    return poseidon_permutation(state)


def poseidon_witness_device(state, params=None):
    """Permutation + per-sbox witness trace (the master-instance analog).

    Returns (final_state, aux) where aux is (n_sboxes, 3, L, B) Montgomery:
    for every sbox in circuit order (first half full rounds j=0..t-1, then
    partial rounds, then last half full rounds) the (x^2, x^4, x^5) values
    the R1CS gadget allocates (gadgets/poseidon.py _FifthPower).  One
    batched trace fills the witness of every instance in a batch - the
    TPU-first equivalent of the reference's master-gadget instancing
    (poseidon.hpp:405-517)."""
    params = params or DefaultParams
    C, M = _params_device(params)
    C = jnp.asarray(C)
    half_F = params.nRoundsF // 2
    n_p = params.nRoundsP
    assert params.e == 5, "witness trace is specialized to the x^5 sbox"

    def full_round(s, c):
        s = Fr.add(s, jnp.broadcast_to(c[:, None, None], s.shape))
        x2 = Fr.mul(s, s)
        x4 = Fr.mul(x2, x2)
        x5 = Fr.mul(x4, s)
        return _mix(x5, M), (x2, x4, x5)

    def partial_round(s, c):
        s = Fr.add(s, jnp.broadcast_to(c[:, None, None], s.shape))
        x = s[:, 0]
        x2 = Fr.mul(x, x)
        x4 = Fr.mul(x2, x2)
        x5 = Fr.mul(x4, x)
        s = s.at[:, 0].set(x5)
        return _mix(s, M), (x2, x4, x5)

    state, aux_f1 = lax.scan(full_round, state, C[:half_F])
    state, aux_p = lax.scan(partial_round, state, C[half_F:half_F + n_p])
    state, aux_f2 = lax.scan(full_round, state, C[half_F + n_p:])

    def flat_full(aux):
        # (nR, L, t, B) x3 -> (nR*t, 3, L, B) in (round, j) order
        return jnp.stack(
            [jnp.moveaxis(a, 2, 1).reshape(-1, Fr.L, a.shape[3])
             for a in aux], axis=1)

    def flat_part(aux):
        # (nR, L, B) x3 -> (nR, 3, L, B)
        return jnp.stack(list(aux), axis=1)

    aux = jnp.concatenate(
        [flat_full(aux_f1), flat_part(aux_p), flat_full(aux_f2)], axis=0)
    return state, aux


_poseidon_witness_jit = jax.jit(poseidon_witness_device)


def poseidon_device(inputs_batch, params=None, chained=False):
    """Host convenience: batch of input tuples -> batched Poseidon.

    inputs_batch: sequence of equal-length tuples of ints (len < t).
    Returns list of output ints (or list of full states if chained)."""
    params = params or DefaultParams
    t = params.t
    n = len(inputs_batch)
    width = len(inputs_batch[0])
    assert chained or width < t
    state = np.zeros((Fr.L, t, n), dtype=np.uint32)
    for j in range(width):
        col = np.asarray(Fr.to_mont_jit(
            Fr.to_limbs([row[j] for row in inputs_batch])))
        state[:, j, :] = col
    out = _poseidon_default_jit(jnp.asarray(state))
    plain = np.asarray(Fr.from_mont_jit(out.reshape(Fr.L, t * n))).reshape(
        Fr.L, t, n)
    if chained:
        return [[Fr.from_limbs(plain[:, j, b:b + 1])[0] for j in range(t)]
                for b in range(n)]
    return Fr.from_limbs(plain[:, 0, :])
