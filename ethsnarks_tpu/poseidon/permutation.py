"""Poseidon permutation (host oracle), parity with the reference implementation.

Mirrors ``/root/reference/ethsnarks/poseidon/permutation.py``:
 - parameters validated against the interpolation / Groebner-basis attack
   bounds of iacr.org/2019/458,
 - round constants C from an iterated 32-byte blake2b chain (little-endian),
   seeded ``seed + b'_constants'``,
 - MDS matrix as the Cauchy-style matrix 1/(c_i - c_{t+j}) with constants from
   seed ``seed + b'_matrix_0000'``,
 - default instance: t=6, R_F=8, R_P=57, e=5 over the BN254 scalar field.

The batched TPU kernel is :mod:`ethsnarks_tpu.ops.poseidon_ops`, pinned to this
oracle by tests.
"""

from math import log2, floor
from hashlib import blake2b
from collections import namedtuple

from ..field import SNARK_SCALAR_FIELD

PoseidonParamsType = namedtuple(
    '_PoseidonParams',
    ('p', 't', 'nRoundsF', 'nRoundsP', 'seed', 'e', 'constants_C', 'constants_M'))


def H(arg):
    if isinstance(arg, int):
        arg = arg.to_bytes(32, 'little')
    hashed = blake2b(arg, digest_size=32).digest()
    return int.from_bytes(hashed, 'little')


def poseidon_constants(p, seed, n):
    assert isinstance(n, int)
    for _ in range(n):
        seed = H(seed)
        yield seed % p


def poseidon_matrix(p, seed, t):
    """Cauchy MDS matrix from 2t derived constants: M[i][j] = (c_i - c_{t+j})^-1."""
    c = list(poseidon_constants(p, seed, t * 2))
    return [[pow((c[i] - c[t + j]) % p, p - 2, p) for j in range(t)]
            for i in range(t)]


def poseidon_params(p, t, nRoundsF, nRoundsP, seed, e, constants_C=None,
                    constants_M=None, security_target=None):
    assert nRoundsF % 2 == 0 and nRoundsF > 0
    assert nRoundsP > 0
    assert t >= 2
    assert isinstance(seed, bytes)

    n = floor(log2(p))
    M = n if security_target is None else security_target
    assert n >= M

    if p % 2 == 3:
        assert e == 3
        grobner_rounds, grobner_sboxes, interp = 0.32, 0.18, 0.63
    elif p % 5 != 1:
        assert e == 5
        grobner_rounds, grobner_sboxes, interp = 0.21, 0.14, 0.43
    else:
        raise ValueError('Invalid p for congruency')

    # iacr.org/2019/458 section 3, figures 1/3/4: round counts must exceed the
    # known algebraic attack bounds.
    assert (nRoundsF + nRoundsP) > ((interp * min(n, M)) + log2(t))
    assert (nRoundsF + nRoundsP) > ((2 + min(M, n)) * grobner_rounds)
    assert (nRoundsF + (t * nRoundsP)) > (M * grobner_sboxes)

    if constants_C is None:
        constants_C = list(poseidon_constants(p, seed + b'_constants',
                                              nRoundsF + nRoundsP))
    if constants_M is None:
        constants_M = poseidon_matrix(p, seed + b'_matrix_0000', t)

    return PoseidonParamsType(p, t, nRoundsF, nRoundsP, seed, e,
                              constants_C, constants_M)


DefaultParams = poseidon_params(SNARK_SCALAR_FIELD, 6, 8, 57, b'poseidon', 5,
                                security_target=126)


def poseidon_sbox(state, i, params):
    """Hades: full sbox layers on the outer R_F rounds, single sbox inside."""
    half_F = params.nRoundsF // 2
    e, p = params.e, params.p
    if i < half_F or i >= (half_F + params.nRoundsP):
        return [pow(x, e, p) for x in state]
    return [pow(state[0], e, p)] + state[1:]


def poseidon_mix(state, M, p):
    return [sum(M[i][j] * x for j, x in enumerate(state)) % p
            for i in range(len(M))]


def poseidon(inputs, params=None, chained=False, trace=False):
    """Poseidon sponge over one permutation call; ``chained`` returns full state."""
    if params is None:
        params = DefaultParams
    assert isinstance(params, PoseidonParamsType)
    assert len(inputs) > 0
    if not chained:
        assert len(inputs) < params.t
    state = [0] * params.t
    state[:len(inputs)] = [int(x) for x in inputs]
    for i, C_i in enumerate(params.constants_C):
        state = [x + C_i for x in state]           # ARK
        state = poseidon_sbox(state, i, params)    # SBOX (reduces mod p)
        state = poseidon_mix(state, params.constants_M, params.p)
        if trace:
            for j, val in enumerate(state):
                print('%d %d' % (i, j), '=', val)
    if chained:
        return state
    return state[0]
