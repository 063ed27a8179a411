"""Field core v2 (signed redundant digits) pinned against the exact oracle.

Checks value-exactness of every op mod N, chain stability (digit bounds
hold across long op chains), and the G1/G2 point bodies against the host
curve implementation."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ethsnarks_tpu.ops import fp_red
from ethsnarks_tpu.ops.fp_red import (
    RL, RMASK, red_field, mk_red_ops, g1_add_red, g1_double_red,
    g2_add_red, g2_double_red)
from ethsnarks_tpu.ops.fp import BN254_Q, BN254_R

rng = np.random.RandomState(1234)


def rand_vals(n, modulus):
    return [int.from_bytes(rng.bytes(40), 'little') % modulus
            for _ in range(n)]


@pytest.mark.parametrize('modulus', [BN254_Q, BN254_R])
def test_roundtrip_and_mont(modulus):
    F = red_field(modulus)
    vals = rand_vals(16, modulus) + [0, 1, modulus - 1]
    d = F.to_digits(vals)
    assert list(F.from_digits(d)) == vals
    m = F.to_mont(vals)
    assert list(F.from_mont(m)) == vals


@pytest.mark.parametrize('modulus', [BN254_Q, BN254_R])
def test_ops_exact(modulus):
    F = red_field(modulus)
    ops = mk_red_ops(F.packed_consts())
    n = 64
    av = rand_vals(n, modulus)
    bv = rand_vals(n, modulus)
    a = jnp.asarray(F.to_mont(av))
    b = jnp.asarray(F.to_mont(bv))

    got = F.from_mont(np.asarray(jax.jit(ops['add'])(a, b)))
    assert list(got) == [(x + y) % modulus for x, y in zip(av, bv)]

    got = F.from_mont(np.asarray(jax.jit(ops['sub'])(a, b)))
    assert list(got) == [(x - y) % modulus for x, y in zip(av, bv)]

    got = F.from_mont(np.asarray(jax.jit(ops['mul'])(a, b)))
    assert list(got) == [(x * y) % modulus for x, y in zip(av, bv)]

    got = F.from_mont(np.asarray(jax.jit(
        lambda t: ops['mul_small'](t, 9))(a)))
    assert list(got) == [(x * 9) % modulus for x, y in zip(av, bv)]

    got = F.from_mont(np.asarray(jax.jit(ops['neg'])(a)))
    assert list(got) == [(-x) % modulus for x in av]


@pytest.mark.parametrize('modulus', [BN254_Q])
def test_chain_stability(modulus):
    """Long mixed chains keep digits in the standard range (int32-safe) and
    stay value-exact: emulates NTT butterflies / point-formula dataflow."""
    F = red_field(modulus)
    ops = mk_red_ops(F.packed_consts())
    n = 32
    av = rand_vals(n, modulus)
    bv = rand_vals(n, modulus)
    a = jnp.asarray(F.to_mont(av))
    b = jnp.asarray(F.to_mont(bv))

    @jax.jit
    def chain(a, b):
        outs = []
        for _ in range(6):
            t = ops['mul'](ops['add'](a, b), ops['sub'](a, b))
            u = ops['add'](ops['add'](t, t), ops['mul_small'](a, 9))
            a, b = ops['mul'](u, b), ops['sub'](t, u)
            outs.append(a)
            outs.append(b)
        return a, b, outs

    a2, b2, outs = chain(a, b)
    # digit-bound audit on every intermediate: non-top digits standard,
    # top digit within the documented hard limit (see fp_red ledger)
    for o in outs:
        arr = np.asarray(o)
        assert arr[:RL - 1].min() >= -4300 and arr[:RL - 1].max() <= 4300, (
            arr[:RL - 1].min(), arr[:RL - 1].max())
        assert abs(arr[RL - 1]).max() <= 45000, abs(arr[RL - 1]).max()

    # exact value check against python ints (Montgomery semantics: device
    # mul computes a*b*R^-1, so mirror with mont values on host)
    R_inv = F.r_inv
    ah = [(x * F.r_mod) % modulus for x in av]
    bh = [(x * F.r_mod) % modulus for x in bv]
    for _ in range(6):
        t = [((x + y) * (x - y) % modulus) * R_inv % modulus
             for x, y in zip(ah, bh)]
        u = [(2 * tt + 9 * x) % modulus for tt, x in zip(t, ah)]
        ah = [(uu * y % modulus) * R_inv % modulus
              for uu, y in zip(u, bh)]
        bh = [(tt - uu) % modulus for tt, uu in zip(t, u)]
    assert list(F.from_digits(np.asarray(a2))) == ah
    assert list(F.from_digits(np.asarray(b2))) == bh


def test_adversarial_digit_patterns():
    """All-4095 digits, tiny/huge values, and repeated squarings."""
    F = red_field(BN254_Q)
    ops = mk_red_ops(F.packed_consts())
    specials = [0, 1, 2, BN254_Q - 1, BN254_Q - 2, (1 << 254) % BN254_Q,
                int('fff' * 22, 16) % BN254_Q, RMASK, 1 << 252]
    a = jnp.asarray(F.to_mont(specials))

    @jax.jit
    def sq_chain(a):
        for _ in range(8):
            a = ops['mul'](a, a)
        return a

    got = F.from_mont(np.asarray(sq_chain(a)))
    exp = [pow(v, 2 ** 8, BN254_Q) for v in specials]
    assert list(got) == exp


def _host_g1_points(n):
    from ethsnarks_tpu.bn254 import G1_GEN, multiply
    return [multiply(G1_GEN, 3 + 7 * i) for i in range(n)]


def _g1_to_dev(F, points):
    xs = F.to_mont([int(p[0].n) for p in points])
    ys = F.to_mont([int(p[1].n) for p in points])
    zs = F.to_mont([1] * len(points))
    return tuple(jnp.asarray(v) for v in (xs, ys, zs))


def _g1_decode(F, res):
    xs = F.from_mont(np.asarray(res[0]))
    ys = F.from_mont(np.asarray(res[1]))
    zs = F.from_mont(np.asarray(res[2]))
    out = []
    for x, y, z in zip(xs, ys, zs):
        if int(z) == 0:
            out.append(None)
        else:
            zi = pow(int(z), BN254_Q - 2, BN254_Q)
            out.append((int(x) * zi % BN254_Q, int(y) * zi % BN254_Q))
    return out


def _affine(pt):
    return None if pt is None else (int(pt[0].n), int(pt[1].n))


def test_g1_bodies_match_host():
    from ethsnarks_tpu import bn254
    F = red_field(BN254_Q)
    ops = mk_red_ops(F.packed_consts())
    pts = _host_g1_points(9)
    qts = _host_g1_points(9)[::-1]

    p = _g1_to_dev(F, pts)
    q = _g1_to_dev(F, qts)
    got = _g1_decode(F, jax.jit(lambda p, q: g1_add_red(ops, p, q))(p, q))
    for g, pa, pb in zip(got, pts, qts):
        assert g == _affine(bn254.add(pa, pb))

    got = _g1_decode(F, jax.jit(lambda p: g1_double_red(ops, p))(p))
    for g, pa in zip(got, pts):
        assert g == _affine(bn254.double(pa))


def test_g1_identity_handling():
    """Complete formulas: P + 0 = P, 0 + P = P, P + P = 2P, P + (-P) = 0."""
    from ethsnarks_tpu import bn254
    F = red_field(BN254_Q)
    ops = mk_red_ops(F.packed_consts())
    pts = _host_g1_points(4)

    def col(vals_x, vals_y, vals_z):
        return (jnp.asarray(F.to_mont(vals_x)),
                jnp.asarray(F.to_mont(vals_y)),
                jnp.asarray(F.to_mont(vals_z)))

    xs = [int(p[0].n) for p in pts]
    ys = [int(p[1].n) for p in pts]
    p = col(xs, ys, [1] * 4)
    ident = col([0] * 4, [1] * 4, [0] * 4)
    negp = col(xs, [(-y) % BN254_Q for y in ys], [1] * 4)

    add = jax.jit(lambda p, q: g1_add_red(ops, p, q))
    for lhs, rhs, exp_fn in [
            (p, ident, lambda pt: pt),
            (ident, p, lambda pt: pt),
            (p, p, bn254.double),
    ]:
        got = _g1_decode(F, add(lhs, rhs))
        for g, pt in zip(got, pts):
            assert g == _affine(exp_fn(pt))
    # P + (-P) -> infinity (z == 0)
    got = _g1_decode(F, add(p, negp))
    assert got == [None] * 4


def test_g2_bodies_match_host():
    from ethsnarks_tpu import bn254
    F = red_field(BN254_Q)
    ops = mk_red_ops(F.packed_consts())
    from ethsnarks_tpu.ops.fp2 import B3_COEFFS
    b3 = (jnp.asarray(F.to_mont([B3_COEFFS[0]])),
          jnp.asarray(F.to_mont([B3_COEFFS[1]])))

    pts = [bn254.multiply(bn254.G2_GEN, 5 + 3 * i) for i in range(4)]
    qts = [bn254.multiply(bn254.G2_GEN, 11 + 2 * i) for i in range(4)]

    def to_dev(points):
        def coeff(axis, k):
            return F.to_mont([int(p[axis].coeffs[k]) for p in points])
        one = F.to_mont([1] * len(points))
        zero = F.to_digits([0] * len(points))
        return ((jnp.asarray(coeff(0, 0)), jnp.asarray(coeff(0, 1))),
                (jnp.asarray(coeff(1, 0)), jnp.asarray(coeff(1, 1))),
                (jnp.asarray(one), jnp.asarray(zero)))

    def decode(res):
        from ethsnarks_tpu.bn254 import Fq2 as HostFq2
        x0 = F.from_mont(np.asarray(res[0][0]))
        x1 = F.from_mont(np.asarray(res[0][1]))
        y0 = F.from_mont(np.asarray(res[1][0]))
        y1 = F.from_mont(np.asarray(res[1][1]))
        z0 = F.from_mont(np.asarray(res[2][0]))
        z1 = F.from_mont(np.asarray(res[2][1]))
        out = []
        for i in range(len(x0)):
            z = HostFq2([int(z0[i]), int(z1[i])])
            zi = z.inv()
            gx = HostFq2([int(x0[i]), int(x1[i])]) * zi
            gy = HostFq2([int(y0[i]), int(y1[i])]) * zi
            out.append((gx, gy))
        return out

    p = to_dev(pts)
    q = to_dev(qts)
    got = decode(jax.jit(lambda p, q: g2_add_red(ops, b3, p, q))(p, q))
    for g, pa, pb in zip(got, pts, qts):
        exp = bn254.add(pa, pb)
        assert g[0] == exp[0] and g[1] == exp[1]

    got = decode(jax.jit(lambda p: g2_double_red(ops, b3, p))(p))
    for g, pa in zip(got, pts):
        exp = bn254.double(pa)
        assert g[0] == exp[0] and g[1] == exp[1]
