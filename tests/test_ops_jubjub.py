"""Batched device JubJub/Pedersen/EdDSA vs host oracle."""
import random
import unittest

import numpy as np
import jax
import jax.numpy as jnp

from ethsnarks_tpu.jubjub import Point, JUBJUB_L
from ethsnarks_tpu.pedersen import pedersen_hash_bits
from ethsnarks_tpu.eddsa import PureEdDSA
from ethsnarks_tpu.ops import jubjub_ops as jj
from ethsnarks_tpu.ops.eddsa_ops import eddsa_verify_batch

_rng = random.Random(2024)


class TestEtecOps(unittest.TestCase):
    def test_add_double_roundtrip(self):
        g = Point.generator()
        pts = [g * 3, g * 5, g * 7, Point.infinity()]
        others = [g * 11, g * 13, Point.infinity(), g * 2]
        a = jj.point_to_device(pts)
        b = jj.point_to_device(others)
        back = jj.device_to_points(a)
        self.assertEqual(back, pts)
        s = jax.jit(jj.etec_add)(a, b)
        self.assertEqual(jj.device_to_points(s),
                         [p + q for p, q in zip(pts, others)])
        d = jax.jit(jj.etec_double)(a)
        self.assertEqual(jj.device_to_points(d), [p.double() for p in pts])
        eq = np.asarray(jax.jit(jj.etec_equal)(a, a))
        self.assertTrue(eq.all())

    def test_scalar_mult(self):
        g = Point.generator()
        pts = [g * 3, g * 9]
        scalars = [_rng.randrange(JUBJUB_L) for _ in pts]
        bits = np.zeros((254, len(pts)), dtype=np.uint32)
        for b, s in enumerate(scalars):
            for i in range(254):
                bits[i, b] = (s >> i) & 1
        dev = jj.point_to_device(pts)
        out = jax.jit(jj.scalar_mult_bits)(dev, jnp.asarray(bits))
        self.assertEqual(jj.device_to_points(out),
                         [p * s for p, s in zip(pts, scalars)])

    def test_fixed_base_mult(self):
        g = Point.generator()
        scalars = [_rng.randrange(JUBJUB_L) for _ in range(3)]
        bits = np.zeros((254, 3), dtype=np.uint32)
        for b, s in enumerate(scalars):
            for i in range(254):
                bits[i, b] = (s >> i) & 1
        out = jax.jit(lambda x: jj.fixed_base_mult_device(g, x))(
            jnp.asarray(bits))
        self.assertEqual(jj.device_to_points(out), [g * s for s in scalars])


class TestPedersenDevice(unittest.TestCase):
    def test_vs_host(self):
        nbits = 84
        strings = [''.join(_rng.choice('01') for _ in range(nbits))
                   for _ in range(4)]
        bits = np.zeros((nbits, len(strings)), dtype=np.uint32)
        for b, s in enumerate(strings):
            for i, ch in enumerate(s):
                bits[i, b] = int(ch)
        out = jax.jit(lambda x: jj.pedersen_hash_bits_device(b'test', x))(
            jnp.asarray(bits))
        got = jj.device_to_points(out)
        want = [pedersen_hash_bits('test', s) for s in strings]
        self.assertEqual(got, want)


class TestEdDSADevice(unittest.TestCase):
    def test_verify_batch(self):
        B = PureEdDSA.B()
        batch = []
        for i in range(3):
            k, A = PureEdDSA.random_keypair()
            msg = bytes([_rng.randrange(256) for _ in range(8)])
            sm = PureEdDSA.sign(msg, k)
            batch.append((A, (sm.sig.R, int(sm.sig.s)), msg))
        # one corrupted signature
        A0, (R0, s0), m0 = batch[0]
        bad = (A0, (R0, (s0 + 1) % (2 ** 250)), m0)
        As = [b[0] for b in batch] + [bad[0]]
        sigs = [b[1] for b in batch] + [bad[1]]
        msgs = [b[2] for b in batch] + [bad[2]]
        ok = eddsa_verify_batch(As, sigs, msgs)
        self.assertEqual(ok, [True, True, True, False])


if __name__ == "__main__":
    unittest.main()
