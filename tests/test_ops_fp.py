"""Device field-kernel bit-exactness vs the host oracle (random + edge vectors)."""
import random
import unittest

import numpy as np
import jax

from ethsnarks_tpu.ops.fp import Fr, Fq, BN254_R, BN254_Q


def _vectors(modulus, n, seed):
    rng = random.Random(seed)
    edge = [0, 1, 2, modulus - 1, modulus - 2, (modulus - 1) // 2]
    vals = edge + [rng.randrange(modulus) for _ in range(n - len(edge))]
    return vals[:n]


class TestFp(unittest.TestCase):
    def _ctx_roundtrip(self, F, mod, seed):
        vals = _vectors(mod, 64, seed)
        limbs = F.to_limbs(vals)
        self.assertEqual(F.from_limbs(limbs), vals)

    def test_roundtrip(self):
        self._ctx_roundtrip(Fr, BN254_R, 1)
        self._ctx_roundtrip(Fq, BN254_Q, 2)

    def _check_binary(self, F, mod, op, ref, seed):
        a_vals = _vectors(mod, 64, seed)
        b_vals = _vectors(mod, 64, seed + 100)
        a = F.to_limbs(a_vals)
        b = F.to_limbs(b_vals)
        got = F.from_limbs(np.asarray(op(a, b)))
        want = [ref(x, y) % mod for x, y in zip(a_vals, b_vals)]
        self.assertEqual(got, want)

    def test_add(self):
        self._check_binary(Fr, BN254_R, Fr.add_jit, lambda x, y: x + y, 3)
        self._check_binary(Fq, BN254_Q, Fq.add_jit, lambda x, y: x + y, 4)

    def test_sub(self):
        self._check_binary(Fr, BN254_R, Fr.sub_jit, lambda x, y: x - y, 5)
        self._check_binary(Fq, BN254_Q, Fq.sub_jit, lambda x, y: x - y, 6)

    def test_mont_mul(self):
        """to_mont -> mul -> from_mont equals plain modular product."""
        for F, mod, seed in ((Fr, BN254_R, 7), (Fq, BN254_Q, 8)):
            a_vals = _vectors(mod, 48, seed)
            b_vals = _vectors(mod, 48, seed + 50)
            am = F.to_mont_jit(F.to_limbs(a_vals))
            bm = F.to_mont_jit(F.to_limbs(b_vals))
            prod = F.from_mont_jit(F.mul_jit(am, bm))
            got = F.from_limbs(np.asarray(prod))
            want = [x * y % mod for x, y in zip(a_vals, b_vals)]
            self.assertEqual(got, want)

    def test_mont_roundtrip(self):
        for F, mod, seed in ((Fr, BN254_R, 9), (Fq, BN254_Q, 10)):
            vals = _vectors(mod, 32, seed)
            limbs = F.to_limbs(vals)
            back = F.from_limbs(np.asarray(F.from_mont_jit(F.to_mont_jit(limbs))))
            self.assertEqual(back, vals)

    def test_pow_inv(self):
        vals = [v for v in _vectors(BN254_R, 16, 11) if v != 0]
        am = Fr.to_mont_jit(Fr.to_limbs(vals))
        # x^7 sbox
        got7 = Fr.from_limbs(np.asarray(Fr.from_mont_jit(jax.jit(lambda x: Fr.pow_const(x, 7))(am))))
        self.assertEqual(got7, [pow(v, 7, BN254_R) for v in vals])
        inv = Fr.from_limbs(np.asarray(Fr.from_mont_jit(Fr.inv_jit(am))))
        self.assertEqual(inv, [pow(v, -1, BN254_R) for v in vals])

    def test_neg_zero_equal(self):
        vals = _vectors(BN254_R, 16, 12)
        a = Fr.to_limbs(vals)
        n = Fr.from_limbs(np.asarray(Fr.neg_jit(a)))
        self.assertEqual(n, [(-v) % BN254_R for v in vals])
        iz = np.asarray(jax.jit(Fr.is_zero)(Fr.to_limbs([0, 1, BN254_R - 1])))
        self.assertEqual(iz.tolist(), [True, False, False])

    def test_batch_shapes(self):
        """2-D batches (L, m, n) work the same as flat ones."""
        vals = _vectors(BN254_R, 12, 13)
        flat = Fr.to_limbs(vals)
        shaped = flat.reshape(20, 3, 4)
        out = np.asarray(Fr.add_jit(shaped, shaped)).reshape(20, 12)
        want = Fr.from_limbs(np.asarray(Fr.add_jit(flat, flat)))
        self.assertEqual(Fr.from_limbs(out), want)


if __name__ == "__main__":
    unittest.main()
