"""Device batch fixed-base exponentiation vs exact host arithmetic.

Parity role: libff get_window_table/batch_exp, the generator hot path
(reference r1cs_gg_ppzksnark_zok.tcc:358-412).
"""
import unittest

from ethsnarks_tpu.bn254 import G1_GEN, G2_GEN, multiply, CURVE_ORDER
from ethsnarks_tpu.ops.batch_exp import _BatchExp


class TestBatchExp(unittest.TestCase):
    def test_g1(self):
        scalars = [0, 1, 2, 7, CURVE_ORDER - 1, 12345678901234567890,
                   CURVE_ORDER - 2, 3]
        be = _BatchExp(G1_GEN, 'g1')
        got = be.mul_many(scalars)
        want = [multiply(G1_GEN, s) if s % CURVE_ORDER else None
                for s in scalars]
        self.assertEqual(got, want)

    def test_g1_other_base(self):
        base = multiply(G1_GEN, 987654321)
        scalars = [5, 11, 0, 2**200 + 17]
        be = _BatchExp(base, 'g1')
        got = be.mul_many(scalars)
        want = [multiply(base, s) if s else None for s in scalars]
        self.assertEqual(got, want)

    def test_g2(self):
        scalars = [1, 3, 0, CURVE_ORDER - 1, 2**170 + 5]
        be = _BatchExp(G2_GEN, 'g2')
        got = be.mul_many(scalars)
        want = [multiply(G2_GEN, s) if s else None for s in scalars]
        self.assertEqual(got, want)


if __name__ == "__main__":
    unittest.main()
