"""EVM-level wNAF.scalarMultNAF5 twin vs the host JubJub library.

Parity with the reference's contracts/wNAF.sol:41-83 capability (the
gas-optimized on-chain variable-base mult), pinned three ways: against the
host wNAF-LUT multiplier, the plain double-and-add host mult, and the
binary scalarMult bytecode twin.
"""
import random
import unittest

from ethsnarks_tpu.evm_jubjub import (
    scalar_mult_naf5_evm, scalar_mult_evm, GEN)
from ethsnarks_tpu.field import FQ
from ethsnarks_tpu.jubjub import Point, JUBJUB_L, mult_naf_lut

_rng = random.Random(4242)
_G = Point(FQ(GEN[0]), FQ(GEN[1]))


class TestWnafTwin(unittest.TestCase):
    def _check(self, point, scalar):
        exp = point * scalar
        got = scalar_mult_naf5_evm(int(point.x), int(point.y), scalar)
        self.assertEqual(got, (int(exp.x), int(exp.y)), scalar)

    def test_small_scalars(self):
        # covers every digit branch: zero digits, positive (1..15) and
        # negative (17..31 encodings) window entries
        for s in (0, 1, 2, 3, 8, 15, 16, 17, 31, 32, 33, 255):
            self._check(_G, s)

    def test_random_scalars(self):
        for _ in range(4):
            self._check(_G, _rng.randrange(1, JUBJUB_L))

    def test_subgroup_order_minus_one(self):
        self._check(_G, JUBJUB_L - 1)

    def test_matches_host_wnaf_lut(self):
        s = _rng.randrange(1, JUBJUB_L)
        got = scalar_mult_naf5_evm(GEN[0], GEN[1], s)
        lut = mult_naf_lut(_G.as_etec(), s, width=5).as_point()
        self.assertEqual(got, (int(lut.x), int(lut.y)))

    def test_matches_binary_twin(self):
        s = _rng.randrange(1, JUBJUB_L)
        self.assertEqual(scalar_mult_naf5_evm(GEN[0], GEN[1], s),
                         scalar_mult_evm(GEN[0], GEN[1], s))

    def test_non_generator_point(self):
        p = _G * 12345
        self._check(p, _rng.randrange(1, JUBJUB_L))


if __name__ == "__main__":
    unittest.main()
