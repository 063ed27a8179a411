"""Red-core dense MSM (ops/msm_red.py) vs exact host arithmetic.

Runs the full dense pipeline on the CPU reference stages (the pallas
kernels share the identical fp_red field math and are hardware-validated
by tools/validate_red_msm.py).  Sizes are kept tiny and shapes shared so
the 2-core CPU box compiles each executable once.
"""
import unittest

import numpy as np

from ethsnarks_tpu.bn254 import (
    G1_GEN, G2_GEN, CURVE_ORDER, multiply, add)
from ethsnarks_tpu.ops import msm_red


# One shared problem shape for every G1 case: b=512, c=7, 2 windows
B, C, NW = 512, 7, 2


def _digits(scalars):
    out = np.zeros((NW, len(scalars)), dtype=np.uint32)
    for w in range(NW):
        out[w] = [(s >> (w * C)) & ((1 << C) - 1) for s in scalars]
    return out


def _host_msm(scalars, points):
    out = None
    for s, p in zip(scalars, points):
        out = add(out, multiply(p, s))
    return out


class TestRedConversions(unittest.TestCase):
    def test_g1_roundtrip(self):
        pts = [G1_GEN, multiply(G1_GEN, 7), None, multiply(G1_GEN, 12345)]
        self.assertEqual(msm_red.g1_from_red(msm_red.g1_to_red(pts)), pts)

    def test_g2_roundtrip(self):
        pts = [G2_GEN, multiply(G2_GEN, 9), None]
        self.assertEqual(msm_red.g2_from_red(msm_red.g2_to_red(pts)), pts)


class TestRedDenseMSM(unittest.TestCase):
    def test_g1_random(self):
        rng = np.random.default_rng(5)
        pts = [multiply(G1_GEN, int(j) + 1) for j in range(16)] * (B // 16)
        dev = msm_red.g1_to_red(pts)
        scalars = [int(rng.integers(0, 1 << (C * NW))) for _ in range(B)]
        got = msm_red.msm_g1_dense_red(dev, _digits(scalars), C)
        self.assertEqual(got, _host_msm(scalars, pts))

    def test_g1_edge_digits(self):
        # max digit everywhere (capacity stress on one bucket), zeros
        # (bucket-0 exclusion), single nonzero
        pts = [multiply(G1_GEN, int(j) + 1) for j in range(16)] * (B // 16)
        dev = msm_red.g1_to_red(pts)
        mx = (1 << C) - 1
        scalars = [0] * B
        scalars[3] = mx | (mx << C)
        got = msm_red.msm_g1_dense_red(dev, _digits(scalars), C)
        self.assertEqual(got, _host_msm(scalars, pts))

    def test_g1_all_zero(self):
        pts = [multiply(G1_GEN, int(j) + 1) for j in range(16)] * (B // 16)
        dev = msm_red.g1_to_red(pts)
        scalars = [0] * B
        got = msm_red.msm_g1_dense_red(dev, _digits(scalars), C)
        self.assertIsNone(got)

    def test_g1_static_plan(self):
        rng = np.random.default_rng(6)
        pts = [multiply(G1_GEN, int(j) + 1) for j in range(16)] * (B // 16)
        dev = msm_red.g1_to_red(pts)
        scalars = [int(rng.integers(0, 1 << (C * NW))) for _ in range(B)]
        got = msm_red.msm_g1_dense_red(dev, _digits(scalars), C,
                                       static_plan=True)
        self.assertEqual(got, _host_msm(scalars, pts))

    def test_g1_ones_heavy(self):
        # mostly scalar==1 columns (bit-decomposition circuit shape):
        # routed through the plain point-sum path, rest through Pippenger
        rng = np.random.default_rng(9)
        pts = [multiply(G1_GEN, int(j) + 1) for j in range(16)] * (B // 16)
        dev = msm_red.g1_to_red(pts)
        scalars = [1] * B
        for i in range(0, B, 7):
            scalars[i] = int(rng.integers(0, 1 << (C * NW)))
        got = msm_red.msm_g1_dense_red(dev, _digits(scalars), C)
        self.assertEqual(got, _host_msm(scalars, pts))

    def test_g2_random(self):
        rng = np.random.default_rng(7)
        pts = [multiply(G2_GEN, int(j) + 1) for j in range(8)] * (B // 8)
        dev = msm_red.g2_to_red(pts)
        scalars = [int(rng.integers(0, 1 << (C * NW))) for _ in range(B)]
        got = msm_red.msm_g2_dense_red(dev, _digits(scalars), C)
        self.assertEqual(got, _host_msm(scalars, pts))


if __name__ == '__main__':
    unittest.main()
