"""Device curve ops + Pippenger MSM vs exact host arithmetic."""
import random
import unittest

import jax

from ethsnarks_tpu import bn254
from ethsnarks_tpu.bn254 import (
    G1_GEN, G2_GEN, multiply, add, CURVE_ORDER)
from ethsnarks_tpu.ops import curve, msm


class TestDeviceCurve(unittest.TestCase):
    def test_g1_add_double_roundtrip(self):
        pts = [G1_GEN, multiply(G1_GEN, 7), multiply(G1_GEN, 12345), None]
        dev = curve.g1_to_device(pts)
        back = curve.g1_from_device(dev)
        self.assertEqual(back, pts)
        # pairwise adds vs host
        other = [multiply(G1_GEN, 3), None, multiply(G1_GEN, 12345), None]
        dev2 = curve.g1_to_device(other)
        s = jax.jit(lambda a, b: curve.point_add(curve.G1F, a, b))(dev, dev2)
        got = curve.g1_from_device(s)
        want = [add(a, b) for a, b in zip(pts, other)]
        self.assertEqual(got, want)
        d = jax.jit(lambda a: curve.point_double(curve.G1F, a))(dev)
        self.assertEqual(curve.g1_from_device(d),
                         [bn254.double(p) if p else None for p in pts])

    def test_g2_add_double(self):
        pts = [G2_GEN, multiply(G2_GEN, 9), None]
        other = [multiply(G2_GEN, 4), multiply(G2_GEN, 9), G2_GEN]
        dev = curve.g2_to_device(pts)
        dev2 = curve.g2_to_device(other)
        back = curve.g2_from_device(dev)
        self.assertEqual(back, pts)
        s = jax.jit(lambda a, b: curve.point_add(curve.G2F, a, b))(dev, dev2)
        got = curve.g2_from_device(s)
        want = [add(a, b) for a, b in zip(pts, other)]
        self.assertEqual(got, want)


class TestMSM(unittest.TestCase):
    def _host_msm(self, scalars, points):
        out = None
        for s, p in zip(scalars, points):
            out = add(out, multiply(p, s))
        return out

    # All G1 cases pad to the same (B=32, c=4) problem shape so the CPU
    # test run compiles the MSM executable exactly once (2-core box).
    B = 32

    def _padded(self, scalars, points):
        pad = self.B - len(scalars)
        return (list(scalars) + [0] * pad,
                list(points) + [G1_GEN] * pad)

    def test_msm_g1_small(self):
        rng = random.Random(11)
        scalars = [rng.randrange(CURVE_ORDER) for _ in range(16)]
        points = [multiply(G1_GEN, rng.randrange(1, 1000)) for _ in range(16)]
        scalars, points = self._padded(scalars, points)
        got = msm.msm_g1_host_api(scalars, points, c=4)
        self.assertEqual(got, self._host_msm(scalars, points))

    def test_msm_g1_edge_scalars(self):
        points = [G1_GEN, multiply(G1_GEN, 2), multiply(G1_GEN, 3), G1_GEN]
        scalars = [0, 1, CURVE_ORDER - 1, 2]
        scalars, points = self._padded(scalars, points)
        got = msm.msm_g1_host_api(scalars, points, c=4)
        self.assertEqual(got, self._host_msm(scalars, points))

    def test_msm_g1_with_infinity_points(self):
        scalars, points = self._padded([3, 4, 5],
                                       [G1_GEN, None, multiply(G1_GEN, 5)])
        got = msm.msm_g1_host_api(scalars, points, c=4)
        want = add(multiply(G1_GEN, 3), multiply(G1_GEN, 25))
        self.assertEqual(got, want)

    def test_msm_g1_duplicate_digits(self):
        """Many equal scalars stress the segmented scan."""
        n = 32
        points = [multiply(G1_GEN, i + 1) for i in range(n)]
        scalars = [42] * n
        got = msm.msm_g1_host_api(scalars, points, c=4)
        self.assertEqual(got, self._host_msm(scalars, points))

    def test_msm_g2(self):
        rng = random.Random(13)
        n = 8
        scalars = [rng.randrange(CURVE_ORDER) for _ in range(n)]
        points = [multiply(G2_GEN, rng.randrange(1, 50)) for _ in range(n)]
        got = msm.msm_g2_host_api(scalars, points, c=4)
        self.assertEqual(got, self._host_msm(scalars, points))


if __name__ == "__main__":
    unittest.main()
