"""Red-core dense MSM (ops/msm_red.py) vs exact host arithmetic.

Runs the full dense pipeline on the CPU reference stages (the pallas
kernels share the identical fp_red field math and are hardware-validated
by tools/validate_red_msm.py).  Sizes are kept tiny and shapes shared so
the 2-core CPU box compiles each executable once.
"""
import unittest

import numpy as np
import pytest

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


def _full_digits(scalars, c):
    from ethsnarks_tpu.ops.msm import window_digits_host_np
    return window_digits_host_np(scalars, c)


def _rand_scalars(n, seed):
    rng = np.random.default_rng(seed)
    return [int.from_bytes(rng.bytes(32), 'little') % CURVE_ORDER
            for _ in range(n)]


@pytest.mark.slow
class TestRedEnvelope(unittest.TestCase):
    """The operating envelope the prover actually uses: full 254-bit
    scalars, prover-sized window widths, merged top window, tail pipeline,
    multi-group lax.scan + group Horner, static-plan overflow -> replan.
    (Round 2's c=11 bench failure lived exactly in the region the tiny
    2-window c=7 tests above never reached.)"""

    def test_g1_254bit_c8_narrow_top(self):
        # c=8 -> 32 windows, 6-bit top window; at this size the cost model
        # leaves it UNMERGED (skewed-but-small window in the main scan)
        n = 128
        pts = [multiply(G1_GEN, int(j) + 1) for j in range(16)] * (n // 16)
        dev = msm_red.g1_to_red(pts)
        scalars = _rand_scalars(n, 11)
        got = msm_red.msm_g1_dense_red(dev, _full_digits(scalars, 8), 8)
        self.assertEqual(got, _host_msm(scalars, pts))

    def test_g1_254bit_c7_merged_tail(self):
        # c=7 -> 37 windows, 2-bit top window; merged tail at 9-bit width
        # (the cost model merges here: 512*16 < 128*k_top)
        from ethsnarks_tpu.ops.msm_red import _should_merge_top
        self.assertTrue(_should_merge_top(512, 7, 2))
        n = 512
        pts = [multiply(G1_GEN, int(j) + 1) for j in range(16)] * (n // 16)
        dev = msm_red.g1_to_red(pts)
        scalars = _rand_scalars(n, 12)
        got = msm_red.msm_g1_dense_red(dev, _full_digits(scalars, 7), 7)
        self.assertEqual(got, _host_msm(scalars, pts))

    def test_g1_254bit_multigroup_scan(self):
        # max_lanes squeezed so the plan needs n_groups > 1 (lax.scan over
        # window groups + on-device group Horner) + narrow-top tail
        n = 128
        pts = [multiply(G1_GEN, int(j) + 1) for j in range(16)] * (n // 16)
        dev = msm_red.g1_to_red(pts)
        scalars = _rand_scalars(n, 13)
        digits = _full_digits(scalars, 7)            # 37 windows
        got = msm_red.msm_g1_dense_red(dev, digits, 7, max_lanes=1 << 13)
        self.assertEqual(got, _host_msm(scalars, pts))

    def test_g1_static_plan_254bit(self):
        # static (distribution-free) plan on genuine 254-bit uniform
        # scalars: the prover's H-query path
        n = 128
        pts = [multiply(G1_GEN, int(j) + 1) for j in range(16)] * (n // 16)
        dev = msm_red.g1_to_red(pts)
        scalars = _rand_scalars(n, 14)
        got = msm_red.msm_g1_dense_red(dev, _full_digits(scalars, 8), 8,
                                       static_plan=True)
        self.assertEqual(got, _host_msm(scalars, pts))

    def test_g1_static_plan_overflow_replan(self):
        # all-equal scalars overload one bucket per window: the static plan
        # overflows on device and the driver must replan from host digits
        n = 512
        pts = [multiply(G1_GEN, int(j) + 1) for j in range(16)] * (n // 16)
        dev = msm_red.g1_to_red(pts)
        s = (0x2D << 7) | 0x35                       # 2 windows at c=7
        digits = np.zeros((2, n), dtype=np.uint32)
        digits[0, :] = 0x35
        digits[1, :] = 0x2D
        got = msm_red.msm_g1_dense_red(dev, digits, 7, static_plan=True)
        self.assertEqual(got, _host_msm([s] * n, pts))

    def test_g1_merged_tail_overflow_replan(self):
        # REGRESSION (round-2 advisor, msm_red replan): skewed MAIN windows
        # + uniform merged top window at c=7/b=256 (merged by the cost
        # model).  The static plan overflows on the skewed main window; the
        # replan's exact tail capacity is <= the exact main_k, so without
        # carrying the merged state through the recursion the 9-bit merged
        # row would be scheduled into the 2^7-bucket main scan and
        # silently corrupt the result.
        from ethsnarks_tpu.ops.msm_red import _should_merge_top
        self.assertTrue(_should_merge_top(256, 7, 2))
        n = 256
        pts = [multiply(G1_GEN, int(j) + 1) for j in range(16)] * (n // 16)
        dev = msm_red.g1_to_red(pts)
        rng = np.random.default_rng(15)
        nw = (254 + 6) // 7                          # 37 windows at c=7
        digits = rng.integers(0, 1 << 7, size=(nw, n)).astype(np.uint32)
        digits[-1] = rng.integers(0, 4, size=n).astype(np.uint32)
        digits[5, :24] = 9          # 24-lane pileup in window 5, bucket 9
        scalars = []
        for i in range(n):
            s = 0
            for w in range(nw - 1, -1, -1):
                s = (s << 7) | int(digits[w, i])
            scalars.append(s)
        got = msm_red.msm_g1_dense_red(dev, digits, 7, static_plan=True)
        self.assertEqual(got, _host_msm(scalars, pts))

    def test_g2_254bit_narrow_top(self):
        n = 64
        pts = [multiply(G2_GEN, int(j) + 1) for j in range(8)] * (n // 8)
        dev = msm_red.g2_to_red(pts)
        scalars = _rand_scalars(n, 16)
        got = msm_red.msm_g2_dense_red(dev, _full_digits(scalars, 8), 8)
        self.assertEqual(got, _host_msm(scalars, pts))

    def test_g1_static_plan_ones_flood_replan(self):
        # REGRESSION (round-5, 2^20 Merkle B query): a bit-heavy witness
        # floods bucket 1 of window 0; the static plan overflows and the
        # exact replan - without mixed-addition filtering - made bucket
        # 1's dense capacity (and the gather slab) explode into a compile
        # OOM on hardware.  The replan must route scalar==1 columns
        # through the plain point-sum and keep capacities bounded.
        n = 512
        pts = [multiply(G1_GEN, int(j) + 1) for j in range(16)] * (n // 16)
        dev = msm_red.g1_to_red(pts)
        scalars = _rand_scalars(n, 23)
        for i in range(0, n, 2):                     # 256 ones > threshold
            scalars[i] = 1
        digits = _full_digits(scalars, 7)
        got = msm_red.msm_g1_dense_red(dev, digits, 7, static_plan=True)
        self.assertEqual(got, _host_msm(scalars, pts))

    def test_g1_static_plan_duplicate_value_replan(self):
        # REGRESSION (round-5, flagship Merkle B query): ~900 EQUAL
        # witness values (shared IVs / default tree nodes) flood one
        # bucket per window; the exact replan must route each heavy
        # duplicate group through value * device-point-sum
        # (_filter_heavy_groups) instead of exploding the dense capacity
        # into a multi-GB gather slab.
        n = 512
        pts = [multiply(G1_GEN, int(j) + 1) for j in range(16)] * (n // 16)
        dev = msm_red.g1_to_red(pts)
        scalars = _rand_scalars(n, 29)
        dup = 0xABCDEF0123456789FEDCBA
        for i in range(0, n, 2):
            scalars[i] = dup                 # 256 equal values
        digits = _full_digits(scalars, 7)
        got = msm_red.msm_g1_dense_red(dev, digits, 7, static_plan=True)
        self.assertEqual(got, _host_msm(scalars, pts))

    def test_g1_static_plan_shared_digit_spill(self):
        # REGRESSION (round-5, flagship Merkle B query, second form):
        # DISTINCT values that share one window digit (~600 groups of ~96
        # equal path-node values) flood a bucket past the slab budget;
        # the group filter can't see them, so the excess columns must
        # spill to the exact scan-accumulate MSM
        # (_spill_dense_overflow; cap forced small via env for test
        # scale).
        import os
        n = 512
        pts = [multiply(G1_GEN, int(j) + 1) for j in range(16)] * (n // 16)
        dev = msm_red.g1_to_red(pts)
        rng = np.random.default_rng(43)
        scalars = _rand_scalars(n, 37)
        for i in range(300):
            hi = int.from_bytes(rng.bytes(30), 'little') << 7
            scalars[i] = ((hi & ~0x7f) | 5) % CURVE_ORDER
            scalars[i] = (scalars[i] & ~0x7f) | 5
        digits = _full_digits(scalars, 7)
        os.environ['ETHSNARKS_MSM_SPILL_CAP'] = '64'
        try:
            got = msm_red.msm_g1_dense_red(dev, digits, 7,
                                           static_plan=True)
        finally:
            del os.environ['ETHSNARKS_MSM_SPILL_CAP']
        self.assertEqual(got, _host_msm(scalars, pts))

    def test_digit_contract_violation_raises(self):
        # round-2 bench bug shape: top digit spanning past bit 253 at c=11
        # must RAISE, not silently corrupt
        n = 128
        pts = [multiply(G1_GEN, int(j) + 1) for j in range(16)] * (n // 16)
        dev = msm_red.g1_to_red(pts)
        digits = _full_digits(_rand_scalars(n, 17), 11)
        bad = digits.copy()
        bad[-1, 0] = 5                # top window allows only 1 bit at c=11
        with self.assertRaises(ValueError):
            msm_red.msm_g1_dense_red(dev, bad, 11)
        bad2 = digits.copy()
        bad2[3, 0] = 1 << 11          # >= 2^c in a middle window
        with self.assertRaises(ValueError):
            msm_red.msm_g1_dense_red(dev, bad2, 11)


if __name__ == '__main__':
    unittest.main()
