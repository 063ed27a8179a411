"""NTT domain tests vs naive host evaluation."""
import random
import unittest

import numpy as np
import jax

from ethsnarks_tpu.ops.fp import Fr, BN254_R
from ethsnarks_tpu.ops.ntt import NttDomain

R = BN254_R


def _naive_eval(coeffs, xs):
    out = []
    for x in xs:
        acc = 0
        xp = 1
        for c in coeffs:
            acc = (acc + c * xp) % R
            xp = xp * x % R
        out.append(acc)
    return out


class TestNtt(unittest.TestCase):
    def _mont(self, vals):
        return Fr.to_mont_jit(Fr.to_limbs(vals))

    def _plain(self, arr):
        return Fr.from_limbs(np.asarray(Fr.from_mont_jit(arr)))

    def test_fft_matches_naive(self):
        m = 16
        d = NttDomain(m)
        rng = random.Random(5)
        coeffs = [rng.randrange(R) for _ in range(m)]
        # put coefficients in bitrev order, transform, compare to naive
        cb = [coeffs[int(d.bitrev[p])] for p in range(m)]
        evals = self._plain(jax.jit(d.fft_coeffs_bitrev_to_evals)(self._mont(cb)))
        omega_pows = [pow(d.omega, i, R) for i in range(m)]
        self.assertEqual(evals, _naive_eval(coeffs, omega_pows))

    def test_ifft_roundtrip(self):
        m = 32
        d = NttDomain(m)
        rng = random.Random(6)
        evals = [rng.randrange(R) for _ in range(m)]
        cb = jax.jit(d.ifft_evals_to_coeffs_bitrev)(self._mont(evals))
        back = self._plain(jax.jit(d.fft_coeffs_bitrev_to_evals)(cb))
        self.assertEqual(back, evals)

    def test_coset_roundtrip_and_values(self):
        m = 16
        d = NttDomain(m)
        rng = random.Random(7)
        coeffs = [rng.randrange(R) for _ in range(m)]
        cb_vals = [coeffs[int(d.bitrev[p])] for p in range(m)]
        cb = self._mont(cb_vals)
        evals = jax.jit(d.coset_fft_coeffs_bitrev_to_evals)(cb)
        got = self._plain(evals)
        coset_pts = [d.coset_gen * pow(d.omega, i, R) % R for i in range(m)]
        self.assertEqual(got, _naive_eval(coeffs, coset_pts))
        back = self._plain(jax.jit(d.icoset_fft_evals_to_coeffs_bitrev)(evals))
        self.assertEqual(back, cb_vals)

    def test_z_division(self):
        """(x^m - 1) * q(x) on the coset, divided by Z, returns q."""
        m = 8
        d = NttDomain(m)
        rng = random.Random(8)
        # pick q of degree < m, compute p = Z*q evaluated on coset directly
        q = [rng.randrange(R) for _ in range(m)]
        coset_pts = [d.coset_gen * pow(d.omega, i, R) % R for i in range(m)]
        q_evals = _naive_eval(q, coset_pts)
        z_evals = [(pow(x, m, R) - 1) % R for x in coset_pts]
        p_evals = [a * b % R for a, b in zip(q_evals, z_evals)]
        got = self._plain(jax.jit(d.divide_by_z_on_coset)(self._mont(p_evals)))
        self.assertEqual(got, q_evals)


if __name__ == "__main__":
    unittest.main()
