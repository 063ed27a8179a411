"""Radix-2 NTT over the BN254 scalar field on TPU (libfqfft replacement).

The QAP witness map needs three iFFTs + three coset FFTs + one inverse coset
FFT on the evaluation domain (reference hot path
r1cs_to_qap_witness_map, SURVEY.md §3.2).  TPU-first design decisions:

 - **No bit-reversal permutation is ever materialized.**  The forward
   transform is decimation-in-frequency (natural -> bit-reversed) and the
   companion transform is decimation-in-time (bit-reversed -> natural); all
   pointwise scalings that happen while data is in bit-reversed order
   (coset powers, 1/m, Z^-1) use constant arrays precomputed host-side in
   bit-reversed order.  Consumers that pair coefficients with fixed data
   (the Groth16 H-query) permute the *setup-time* data instead.
 - Each butterfly stage is a reshape (free) + one batched Montgomery mul +
   modular add/sub on (L, l, n) arrays: pure VPU work with lanes = domain.
 - Fr has 2-adicity 28 (r - 1 = 2^28 * odd), so domains up to 2^28 work.

All arrays are Montgomery-form Fr limbs, shape (L, m).
Oracle: naive O(m^2) evaluation with python ints (tests).
"""

from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp

from .fp import Fr, BN254_R

R = BN254_R

# Multiplicative generator of Fr* (standard for this curve; also libsnark's
# Fr::multiplicative_generator) - used both as 2-adic root source and as the
# coset shift g.
MULT_GEN = 5
TWO_ADICITY = 28
_ROOT_OF_UNITY = pow(MULT_GEN, (R - 1) >> TWO_ADICITY, R)
assert pow(_ROOT_OF_UNITY, 1 << 27, R) != 1 or True  # order checked below
assert pow(_ROOT_OF_UNITY, 1 << TWO_ADICITY, R) == 1
assert pow(_ROOT_OF_UNITY, 1 << (TWO_ADICITY - 1), R) == R - 1


def _mont_np(vals):
    """ints -> (L, n) uint32 Montgomery limbs.

    One object-array pass for the Montgomery scaling, then the bytes fast
    path of to_limbs_fast - the per-element double loop this replaces cost
    ~6us/element (tens of seconds over a 2^21 domain's twiddle planes)."""
    arr = np.asarray(list(vals), dtype=object)
    m = (arr * Fr.R_mod) % R
    return Fr.to_limbs_fast(m)


def _pow_series(w, n, mod=None):
    """[w^0, w^1, ..., w^(n-1)] mod R as an object ndarray via doubling
    (log2(n) vectorized passes instead of n modular pows)."""
    mod = mod or R
    out = np.ones(1, dtype=object)
    wk = int(w) % mod
    while len(out) < n:
        out = np.concatenate([out, (out * wk) % mod])
        wk = wk * wk % mod
    return out[:n]


def _bitrev_indices(m):
    k = m.bit_length() - 1
    idx = np.arange(m)
    out = np.zeros(m, dtype=np.int64)
    for b in range(k):
        out |= ((idx >> b) & 1) << (k - 1 - b)
    return out


class NttDomain:
    """Evaluation domain of size m = 2^k with coset support."""

    def __init__(self, m, coset_gen=MULT_GEN):
        assert m & (m - 1) == 0 and m >= 2
        self.m = m
        self.k = m.bit_length() - 1
        assert self.k <= TWO_ADICITY
        self.omega = pow(_ROOT_OF_UNITY, 1 << (TWO_ADICITY - self.k), R)
        self.omega_inv = pow(self.omega, -1, R)
        self.m_inv = pow(m, -1, R)
        self.coset_gen = coset_gen
        self.bitrev = _bitrev_indices(m)

        # Per-stage twiddles for spans n = m, m/2, ..., 2 (DIF order):
        # stage twiddles are w_n^j, j in 0..n/2-1, with w_n = omega^(m/n).
        # Stage s's twiddles are the stride-2^s subsample of the stage-0
        # series (omega^(2^s * j)), so ONE doubled power series of length
        # m/2 (and its inverse) feeds every stage - no per-element pows.
        base_fwd = _pow_series(self.omega, m // 2)
        base_inv = _pow_series(self.omega_inv, m // 2)
        self.tw_fwd = []
        self.tw_inv = []
        for s in range(self.k):
            n = m >> s
            self.tw_fwd.append(_mont_np(base_fwd[::1 << s][:n // 2]))
            self.tw_inv.append(_mont_np(base_inv[::1 << s][:n // 2]))

        # Pointwise constant arrays (bit-reversed order where applicable).
        g = coset_gen
        g_series = _pow_series(g, m)
        g_inv_series = _pow_series(pow(g, -1, R), m)
        g_pows = g_series[self.bitrev]
        g_pows_inv = g_inv_series[self.bitrev]
        self.coset_scale_bitrev = _mont_np(g_pows)          # (L, m)
        self.coset_unscale_bitrev = _mont_np(g_pows_inv)    # (L, m)
        # Fused ifft+coset scales (one pointwise pass instead of two in
        # the witness map): g^i/m and g^-i/m in bitrev order.
        self.coset_scale_m_inv_bitrev = _mont_np(
            (g_pows * self.m_inv) % R)
        self.coset_unscale_m_inv_bitrev = _mont_np(
            (g_pows_inv * self.m_inv) % R)
        self.m_inv_mont = _mont_np([self.m_inv])            # (L, 1)
        z_coset = (pow(g, m, R) - 1) % R                    # Z_H(coset) const
        self.z_coset_inv_mont = _mont_np([pow(z_coset, -1, R)])

    # ---- butterfly drivers (traceable) ----

    # Small-span butterfly stages (span <= _T) run in a TRANSPOSED layout:
    # with the classic flat view, stage s's minor dimension is m >> (s+1),
    # which collapses to 64..1 lanes in the last log2(_T) stages - the VPU
    # pads every op to 128 lanes and utilization craters (measured: ~2.0s
    # per 2^18 transform, 14 of the 15.5s warm witness map).  Blocks of _T
    # elements are transposed to the MAJOR axis instead, so every op keeps
    # >= total/_T lanes minor; the butterfly index sets, twiddle pairing
    # and final element order are bit-identical to the classic loop.
    #
    # Both drivers also accept a BATCHED input (L, B*m) of B independent
    # m-vectors (m-aligned): spans never cross an m boundary, so the same
    # reshapes apply - the witness map runs its three iFFTs as one call.
    _T = 512

    def _dif(self, x, twiddles):
        """Natural -> bit-reversed Cooley-Tukey DIF.
        Butterfly: (u, v) -> (u + v, (u - v) * w^j).
        x: (L, m) or (L, B*m) for B stacked independent transforms."""
        m, k = self.m, self.k
        total = int(np.prod(x.shape[1:]))
        x = x.reshape(Fr.L, total)
        T = min(m, self._T)
        kt = T.bit_length() - 1
        for s in range(k - kt):
            n = m >> s
            half = n // 2
            x = x.reshape(Fr.L, total // n, n)
            u = x[:, :, :half]
            v = x[:, :, half:]
            tw = jnp.asarray(twiddles[s])[:, None, :]  # (L, 1, half)
            a = Fr.add(u, v)
            b = Fr.mul(Fr.sub(u, v), jnp.broadcast_to(tw, u.shape))
            x = jnp.concatenate([a, b], axis=2)
        nb = total // T
        x = jnp.swapaxes(x.reshape(Fr.L, nb, T), 1, 2)  # (L, T, nb)
        for s in range(k - kt, k):
            n = m >> s
            half = n // 2
            x = x.reshape(Fr.L, T // n, n, nb)
            u = x[:, :, :half, :]
            v = x[:, :, half:, :]
            tw = jnp.asarray(twiddles[s])[:, None, :, None]
            a = Fr.add(u, v)
            b = Fr.mul(Fr.sub(u, v), jnp.broadcast_to(tw, u.shape))
            x = jnp.concatenate([a, b], axis=2)
        x = jnp.swapaxes(x.reshape(Fr.L, T, nb), 1, 2)
        return x.reshape(Fr.L, total)

    def _dit(self, x, twiddles):
        """Bit-reversed -> natural Gentleman-Sande-inverse DIT.
        Butterfly: (u, v) -> (u + v*w^j, u - v*w^j).
        x: (L, m) or (L, B*m) for B stacked independent transforms."""
        m, k = self.m, self.k
        total = int(np.prod(x.shape[1:]))
        x = x.reshape(Fr.L, total)
        T = min(m, self._T)
        kt = T.bit_length() - 1
        nb = total // T
        x = jnp.swapaxes(x.reshape(Fr.L, nb, T), 1, 2)  # (L, T, nb)
        for s in range(k - 1, k - kt - 1, -1):
            n = m >> s
            half = n // 2
            x = x.reshape(Fr.L, T // n, n, nb)
            u = x[:, :, :half, :]
            v = x[:, :, half:, :]
            tw = jnp.asarray(twiddles[s])[:, None, :, None]
            t = Fr.mul(v, jnp.broadcast_to(tw, v.shape))
            x = jnp.concatenate([Fr.add(u, t), Fr.sub(u, t)], axis=2)
        x = jnp.swapaxes(x.reshape(Fr.L, T, nb), 1, 2)
        for s in range(k - kt - 1, -1, -1):
            n = m >> s
            half = n // 2
            x = x.reshape(Fr.L, total // n, n)
            u = x[:, :, :half]
            v = x[:, :, half:]
            tw = jnp.asarray(twiddles[s])[:, None, :]
            t = Fr.mul(v, jnp.broadcast_to(tw, v.shape))
            x = jnp.concatenate([Fr.add(u, t), Fr.sub(u, t)], axis=2)
        return x.reshape(Fr.L, total)

    # ---- high-level transforms (traceable) ----

    def fft_coeffs_bitrev_to_evals(self, coeffs_bitrev):
        """Coefficients (bit-reversed order) -> evaluations (natural)."""
        return self._dit(coeffs_bitrev, self.tw_fwd)

    def ifft_evals_to_coeffs_bitrev(self, evals):
        """Evaluations (natural) -> coefficients (bit-reversed), incl 1/m."""
        x = self._dif(evals, self.tw_inv)
        scale = jnp.asarray(self.m_inv_mont)
        return Fr.mul(x, jnp.broadcast_to(scale, x.shape))

    def coset_fft_coeffs_bitrev_to_evals(self, coeffs_bitrev):
        """Coefficients (bitrev) -> evaluations on the coset g*H (natural)."""
        scaled = Fr.mul(coeffs_bitrev, jnp.asarray(self.coset_scale_bitrev))
        return self._dit(scaled, self.tw_fwd)

    def icoset_fft_evals_to_coeffs_bitrev(self, evals):
        """Evaluations on g*H (natural) -> coefficients (bitrev)."""
        x = self._dif(evals, self.tw_inv)
        scale = jnp.asarray(self.m_inv_mont)
        x = Fr.mul(x, jnp.broadcast_to(scale, x.shape))
        return Fr.mul(x, jnp.asarray(self.coset_unscale_bitrev))

    def divide_by_z_on_coset(self, evals):
        """Multiply coset evaluations by Z_H(coset)^-1 (a single constant)."""
        scale = jnp.asarray(self.z_coset_inv_mont)
        return Fr.mul(evals, jnp.broadcast_to(scale, evals.shape))


@lru_cache(maxsize=None)
@lru_cache(maxsize=2)
def get_domain(m):
    """Domain cache: generator() and ProverContext() both need the same
    domain; at 2^21 its twiddle/coset planes take seconds to build and
    hundreds of MB, so share the last two sizes in-process."""
    return NttDomain(m)
