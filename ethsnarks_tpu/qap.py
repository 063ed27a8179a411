"""R1CS -> QAP: instance map (host, setup-time) and witness map (TPU).

Replaces the fork-libsnark ``r1cs_to_qap_instance_map_with_evaluation`` /
``r1cs_to_qap_witness_map`` pair (reference hot path, SURVEY.md §3.2).

Domain size is next_pow2(num_constraints + num_inputs + 1); like libsnark,
the (num_inputs+1) extra virtual rows pin aA[n + j] = w_j (j = 0..num_inputs,
w_0 = 1) to make the input polynomials linearly independent.

Device witness map: sparse COO matvec (gather -> batched Montgomery mul ->
segment-sum with lazy modular reduction) followed by the NTT pipeline of
:mod:`ethsnarks_tpu.ops.ntt`; H coefficients come back in bit-reversed order,
which the Groth16 generator accounts for by storing the H-query bit-reversed.
"""

import numpy as np
import jax
import jax.numpy as jnp

from .field import SNARK_SCALAR_FIELD
from .ops.fp import Fr
from .ops.ntt import get_domain, _mont_np

P = SNARK_SCALAR_FIELD


def _next_pow2(n):
    m = 1
    while m < n:
        m *= 2
    return m


class QAP(object):
    """Compiled form of a constraint system for proving."""

    def __init__(self, cs):
        self.num_constraints = cs.num_constraints
        self.num_inputs = cs.num_inputs
        self.num_variables = cs.num_variables  # includes ONE
        self.domain_size = _next_pow2(self.num_constraints + self.num_inputs + 1)
        self.domain = get_domain(self.domain_size)

        coo = cs.to_coo()
        self._coo_host = coo
        self.dev = {}
        self.max_terms = {}
        for name in ('a', 'b', 'c'):
            rows, cols, coeffs = coo[name]
            if len(rows) == 0:
                rows = np.array([0], dtype=np.int64)
                cols = np.array([0], dtype=np.int64)
                coeffs = [0]
            counts = np.bincount(rows, minlength=self.domain_size)
            self.max_terms[name] = max(1, int(counts.max()))
            self.dev[name] = (
                jnp.asarray(rows.astype(np.int32)),
                jnp.asarray(cols.astype(np.int32)),
                jnp.asarray(_mont_np(coeffs)),
            )
        # Every large array (COO matrices, per-stage twiddles, pointwise
        # scale planes) is passed to the jit as an ARGUMENT, never closed
        # over: closure constants get baked into the serialized module,
        # and at 2^20-constraint scale (2^21 domain) that is a ~1GB
        # compile request the remote-compile service rejects (HTTP 413).
        d = self.domain
        self._big = dict(
            a=self.dev['a'], b=self.dev['b'], c=self.dev['c'],
            tw_fwd=tuple(jnp.asarray(t) for t in d.tw_fwd),
            tw_inv=tuple(jnp.asarray(t) for t in d.tw_inv),
            coset_scale=jnp.asarray(d.coset_scale_bitrev),
            coset_unscale=jnp.asarray(d.coset_unscale_bitrev),
            coset_scale_mi=jnp.asarray(d.coset_scale_m_inv_bitrev),
            coset_unscale_mi=jnp.asarray(d.coset_unscale_m_inv_bitrev),
            m_inv=jnp.asarray(d.m_inv_mont),
            z_inv=jnp.asarray(d.z_coset_inv_mont),
        )
        self._witness_map_jit = jax.jit(self._witness_map_params)

    # ------------- device witness map -------------

    def _matvec(self, name, witness_mont, arrs=None):
        """Sparse rows . witness -> (L, domain_size), Montgomery form."""
        rows, cols, coeffs = arrs if arrs is not None else self.dev[name]
        vals = Fr.mul(coeffs, witness_mont[:, cols])  # (L, nnz)
        sums = jax.ops.segment_sum(
            vals.T.astype(jnp.uint32), rows,
            num_segments=self.domain_size).T  # (L, m) lazy
        t = Fr._carry(sums)
        mult = 1
        while mult * 2 < self.max_terms[name]:
            mult *= 2
        while mult >= 1:
            t = Fr._cond_sub_multiple(t, mult)
            mult //= 2
        return t[:Fr.L]

    def _witness_map_params(self, witness_mont, big):
        """Pure-parameter witness map body: `big` carries the COO matrices
        and NTT constant planes (see __init__ note).  Value-identical to
        the NttDomain method composition.

        The three iFFT+coset-FFT chains run as ONE batched (L, 3m)
        transform pair (the NTT drivers accept stacked m-aligned vectors)
        with the 1/m and coset scales fused into a single pointwise pass -
        measured 2^18 witness map 15.1s -> see PROVE_r05 notes."""
        d = self.domain
        m = self.domain_size
        aA = self._matvec('a', witness_mont, big['a'])
        aB = self._matvec('b', witness_mont, big['b'])
        aC = self._matvec('c', witness_mont, big['c'])
        # Input-consistency rows: aA[n + j] = w_j for j = 0..num_inputs.
        n = self.num_constraints
        inputs = witness_mont[:, :self.num_inputs + 1]  # includes ONE
        aA = jax.lax.dynamic_update_slice(aA, inputs, (0, n))

        abc = jnp.concatenate([aA, aB, aC], axis=1)       # (L, 3m)
        c3 = d._dif(abc, big['tw_inv'])
        c3 = Fr.mul(c3.reshape(Fr.L, 3, m),
                    big['coset_scale_mi'][:, None, :]).reshape(Fr.L, 3 * m)
        e3 = d._dit(c3, big['tw_fwd']).reshape(Fr.L, 3, m)
        eA, eB, eC = e3[:, 0], e3[:, 1], e3[:, 2]
        ab_c = Fr.sub(Fr.mul(eA, eB), eC)
        h_evals = Fr.mul(ab_c, jnp.broadcast_to(big['z_inv'], ab_c.shape))
        y = d._dif(h_evals, big['tw_inv'])
        return Fr.mul(y, big['coset_unscale_mi'])

    def _witness_map(self, witness_mont):
        """witness_mont: (L, num_variables) Montgomery (col 0 = ONE).

        Returns H coefficients (L, domain_size), bit-reversed order."""
        return self._witness_map_params(witness_mont, self._big)

    # ---- split-dispatch witness map (large-module workaround) ----

    @property
    def _split_jits(self):
        """Per-transform jits for the split witness map: the one-module
        form exceeds the remote-compile service's module budget on TPU at
        large domains (the chipless AOT fallback rejects it), so each
        transform compiles separately.  Lazy-built; value-identical."""
        jits = getattr(self, '_split_jits_cache', None)
        if jits is None:
            d = self.domain

            def mv(name):
                # self.max_terms[name] is read inside _matvec at trace
                # time (it shapes the cond-sub ladder)

                @jax.jit
                def run(w, rows, cols, coeffs):
                    return self._matvec(name, w, (rows, cols, coeffs))
                return run

            m = self.domain_size

            jits = dict(
                mv={n: mv(n) for n in ('a', 'b', 'c')},
                dif=jax.jit(lambda x, tw: d._dif(x, tw)),
                dit=jax.jit(lambda x, tw: d._dit(x, tw)),
                mul=jax.jit(Fr.mul),
                mul3=jax.jit(lambda x, s: Fr.mul(
                    x.reshape(Fr.L, 3, m),
                    s[:, None, :]).reshape(Fr.L, 3 * m)),
                absubc_z=jax.jit(lambda e3, z: Fr.mul(
                    Fr.sub(Fr.mul(e3[:, 0], e3[:, 1]), e3[:, 2]),
                    jnp.broadcast_to(z, (Fr.L, m)))),
                cat3=jax.jit(lambda a, b, c: jnp.concatenate(
                    [a, b, c], axis=1)),
                upd=jax.jit(lambda aA, inputs, n: jax.lax.dynamic_update_slice(
                    aA, inputs, (0, n)), static_argnums=(2,)),
            )
            self._split_jits_cache = jits
        return jits

    def _witness_map_split(self, w_mont):
        """Same math as _witness_map_params, split into a handful of
        dispatches (compile economy for the remote service; the batched
        3-in-1 transforms keep each module at one NTT's size)."""
        big = self._big
        j = self._split_jits
        m = self.domain_size
        n = self.num_constraints
        inputs = w_mont[:, :self.num_inputs + 1]
        aA = j['upd'](j['mv']['a'](w_mont, *big['a']), inputs, n)
        aB = j['mv']['b'](w_mont, *big['b'])
        aC = j['mv']['c'](w_mont, *big['c'])

        abc = j['cat3'](aA, aB, aC)
        c3 = j['mul3'](j['dif'](abc, big['tw_inv']),
                       big['coset_scale_mi'])
        e3 = j['dit'](c3, big['tw_fwd']).reshape(Fr.L, 3, m)
        h_evals = j['absubc_z'](e3, big['z_inv'])
        y = j['dif'](h_evals, big['tw_inv'])
        return j['mul'](y, big['coset_unscale_mi'])

    def witness_map_device(self, witness_values):
        """Host ints -> device H coefficients (bitrev).  Returns jax array."""
        return self.witness_map_device_limbs(
            Fr.to_limbs_fast(witness_values))

    def witness_map_device_limbs(self, witness_limbs):
        """Canonical 13-bit limb array (L, nv) uint32 -> device H coeffs
        (bitrev).  Lets the prover share ONE limb decomposition between the
        witness map and the A/B/L digit extraction.

        On TPU the transforms dispatch separately (see _split_jits); off-
        TPU the fused single-module form is kept (XLA:CPU fuses the
        pointwise stages and the persistent test caches stay valid)."""
        w = Fr.to_mont_jit(witness_limbs)
        try:
            on_tpu = jax.default_backend() != 'cpu'
        except Exception:
            on_tpu = False
        if on_tpu:
            return self._witness_map_split(w)
        return self._witness_map_jit(w, self._big)

    # ------------- host witness map (exact, compile-free) -------------

    def witness_map_host(self, witness_values):
        """Exact Python-int mirror of :meth:`_witness_map`: sparse matvec +
        input-consistency rows + the 7-transform coset-NTT pipeline, all on
        host bigints.  Returns the H coefficients (bit-reversed order) as a
        list of ints - identical values to the device path.

        Used by the host prover (``use_device_msm=False``) so a purely
        host-side prove never compiles an XLA program (the device witness
        map is a multi-minute cold compile on small CPU boxes)."""
        w = [int(v) % P for v in witness_values]
        m = self.domain_size
        d = self.domain
        k = d.m.bit_length() - 1

        evals = {}
        for name in ('a', 'b', 'c'):
            rows, cols, coeffs = self._coo_host[name]
            e = [0] * m
            for r, c, v in zip(rows, cols, coeffs):
                e[int(r)] = (e[int(r)] + int(v) * w[int(c)]) % P
            evals[name] = e
        n = self.num_constraints
        for j in range(self.num_inputs + 1):
            evals['a'][n + j] = (evals['a'][n + j] + w[j]) % P

        # Integer twiddles (the domain caches Montgomery limb planes only).
        tw_fwd, tw_inv = [], []
        for s in range(k):
            span = m >> s
            w_n = pow(d.omega, m // span, P)
            w_i = pow(d.omega_inv, m // span, P)
            fwd, inv, af, ai = [], [], 1, 1
            for _ in range(span // 2):
                fwd.append(af)
                inv.append(ai)
                af = af * w_n % P
                ai = ai * w_i % P
            tw_fwd.append(fwd)
            tw_inv.append(inv)

        def dif(x, tw):
            """Natural -> bitrev (mirror of NttDomain._dif)."""
            for s in range(k):
                span = m >> s
                half = span // 2
                for b0 in range(0, m, span):
                    for j in range(half):
                        u, v = x[b0 + j], x[b0 + j + half]
                        x[b0 + j] = (u + v) % P
                        x[b0 + j + half] = (u - v) * tw[s][j] % P
            return x

        def dit(x, tw):
            """Bitrev -> natural (mirror of NttDomain._dit)."""
            for s in range(k - 1, -1, -1):
                span = m >> s
                half = span // 2
                for b0 in range(0, m, span):
                    for j in range(half):
                        t = x[b0 + j + half] * tw[s][j] % P
                        u = x[b0 + j]
                        x[b0 + j] = (u + t) % P
                        x[b0 + j + half] = (u - t) % P
            return x

        m_inv = d.m_inv
        g = d.coset_gen
        bitrev = d.bitrev
        g_brev = [pow(g, int(i), P) for i in bitrev]
        g_brev_inv = [pow(g, -int(i), P) for i in bitrev]
        z_inv = pow((pow(g, m, P) - 1) % P, -1, P)

        def ifft_bitrev(e):
            return [v * m_inv % P for v in dif(list(e), tw_inv)]

        def coset_fft(cb):
            return dit([c * s % P for c, s in zip(cb, g_brev)], tw_fwd)

        cA = ifft_bitrev(evals['a'])
        cB = ifft_bitrev(evals['b'])
        cC = ifft_bitrev(evals['c'])
        eA = coset_fft(cA)
        eB = coset_fft(cB)
        eC = coset_fft(cC)
        h_evals = [(a * b - c) % P * z_inv % P
                   for a, b, c in zip(eA, eB, eC)]
        x = [v * m_inv % P for v in dif(h_evals, tw_inv)]
        return [v * s % P for v, s in zip(x, g_brev_inv)]

    # ------------- host instance map (setup time, exact) -------------

    def instance_map(self, t):
        """Evaluate A_i(t), B_i(t), C_i(t) for every variable, plus Z(t).

        Returns (At, Bt, Ct, Zt) as python-int lists/scalars."""
        m = self.domain_size
        omega = self.domain.omega
        Zt = (pow(t, m, P) - 1) % P
        # Lagrange: L_i(t) = (Z(t)/m) * omega^i / (t - omega^i).
        zt_over_m = Zt * pow(m, -1, P) % P
        omega_pows = [1] * m
        for i in range(1, m):
            omega_pows[i] = omega_pows[i - 1] * omega % P
        # batch inversion of (t - omega^i)
        diffs = [(t - w) % P for w in omega_pows]
        if any(x == 0 for x in diffs):
            raise ValueError("t is in the domain; resample")
        prefix = [1] * (m + 1)
        for i in range(m):
            prefix[i + 1] = prefix[i] * diffs[i] % P
        inv_all = pow(prefix[m], -1, P)
        inv_diffs = [0] * m
        for i in range(m - 1, -1, -1):
            inv_diffs[i] = inv_all * prefix[i] % P
            inv_all = inv_all * diffs[i] % P
        u = [zt_over_m * omega_pows[i] % P * inv_diffs[i] % P for i in range(m)]

        nv = self.num_variables
        At = [0] * nv
        Bt = [0] * nv
        Ct = [0] * nv
        for name, target in (('a', At), ('b', Bt), ('c', Ct)):
            rows, cols, coeffs = self._coo_host[name]
            for r, c, v in zip(rows, cols, coeffs):
                target[c] = (target[c] + v * u[r]) % P
        # input consistency rows
        n = self.num_constraints
        for j in range(self.num_inputs + 1):
            At[j] = (At[j] + u[n + j]) % P
        return At, Bt, Ct, Zt
