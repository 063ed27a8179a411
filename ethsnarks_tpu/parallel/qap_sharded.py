"""Sharded QAP witness map: the full prover device program under shard_map.

The reference computes H = (A·w ∘ B·w − C·w)/Z on one node with OpenMP
inside the FFTs (/root/reference/src/r1cs_gg_ppzksnark_zok/
r1cs_gg_ppzksnark_zok.tcc:460-468 via fork-libsnark
r1cs_to_qap_witness_map).  The TPU-native version shards the evaluation
domain contiguously over the mesh:

 - **Sparse matvec**: COO entries are bucketed host-side by destination
   row chunk (row // (m/n_dev)), padded to a uniform nnz, and each device
   segment-sums its own chunk against the REPLICATED witness vector - no
   communication at all (the witness is small next to the domain).
 - **NTT pipeline**: 3 iFFT + 3 coset FFT + divide-by-Z + 1 inverse coset
   FFT run as shard-local butterfly stages with one pairwise ppermute per
   cross-device span (parallel/ntt_sharded.py); all pointwise coset/1/m/Z
   scalings use bit-reversed-order constant chunks sharded like the data.

Output: H coefficients (L, m), bit-reversed order, sharded over the mesh -
fed directly (still sharded, digits extracted on-device) into the sharded
red MSM.
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from ..ops.fp import Fr
from ..ops.ntt import _mont_np
from .mesh import AXIS
from .ntt_sharded import ShardedNttDomain


def _pow2ceil(n):
    return max(1, 1 << (int(n) - 1).bit_length())


def _partition_coo(entries, m, n_dev):
    """entries: iterable of (row, col, int_coeff).  Returns per-device
    padded arrays: rows_local (n_dev, nnz_pad) int32, cols (n_dev, nnz_pad)
    int32, coeffs_mont (L, n_dev, nnz_pad) uint32.  Padding entries are
    (row 0, col 0, coeff 0): they add an exact zero."""
    chunk = m // n_dev
    buckets = [[] for _ in range(n_dev)]
    for r, c, v in entries:
        buckets[int(r) // chunk].append((int(r) % chunk, int(c), int(v)))
    nnz_pad = _pow2ceil(max(1, max(len(b) for b in buckets)))
    rows = np.zeros((n_dev, nnz_pad), dtype=np.int32)
    cols = np.zeros((n_dev, nnz_pad), dtype=np.int32)
    vals = []
    for d, bucket in enumerate(buckets):
        for j, (r, c, v) in enumerate(bucket):
            rows[d, j] = r
            cols[d, j] = c
        vals.extend([v for (_, _, v) in bucket]
                    + [0] * (nnz_pad - len(bucket)))
    coeffs = _mont_np(vals).reshape(Fr.L, n_dev, nnz_pad)
    return rows, cols, coeffs


class ShardedWitnessMap:
    """Compiled sharded witness map for one QAP on one mesh."""

    def __init__(self, qap, mesh):
        self.qap = qap
        self.mesh = mesh
        self.n_dev = int(np.prod(mesh.devices.shape))
        m = qap.domain_size
        assert m % self.n_dev == 0
        self.chunk = m // self.n_dev
        self.dom = ShardedNttDomain(m, mesh)

        coo = qap._coo_host
        parts = {}
        for name in ('a', 'b', 'c'):
            rows, cols, coeffs = coo[name]
            entries = list(zip(rows, cols, coeffs))
            if name == 'a':
                # input-consistency rows aA[n + j] = w_j (the base map's
                # dynamic_update_slice): rows n..n+ni carry no constraint
                # entries, so adding (n+j, j, 1) is equivalent
                n = qap.num_constraints
                for j in range(qap.num_inputs + 1):
                    entries.append((n + j, j, 1))
            parts[name] = _partition_coo(entries, m, self.n_dev)
        self._parts = parts
        self._scale = jnp.asarray(self.dom.coset_scale_bitrev)
        self._unscale = jnp.asarray(self.dom.coset_unscale_bitrev)
        self._fn = self._build()
        self._shard2 = NamedSharding(mesh, P(None, AXIS))

    def _matvec_local(self, name, w_mont, rows_l, cols_l, coeffs_l):
        """One device's chunk of the sparse matvec: (L, chunk)."""
        vals = Fr.mul(coeffs_l[:, 0], w_mont[:, cols_l[0]])   # (L, nnz)
        sums = jax.ops.segment_sum(
            vals.T.astype(jnp.uint32), rows_l[0],
            num_segments=self.chunk).T                         # lazy
        t = Fr._carry(sums)
        mult = 1
        # 'a' gained the input rows (one coeff-1 entry each, in otherwise
        # empty rows), so the base map's max_terms bound still holds
        while mult * 2 < self.qap.max_terms[name]:
            mult *= 2
        while mult >= 1:
            t = Fr._cond_sub_multiple(t, mult)
            mult //= 2
        return t[:Fr.L]

    def _build(self):
        dom = self.dom

        def local(w_mont, ar, ac, av, br, bc, bv, cr, cc, cv,
                  scale, unscale):
            aA = self._matvec_local('a', w_mont, ar, ac, av)
            aB = self._matvec_local('b', w_mont, br, bc, bv)
            aC = self._matvec_local('c', w_mont, cr, cc, cv)
            cA = dom.ifft_local(aA)
            cB = dom.ifft_local(aB)
            cC = dom.ifft_local(aC)
            eA = dom.coset_fft_local(cA, scale)
            eB = dom.coset_fft_local(cB, scale)
            eC = dom.coset_fft_local(cC, scale)
            h_evals = dom.divide_by_z_local(Fr.sub(Fr.mul(eA, eB), eC))
            return dom.icoset_fft_local(h_evals, unscale)

        rows_spec = P(AXIS, None)
        coeff_spec = P(None, AXIS, None)
        fn = jax.shard_map(
            local, mesh=self.mesh,
            in_specs=(P(None, None),) + (rows_spec, rows_spec, coeff_spec) * 3
            + (P(None, AXIS), P(None, AXIS)),
            out_specs=P(None, AXIS))
        return jax.jit(fn)

    def __call__(self, witness_mont):
        """witness_mont (L, nv) Montgomery -> H coeffs (L, m) bitrev,
        SHARDED over the mesh (a jax array; keep it on device)."""
        a = self._parts['a']
        b = self._parts['b']
        c = self._parts['c']
        return self._fn(witness_mont, a[0], a[1], a[2],
                        b[0], b[1], b[2], c[0], c[1], c[2],
                        self._scale, self._unscale)
