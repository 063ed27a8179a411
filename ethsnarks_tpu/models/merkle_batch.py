"""Batched Merkle-membership model with device-side witness generation.

The 2^20-constraint flagship workload (BASELINE.md: "depth-29 MiMC Merkle
membership, Miximus-style, multi-host"): N membership proofs in one circuit.
TPU-first equivalent of the reference's master-instance/thread-values
machinery (poseidon.hpp:405-517, SURVEY.md §5.7): circuit rows are stamped
per proof by the gadget layer, while the witness for all N proofs is
computed level-by-level by ONE batched device MiMC trace
(ops.mimc.mimc_mp_witness_device) and bulk-assigned into the variable
vector - no per-gadget python witness recursion.
"""

import numpy as np
import jax
import jax.numpy as jnp

from ..r1cs import ConstraintSystem
from ..gadgets import merkle_path_authenticator
from ..gadgets.merkle import merkle_tree_IVs
from ..field import SNARK_SCALAR_FIELD
from ..ops.fp import Fr
from ..ops.mimc import mimc_mp_witness_device

P = SNARK_SCALAR_FIELD


class BatchMerkleMembership(object):
    """N Merkle membership proofs (shared public root) in one circuit.

    Constraints/proof ~= depth * (3 + 2*(4*91) + 2) + 1; at depth 29,
    N=48 crosses 2^20 constraints."""

    def __init__(self, depth=29, n_proofs=1):
        self.depth = depth
        self.n_proofs = n_proofs
        pb = ConstraintSystem()
        self.root_v = pb.allocate('root')
        pb.set_input_sizes(1)
        self.leaf_vs = []
        self.addr_vs = []
        self.path_vs = []
        self.auths = []
        for i in range(n_proofs):
            leaf = pb.allocate('leaf_%d' % i)
            addr = pb.allocate_array(depth, 'addr_%d' % i)
            path = pb.allocate_array(depth, 'path_%d' % i)
            auth = merkle_path_authenticator(
                pb, depth, addr, self.root_v + 0, leaf + 0, path,
                'm_%d' % i)
            auth.generate_r1cs_constraints()
            self.leaf_vs.append(leaf)
            self.addr_vs.append(addr)
            self.path_vs.append(path)
            self.auths.append(auth)
        self.pb = pb
        self._ivs = merkle_tree_IVs(depth)
        self._wit_jit = jax.jit(mimc_mp_witness_device)

    def set_witness(self, tree, indices):
        """Fill all N witnesses from one host MerkleTree (device hashing)."""
        assert len(indices) == self.n_proofs
        pb = self.pb
        pb.setval(self.root_v, tree.root)
        proofs = [tree.proof(ix) for ix in indices]
        cur = []   # running node value per proof (python ints)
        for i, (ix, proof) in enumerate(zip(indices, proofs)):
            pb.setval(self.leaf_vs[i], tree[ix])
            cur.append(tree[ix])
            for d in range(self.depth):
                pb.setval(self.addr_vs[i][d], proof.address[d])
                pb.setval(self.path_vs[i][d], proof.path[d])

        for d in range(self.depth):
            lefts, rights = [], []
            for i, proof in enumerate(proofs):
                bit = proof.address[d]
                sibling = proof.path[d]
                left = sibling if bit else cur[i]
                right = cur[i] if bit else sibling
                sel = self.auths[i].selectors[d]
                pb.setval(sel.left, left)
                pb.setval(sel.right, right)
                lefts.append(left)
                rights.append(right)
            # one batched device trace for all proofs at this level
            lm = jnp.asarray(Fr.to_mont_jit(Fr.to_limbs_fast(lefts)))
            rm = jnp.asarray(Fr.to_mont_jit(Fr.to_limbs_fast(rights)))
            ivm = jnp.broadcast_to(jnp.asarray(Fr.constant_mont(
                self._ivs[d], lm.shape[1:])), lm.shape).astype(jnp.uint32)
            out, aux = self._wit_jit(lm, rm, ivm)
            aux_t = jnp.moveaxis(aux, 1, 0)  # (L, n_aux, B)
            aux_plain = Fr.from_limbs_fast(
                np.asarray(Fr.from_mont_jit(aux_t)))
            # bulk-assign: hasher variables are allocated contiguously
            for i in range(self.n_proofs):
                hasher = self.auths[i].hashers[d]
                base = hasher.ciphers[0].rounds_g[0].t2.index
                col = aux_plain[:, i]
                for j in range(aux.shape[0]):
                    pb.values[base + j] = int(col[j])
                cur[i] = pb.values[hasher.outputs[-1].index]
        assert all(c == tree.root for c in cur), "root mismatch"
        return self

    def prove(self, keypair=None, context=None, use_device_msm=True,
              rng=None):
        from ..groth16 import generator, ProverContext
        if keypair is None and context is None:
            keypair = generator(self.pb, rng=rng)
        if context is None:
            context = ProverContext(keypair.pk, self.pb,
                                    use_device_msm=use_device_msm)
        proof = context.prove(self.pb.values)
        return proof, keypair, context
