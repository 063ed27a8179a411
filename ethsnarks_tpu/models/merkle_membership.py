"""Miximus-style Merkle-membership model (the flagship workload).

Proves knowledge of a leaf at a secret position in a depth-d MiMC Merkle
tree with a public root (BASELINE.md config: depth-29, ~2^20 constraints at
Loopring batch scale).  Public input: root.  Private: leaf, address bits,
path siblings.
"""

from ..r1cs import ConstraintSystem
from ..gadgets import merkle_path_authenticator
from ..merkletree import MerkleTree


class MerkleMembership(object):
    def __init__(self, depth=29):
        self.depth = depth
        pb = ConstraintSystem()
        self.root_v = pb.allocate('root')
        pb.set_input_sizes(1)
        self.leaf_v = pb.allocate('leaf')
        self.addr = pb.allocate_array(depth, 'address')
        self.path = pb.allocate_array(depth, 'path')
        self.auth = merkle_path_authenticator(
            pb, depth, self.addr, self.root_v + 0, self.leaf_v + 0,
            self.path, 'membership')
        self.auth.generate_r1cs_constraints()
        self.pb = pb

    def set_witness(self, tree, index):
        """Fill the witness from a host MerkleTree and a leaf index."""
        assert isinstance(tree, MerkleTree)
        proof = tree.proof(index)
        pb = self.pb
        pb.setval(self.root_v, tree.root)
        pb.setval(self.leaf_v, tree[index])
        for d in range(self.depth):
            pb.setval(self.addr[d], proof.address[d])
            pb.setval(self.path[d], proof.path[d])
        self.auth.generate_r1cs_witness()
        assert self.pb.is_satisfied()
        return self

    def prove(self, keypair=None, context=None, use_device_msm=True, rng=None):
        from ..groth16 import generator, ProverContext
        if keypair is None and context is None:
            keypair = generator(self.pb, rng=rng)
        if context is None:
            context = ProverContext(keypair.pk, self.pb,
                                    use_device_msm=use_device_msm)
        proof = context.prove(self.pb.values)
        return proof, keypair, context
