"""Batched Merkle-membership model: device witness generation + e2e prove."""
import random
import unittest

from ethsnarks_tpu.field import SNARK_SCALAR_FIELD
from ethsnarks_tpu.merkletree import MerkleTree
from ethsnarks_tpu.models.merkle_batch import BatchMerkleMembership

P = SNARK_SCALAR_FIELD
_rng = random.Random(31337)


class TestBatchMerkle(unittest.TestCase):
    def test_device_witness_satisfies(self):
        depth, n = 4, 3
        tree = MerkleTree(2 ** depth)
        for _ in range(6):
            tree.append(_rng.randrange(P))
        model = BatchMerkleMembership(depth=depth, n_proofs=n)
        model.set_witness(tree, [0, 2, 5])
        self.assertTrue(model.pb.is_satisfied())
        # tamper one path element -> unsatisfied
        model.pb.setval(model.path_vs[1][0],
                        (model.pb.val(model.path_vs[1][0]) + 1) % P)
        self.assertFalse(model.pb.is_satisfied())

    def test_prove_verify_small(self):
        depth, n = 2, 2
        tree = MerkleTree(2 ** depth)
        for _ in range(3):
            tree.append(_rng.randrange(P))
        model = BatchMerkleMembership(depth=depth, n_proofs=n)
        model.set_witness(tree, [1, 2])
        proof, keypair, _ = model.prove(
            use_device_msm=False, rng=lambda: _rng.randrange(1, P))
        self.assertTrue(keypair.vk.verify(proof))
        self.assertEqual(proof.input, [tree.root])


if __name__ == "__main__":
    unittest.main()
