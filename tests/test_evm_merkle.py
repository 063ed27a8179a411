"""EVM-level MerkleTree.VerifyPath twin vs the host library.

The bytecode (ethsnarks_tpu/evm_merkle.py, twin of
contracts/MerkleTree.sol VerifyPath) must recompute exactly the root the
host MerkleTree produces for its own proofs - the pinning the reference
gets from truffle's TestMerkleTree.sol.
"""
import unittest

from ethsnarks_tpu.merkletree import MerkleTree
from ethsnarks_tpu.evm_merkle import verify_path_evm


class TestEvmMerkleVerifyPath(unittest.TestCase):
    def test_depth3_all_leaves(self):
        tree = MerkleTree(8)
        for leaf in range(1, 6):
            tree.append(leaf * 7919)
        for idx in range(5):
            proof = tree.proof(idx)
            got = verify_path_evm(tree[idx], proof.path, proof.address)
            self.assertEqual(got, tree.root, "leaf %d" % idx)

    def test_depth3_wrong_sibling_changes_root(self):
        tree = MerkleTree(8)
        for leaf in range(1, 5):
            tree.append(leaf * 104729)
        proof = tree.proof(2)
        bad_path = list(proof.path)
        bad_path[1] = (bad_path[1] + 1)
        got = verify_path_evm(tree[2], bad_path, proof.address)
        self.assertNotEqual(got, tree.root)

    def test_depth29_contract_shape(self):
        # the production shape (contracts/MerkleTree.sol TREE_DEPTH = 29)
        tree = MerkleTree(2 ** 29)
        tree.append(123456789)
        tree.append(987654321)
        proof = tree.proof(1)
        self.assertEqual(len(proof.path), 29)
        got = verify_path_evm(tree[1], proof.path, proof.address)
        self.assertEqual(got, tree.root)


if __name__ == "__main__":
    unittest.main()
