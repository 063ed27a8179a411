"""Gadget-layer tests: witness values vs host oracle + constraint counts."""
import random
import unittest

from ethsnarks_tpu.field import SNARK_SCALAR_FIELD
from ethsnarks_tpu.r1cs import ConstraintSystem, LinearCombination
from ethsnarks_tpu.gadgets import (
    MiMCe7_gadget, MiMCe5_gadget, MiyaguchiPreneel_OWF,
    merkle_path_authenticator, lookup_1bit_gadget, lookup_2bit_gadget,
    lookup_3bit_gadget, lookup_signed_3bit_gadget, IsNonZero,
    field2bits_strict, one_of_n, Poseidon_gadget)
from ethsnarks_tpu.mimc import mimc, mimc_hash
from ethsnarks_tpu.poseidon import poseidon
from ethsnarks_tpu.merkletree import MerkleTree

P = SNARK_SCALAR_FIELD


class TestMiMCGadget(unittest.TestCase):
    def test_cipher_e7(self):
        pb = ConstraintSystem()
        x = pb.allocate('x')
        k = pb.allocate('k')
        g = MiMCe7_gadget(pb, x + 0, k + 0, 'mimc')
        g.generate_r1cs_constraints()
        # 91 rounds x 4 constraints
        self.assertEqual(pb.num_constraints, 91 * 4)
        pb.setval(x, 1)
        pb.setval(k, 1)
        g.generate_r1cs_witness()
        self.assertEqual(pb.val(g.result()), mimc(1, 1))
        self.assertTrue(pb.is_satisfied())

    def test_cipher_e5(self):
        pb = ConstraintSystem()
        x = pb.allocate('x')
        g = MiMCe5_gadget(pb, x + 0, LinearCombination() + 3, 'mimc5')
        g.generate_r1cs_constraints()
        self.assertEqual(pb.num_constraints, 110 * 3)
        pb.setval(x, 7)
        g.generate_r1cs_witness()
        self.assertEqual(pb.val(g.result()), mimc(7, 3, e=5, R=110))
        self.assertTrue(pb.is_satisfied())

    def test_mp_hash(self):
        pb = ConstraintSystem()
        m = pb.allocate_array(2, 'm')
        g = MiyaguchiPreneel_OWF(pb, [m[0] + 0, m[1] + 0],
                                 LinearCombination() + 0, 'mp')
        g.generate_r1cs_constraints()
        pb.setval(m[0], 1)
        pb.setval(m[1], 1)
        g.generate_r1cs_witness()
        self.assertEqual(pb.val(g.result()), mimc_hash([1, 1]))
        self.assertTrue(pb.is_satisfied())


class TestMerkleGadget(unittest.TestCase):
    def test_authenticator(self):
        depth = 4
        tree = MerkleTree(2 ** depth)
        rng = random.Random(99)
        leaves = [rng.randrange(P) for _ in range(5)]
        for leaf in leaves:
            tree.append(leaf)
        for index in (0, 3, 4):
            proof = tree.proof(index)
            pb = ConstraintSystem()
            root_v = pb.allocate('root')
            pb.set_input_sizes(1)
            leaf_v = pb.allocate('leaf')
            addr = pb.allocate_array(depth, 'addr')
            path = pb.allocate_array(depth, 'path')
            g = merkle_path_authenticator(
                pb, depth, addr, root_v + 0, leaf_v + 0, path, 'auth')
            g.generate_r1cs_constraints()
            pb.setval(root_v, tree.root)
            pb.setval(leaf_v, leaves[index])
            for d in range(depth):
                pb.setval(addr[d], proof.address[d])
                pb.setval(path[d], proof.path[d])
            g.generate_r1cs_witness()
            self.assertTrue(g.is_valid())
            self.assertTrue(pb.is_satisfied())
            # tampered root must fail
            pb.setval(root_v, (tree.root + 1) % P)
            self.assertFalse(pb.is_satisfied())


class TestBasicGadgets(unittest.TestCase):
    def test_lookup_1bit(self):
        for bit in (0, 1):
            pb = ConstraintSystem()
            b = pb.allocate('b')
            g = lookup_1bit_gadget(pb, [11, 22], b, 'l1')
            g.generate_r1cs_constraints()
            pb.setval(b, bit)
            g.generate_r1cs_witness()
            self.assertEqual(pb.val(g.result()), [11, 22][bit])
            self.assertTrue(pb.is_satisfied())
            self.assertEqual(pb.num_constraints, 1)

    def test_lookup_2bit(self):
        table = [10, 21, 32, 43]
        for idx in range(4):
            pb = ConstraintSystem()
            b0 = pb.allocate('b0')
            b1 = pb.allocate('b1')
            g = lookup_2bit_gadget(pb, table, b0, b1, 'l2')
            g.generate_r1cs_constraints()
            pb.setval(b0, idx & 1)
            pb.setval(b1, (idx >> 1) & 1)
            g.generate_r1cs_witness()
            self.assertEqual(pb.val(g.result()), table[idx])
            self.assertTrue(pb.is_satisfied())
            self.assertEqual(pb.num_constraints, 1)

    def test_lookup_3bit(self):
        table = [3, 1, 4, 1, 5, 9, 2, 6]
        for idx in range(8):
            pb = ConstraintSystem()
            bits = pb.allocate_array(3, 'b')
            g = lookup_3bit_gadget(pb, table, bits, 'l3')
            g.generate_r1cs_constraints()
            for i in range(3):
                pb.setval(bits[i], (idx >> i) & 1)
            g.generate_r1cs_witness()
            self.assertEqual(pb.val(g.result()), table[idx])
            self.assertTrue(pb.is_satisfied())
            self.assertEqual(pb.num_constraints, 5)

    def test_lookup_signed_3bit(self):
        table = [10, 21, 32, 43]
        for idx in range(8):
            pb = ConstraintSystem()
            bits = pb.allocate_array(3, 'b')
            g = lookup_signed_3bit_gadget(pb, table, bits[0], bits[1], bits[2], 'ls3')
            g.generate_r1cs_constraints()
            for i in range(3):
                pb.setval(bits[i], (idx >> i) & 1)
            g.generate_r1cs_witness()
            want = table[idx & 3] if idx < 4 else (P - table[idx & 3]) % P
            self.assertEqual(pb.val(g.result()), want)
            self.assertTrue(pb.is_satisfied())
            self.assertEqual(pb.num_constraints, 2)

    def test_isnonzero(self):
        for v, want in ((0, 0), (5, 1), (P - 1, 1)):
            pb = ConstraintSystem()
            x = pb.allocate('x')
            g = IsNonZero(pb, x + 0, 'nz')
            g.generate_r1cs_constraints()
            pb.setval(x, v)
            g.generate_r1cs_witness()
            self.assertEqual(pb.val(g.result()), want)
            self.assertTrue(pb.is_satisfied())
            self.assertEqual(pb.num_constraints, 2)

    def test_field2bits_strict(self):
        for v in (0, 1, 0xdeadbeef, P - 1):
            pb = ConstraintSystem()
            x = pb.allocate('x')
            g = field2bits_strict(pb, x + 0, 'f2b')
            g.generate_r1cs_constraints()
            pb.setval(x, v)
            g.generate_r1cs_witness()
            bits = [pb.val(b) for b in g.result()]
            self.assertEqual(sum(b << i for i, b in enumerate(bits)), v)
            self.assertTrue(pb.is_satisfied())

    def test_field2bits_strict_rejects_p(self):
        """Assigning the bits of p itself (encoding of 0 + p) must not satisfy."""
        pb = ConstraintSystem()
        x = pb.allocate('x')
        g = field2bits_strict(pb, x + 0, 'f2b')
        g.generate_r1cs_constraints()
        pb.setval(x, 0)
        g.generate_r1cs_witness()
        self.assertTrue(pb.is_satisfied())
        # overwrite with the bits of p (packs to the same field element 0)
        for i, b in enumerate(g.bits):
            pb.setval(b, (P >> i) & 1)
        for i in reversed(range(254)):
            if (P >> i) & 1:
                pb.setval(g.e_vars[i], 1)
        self.assertFalse(pb.is_satisfied())

    def test_one_of_n(self):
        pb = ConstraintSystem()
        items = pb.allocate_array(4, 'items')
        our = pb.allocate('our')
        g = one_of_n(pb, our + 0, [i + 0 for i in items], '1ofn')
        g.generate_r1cs_constraints()
        self.assertEqual(pb.num_constraints, 2 * 4 + 1)
        for i, v in enumerate([7, 8, 9, 10]):
            pb.setval(items[i], v)
        pb.setval(our, 9)
        g.generate_r1cs_witness()
        self.assertTrue(pb.is_satisfied())
        pb.setval(our, 11)
        self.assertFalse(pb.is_satisfied())


class TestPoseidonGadget(unittest.TestCase):
    def test_permutation(self):
        pb = ConstraintSystem()
        xs = pb.allocate_array(2, 'x')
        g = Poseidon_gadget(pb, [xs[0] + 0, xs[1] + 0], 'poseidon')
        g.generate_r1cs_constraints()
        # 3*(8*6 + 57) sbox constraints + 1 output bind
        self.assertEqual(pb.num_constraints, 315 + 1)
        pb.setval(xs[0], 1)
        pb.setval(xs[1], 2)
        g.generate_r1cs_witness()
        self.assertEqual(pb.val(g.result()), poseidon([1, 2]))
        self.assertTrue(pb.is_satisfied())


if __name__ == "__main__":
    unittest.main()
