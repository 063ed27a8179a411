"""SHA-256 gadget vs hashlib (Ethereum-compatible 512-bit + arbitrary)."""
import hashlib
import unittest

from ethsnarks_tpu.r1cs import ConstraintSystem
from ethsnarks_tpu.gadgets.sha256 import (
    sha256_full_gadget_512, sha256_many, bits2blocks_padded)


def _bits_of(data):
    return [int(b) for byte in data for b in bin(byte)[2:].rjust(8, '0')]


def _digest_from_result(pb, result_bits):
    out = ''.join(str(pb.val(b) if not isinstance(b, int) else b)
                  for b in result_bits)
    return int(out, 2).to_bytes(32, 'big')


class TestSha256Full(unittest.TestCase):
    def test_full_512(self):
        data = bytes(range(64))
        pb = ConstraintSystem()
        in_bits = pb.allocate_array(512, 'in')
        g = sha256_full_gadget_512(pb, in_bits, 'sha')
        g.generate_r1cs_constraints()
        for v, b in zip(in_bits, _bits_of(data)):
            pb.setval(v, b)
        g.generate_r1cs_witness()
        self.assertEqual(_digest_from_result(pb, g.result()),
                         hashlib.sha256(data).digest())
        self.assertTrue(pb.is_satisfied())
        # tampering an input bit breaks satisfiability
        pb.setval(in_bits[0], 1 - pb.val(in_bits[0]))
        self.assertFalse(pb.is_satisfied())


class TestSha256Many(unittest.TestCase):
    def test_blocks_padded(self):
        self.assertEqual(bits2blocks_padded(0), 1)
        self.assertEqual(bits2blocks_padded(447), 1)
        self.assertEqual(bits2blocks_padded(448), 2)
        self.assertEqual(bits2blocks_padded(512), 2)

    def test_arbitrary_length(self):
        for data in (b'abc', b'x' * 55, b'y' * 56, b'z' * 64):
            pb = ConstraintSystem()
            in_bits = pb.allocate_array(len(data) * 8, 'in')
            g = sha256_many(pb, in_bits, 'many')
            g.generate_r1cs_constraints()
            for v, b in zip(in_bits, _bits_of(data)):
                pb.setval(v, b)
            g.generate_r1cs_witness()
            self.assertEqual(_digest_from_result(pb, g.result()),
                             hashlib.sha256(data).digest(), data)
            self.assertTrue(pb.is_satisfied())


if __name__ == "__main__":
    unittest.main()
