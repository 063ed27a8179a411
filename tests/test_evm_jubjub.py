"""EVM-level JubJub scalarMult + EdDSA.Verify twins vs the host library.

The bytecode (ethsnarks_tpu/evm_jubjub.py, twins of contracts/JubJub.sol
and contracts/EdDSA.sol) must agree with the host jubjub implementation -
the pinning the reference gets from truffle's TestJubJub/TestEdDSA.
"""
import hashlib
import unittest

from ethsnarks_tpu.jubjub import Point, JUBJUB_L
from ethsnarks_tpu.evm_jubjub import (
    GEN, MASK_250, scalar_mult_evm, eddsa_verify_evm)

B = Point(GEN[0], GEN[1])


def _hash_to_int(*words):
    data = b''.join(int(w).to_bytes(32, 'big') for w in words)
    return int.from_bytes(hashlib.sha256(data).digest(), 'big') & MASK_250


class TestEvmScalarMult(unittest.TestCase):
    def test_matches_host(self):
        for s in (1, 2, 3, 7, 0xDEADBEEF,
                  int(JUBJUB_L) - 1,
                  12345678901234567890123456789012345678901234567890):
            want = B.mult(s)
            got = scalar_mult_evm(GEN[0], GEN[1], s)
            self.assertEqual(got, (int(want.x), int(want.y)), "s=%d" % s)

    def test_zero_gives_identity(self):
        self.assertEqual(scalar_mult_evm(GEN[0], GEN[1], 0), (0, 1))

    def test_arbitrary_base(self):
        p = B.mult(99991)
        got = scalar_mult_evm(int(p.x), int(p.y), 31337)
        want = p.mult(31337)
        self.assertEqual(got, (int(want.x), int(want.y)))


class TestEvmEdDSA(unittest.TestCase):
    """contracts/EdDSA.sol checks s*B == t*A with t = HashToInt(R||A||M)
    (the reference contract's protocol, R folded only into the hash)."""

    def test_accept_and_reject(self):
        a = 0x1234567890ABCDEF
        A = B.mult(a)
        R = B.mult(424242)            # any point; only hashed
        m = 998877665544332211
        t = _hash_to_int(int(R.x), int(R.y), int(A.x), int(A.y), m)
        s = (t * a) % int(JUBJUB_L)
        self.assertTrue(eddsa_verify_evm(
            (int(A.x), int(A.y)), m, (int(R.x), int(R.y)), s))
        self.assertFalse(eddsa_verify_evm(
            (int(A.x), int(A.y)), m, (int(R.x), int(R.y)),
            (s + 1) % int(JUBJUB_L)))
        self.assertFalse(eddsa_verify_evm(
            (int(A.x), int(A.y)), m + 1, (int(R.x), int(R.y)), s))


if __name__ == "__main__":
    unittest.main()
