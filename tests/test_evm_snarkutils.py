"""EVM-level SnarkUtils twins vs the host packing oracle.

Parity with the reference's test/TestSnarkUtils.sol: PackWords output must
equal utils.bytes_to_field_elements over the same byte stream, and
ReverseBits must be a 256-bit bit reversal.
"""
import random
import unittest

from ethsnarks_tpu.evm_snarkutils import reverse_bits_evm, pack_words_evm
from ethsnarks_tpu.utils import bytes_to_field_elements

_rng = random.Random(1717)


def _rev256(v):
    return int(bin(v)[2:].rjust(256, '0')[::-1], 2)


class TestReverseBits(unittest.TestCase):
    def test_known(self):
        self.assertEqual(reverse_bits_evm(0), 0)
        self.assertEqual(reverse_bits_evm(1), 1 << 255)
        self.assertEqual(reverse_bits_evm((1 << 256) - 1), (1 << 256) - 1)
        self.assertEqual(reverse_bits_evm(0b1011), _rev256(0b1011))

    def test_random(self):
        for _ in range(20):
            v = _rng.getrandbits(256)
            self.assertEqual(reverse_bits_evm(v), _rev256(v))

    def test_involution(self):
        v = _rng.getrandbits(256)
        self.assertEqual(reverse_bits_evm(reverse_bits_evm(v)), v)


class TestPackWords(unittest.TestCase):
    def _check(self, words):
        data = b''.join(int(w).to_bytes(32, 'big') for w in words)
        expected = bytes_to_field_elements(data)
        got = pack_words_evm(words)
        self.assertEqual(got, expected, words)

    def test_single_word(self):
        self._check([_rng.getrandbits(256)])

    def test_two_words(self):
        self._check([_rng.getrandbits(256), _rng.getrandbits(256)])

    def test_reference_shape_five_words(self):
        # TestSnarkUtils.sol packs sha256-digest-sized arrays; 5 words ->
        # ceil(1280/253) = 6 field elements, exercising the chunk seams
        self._check([_rng.getrandbits(256) for _ in range(5)])

    def test_all_ones_and_zero(self):
        self._check([(1 << 256) - 1, 0, (1 << 256) - 1])

    def test_field_element_bound(self):
        for w in pack_words_evm([_rng.getrandbits(256) for _ in range(4)]):
            self.assertLess(w, 1 << 253)


if __name__ == "__main__":
    unittest.main()
