"""Batched SHA-256 witness instancing (master-instance analog) parity.

Pins models.sha256_batch.BatchSha256 against the per-gadget python witness
path, the hashlib oracle, and single-instance constraint parity (role of
the reference's src/gadgets/sha256_many.hpp:20-148 master-instance
mechanism; test model: src/test/test_sha256_full.cpp).
"""
import hashlib
import unittest

import pytest

from ethsnarks_tpu.r1cs import ConstraintSystem
from ethsnarks_tpu.gadgets.sha256 import sha256_many
from ethsnarks_tpu.models.sha256_batch import BatchSha256

pytestmark = pytest.mark.device


def _single_instance(msg):
    """Reference path: one sha256_many with the python witness recursion."""
    pb = ConstraintSystem()
    in_bits = pb.allocate_array(len(msg) * 8, 'msg')
    g = sha256_many(pb, in_bits, 'sha')
    g.generate_r1cs_constraints()
    bits = ''.join(bin(byte)[2:].rjust(8, '0') for byte in msg)
    for v, ch in zip(in_bits, bits):
        pb.setval(v, int(ch))
    g.generate_r1cs_witness()
    assert pb.is_satisfied()
    return pb, g


class TestBatchSha256(unittest.TestCase):
    def test_batch_matches_python_witness_and_hashlib(self):
        n = 3
        msgs = [bytes([(i * 37 + j) & 0xff for j in range(64)])
                for i in range(n)]
        model = BatchSha256(n, n_bits=512)
        model.set_witness(msgs)
        pb = model.pb
        self.assertTrue(pb.is_satisfied())

        for i, msg in enumerate(msgs):
            d = hashlib.sha256(msg).digest()
            hi, lo = model.digests()[i]
            self.assertEqual(hi, int.from_bytes(d[:16], 'big'))
            self.assertEqual(lo, int.from_bytes(d[16:], 'big'))

        # constraint parity: N * (single sha256_many + 2 packing rows)
        single_pb, single_g = _single_instance(msgs[0])
        self.assertEqual(len(pb.constraints),
                         n * (len(single_pb.constraints) + 2))

        # bulk-assigned wires equal the python witness recursion, wire for
        # wire (instance 0's gadget vs the standalone gadget - identical
        # allocation order, shifted indices)
        g0 = model.gadgets[0]
        base_batch = model.input_vs[0][0].index
        base_single = 1     # single pb: ONE then msg bits
        n_wires = len(single_pb.values) - base_single
        for k in range(n_wires):
            self.assertEqual(pb.values[base_batch + k],
                             single_pb.values[base_single + k],
                             "wire %d diverges" % k)
        self.assertEqual(len(g0.comps), len(single_g.comps))

    def test_multiblock_messages(self):
        # 96-byte messages -> 2 data blocks + padding block = 3 compressions
        n = 2
        msgs = [bytes(range(i, i + 96)) for i in range(n)]
        model = BatchSha256(n, n_bits=96 * 8)
        self.assertEqual(model.n_blocks, 2)
        model.set_witness(msgs)
        self.assertTrue(model.pb.is_satisfied())
        for i, msg in enumerate(msgs):
            d = hashlib.sha256(msg).digest()
            self.assertEqual(model.digests()[i],
                             (int.from_bytes(d[:16], 'big'),
                              int.from_bytes(d[16:], 'big')))


if __name__ == '__main__':
    unittest.main()
