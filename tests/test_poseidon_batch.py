"""Batched Poseidon witness instancing (master-instance analog) parity.

Pins models.poseidon_batch.BatchPoseidonHash against the per-gadget python
witness path and the host poseidon() oracle, and checks the reference
constraint count 3*(RF*t + RP) = 315 per permutation + 1 digest bind
(reference poseidon.hpp:520-521).
"""
import unittest

import pytest

from ethsnarks_tpu.r1cs import ConstraintSystem
from ethsnarks_tpu.gadgets import Poseidon_gadget
from ethsnarks_tpu.models.poseidon_batch import BatchPoseidonHash
from ethsnarks_tpu.poseidon import poseidon

pytestmark = pytest.mark.device


class TestBatchPoseidon(unittest.TestCase):
    def test_batch_matches_gadget_witness_and_host(self):
        n = 5
        inputs = [(1000 + i, 2000 + i) for i in range(n)]
        model = BatchPoseidonHash(n, n_inputs=2)
        model.set_witness(inputs)
        pb = model.pb
        self.assertTrue(pb.is_satisfied())

        # digests match the host sponge oracle
        for i, row in enumerate(inputs):
            self.assertEqual(model.digests()[i], poseidon(list(row)))

        # constraint count: n * (315 + 1 bind)
        self.assertEqual(len(pb.constraints), n * (315 + 1))

        # bulk-assigned witness equals the per-gadget python witness
        twin = ConstraintSystem()
        d = twin.allocate('d')
        twin.set_input_sizes(1)
        ins = twin.allocate_array(2, 'in')
        g = Poseidon_gadget(twin, [v + 0 for v in ins], 'p',
                            constrain_outputs=0)
        g.generate_r1cs_constraints()
        twin.add_constraint(g.final_state[0], 1, d + 0, 'bind')
        twin.setval(ins[0], inputs[0][0])
        twin.setval(ins[1], inputs[0][1])
        g.generate_r1cs_witness()
        twin.setval(d, twin.lc_val(g.final_state[0]))
        self.assertTrue(twin.is_satisfied())
        for k, sb in enumerate(g.sboxes):
            batch_sb = model.gadgets[0].sboxes[k]
            for off in range(3):
                self.assertEqual(pb.values[batch_sb.x2.index + off],
                                 twin.values[sb.x2.index + off],
                                 'sbox %d word %d' % (k, off))
        self.assertEqual(model.digests()[0], twin.val(d))


if __name__ == "__main__":
    unittest.main()
