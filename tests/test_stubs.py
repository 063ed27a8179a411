"""Stub orchestration: genkeys -> prove -> verify via the one-call helpers."""
import os
import random
import tempfile
import unittest

from ethsnarks_tpu.field import SNARK_SCALAR_FIELD
from ethsnarks_tpu.r1cs import ConstraintSystem
from ethsnarks_tpu.stubs import (
    stub_genkeys_from_pb, load_proving_key, make_prover_context, prove,
    stub_verify, stub_test_proof_verify)

P = SNARK_SCALAR_FIELD
_rng = random.Random(9009)


def _circuit():
    pb = ConstraintSystem()
    out = pb.allocate('out')
    pb.set_input_sizes(1)
    x = pb.allocate('x')
    sq = pb.allocate('sq')
    pb.add_constraint(x, x, sq, 'x*x')
    pb.add_constraint(sq + x, 1, out, 'sum')
    pb.setval(x, 6)
    pb.setval(sq, 36)
    pb.setval(out, 42)
    assert pb.is_satisfied()
    return pb


class TestStubs(unittest.TestCase):
    def test_full_cycle_via_files(self):
        pb = _circuit()
        with tempfile.TemporaryDirectory() as td:
            pk_file = os.path.join(td, 'pk.raw')
            vk_file = os.path.join(td, 'vk.json')
            stub_genkeys_from_pb(pb, pk_file, vk_file,
                                 rng=lambda: _rng.randrange(1, P))
            pk = load_proving_key(pk_file)
            ctx = make_prover_context(pk, pb, use_device_msm=False)
            proof_json = prove(ctx, pb)
            with open(vk_file) as fh:
                vk_json = fh.read()
            self.assertTrue(stub_verify(vk_json, proof_json))
            # tampered input must fail
            bad = proof_json.replace('"0x2a"', '"0x2b"')
            self.assertNotEqual(bad, proof_json)
            self.assertFalse(stub_verify(vk_json, bad))

    def test_proof_roundtrip_helper(self):
        pb = _circuit()
        self.assertTrue(stub_test_proof_verify(
            pb, rng=lambda: _rng.randrange(1, P)))


if __name__ == "__main__":
    unittest.main()
