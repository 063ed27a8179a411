"""End-to-end Groth16: generator -> prover -> verifier (self-contained).

The first full slice: circuits built with the R1CS builder, H polynomial via
the device NTT witness map, proof assembled and checked by the pairing
verifier -- the same 4-product the unmodified Verifier.sol performs.
"""
import random
import unittest

from ethsnarks_tpu.field import SNARK_SCALAR_FIELD
from ethsnarks_tpu.r1cs import ConstraintSystem
from ethsnarks_tpu.gadgets import MiMCe7_gadget
from ethsnarks_tpu.mimc import mimc
from ethsnarks_tpu.groth16 import generator, ProverContext
from ethsnarks_tpu.verifier import VerifyingKey, Proof

P = SNARK_SCALAR_FIELD

_rng = random.Random(1234)


def _det_rng():
    return _rng.randrange(1, P)


def _cubic_circuit():
    """x^3 + x + 5 == out, out public; witness x = 3 -> out = 35."""
    pb = ConstraintSystem()
    out = pb.allocate('out')
    pb.set_input_sizes(1)
    x = pb.allocate('x')
    t1 = pb.allocate('t1')
    t2 = pb.allocate('t2')
    pb.add_constraint(x, x, t1, 'x*x')
    pb.add_constraint(t1, x, t2, 't1*x')
    pb.add_constraint(t2 + x + 5, 1, out, 'sum')
    pb.setval(x, 3)
    pb.setval(t1, 9)
    pb.setval(t2, 27)
    pb.setval(out, 35)
    assert pb.is_satisfied()
    return pb


class TestGroth16Cubic(unittest.TestCase):
    def test_prove_verify(self):
        pb = _cubic_circuit()
        keypair = generator(pb, rng=_det_rng)
        ctx = ProverContext(keypair.pk, pb, use_device_msm=False)
        proof = ctx.prove(pb.values)
        self.assertEqual(proof.input, [35])
        self.assertTrue(keypair.vk.verify(proof))

    def test_json_roundtrip_and_reject(self):
        pb = _cubic_circuit()
        keypair = generator(pb, rng=_det_rng)
        ctx = ProverContext(keypair.pk, pb, use_device_msm=False)
        proof = ctx.prove(pb.values)
        vk2 = VerifyingKey.from_json(keypair.vk.to_json())
        proof2 = Proof.from_json(proof.to_json())
        self.assertTrue(vk2.verify(proof2))
        bad = Proof(proof.A, proof.B, proof.C, [36])
        self.assertFalse(vk2.verify(bad))

    def test_deterministic_nozk(self):
        """No blinding: the same witness yields the identical proof."""
        pb = _cubic_circuit()
        keypair = generator(pb, rng=_det_rng)
        ctx = ProverContext(keypair.pk, pb, use_device_msm=False)
        p1 = ctx.prove(pb.values)
        p2 = ctx.prove(pb.values)
        self.assertEqual(p1.to_json(), p2.to_json())


class TestGroth16MiMC(unittest.TestCase):
    def test_mimc_preimage(self):
        """Prove knowledge of (x, k) with mimc(x, k) == public digest."""
        pb = ConstraintSystem()
        digest = pb.allocate('digest')
        pb.set_input_sizes(1)
        x = pb.allocate('x')
        k = pb.allocate('k')
        g = MiMCe7_gadget(pb, x + 0, k + 0, 'mimc')
        g.generate_r1cs_constraints()
        pb.add_constraint(g.result() + 0, 1, digest + 0, 'bind')

        pb.setval(x, 777)
        pb.setval(k, 888)
        g.generate_r1cs_witness()
        pb.setval(digest, mimc(777, 888))
        self.assertTrue(pb.is_satisfied())

        keypair = generator(pb, rng=_det_rng)
        ctx = ProverContext(keypair.pk, pb, use_device_msm=False)
        proof = ctx.prove(pb.values)
        self.assertTrue(keypair.vk.verify(proof))
        bad = Proof(proof.A, proof.B, proof.C, [(proof.input[0] + 1) % P])
        self.assertFalse(keypair.vk.verify(bad))


if __name__ == "__main__":
    unittest.main()
