"""zk-form key + r/s blinding behind a flag (reference hpp:172-274 parity).

The fork proves nozk (deterministic) by default; generator(zk=True) keeps
the zk extras and prove(blind=True) adds standard Groth16 blinding.  All
host-path (compile-free).
"""
import random
import unittest

from ethsnarks_tpu.field import SNARK_SCALAR_FIELD
from ethsnarks_tpu.r1cs import ConstraintSystem
from ethsnarks_tpu.gadgets import MiMCe7_gadget
from ethsnarks_tpu.mimc import mimc
from ethsnarks_tpu.groth16 import generator, ProverContext

P = SNARK_SCALAR_FIELD


def _circuit():
    pb = ConstraintSystem()
    digest = pb.allocate('digest')
    pb.set_input_sizes(1)
    x = pb.allocate('x')
    k = pb.allocate('k')
    g = MiMCe7_gadget(pb, x + 0, k + 0, 'mimc')
    g.generate_r1cs_constraints()
    pb.add_constraint(g.result() + 0, 1, digest + 0, 'bind')
    pb.setval(x, 123)
    pb.setval(k, 456)
    g.generate_r1cs_witness()
    pb.setval(digest, mimc(123, 456))
    assert pb.is_satisfied()
    return pb


class TestZkBlinding(unittest.TestCase):
    @classmethod
    def setUpClass(cls):
        cls.pb = _circuit()
        rng = random.Random(77)
        cls.keypair = generator(
            cls.pb, rng=lambda: rng.randrange(1, P), device_exp=False,
            zk=True)
        cls.ctx = ProverContext(cls.keypair.pk, cls.pb,
                                use_device_msm=False)

    def test_zk_key_has_extras(self):
        self.assertTrue(self.keypair.pk.has_zk_extras)

    def test_blinded_proof_verifies_and_randomizes(self):
        rng = random.Random(99)
        blinder = lambda: rng.randrange(1, P)
        p1 = self.ctx.prove(self.pb.values, blind=True, rng=blinder)
        p2 = self.ctx.prove(self.pb.values, blind=True, rng=blinder)
        self.assertTrue(self.keypair.vk.verify(p1))
        self.assertTrue(self.keypair.vk.verify(p2))
        # different blinds -> different proofs for the same witness
        self.assertNotEqual(p1.to_json(), p2.to_json())

    def test_unblinded_stays_deterministic(self):
        p1 = self.ctx.prove(self.pb.values)
        p2 = self.ctx.prove(self.pb.values)
        self.assertEqual(p1.to_json(), p2.to_json())
        self.assertTrue(self.keypair.vk.verify(p1))

    def test_nozk_key_rejects_blinding(self):
        rng = random.Random(5)
        kp = generator(self.pb, rng=lambda: rng.randrange(1, P),
                       device_exp=False)
        self.assertFalse(kp.pk.has_zk_extras)
        ctx = ProverContext(kp.pk, self.pb, use_device_msm=False)
        with self.assertRaises(ValueError):
            ctx.prove(self.pb.values, blind=True)


if __name__ == "__main__":
    unittest.main()
