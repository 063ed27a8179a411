"""Serialization: r1cs/witness JSON round trips + bellman pk interop."""
import json
import os
import random
import tempfile
import unittest

from ethsnarks_tpu.field import SNARK_SCALAR_FIELD
from ethsnarks_tpu.r1cs import ConstraintSystem
from ethsnarks_tpu.serialization import (
    r1cs_to_dict, r1cs_from_dict, r1cs2json, witness2json, witness_from_json,
    pk_to_bellman_dict, pk_from_bellman_dict)
from ethsnarks_tpu.groth16 import generator, ProverContext
from ethsnarks_tpu.qap import QAP

P = SNARK_SCALAR_FIELD
_rng = random.Random(777)


def _cubic():
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


class TestR1csJson(unittest.TestCase):
    def test_roundtrip(self):
        pb = _cubic()
        d = r1cs_to_dict(pb)
        self.assertEqual(d['nPubInputs'], 1)
        self.assertEqual(d['nConstraints'], 3)
        cs2 = r1cs_from_dict(d)
        self.assertEqual(cs2.num_constraints, pb.num_constraints)
        # transplant the witness; must satisfy
        cs2.values = list(pb.values)
        self.assertTrue(cs2.is_satisfied())

    def test_files(self):
        pb = _cubic()
        with tempfile.TemporaryDirectory() as td:
            rp = os.path.join(td, 'r1cs.json')
            wp = os.path.join(td, 'witness.json')
            r1cs2json(pb, rp)
            witness2json(pb, wp)
            with open(rp) as fh:
                d = json.load(fh)
            cs2 = r1cs_from_dict(d)
            cs2.values = witness_from_json(wp)
            self.assertTrue(cs2.is_satisfied())


class TestBellmanInterop(unittest.TestCase):
    def test_pk_roundtrip_and_prove(self):
        pb = _cubic()
        keypair = generator(pb, rng=lambda: _rng.randrange(1, P))
        qap = QAP(pb)
        bell = pk_to_bellman_dict(keypair.pk, pb.num_variables,
                                  qap.domain.bitrev)
        # through JSON text to exercise string coords
        bell = json.loads(json.dumps(bell))
        pk2 = pk_from_bellman_dict(bell)
        ctx = ProverContext(pk2, pb, use_device_msm=False)
        proof = ctx.prove(pb.values)
        self.assertTrue(keypair.vk.verify(proof))


class TestBinaryMontgomeryKey(unittest.TestCase):
    """Binary Montgomery-form key stream (role of the reference's
    BINARY_OUTPUT/MONTGOMERY_OUTPUT, utils.hpp:166-185)."""

    def _keypair(self):
        pb = _cubic()
        return pb, generator(pb, rng=lambda: _rng.randrange(1, P))

    def test_binary_roundtrip_exact(self):
        from ethsnarks_tpu.serialization import (
            write_pk_binary, read_pk_binary)
        pb, keypair = self._keypair()
        with tempfile.TemporaryDirectory() as td:
            path = os.path.join(td, 'pk.bin')
            write_pk_binary(keypair.pk, path)
            pk2 = read_pk_binary(path)
        self.assertEqual(pk2.num_inputs, keypair.pk.num_inputs)
        self.assertEqual(pk2.alpha_g1, keypair.pk.alpha_g1)
        self.assertEqual(pk2.beta_g2, keypair.pk.beta_g2)
        self.assertEqual(pk2.delta_g2, keypair.pk.delta_g2)
        self.assertEqual(pk2.a_query, keypair.pk.a_query)
        self.assertEqual(pk2.b_query, keypair.pk.b_query)
        self.assertEqual(pk2.h_query_bitrev, keypair.pk.h_query_bitrev)
        self.assertEqual(pk2.l_query, keypair.pk.l_query)

    def test_bellman_to_binary_to_prove(self):
        # bellman JSON -> binary Montgomery stream -> load -> prove
        from ethsnarks_tpu.serialization import pk_bellman2ethsnarks
        from ethsnarks_tpu.stubs import load_proving_key
        pb, keypair = self._keypair()
        qap = QAP(pb)
        bell = pk_to_bellman_dict(keypair.pk, pb.num_variables,
                                  qap.domain.bitrev)
        with tempfile.TemporaryDirectory() as td:
            bp = os.path.join(td, 'bellman.json')
            kp = os.path.join(td, 'pk.bin')
            with open(bp, 'w') as fh:
                json.dump(bell, fh)
            pk_bellman2ethsnarks(bp, kp)
            pk2 = load_proving_key(kp)
        ctx = ProverContext(pk2, pb, use_device_msm=False)
        proof = ctx.prove(pb.values)
        self.assertTrue(keypair.vk.verify(proof))

    def test_legacy_pickle_still_loads(self):
        import pickle
        from ethsnarks_tpu.stubs import load_proving_key
        pb, keypair = self._keypair()
        with tempfile.TemporaryDirectory() as td:
            path = os.path.join(td, 'pk.pkl')
            with open(path, 'wb') as fh:
                pickle.dump(keypair.pk, fh)
            pk2 = load_proving_key(path)
        self.assertEqual(pk2.a_query, keypair.pk.a_query)


if __name__ == "__main__":
    unittest.main()
