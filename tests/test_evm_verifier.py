"""EVM-level Groth16 verification (bytecode twin of contracts/Verifier.sol).

The reference pins proofs to the on-chain verifier via
test/TestVerifier.sol:8-59 (ganache).  Without solc/ganache in this image,
the same invariant is pinned at the EVM-bytecode level: a hand-assembled
Verify routine (ethsnarks_tpu/evm_verifier.py) using the real EIP-196/197
precompile call sequence, run in the in-process mini-EVM whose precompiles
are backed by bn254.py/pairing.py.  Any drift in vk/proof word layout,
G2 coefficient order, NegateY, or the scalar-field range check fails here.
"""
import unittest

from ethsnarks_tpu.verifier import VerifyingKey, Proof
from ethsnarks_tpu.evm_verifier import evm_verify, encode_calldata, \
    groth16_verifier_code
from ethsnarks_tpu.evmasm import execute, EvmError
from tests.test_verifier import VK_STATIC, PROOF_STATIC


class TestEvmVerifier(unittest.TestCase):
    """Uses the reference's static cross-implementation fixture (proved by
    the reference C++ prover, verified on-chain by TestVerifier.sol)."""

    def setUp(self):
        self.vk = VerifyingKey.from_dict(VK_STATIC)
        self.proof = Proof.from_dict(PROOF_STATIC)

    def test_accepts_static_reference_proof(self):
        self.assertTrue(evm_verify(self.vk, self.proof))

    def test_rejects_wrong_input(self):
        bad = [self.proof.input[0], 8]
        self.assertFalse(evm_verify(self.vk, self.proof, bad))

    def test_reverts_on_input_ge_scalar_field(self):
        from ethsnarks_tpu.evm_verifier import SNARK_SCALAR_FIELD
        bad = [self.proof.input[0], SNARK_SCALAR_FIELD]
        with self.assertRaises(EvmError):
            evm_verify(self.vk, self.proof, bad)

    def test_reverts_on_off_curve_proof_point(self):
        # corrupt A.x: the ecpairing precompile must reject it -> staticcall
        # failure -> REVERT (same behavior as the on-chain contract)
        data = bytearray(encode_calldata(self.vk, self.proof))
        word = 15 * 32  # proof[0] = A.x
        data[word:word + 32] = (int.from_bytes(data[word:word + 32], 'big')
                                ^ 1).to_bytes(32, 'big')
        with self.assertRaises(EvmError):
            execute(groth16_verifier_code(), bytes(data))

    def test_rejects_tampered_proof_scalar(self):
        # flipping C for another curve point must fail the pairing check
        from ethsnarks_tpu.bn254 import G1_GEN
        bad = Proof(self.proof.A, self.proof.B, G1_GEN, self.proof.input)
        self.assertFalse(evm_verify(self.vk, bad))


class TestEvmVerifierFreshProof(unittest.TestCase):
    """End-to-end: prove a small circuit with the TPU prover and verify the
    encoded proof through the EVM bytecode path."""

    def test_fresh_proof_roundtrip(self):
        import os
        import random
        import tempfile
        from ethsnarks_tpu.field import SNARK_SCALAR_FIELD as P
        from ethsnarks_tpu.r1cs import ConstraintSystem
        from ethsnarks_tpu.stubs import (
            stub_genkeys_from_pb, load_proving_key, make_prover_context,
            prove)

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
        self.assertTrue(pb.is_satisfied())

        rng = random.Random(4242)
        with tempfile.TemporaryDirectory() as td:
            pk_file = os.path.join(td, 'pk.raw')
            vk_file = os.path.join(td, 'vk.json')
            stub_genkeys_from_pb(pb, pk_file, vk_file,
                                 rng=lambda: rng.randrange(1, P))
            pk = load_proving_key(pk_file)
            ctx = make_prover_context(pk, pb, use_device_msm=False)
            proof_json = prove(ctx, pb)
            with open(vk_file) as fh:
                vk = VerifyingKey.from_json(fh.read())
        proof = Proof.from_json(proof_json)
        self.assertTrue(evm_verify(vk, proof))
        bad = Proof(proof.A, proof.B, proof.C,
                    [(proof.input[0] + 1) % P] + list(proof.input[1:]))
        self.assertFalse(evm_verify(vk, bad))


if __name__ == '__main__':
    unittest.main()
