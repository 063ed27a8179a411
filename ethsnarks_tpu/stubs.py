"""One-call orchestration helpers (parity: src/stubs.{hpp,cpp}).

stub_genkeys_from_pb / stub_genkeys<Gadget> / prove(context, pb) ->
proof JSON / stub_verify(vk_json, proof_json) / stub_main_verify /
stub_test_proof_verify - same API surface.  Proving keys are stored in the
binary Montgomery-form stream (serialization.write_pk_binary, role of the
reference's BINARY_OUTPUT/MONTGOMERY_OUTPUT key files - the pk *is* the
checkpoint, SURVEY.md §5.4); legacy pickle files still load.
"""

import pickle

from .groth16 import generator, ProverContext
from .verifier import VerifyingKey, Proof
from .serialization import (
    vk2json_file, write_pk_binary, read_pk_binary, _PK_MAGIC)


def stub_genkeys_from_pb(pb, pk_file, vk_file, rng=None):
    keypair = generator(pb, rng=rng)
    vk2json_file(keypair.vk, vk_file)
    write_pk_binary(keypair.pk, pk_file)
    return keypair


def stub_genkeys(gadget_cls, pk_file, vk_file, *gadget_args, rng=None):
    """Instantiate gadget_cls on a fresh protoboard, constrain, genkeys."""
    from .r1cs import ConstraintSystem
    pb = ConstraintSystem()
    gadget = gadget_cls(pb, *gadget_args) if gadget_args else gadget_cls(pb)
    gadget.generate_r1cs_constraints()
    stub_genkeys_from_pb(pb, pk_file, vk_file)
    return pb, gadget


def load_proving_key(pk_file):
    """Sniff the binary Montgomery magic; fall back to legacy pickle."""
    with open(pk_file, 'rb') as fh:
        head = fh.read(len(_PK_MAGIC))
    if head == _PK_MAGIC:
        return read_pk_binary(pk_file)
    with open(pk_file, 'rb') as fh:
        return pickle.load(fh)


def make_prover_context(pk, pb, use_device_msm=True):
    return ProverContext(pk, pb, use_device_msm=use_device_msm)


def prove(context, pb):
    """ProverContext + satisfied protoboard -> proof JSON string."""
    proof = context.prove(pb.values)
    return proof.to_json()


def prove_from_pb(pb, pk_file, use_device_msm=True):
    """Working equivalent of the reference's stale stub_prove_from_pb
    (src/pinocchio/main.cpp:10 calls an API removed by the fork; we provide
    the fixed version, see SURVEY.md §2.5 note)."""
    pk = load_proving_key(pk_file)
    context = ProverContext(pk, pb, use_device_msm=use_device_msm)
    return prove(context, pb)


def stub_verify(vk_json, proof_json):
    vk = VerifyingKey.from_json(vk_json)
    proof = Proof.from_json(proof_json)
    return vk.verify(proof)


def stub_main_verify(prog_name, args):
    if len(args) < 2:
        print("Usage: %s <vk.json> <proof.json>" % prog_name)
        return 1
    with open(args[0]) as fh:
        vk_json = fh.read()
    with open(args[1]) as fh:
        proof_json = fh.read()
    if stub_verify(vk_json, proof_json):
        print("OK")
        return 0
    print("FAIL")
    return 1


def stub_test_proof_verify(pb, rng=None, use_device_msm=False):
    """In-process generator -> prover -> verifier round trip (parity:
    src/stubs.cpp:135-148; used by gadget tests that escalate to full
    proofs)."""
    keypair = generator(pb, rng=rng)
    context = ProverContext(keypair.pk, pb, use_device_msm=use_device_msm)
    proof = context.prove(pb.values)
    return keypair.vk.verify(proof)
