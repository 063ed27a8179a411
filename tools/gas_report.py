#!/usr/bin/env python
"""Gas report for every EVM-level contract twin (Istanbul schedule).

The reference measures contract gas with eth-gas-reporter / estimateGas
(truffle.js:22-27, test/TestMiMC.js:18-19, TestJubJub.js); this is the
same accounting over the in-process mini-EVM.  Prints one JSON line per
operation and writes GAS_REPORT.json at the repo root.
"""
import json
import os
import random
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from ethsnarks_tpu.field import SNARK_SCALAR_FIELD
from ethsnarks_tpu.evmasm import execute

P = SNARK_SCALAR_FIELD
_rng = random.Random(20260821)


def _gas(code, *words, gas_limit=50_000_000):
    data = b''.join(int(w).to_bytes(32, 'big') for w in words)
    _, gas = execute(code, data, gas_limit=gas_limit, with_gas=True)
    return gas


def mimc_pe7():
    from ethsnarks_tpu.mimc.contract import mimc_contract
    code = mimc_contract()
    return _gas(code, _rng.randrange(P), _rng.randrange(P))


def poseidon_t6():
    from ethsnarks_tpu.poseidon.contract import poseidon_contract
    code = poseidon_contract()
    return _gas(code, _rng.randrange(P), _rng.randrange(P))


def merkle_verify_path_29():
    from ethsnarks_tpu.merkletree import MerkleTree
    from ethsnarks_tpu.evm_merkle import merkle_verify_path_code
    tree = MerkleTree(2 ** 29)
    for leaf in (111, 222, 333):
        tree.append(leaf)
    proof = tree.proof(1)
    code = merkle_verify_path_code(29)
    words = [tree[1]] + [int(x) for x in proof.path] \
        + [1 if b else 0 for b in proof.address]
    return _gas(code, *words)


def jubjub_scalar_mult():
    from ethsnarks_tpu.evm_jubjub import scalar_mult_code, GEN
    return _gas(scalar_mult_code(), GEN[0], GEN[1],
                _rng.randrange(1 << 250))


def jubjub_scalar_mult_naf5():
    from ethsnarks_tpu.evm_jubjub import scalar_mult_naf5_code, GEN
    return _gas(scalar_mult_naf5_code(), GEN[0], GEN[1],
                _rng.randrange(1 << 250))


def eddsa_verify():
    from ethsnarks_tpu.evm_jubjub import eddsa_verify_code, Q
    from ethsnarks_tpu.eddsa import MiMCEdDSA, PureEdDSA
    from ethsnarks_tpu.jubjub import Point
    # the contract twin checks s*B == t*A with t = HashToInt(sha256);
    # drive it with a structurally valid input set (gas is data-blind)
    k, A = PureEdDSA.random_keypair()
    return _gas(eddsa_verify_code(), int(A.x), int(A.y),
                _rng.randrange(1 << 250), int(A.x), int(A.y),
                _rng.randrange(1 << 250))


def groth16_verify():
    from tests.test_verifier import VK_STATIC, PROOF_STATIC
    from ethsnarks_tpu.verifier import VerifyingKey, Proof
    from ethsnarks_tpu.evm_verifier import (
        groth16_verifier_code, encode_calldata)
    vk = VerifyingKey.from_dict(VK_STATIC)
    proof = Proof.from_dict(PROOF_STATIC)
    data = encode_calldata(vk, proof, proof.input)
    _, gas = execute(groth16_verifier_code(), bytes(data),
                     gas_limit=50_000_000, with_gas=True)
    return gas


def snarkutils_pack5():
    from ethsnarks_tpu.evm_snarkutils import pack_words_code
    return _gas(pack_words_code(),
                *[_rng.getrandbits(256) for _ in range(5)])


REPORT = [
    ("MiMCpe7_permutation", mimc_pe7),
    ("Poseidon_t6", poseidon_t6),
    ("MerkleTree.VerifyPath_depth29", merkle_verify_path_29),
    ("JubJub.scalarMult", jubjub_scalar_mult),
    ("wNAF.scalarMultNAF5", jubjub_scalar_mult_naf5),
    ("EdDSA.Verify", eddsa_verify),
    ("Verifier.Verify_groth16", groth16_verify),
    ("SnarkUtils.PackWords_5words", snarkutils_pack5),
]


def main():
    out = {}
    for name, fn in REPORT:
        try:
            gas = fn()
        except Exception as exc:      # pragma: no cover
            gas = None
            print(json.dumps({"op": name, "error": str(exc)}), flush=True)
            continue
        out[name] = gas
        print(json.dumps({"op": name, "gas": gas}), flush=True)
    path = os.path.join(os.path.dirname(__file__), "..", "GAS_REPORT.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
