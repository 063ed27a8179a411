#!/usr/bin/env python
"""The flagship bit-exact target: depth-29 MiMC Merkle membership
(Miximus-style) at ~2^20 constraints, proven end-to-end on the chip and
checked by BOTH acceptors:

  - verifier.py (the pairing verifier / NativeVerifier twin), and
  - the unmodified Verifier.sol behavior twin executed in the mini-EVM.

BASELINE.md target row "depth-29 MiMC Merkle membership"; circuit =
models.merkle_batch.BatchMerkleMembership(29, N) with the batched device
witness trace.  N=48 -> 1,020,385 constraints (domain 2^20), so the
prover reuses the 2^20-campaign G1 executables.

Usage: python tools/bench_merkle_prove.py [n_proofs=48] [reps=2]
"""
import json
import os
import pickle
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def main():
    n_proofs = int(sys.argv[1]) if len(sys.argv) > 1 else 48
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2

    from ethsnarks_tpu.merkletree import MerkleTree
    from ethsnarks_tpu.models.merkle_batch import BatchMerkleMembership
    from ethsnarks_tpu.groth16 import generator, ProverContext, Config

    t0 = time.perf_counter()
    model = BatchMerkleMembership(depth=29, n_proofs=n_proofs)
    n = len(model.pb.constraints)
    print("circuit: %d constraints (%d proofs x depth 29), %.1fs build"
          % (n, n_proofs, time.perf_counter() - t0), flush=True)

    # Populate a realistic leaf neighborhood and prove WELL-SEPARATED
    # indices: 48 proofs over a 64-leaf cluster share all path nodes
    # above level 6, and ~1100 equal-valued witness scalars per shared
    # node explode the exact Pippenger bucket capacities (measured: 8GB
    # G2 gather slab -> compile OOM).  Miximus-style usage proves
    # distinct, spread deposits; model that.
    n_leaves = 4096
    tree = MerkleTree(1 << 29)
    for i in range(n_leaves):
        tree.append(int(1234567 + i * 7919))
    t0 = time.perf_counter()
    model.set_witness(tree, [i * (n_leaves // max(1, n_proofs)) + 1
                             for i in range(n_proofs)])
    assert model.pb.is_satisfied()
    print("witness: %.1fs (batched device trace, satisfied)"
          % (time.perf_counter() - t0), flush=True)

    cache = os.path.join(os.path.dirname(__file__), "..", ".bench_cache")
    os.makedirs(cache, exist_ok=True)
    ckpt = os.path.join(cache, "merkle29_%d_%d.pkl" % (n_proofs, n))
    if os.path.exists(ckpt):
        with open(ckpt, 'rb') as fh:
            keypair = pickle.load(fh)
        print("keypair: loaded from cache", flush=True)
    else:
        t0 = time.perf_counter()
        keypair = generator(model.pb)
        setup_sec = time.perf_counter() - t0
        print("keypair: generated in %.1fs" % setup_sec, flush=True)
        with open(ckpt, 'wb') as fh:
            pickle.dump(keypair, fh)

    t0 = time.perf_counter()
    ctx = ProverContext(keypair.pk, model.pb,
                        config=Config(msm_static_plan=True))
    print("context: %.1fs" % (time.perf_counter() - t0), flush=True)

    t0 = time.perf_counter()
    proof = ctx.prove(model.pb.values)
    print("first prove (incl compile): %.1fs"
          % (time.perf_counter() - t0), flush=True)
    assert keypair.vk.verify(proof), "pairing verifier rejected"

    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        proof = ctx.prove(model.pb.values)
        times.append(time.perf_counter() - t0)
    dt = min(times)
    ok_py = keypair.vk.verify(proof)

    # the Verifier.sol twin executed in the mini-EVM
    from ethsnarks_tpu.evm_verifier import evm_verify
    from ethsnarks_tpu.verifier import Proof
    ok_evm = evm_verify(keypair.vk, proof)
    bad = Proof(proof.A, proof.B, proof.C,
                [(int(proof.input[0]) + 1) % (1 << 253)]
                + list(proof.input[1:]))
    try:
        tampered_rejected = not evm_verify(keypair.vk, bad)
    except Exception:
        tampered_rejected = True

    out = {
        "metric": "merkle29_prove_sec",
        "value": round(dt, 3),
        "unit": "s (depth-29 Merkle x%d, %d constraints, %s)" % (
            n_proofs, n, jax.devices()[0].platform),
        "constraints_per_sec": round(n / dt, 1),
        "verified_verifier_py": bool(ok_py),
        "verified_evm_twin": bool(ok_evm),
        "tampered_rejected": bool(tampered_rejected),
    }
    print(json.dumps(out), flush=True)
    return 0 if (ok_py and ok_evm and tampered_rejected) else 1


if __name__ == "__main__":
    sys.exit(main())
