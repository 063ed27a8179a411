#!/usr/bin/env python
"""BASELINE.md config workloads on the current accelerator.

Workloads (BASELINE.json "configs"):
  poseidon1k   - Poseidon t=6 permutation, batch 1k
  mimc64k      - MiMC-e7 + Miyaguchi-Preneel hash, batch 64k messages
  ntt20        - NTT round trip at 2^20 (witness-map building block)
  merkle       - depth-29 batched Merkle witness traces

Usage: python benchmarks/bench_workloads.py [workload ...]
Prints one JSON line per workload.
"""
import json
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from ethsnarks_tpu.ops.fp import Fr
from ethsnarks_tpu.field import SNARK_SCALAR_FIELD

P = SNARK_SCALAR_FIELD


def _rand_mont(shape, seed):
    rng = np.random.default_rng(seed)
    vals = rng.integers(0, 1 << 62, size=int(np.prod(shape)), dtype=np.int64)
    return jnp.asarray(Fr.to_mont_jit(
        Fr.to_limbs_fast(vals.astype(object)))).reshape((Fr.L,) + tuple(shape))


def _sync(out):
    # On the axon tunnel block_until_ready returns at ENQUEUE; a (tiny)
    # host read is the only real fence.  Read one element of one leaf.
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf[(0,) * leaf.ndim])
    return out


def _time(fn, *args, reps=5):
    _sync(fn(*args))
    best = float('inf')
    for _ in range(reps):
        t0 = time.perf_counter()
        _sync(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def bench_poseidon1k():
    from ethsnarks_tpu.ops.poseidon_ops import poseidon_permutation
    B = 1024
    state = _rand_mont((6, B), 1)
    fn = jax.jit(poseidon_permutation)
    dt = _time(fn, state)
    return {"metric": "poseidon_perms_per_sec", "value": round(B / dt, 1),
            "unit": "perm/s (t=6, batch %d, %s)" % (B, jax.default_backend()),
            "vs_baseline": round((B / dt) / 20000.0, 4)}


def bench_mimc64k():
    from ethsnarks_tpu.ops.mimc import mimc_hash_batch
    B = 65536
    xs = jnp.moveaxis(_rand_mont((2, B), 2), 1, 0)   # (n_msgs, L, B)
    k = _rand_mont((B,), 3)
    fn = jax.jit(mimc_hash_batch)
    dt = _time(fn, xs, k)
    return {"metric": "mimc_mp_hashes_per_sec", "value": round(B / dt, 1),
            "unit": "hash/s (e7 2-block MP, batch %d, %s)" % (
                B, jax.default_backend()),
            "vs_baseline": round((B / dt) / 100000.0, 4)}


def bench_ntt20():
    from ethsnarks_tpu.ops.ntt import get_domain
    m = 1 << 20
    d = get_domain(m)
    x = _rand_mont((m,), 4)
    fwd = jax.jit(d.ifft_evals_to_coeffs_bitrev)
    inv = jax.jit(d.fft_coeffs_bitrev_to_evals)
    dt = _time(lambda a: inv(fwd(a)), x)
    butterflies = 2 * (m // 2) * 20
    return {"metric": "ntt_butterflies_per_sec",
            "value": round(butterflies / dt, 1),
            "unit": "butterfly/s (2x 2^20 radix-2, %s)" % jax.default_backend(),
            "vs_baseline": round((butterflies / dt) / 1e8, 4)}


def bench_merkle():
    from ethsnarks_tpu.ops.mimc import mimc_mp_witness_device
    B = 1024
    left = _rand_mont((B,), 5)
    right = _rand_mont((B,), 6)
    iv = _rand_mont((B,), 7)
    fn = jax.jit(mimc_mp_witness_device)
    dt = _time(fn, left, right, iv)
    return {"metric": "merkle_node_traces_per_sec",
            "value": round(B / dt, 1),
            "unit": "node/s (MiMC-MP witness trace, batch %d, %s)" % (
                B, jax.default_backend()),
            "vs_baseline": round((B / dt) / 50000.0, 4)}


def bench_eddsa16k():
    """EdDSA+Pedersen verify, batch 16k (BASELINE config row 3).

    256 DISTINCT host-signed messages tiled x64 (cf. bench.py's distinct-
    point rule: values are runtime data, so tiling keeps per-lane compute
    honest while host signing stays tractable).  Host prep (bit unpack,
    point conversion) is one-time and excluded; the timed region is the
    jitted full verify (fixed-base s*B, batched Pedersen RAM hash,
    variable-base t*A, projective compare) including a device round-trip.
    vs_baseline anchor: 2e3 verifies/s, an order-of-magnitude multicore-
    CPU rate for C++ EdDSA open (reference eddsa_open builds a throwaway
    protoboard per signature - far slower; anchor is deliberately the
    stronger plain-crypto rate)."""
    import pickle
    from ethsnarks_tpu.eddsa import PureEdDSA
    from ethsnarks_tpu.ops import eddsa_ops
    from ethsnarks_tpu.ops import jubjub_ops as jj

    B, n_base = 16384, 256
    cache = os.path.join(os.path.dirname(__file__), "..", ".bench_cache")
    os.makedirs(cache, exist_ok=True)
    ckpt = os.path.join(cache, "eddsa_%d.pkl" % n_base)
    if os.path.exists(ckpt):
        with open(ckpt, 'rb') as fh:
            batch = pickle.load(fh)
    else:
        rng = np.random.default_rng(99)
        batch = []
        for i in range(n_base):
            k, A = PureEdDSA.random_keypair()
            msg = bytes(int(x) for x in rng.integers(0, 256, 32))
            sm = PureEdDSA.sign(msg, k)
            batch.append((A, (sm.sig.R, int(sm.sig.s)), msg))
        with open(ckpt, 'wb') as fh:
            pickle.dump(batch, fh)

    reps_tile = B // n_base
    As = [b[0] for b in batch] * reps_tile
    sigs = [b[1] for b in batch] * reps_tile
    msgs = [b[2] for b in batch] * reps_tile

    # one-time host prep (mirrors eddsa_verify_batch, which is the public
    # API pinned by tests/test_ops_jubjub.py)
    a_dev = jj.point_to_device(As)
    r_dev = jj.point_to_device([s[0] for s in sigs])
    s_bits = np.zeros((254, B), dtype=np.uint32)
    for b, sig in enumerate(sigs):
        s = int(sig[1])
        for i in range(254):
            s_bits[i, b] = (s >> i) & 1
    msg_bits = eddsa_ops._msg_bits_device(msgs)
    sb = jnp.asarray(s_bits)
    mb = jnp.asarray(msg_bits)
    fn = eddsa_ops._eddsa_verify_jit
    ok = np.asarray(fn(a_dev, r_dev, sb, mb))
    assert ok.all(), "eddsa16k: a valid signature failed device verify"
    dt = _time(fn, a_dev, r_dev, sb, mb)
    return {"metric": "eddsa_verifies_per_sec", "value": round(B / dt, 1),
            "unit": "verify/s (PureEdDSA+Pedersen, batch %d, %s)" % (
                B, jax.default_backend()),
            "vs_baseline": round((B / dt) / 2000.0, 4)}


def bench_sha256_preimage():
    """SHA256-preimage Groth16 prove (~55k constraints, BASELINE config
    row 4): private 512-bit preimage, public digest packed into two field
    elements, sha256_many circuit with the batched device witness trace
    (models.sha256_batch - the master-instance analog), end-to-end device
    prove.  vs_baseline anchor: 1e5 constraints/s, an order-of-magnitude
    multicore libsnark/mcl prover rate (BASELINE.md publishes no absolute
    number)."""
    import pickle
    from ethsnarks_tpu.models.sha256_batch import BatchSha256
    from ethsnarks_tpu.groth16 import generator, ProverContext

    data = bytes(range(64))
    model = BatchSha256(1, n_bits=512)
    model.set_witness([data])
    pb = model.pb
    assert pb.is_satisfied()
    n = len(pb.constraints)

    cache = os.path.join(os.path.dirname(__file__), "..", ".bench_cache")
    os.makedirs(cache, exist_ok=True)
    # Key the cached keypair by the circuit's constraint count so a gadget
    # change regenerates keys instead of reusing a stale pair.
    ckpt = os.path.join(cache, "sha256_preimage_%d.pkl" % n)
    if os.path.exists(ckpt):
        with open(ckpt, 'rb') as fh:
            keypair = pickle.load(fh)
    else:
        keypair = generator(pb)
        with open(ckpt, 'wb') as fh:
            pickle.dump(keypair, fh)

    ctx = ProverContext(keypair.pk, pb)
    proof = ctx.prove(pb.values)         # warm-up incl. compile
    assert keypair.vk.verify(proof), "sha256 preimage proof failed"
    best = float('inf')
    for _ in range(3):
        t0 = time.perf_counter()
        proof = ctx.prove(pb.values)
        best = min(best, time.perf_counter() - t0)
    assert keypair.vk.verify(proof)
    return {"metric": "sha256_preimage_prove_sec", "value": round(best, 3),
            "unit": "s (%d constraints, verified, %s)" % (
                n, jax.default_backend()),
            "vs_baseline": round((n / best) / 1e5, 4)}


WORKLOADS = {
    'poseidon1k': bench_poseidon1k,
    'mimc64k': bench_mimc64k,
    'ntt20': bench_ntt20,
    'merkle': bench_merkle,
    'eddsa16k': bench_eddsa16k,
    'sha256_preimage': bench_sha256_preimage,
}


def main():
    names = sys.argv[1:] or list(WORKLOADS)
    out = os.environ.get("WORKLOADS_OUT")
    results = {}
    for name in names:
        try:
            row = WORKLOADS[name]()
        except Exception as exc:
            row = {"metric": name, "error": str(exc)}
        results[name] = row
        print(json.dumps(row), flush=True)
        if out:
            # write after EVERY workload: a timeout mid-suite must not
            # lose the rows already measured
            with open(out, "w") as fh:
                json.dump(results, fh, indent=1, sort_keys=True)
    return 0 if all("error" not in r for r in results.values()) else 1


if __name__ == '__main__':
    sys.exit(main())
