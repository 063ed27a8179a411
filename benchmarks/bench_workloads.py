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


def _time(fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float('inf')
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
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
    xs = _rand_mont((2, B), 2)
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


WORKLOADS = {
    'poseidon1k': bench_poseidon1k,
    'mimc64k': bench_mimc64k,
    'ntt20': bench_ntt20,
    'merkle': bench_merkle,
}


def main():
    names = sys.argv[1:] or list(WORKLOADS)
    for name in names:
        print(json.dumps(WORKLOADS[name]()), flush=True)
    return 0


if __name__ == '__main__':
    sys.exit(main())
