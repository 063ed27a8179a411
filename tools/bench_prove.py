#!/usr/bin/env python
"""End-to-end Groth16 prove benchmark on the current accelerator.

Builds a MiMC-e7 chain circuit sized to ~2^N constraints (the BASELINE.md
north-star shape: prove time at large constraint counts), runs the trusted
setup ONCE (cached under .bench_cache/, host fixed-base exp), then times
ProverContext.prove (witness map NTT + 4 MSMs on device) and verifies the
proof with the pairing verifier.

Usage: python tools/bench_prove.py [log2_constraints] [reps]
Env:   PROVE_MSM_IMPL = auto|fused|generic (default auto)
       PROVE_STATIC = 1  -> Config(msm_static_plan=True): fully device-
                      resident digit pipeline for all four MSMs (one
                      witness-limb upload per proof)
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

from ethsnarks_tpu.r1cs import ConstraintSystem
from ethsnarks_tpu.gadgets import MiMCe7_gadget
from ethsnarks_tpu.mimc import mimc
from ethsnarks_tpu.groth16 import generator, ProverContext


def build_circuit(log_n):
    """Chain of MiMC-e7 ciphers: digest = E_{k_i}(...E_{k_1}(x)); each link
    is 364 constraints + 1 bind.  Public input: the final digest."""
    target = 1 << log_n
    n_links = max(1, (target - 2) // 365)
    pb = ConstraintSystem()
    digest = pb.allocate('digest')
    pb.set_input_sizes(1)
    x = pb.allocate('x')
    k = pb.allocate('k')
    gadgets = []
    cur = x + 0
    for i in range(n_links):
        g = MiMCe7_gadget(pb, cur, k + 0, 'mimc_%d' % i)
        g.generate_r1cs_constraints()
        gadgets.append(g)
        cur = g.result() + 0
    pb.add_constraint(cur, 1, digest + 0, 'bind')

    pb.setval(x, 777)
    pb.setval(k, 888)
    val = 777
    for g in gadgets:
        g.generate_r1cs_witness()
        val = mimc(val, 888)
    pb.setval(digest, val)
    assert pb.is_satisfied()
    return pb


def main():
    log_n = int(sys.argv[1]) if len(sys.argv) > 1 else 14
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    msm_impl = os.environ.get("PROVE_MSM_IMPL", "auto")

    cache_dir = os.path.join(os.path.dirname(__file__), "..", ".bench_cache")
    os.makedirs(cache_dir, exist_ok=True)
    ckpt = os.path.join(cache_dir, "prove_%d.pkl" % log_n)

    t0 = time.perf_counter()
    pb = build_circuit(log_n)
    n_constraints = len(pb.constraints)
    print(f"circuit: {n_constraints} constraints, "
          f"{time.perf_counter()-t0:.1f}s build", flush=True)

    if os.path.exists(ckpt):
        with open(ckpt, 'rb') as fh:
            keypair = pickle.load(fh)
        print("keypair: loaded from cache", flush=True)
    else:
        t0 = time.perf_counter()
        keypair = generator(pb)
        print(f"keypair: generated in {time.perf_counter()-t0:.1f}s",
              flush=True)
        with open(ckpt, 'wb') as fh:
            pickle.dump(keypair, fh)

    t0 = time.perf_counter()
    from ethsnarks_tpu.groth16 import Config
    config = Config(msm_static_plan=True) \
        if os.environ.get("PROVE_STATIC") == "1" else None
    ctx = ProverContext(keypair.pk, pb, use_device_msm=True,
                        msm_impl=msm_impl, config=config)
    print(f"context: {time.perf_counter()-t0:.1f}s "
          f"(device keys resident)", flush=True)

    t0 = time.perf_counter()
    proof = ctx.prove(pb.values)
    t_first = time.perf_counter() - t0
    ok = keypair.vk.verify(proof)
    print(f"first prove (incl compile): {t_first:.2f}s verified={ok}",
          flush=True)
    if not ok:
        return 1

    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        proof = ctx.prove(pb.values)
        times.append(time.perf_counter() - t0)
    dt = min(times)
    ok = keypair.vk.verify(proof)
    out = {
        "metric": "groth16_prove_sec",
        "value": round(dt, 3),
        "unit": "s (2^%d-scale: %d constraints, msm=%s, %s, verified=%s)" % (
            log_n, n_constraints, msm_impl,
            jax.devices()[0].platform, ok),
        "constraints_per_sec": round(n_constraints / dt, 1),
    }
    print(json.dumps(out), flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
