#!/usr/bin/env python
"""Benchmark driver: MSM G1 points/sec/chip (the north-star metric).

Runs on whatever accelerator JAX finds (the axon TPU in CI).  Prints ONE
JSON line: {"metric", "value", "unit", "vs_baseline"}.

The reference publishes no absolute numbers (BASELINE.md); vs_baseline is
normalized against 1.0e6 points/sec, a representative multicore-CPU
libsnark/mcl Pippenger rate for 2^20-point BN254 G1 MSMs (order-of-magnitude
anchor, documented in BASELINE.md table: prover asymptotics row).

Env knobs:
  BENCH_MSM_SIZE   log2 number of points (default 20 - the north-star
                   shape; measured r3: 171,929 pts/s correct=True at
                   c=13.  First compiles of a new shape take minutes on
                   the axon remote-compile service; the repo ships a warm
                   .jax_cache)
  BENCH_MSM_C      Pippenger window bits (default "auto" = msm_red.best_c)
  BENCH_REPS       timed repetitions (default 3)
  BENCH_COMPILE_BUDGET  auto-probe subprocess timeout, seconds (default
                   1800: the 2^20 host-side setup alone is minutes)
"""

import json
import os
import sys
import time

import numpy as np

# Use the default platform (TPU when present). Do NOT force CPU here.
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from ethsnarks_tpu.ops import msm as msm_ops
from ethsnarks_tpu.bn254 import G1_GEN, CURVE_ORDER, multiply, add


BASELINE_POINTS_PER_SEC = 1.0e6


def main():
    log_n = int(os.environ.get("BENCH_MSM_SIZE", "20"))
    c_env = os.environ.get("BENCH_MSM_C", "auto")
    if c_env == "auto":
        from ethsnarks_tpu.ops.msm_red import best_c
        c = best_c(1 << log_n)
    else:
        c = int(c_env)
    reps = int(os.environ.get("BENCH_REPS", "3"))
    n = 1 << log_n

    # Points: 256 DISTINCT points tiled across n lanes.  (A broadcast of one
    # point lets XLA's algebraic simplifier collapse the whole MSM to
    # width-1 compute - measured "half a billion points/s" that way - so the
    # point array must be materialized with distinct values.)  The result
    # stays exactly checkable: sum_i s_i P_(i mod 256) = sum_j c_j P_j with
    # c_j = sum of that residue class's scalars.
    from ethsnarks_tpu.ops import curve as curve_ops
    n_base = 256
    base_pts = [multiply(G1_GEN, j + 1) for j in range(n_base)]
    base_dev = curve_ops.g1_to_device(base_pts)
    reps_tile = n // n_base
    points = tuple(jnp.tile(jnp.asarray(cd), (1, reps_tile))
                   for cd in base_dev)

    rng = np.random.default_rng(12345)
    # Scalars uniform in [0, r): 256-bit draws reduced mod r (vectorized
    # object math, ~9 passes), then the SAME decomposition the prover uses
    # (window_digits_host_np) so the digit rows honor msm_red's contract
    # (every row < 2^c, top row < 2^(254-(nw-1)*c)).  Round 2's ad-hoc
    # extraction emitted out-of-contract top digits at c=11 and published
    # a correct=False number - never hand-roll the decomposition here.
    words = rng.integers(0, 1 << 32, size=(n, 8), dtype=np.uint64)
    scalars_obj = np.zeros(n, dtype=object)
    for k in range(8):
        scalars_obj = (scalars_obj << 32) | words[:, k].astype(object)
    scalars_obj %= CURVE_ORDER
    digits = msm_ops.window_digits_host_np(scalars_obj, c)
    class_sums = [0] * n_base
    for j in range(n_base):
        class_sums[j] = int(scalars_obj[j::n_base].sum()) % CURVE_ORDER

    digits_dev = jnp.asarray(digits)
    # "auto": probe the red-core single-dispatch executable in a SUBPROCESS
    # with a hard timeout (a blocked remote compile cannot be preempted by
    # signals in-process), falling back to the v1 fused dense path, then the
    # chunked path.  The subprocess probe is cheap when the executable is
    # already in the persistent cache.
    mode = os.environ.get("BENCH_MSM_MODE", "auto")
    if mode == "auto":
        import subprocess
        budget = int(os.environ.get("BENCH_COMPILE_BUDGET", "1800"))
        fail_line = None
        for probe_mode in ("red", "fused"):
            env = dict(os.environ)
            env["BENCH_MSM_MODE"] = probe_mode
            if probe_mode == "fused":
                # the v1 fused fold kernel needs c <= 10 (VMEM)
                env["BENCH_MSM_C"] = str(min(c, 10))
            try:
                probe = subprocess.run(
                    [sys.executable, os.path.abspath(__file__)],
                    env=env, timeout=budget, capture_output=True, text=True)
            except subprocess.TimeoutExpired:
                continue
            line = next((l for l in probe.stdout.splitlines()
                         if l.startswith('{"metric"')), None)
            # Publish a probe's number ONLY if the probe also exited 0
            # (its own correctness check passed).  Round 2 published a
            # correct=False run by ignoring the exit code here.
            if line and probe.returncode == 0:
                print(line)
                return 0
            if line:
                fail_line = line
        if fail_line is not None:
            # every probe failed its correctness check: publish the failing
            # number honestly and fail the bench
            print(fail_line)
            return 1
        mode = "chunked"

    from ethsnarks_tpu.ops import curve as curve_ops

    def run_red():
        # Red-core (signed redundant digits) dense MSM: whole MSM in one
        # device dispatch (ops/msm_red.py).  Digits live on device and the
        # plan is the distribution-free static one - the prover's
        # operating point (H query always; A/B/L with
        # Config(msm_static_plan=True)): the timed region is dispatch +
        # device pipeline + result readback, not the per-call re-upload
        # of an 84MB digit matrix (2^20) over the tunnel.
        from ethsnarks_tpu.ops import msm_red
        base_red = msm_red.g1_to_red(base_pts)
        pts_red = tuple(jnp.tile(a, (1, reps_tile)) for a in base_red)
        ddev = jax.device_put(jnp.asarray(digits))
        jax.block_until_ready(ddev)
        r = msm_red.msm_g1_dense_red(pts_red, ddev, c,
                                     static_plan=True)      # compile
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            r = msm_red.msm_g1_dense_red(pts_red, ddev, c,
                                         static_plan=True)
            times.append(time.perf_counter() - t0)
        return r, min(times), "red-dense-static"

    def run_fused():
        # Dense all-windows fused Pallas MSM (grouped single-dispatch
        # pipelines; host-to-host timing includes every transfer).
        from ethsnarks_tpu.ops import pallas_msm
        r = pallas_msm.msm_g1_dense_allwin(points, digits, c)  # compile
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            r = pallas_msm.msm_g1_dense_allwin(points, digits, c)
            times.append(time.perf_counter() - t0)
        return r, min(times), "fused-dense"

    def run_monolithic():
        run = msm_ops._jit_msm('g1', c)
        res = run(points, digits_dev)          # warmup/compile
        jax.block_until_ready(res)
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            r = run(points, digits_dev)
            # Time through a host transfer: on the axon tunnel,
            # block_until_ready can return at enqueue time.
            _sync = [np.asarray(coord) for coord in r]
            times.append(time.perf_counter() - t0)
        return curve_ops.g1_from_device(r)[0], min(times), "monolithic"

    def run_chunked():
        # warm the chunk executable
        got = msm_ops.msm_g1_chunked(points, digits, c, chunk=512)
        t0 = time.perf_counter()
        got = msm_ops.msm_g1_chunked(points, digits, c, chunk=512)
        return got, time.perf_counter() - t0, "chunked512"

    got = None
    if mode == "red":
        got, dt, used = run_red()
    elif mode == "fused":
        got, dt, used = run_fused()
    elif mode == "monolithic":
        got, dt, used = run_monolithic()
    if got is None:
        got, dt, used = run_chunked()

    want = None
    for j in range(n_base):
        want = add(want, multiply(base_pts[j], class_sums[j]))
    ok = (got == want)

    pps = n / dt

    # Roofline accounting (model, not measurement): the dense pipeline's
    # point-add lanes are ~2n per window for the halving tree (capacity
    # k ~ 2*mean lanes per bucket slot) + ~2*2^c pairfold lanes per window
    # + the 128-lane-ballast window Horner.  One complete G1 add on the red
    # core costs ~47k int32 VPU ops/lane (12 rmul @ ~3.8k ops - 1221 lane
    # muls + relaxes/folds - plus 2 mul_small + 15 lazy add/sub).  Peak
    # int32 VPU throughput on v5e ~ 8x128 lanes x 4 ALUs x ~1.5 GHz
    # ~ 6.1e12 ops/s (clock inferred from the published 197 bf16 TFLOP/s).
    n_windows = (254 + c - 1) // c
    g1_add_ops = 47000.0
    point_add_lanes = (2 * n * n_windows + 2 * (1 << c) * n_windows
                       + (c + 1) * n_windows * 128)
    model_ops = point_add_lanes * g1_add_ops
    vpu_peak = 6.1e12
    vpu_util = model_ops / dt / vpu_peak

    out = {
        "metric": "msm_g1_points_per_sec_per_chip",
        "value": round(pps, 1),
        "unit": "points/s (2^%d points, c=%d, %s, %s, correct=%s)" % (
            log_n, c, used, jax.devices()[0].platform, ok),
        "vs_baseline": round(pps / BASELINE_POINTS_PER_SEC, 4),
        "model_int32_gops_per_s": round(model_ops / dt / 1e9, 1),
        "vpu_util_pct": round(100 * vpu_util, 2),
    }
    print(json.dumps(out))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
