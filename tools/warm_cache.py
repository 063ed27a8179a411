#!/usr/bin/env python
"""Prime the persistent compile cache for the standard bench/prover shapes.

Run after any kernel or field-core change so the driver's end-of-round
bench (and the next prove campaign) hit warm executables instead of
multi-minute remote compiles.  Each step is independently skippable with
a hard timeout; progress prints one line per shape.

Usage: python tools/warm_cache.py [step ...]
Steps (default all): msm20 msm16 wm16 wm18 g2small
"""
import os
import subprocess
import sys
import time

ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))

STEPS = {
    # the official bench shape (2^20, auto c): exactly what the driver runs
    "msm20": [sys.executable, "bench.py"],
    "msm16": [sys.executable, "bench.py"],
    # witness-map split jits at the prove campaign domains
    "wm16": [sys.executable, "tools/bench_prove.py", "16", "1"],
    "wm18": [sys.executable, "tools/bench_prove.py", "18", "1"],
    # a small red G2 executable (the prover's B query at 2^16 scale)
    "g2small": [sys.executable, "tools/bench_msm_g2.py", "14", "1"],
}

ENVS = {
    "msm16": {"BENCH_MSM_SIZE": "16", "BENCH_REPS": "1"},
    "msm20": {"BENCH_REPS": "1"},
    "wm16": {"PROVE_STATIC": "1"},
    "wm18": {"PROVE_STATIC": "1"},
}

BUDGET = int(os.environ.get("WARM_CACHE_BUDGET", "3000"))


def main():
    names = sys.argv[1:] or list(STEPS)
    failures = []
    for name in names:
        cmd = STEPS[name]
        env = dict(os.environ)
        env.update(ENVS.get(name, {}))
        t0 = time.time()
        try:
            rc = subprocess.run(cmd, cwd=ROOT, env=env,
                                timeout=BUDGET).returncode
        except subprocess.TimeoutExpired:
            rc = 124
        print("[warm_cache] %s: rc=%d (%.0fs)" % (name, rc,
                                                  time.time() - t0),
              flush=True)
        if rc != 0:
            failures.append(name)
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
