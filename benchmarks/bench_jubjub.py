#!/usr/bin/env python
"""JubJub scalar-multiplication micro-benchmarks.

Parity with the reference's .appendix/benchmark-jubjub.py (host coordinate
systems, recorded in BASELINE.md) plus the batched device kernel.

Usage: python benchmarks/bench_jubjub.py [batch]
"""
import sys
import time
import random

from ethsnarks_tpu.jubjub import Point, JUBJUB_L, mult_naf_lut

_rng = random.Random(99)


def _time_host(label, fn, n=20):
    t0 = time.perf_counter()
    for _ in range(n):
        fn()
    dt = (time.perf_counter() - t0) / n
    print("%-28s %.5f s/mult" % (label, dt))
    return dt


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    p = Point.generator()
    k = _rng.randrange(JUBJUB_L)

    _time_host("affine", lambda: p.mult(k))
    _time_host("projective", lambda: p.as_proj().mult(k))
    _time_host("etec", lambda: p.as_etec().mult(k))
    _time_host("etec wNAF w=5", lambda: mult_naf_lut(p.as_etec(), k, 5))

    # batched device variable-base mult
    import numpy as np
    import jax
    import jax.numpy as jnp
    from ethsnarks_tpu.ops import jubjub_ops as jj

    pts = [p * (i + 1) for i in range(batch)]
    bits = np.zeros((254, batch), dtype=np.uint32)
    for b in range(batch):
        s = _rng.randrange(JUBJUB_L)
        for i in range(254):
            bits[i, b] = (s >> i) & 1
    dev = jj.point_to_device(pts)
    fn = jax.jit(jj.scalar_mult_bits)
    out = fn(dev, jnp.asarray(bits))
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = fn(dev, jnp.asarray(bits))
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    print("%-28s %.7f s/mult (batch %d, %s)" % (
        "device etec batched", dt / batch, batch, jax.default_backend()))


if __name__ == "__main__":
    main()
