"""VPU cost-model probe: relative throughput of u32 mul / add / shift / f32.

Informs the field-mul limb-scheme choice (13x20 schoolbook vs CIOS vs 16-bit
split): if int32 multiply is much more expensive than add/shift, mul-count
reduction wins; if they cost the same, total-row-op reduction wins.

Each probe is ONE pallas kernel: fori_loop(ITERS) over a chain of CHAIN ops
on an (ROWS, LANES) block resident in VMEM.  Timing goes through a host
transfer (block_until_ready returns at enqueue on the axon tunnel).
"""
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS = 32
LANES = 1024
ITERS = 256
CHAIN = 16


def mk_kernel(op, dtype):
    def kernel(x, y, o):
        a = x[:]
        b = y[:]

        def step(_, a):
            for _ in range(CHAIN):
                a = op(a, b)
            return a

        o[:] = jax.lax.fori_loop(0, ITERS, step, a)

    spec = pl.BlockSpec((ROWS, LANES), lambda: (0, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel, in_specs=[spec, spec], out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((ROWS, LANES), dtype))


OPS = {
    'u32_mul': (lambda a, b: a * b, jnp.uint32),
    'u32_add': (lambda a, b: a + b, jnp.uint32),
    'u32_mul_add': (lambda a, b: a * b + b, jnp.uint32),
    'u32_shr13_and': (lambda a, b: (a >> 13) & jnp.uint32(8191), jnp.uint32),
    'u32_cmp_sel': (lambda a, b: jnp.where(a > b, a, b), jnp.uint32),
    'i32_mul': (lambda a, b: a * b, jnp.int32),
    'f32_fma': (lambda a, b: a * b + b, jnp.float32),
}


def main():
    print(jax.devices())
    results = {}
    for name, (op, dtype) in OPS.items():
        if dtype == jnp.float32:
            x = jnp.asarray(np.random.rand(ROWS, LANES), dtype)
            y = jnp.asarray(np.random.rand(ROWS, LANES), dtype)
        else:
            x = jnp.asarray(
                np.random.randint(1, 8191, (ROWS, LANES)), dtype)
            y = jnp.asarray(
                np.random.randint(1, 8191, (ROWS, LANES)), dtype)
        fn = jax.jit(lambda x, y, f=mk_kernel(op, dtype): f(x, y))
        np.asarray(fn(x, y))  # compile+warm
        n_rep = 8
        t0 = time.perf_counter()
        for _ in range(n_rep):
            r = fn(x, y)
        np.asarray(r)
        dt = (time.perf_counter() - t0) / n_rep
        n_ops = ROWS * LANES * ITERS * CHAIN
        results[name] = n_ops / dt / 1e9
        print(f"{name:16s} {results[name]:8.1f} Gop/s")
    base = results['u32_add']
    for name, v in results.items():
        print(f"{name:16s} {base / v:6.2f}x cost vs u32_add")


if __name__ == '__main__':
    main()
