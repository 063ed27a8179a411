#!/usr/bin/env python
"""Per-stage wall-time attribution for the split witness map on the real
chip.  block_until_ready returns at enqueue on the axon tunnel, so every
stage is fenced with a 1-element device->host read (np.asarray of a [0,0]
slice), which forces execution of everything enqueued so far.

Usage: python tools/profile_witness_map.py [log2_scale (default 18)]
Needs the .bench_cache/prove_<N>.pkl checkpoint (tools/bench_prove.py).
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from ethsnarks_tpu.ops.fp import Fr


def fence(x):
    leaf = x
    while isinstance(leaf, (tuple, list)):
        leaf = leaf[0]
    np.asarray(leaf[(0,) * (leaf.ndim - 1) + (0,)])


def main():
    log_n = int(sys.argv[1]) if len(sys.argv) > 1 else 18
    from tools.bench_prove import build_circuit
    pb = build_circuit(log_n)
    from ethsnarks_tpu.qap import QAP
    qap = QAP(pb)
    w = [int(v) for v in pb.values]

    wl = Fr.to_limbs_fast(w)
    big = qap._big
    j = qap._split_jits
    n = qap.num_constraints

    m = qap.domain_size

    def run_once(label):
        marks = [(label + ':start', time.perf_counter())]

        def mark(name, x):
            fence(x)
            marks.append((name, time.perf_counter()))

        w_mont = Fr.to_mont_jit(jnp.asarray(wl))
        mark('upload+to_mont', w_mont)
        inputs = w_mont[:, :qap.num_inputs + 1]
        aA = j['upd'](j['mv']['a'](w_mont, *big['a']), inputs, n)
        mark('matvec_a', aA)
        aB = j['mv']['b'](w_mont, *big['b'])
        mark('matvec_b', aB)
        aC = j['mv']['c'](w_mont, *big['c'])
        mark('matvec_c', aC)

        abc = j['cat3'](aA, aB, aC)
        mark('cat3', abc)
        y3 = j['dif'](abc, big['tw_inv'])
        mark('dif3', y3)
        c3 = j['mul3'](y3, big['coset_scale_mi'])
        mark('scale3', c3)
        e3 = j['dit'](c3, big['tw_fwd']).reshape(Fr.L, 3, m)
        mark('dit3', e3)
        h_evals = j['absubc_z'](e3, big['z_inv'])
        mark('absubc_z', h_evals)
        y = j['dif'](h_evals, big['tw_inv'])
        mark('final_dif', y)
        out = j['mul'](y, big['coset_unscale_mi'])
        mark('unscale', out)
        spans = ['%s=%.3fs' % (nm, t - marks[i][1])
                 for i, (nm, t) in enumerate(marks[1:])]
        total = marks[-1][1] - marks[0][1]
        print('[%s total=%.2fs] %s' % (label, total, ' '.join(spans)),
              flush=True)
        return out

    run_once('cold')
    run_once('warm1')
    run_once('warm2')


if __name__ == "__main__":
    sys.exit(main())
