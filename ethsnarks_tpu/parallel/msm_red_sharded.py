"""Production sharded red-core MSM: points sharded over the device mesh.

MSM is additive over point partitions, so each device runs the FULL
single-dispatch dense red pipeline (:func:`ops.msm_red._msm_dense_traced`:
composite-key sort -> dense gather -> halving tree -> pairfold -> window
Horner, on the signed redundant-digit field core) on its local point shard.
The n_dev partial points are then combined one of two ways, selected by the
``combine`` flag:

- ``'device'`` (default on real TPU meshes): the 6 (or 12, G2) tiny
  (RL, 1) leaf planes are ``all_gather``-ed over ICI inside the shard_map
  body and folded with n_dev-1 complete additions on device - no host
  readback beyond the final point.
- ``'host'`` (default on CPU/virtual meshes): per-shard partials return to
  the host and are folded there.  This exists because XLA:CPU kills a
  rendezvous collective when oversubscribed virtual shards reach it >40s
  apart (8 shards time-sharing 2 CI cores) - the heavy per-shard pipeline
  in front of the collective makes that a real hazard, so virtual meshes
  trade one tiny readback for robustness.

This is the TPU-native replacement for the reference's OpenMP-chunked
multi-exp (/root/reference/src/prover_config.hpp:57-85 get_cpu_ranges +
libff multi_exp chunking): where the reference splits point ranges over
threads sharing one memory, we split them over chips and pay one
all_gather of 6 (or 12, G2) tiny (RL, 1) leaves.

Capacity planning is the distribution-free static plan sized for the PER-
SHARD point count (uniform scalars: the Groth16 prover's operating point).
The on-device overflow flag backs it up: on overflow the driver replans
from host digits with exact per-shard capacities (max over shards) and
reruns - same backstop contract as the single-chip driver.
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import NamedSharding, PartitionSpec as P

from ..ops import msm_red
from ..ops.msm_red import (
    _msm_dense_traced, _msm_scan_accum, _leaves, _nest, _cmapf, _padded_add, _g1_consts_red, _g2_b3_red, static_msm_plan, merge_top_window_np, _pow2ceil, _validate_digit_contract)
from .mesh import AXIS


def _window_ks_sharded(b_local, c, digits_merged, n_dev):
    """Exact per-window pow2 capacities = max over shards (every shard runs
    the same executable, so capacities are the per-shard worst case).

    One vectorized bincount over (window, shard, digit) composite keys -
    the python per-(w,d) loop was an O(n_dev * nw) multi-second host stall
    at 2^20-scale replans."""
    import math
    nw, b = digits_merged.shape
    mean = max(1, b_local >> c)
    floor = mean + 4 * int(math.isqrt(mean)) + 8
    per = digits_merged.reshape(nw, n_dev, b_local).astype(np.int64)
    # merged top rows may exceed 2^c; size the per-(w,d) key block to the
    # actual digit range so blocks never collide
    nb = max(1 << c, _pow2ceil(int(per.max()) + 1))
    keys = (np.arange(nw * n_dev, dtype=np.int64)[:, None] * nb
            + per.reshape(nw * n_dev, b_local))
    counts = np.bincount(
        keys.reshape(-1), minlength=nw * n_dev * nb
    ).reshape(nw, n_dev, nb)
    mx_w = counts[:, :, 1:].max(axis=(1, 2))
    ks = []
    for w in range(nw):
        mx = int(mx_w[w])
        need = max(mx + 4 * int(math.isqrt(mx)) + 8, floor) \
            if mx > floor else floor
        ks.append(_pow2ceil(need))
    return ks


class ShardedRedMSM:
    """points+digits sharded along the batch axis; replicated host result.

    One instance per (mesh, total point count, window bits, group); the
    shard_map executable is built once and reused across calls (the
    prover's device-resident key shards stay put)."""

    def __init__(self, mesh, b, c, g2=False, max_lanes=1 << 23,
                 combine='auto'):
        self.mesh = mesh
        self.n_dev = int(np.prod(mesh.devices.shape))
        assert b % self.n_dev == 0, (b, self.n_dev)
        self.b = b
        self.b_local = b // self.n_dev
        self.c = c
        self.g2 = g2
        self.max_lanes = max_lanes
        assert combine in ('auto', 'host', 'device')
        platform = mesh.devices.flat[0].platform
        if combine == 'auto':
            combine = 'device' if platform == 'tpu' else 'host'
        self.combine = combine
        # Off-TPU small shards use the exact scan-accumulate pipeline: one
        # point-formula body -> seconds of XLA:CPU compile instead of
        # minutes (see ops.msm_red._msm_scan_accum), and no overflow /
        # replan machinery at all.  The TPU production path keeps the
        # dense single-dispatch pipeline + Pallas kernels.
        self.scan_mode = (platform != 'tpu' and self.b_local <= 4096)
        self.plan = (None if self.scan_mode
                     else static_msm_plan(self.b_local, c, max_lanes))
        self.nw_full = (254 + c - 1) // c
        self._fn = self._build(self.plan)
        self._exact_plan = None
        self._exact_fn = None
        self._dig_shard = NamedSharding(mesh, P(None, AXIS))

    def _build(self, plan):
        g2 = self.g2
        b_local, c = self.b_local, self.c
        n_dev = self.n_dev
        on_device = self.combine == 'device'

        scan_mode = self.scan_mode

        def local(points, dm, dt):
            if scan_mode:
                res, ovf = _msm_scan_accum(points, dm, b_local, c, g2)
            else:
                res, ovf = _msm_dense_traced(
                    points, dm, dt, b_local, c, g2, plan['main_nw'],
                    plan['n_groups'], plan['main_k'], plan['tail_start'],
                    plan['tail_nw'], plan['tail_k'], plan['tc'])
            if on_device:
                # Real-hardware path: all_gather the 6 (12, G2) tiny
                # (RL, 1) leaf planes over ICI and fold with n_dev-1
                # complete additions; every shard computes the identical
                # replicated result (one final point, no host combine).
                gathered = [
                    lax.all_gather(x, AXIS, axis=1, tiled=True)
                    for x in _leaves(res, g2)]
                consts = jnp.asarray(_g1_consts_red())
                b3 = jnp.asarray(_g2_b3_red()) if g2 else None
                p = _nest(tuple(x[:, :1] for x in gathered), g2)
                for d in range(1, n_dev):
                    q = _nest(tuple(x[:, d:d + 1] for x in gathered), g2)
                    p = _padded_add(consts, b3, p, q, g2)
                return tuple(_leaves(p, g2)), ovf[None].astype(jnp.int32)
            # Host-combine path: return PER-SHARD partials; NO collective
            # in the body.  A rendezvous collective placed after the heavy
            # per-shard pipeline deadlocks oversubscribed virtual-device
            # meshes (XLA:CPU kills the program when shards reach the
            # rendezvous >40s apart - 8 shards time-share 2 cores in CI).
            # The n_dev partials are a few hundred bytes; the driver
            # combines them on the host (exact, one tunnel readback).
            return tuple(_leaves(res, g2)), ovf[None].astype(jnp.int32)

        n_leaves = 6 if g2 else 3
        if g2:
            pair = (P(None, AXIS), P(None, AXIS))
            pts_spec = (pair,) * 3
        else:
            pts_spec = (P(None, AXIS),) * 3
        leaf_spec = P(None, None) if on_device else P(None, AXIS)
        out_leaves = (leaf_spec,) * n_leaves
        fn = jax.shard_map(
            local, mesh=self.mesh,
            in_specs=(pts_spec, P(None, AXIS), P(None, AXIS)),
            out_specs=(out_leaves, P(AXIS)),
            check_vma=False)
        return jax.jit(fn)

    def shard_points(self, points_red):
        """device_put a red coordinate tuple with the batch axis sharded
        over the mesh (call once; reuse across proofs)."""
        spec = NamedSharding(self.mesh, P(None, AXIS))
        return _cmapf(lambda a: jax.device_put(a, spec), points_red,
                      self.g2)

    def _combine_host(self, leaves):
        """Leaf planes -> one host affine point.  Host-combine mode hands
        (RL, n_dev) per-shard partials (n_dev complete adds here);
        device-combine mode hands the already-folded (RL, 1) result
        (the loop below degenerates to one conversion)."""
        from ..bn254 import add as host_add
        res = _nest(leaves, self.g2)
        from_dev = msm_red.g2_from_red if self.g2 else msm_red.g1_from_red
        out = None
        for p in from_dev(res):
            out = host_add(out, p)
        return out

    def _run_plan(self, points_red, digits, plan, fn):
        dm, dt = merge_top_window_np(digits, self.c, plan)
        return fn(
            points_red, jax.device_put(jnp.asarray(dm), self._dig_shard),
            jax.device_put(jnp.asarray(dt), self._dig_shard))

    def __call__(self, points_red, digits):
        """digits: (ceil(254/c), b) uint32 digit rows (host numpy or
        device); returns a host affine point (None = infinity)."""
        digits = np.asarray(digits)
        # Same host safeguards as the single-chip _dense_red_driver:
        # out-of-contract digits raise instead of silently corrupting.
        _validate_digit_contract(digits, self.c)
        if self.scan_mode:
            # exact for any distribution; no merge, no overflow, no replan
            leaves, _ = self._fn(
                points_red,
                jax.device_put(jnp.asarray(digits), self._dig_shard),
                jax.device_put(
                    jnp.zeros((1, self.b), jnp.uint32), self._dig_shard))
            return self._combine_host(leaves)
        if self._exact_fn is not None:
            # a previous call overflowed the static plan; the cached exact
            # executable covers at least that distribution - try it first
            leaves, ovf = self._run_plan(points_red, digits,
                                         self._exact_plan, self._exact_fn)
            if int(np.asarray(ovf).max()) == 0:
                return self._combine_host(leaves)
        leaves, ovf = self._run_plan(points_red, digits, self.plan,
                                     self._fn)
        if int(np.asarray(ovf).max()) > 0:
            # static plan undershot: replan with exact per-shard capacities
            merged_digits = self._merged(digits)
            exact = _window_ks_sharded(self.b_local, self.c,
                                       merged_digits, self.n_dev)
            if exact == list(self.plan['ks']):
                raise AssertionError(
                    "sharded MSM capacity overflow (plan bug)")
            plan = static_msm_plan(self.b_local, self.c, self.max_lanes,
                                   ks=exact)
            if (1 << self.c) * plan['main_k'] > (1 << 26) or \
                    (plan['tail_nw'] and
                     (1 << plan['tc']) * plan['tail_k'] > (1 << 26)):
                raise ValueError(
                    "sharded MSM exact replan needs a %d x %d dense gather "
                    "(> 2^26 lanes); the scalar distribution is too skewed "
                    "for window bits c=%d - lower c or route the skewed "
                    "scalars (e.g. all-ones bit decompositions) through a "
                    "point sum" % (1 << self.c, plan['main_k'], self.c))
            fn = self._build(plan)
            leaves, ovf = self._run_plan(points_red, digits, plan, fn)
            if int(np.asarray(ovf).max()) > 0:
                raise AssertionError(
                    "sharded MSM capacity overflow after exact replan")
            # cache: later calls with the same skewed distribution reuse
            # the compiled exact executable instead of failing the static
            # plan and recompiling every proof
            self._exact_plan, self._exact_fn = plan, fn
        return self._combine_host(leaves)

    def _merged(self, digits):
        if not self.plan['merged']:
            return digits
        row = digits[-2] + (digits[-1].astype(np.uint32) << self.c)
        return np.concatenate([digits[:-2], row[None]], axis=0)

    def call_device(self, points_red, digits_dev):
        """Device-resident digits ((ceil(254/c), b) uint32, sharded or
        reshardable): merge/split happen as traced jnp ops so the digits
        never cross to the host (the prover's H query).  Falls back to the
        host replan path on overflow."""
        if self.scan_mode:
            leaves, _ = self._fn(
                points_red, digits_dev,
                jax.device_put(
                    jnp.zeros((1, self.b), jnp.uint32), self._dig_shard))
            return self._combine_host(leaves)
        plan = self.plan
        d = digits_dev
        if plan['merged']:
            row = d[-2] + (d[-1].astype(jnp.uint32) << self.c)
            d = jnp.concatenate([d[:-2], row[None]], axis=0)
        m = plan['m']
        dm = d[:m]
        pad_rows = plan['n_groups'] * plan['main_nw'] - m
        if pad_rows:
            dm = jnp.concatenate(
                [dm, jnp.zeros((pad_rows, self.b), d.dtype)])
        dt = (d[m:] if plan['tail_nw']
              else jnp.zeros((1, self.b), d.dtype))
        leaves, ovf = self._fn(points_red, dm, dt)
        if int(np.asarray(ovf).max()) > 0:
            return self(points_red, np.asarray(digits_dev))
        return self._combine_host(leaves)


_CACHE = {}


def get_sharded_msm(mesh, b, c, g2=False, max_lanes=1 << 23,
                    combine='auto'):
    """Cached ShardedRedMSM per (mesh, b, c, group, lane budget, combine).

    Keyed on the Mesh object itself (hashable), not id(mesh) - ids are
    reused after garbage collection and would hand back an executable
    bound to a dead mesh."""
    key = (mesh, b, c, g2, max_lanes, combine)
    if key not in _CACHE:
        _CACHE[key] = ShardedRedMSM(mesh, b, c, g2=g2,
                                    max_lanes=max_lanes, combine=combine)
    return _CACHE[key]
