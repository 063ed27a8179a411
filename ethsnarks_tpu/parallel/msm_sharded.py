"""Sharded Pippenger MSM: points/scalars split across the mesh.

Each device runs the full bucket pipeline (:func:`ops.msm._msm_core`) on its
point shard, then the n partial projective points are all-gathered over ICI
and tree-combined with complete additions (EC addition is not a ``psum``-able
monoid over raw limbs, so the combine happens explicitly on gathered
points - n is the device count, so this is negligible work).
"""


import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import PartitionSpec as P

from ..ops import msm as msm_ops
from ..ops.curve import G1F, G2F, point_add
from .mesh import AXIS


def _combine_partials(F, p):
    """p: pytree with a LEADING gathered axis n (from all_gather) ->
    tree-reduced single point.  The gathered axis is moved behind the limb
    axis so the field kernels see their usual limb-first layout."""
    p = jax.tree_util.tree_map(lambda a: jnp.moveaxis(a, 0, -1), p)
    n = jax.tree_util.tree_leaves(p)[0].shape[-1]
    while n > 1:
        half = n // 2
        lo = jax.tree_util.tree_map(lambda a: a[..., :half], p)
        hi = jax.tree_util.tree_map(lambda a: a[..., half:2 * half], p)
        merged = point_add(F, lo, hi)
        if n % 2:
            tail = jax.tree_util.tree_map(lambda a: a[..., -1:], p)
            merged = jax.tree_util.tree_map(
                lambda m, t: jnp.concatenate([m, t], axis=-1), merged, tail)
            n = half + 1
        else:
            n = half
        p = merged
    return jax.tree_util.tree_map(lambda a: a[..., 0], p)


def make_sharded_msm(mesh, field_kind='g1', c=13):
    """Returns a jitted fn(points_dev, digits) with batch sharded over the
    mesh; output is a replicated single projective point (trailing axis 1)."""
    F = G1F if field_kind == 'g1' else G2F

    def local(points, digits):
        acc = msm_ops._msm_core(F, points, digits, c)
        gathered = jax.tree_util.tree_map(
            lambda a: lax.all_gather(a, AXIS), acc)
        return _combine_partials(F, gathered)

    if field_kind == 'g1':
        in_specs = ((P(None, AXIS),) * 3, P(None, AXIS))
        out_specs = (P(), P(), P())
    else:
        pair = (P(None, AXIS), P(None, AXIS))
        in_specs = ((pair,) * 3, P(None, AXIS))
        out_specs = ((P(), P()),) * 3

    # check_vma=False: after all_gather + identical tree-combine the output
    # IS replicated, but the vma tracker cannot prove it.
    fn = jax.shard_map(local, mesh=mesh, in_specs=in_specs,
                       out_specs=out_specs, check_vma=False)
    return jax.jit(fn)
