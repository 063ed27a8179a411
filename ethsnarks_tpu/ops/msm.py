"""Pippenger multi-scalar multiplication on TPU (the prover's money kernel).

Replaces the fork-libsnark ``kc_multi_exp_with_mixed_addition<BDLO12>``
(reference hot path, tcc:487-531).  The data-dependent bucket scatter that
Pippenger needs is hostile to XLA, so bucket accumulation is restructured as
(per window, all under one jit):

 1. sort point indices by their c-bit window digit (``lax.sort_key_val``),
 2. gather points into digit order,
 3. one segmented inclusive scan (``lax.associative_scan``) whose monoid is
    "add points while the digit is unchanged" - complete RCB15 additions make
    the combine branch-free, and sortedness makes the operator associative,
 4. scatter each run's last element into its bucket slot,
 5. weighted bucket reduction  sum_b b*S_b  via c bit-plane masked tree
    reductions + a Horner fold (vectorized over all 2^c buckets; no
    sequential suffix-sum walk),
 6. Horner across windows: acc <- 2^c * acc + W_w.

Scalar digit decomposition happens host-side (numpy; exact).  The same core
drives G1 (Fq) and G2 (Fq2) through the field adapters in ops.curve.

The `c` (window bits) knob mirrors the reference's Config.multi_exp_c
(src/prover_config.hpp:31).
"""

import math
from functools import partial, lru_cache

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from . import curve
from .curve import (
    G1F, G2F, point_add, point_double, point_select, point_identity_like)


def default_window_bits(n):
    """Pippenger window size heuristic (Config.multi_exp_c equivalent)."""
    if n <= 32:
        return 4
    c = int(math.log2(n)) - 3
    return max(4, min(13, c))


def window_digits_host(scalars, c):
    """(W, B) uint32 window digits (LSB window first) from python ints."""
    n_windows = (254 + c - 1) // c
    out = np.zeros((n_windows, len(scalars)), dtype=np.uint32)
    mask = (1 << c) - 1
    for b, s in enumerate(scalars):
        s = int(s)
        for w in range(n_windows):
            out[w, b] = (s >> (w * c)) & mask
    return out


def _tree_mask_reduce(F, points, mask):
    """Sum of points[i] where mask[i], over the last batch axis (size 2^k)."""
    ident = point_identity_like(F, points)
    cur = point_select(F, mask, points, ident)
    n = mask.shape[-1]
    while n > 1:
        half = n // 2
        left = jax.tree_util.tree_map(lambda a: a[..., :half], cur)
        right = jax.tree_util.tree_map(lambda a: a[..., half:], cur)
        cur = point_add(F, left, right)
        n = half
    return jax.tree_util.tree_map(lambda a: a[..., 0], cur)


def _segmented_bucket_sums(F, points, keys, n_buckets):
    """Sorted-key segmented sums -> per-bucket point sums.

    points: pytree with trailing batch axis B (sorted by keys);
    keys: (B,) int32 sorted.  Returns pytree with trailing axis n_buckets."""
    def combine(a, b):
        ka, pa = a
        kb, pb = b
        merged = point_add(F, pa, pb)
        same = (ka == kb)[0]  # keys travel as (1, B) for rank alignment
        return (kb, point_select(F, same, merged, pb))

    _, scanned = lax.associative_scan(
        combine, (keys[None], points), axis=-1)
    b = keys.shape[-1]
    is_last = jnp.concatenate(
        [keys[1:] != keys[:-1], jnp.ones((1,), dtype=bool)])
    target = jnp.where(is_last, keys, n_buckets)  # dump slot n_buckets
    ident = point_identity_like(
        F, jax.tree_util.tree_map(
            lambda a: jnp.broadcast_to(
                a[..., :1], a.shape[:-1] + (n_buckets + 1,)),
            scanned))
    buckets = jax.tree_util.tree_map(
        lambda init, vals: init.at[..., target].set(vals), ident, scanned)
    return jax.tree_util.tree_map(lambda a: a[..., :n_buckets], buckets)


def _weighted_bucket_fold(F, buckets, c):
    """sum_b b * S_b over buckets (trailing axis 2^c) via bit planes:
    Horner over bits (MSB first) under a scan, each step one masked tree
    reduction over the bucket axis."""
    idx = np.arange(1 << c, dtype=np.uint32)
    masks = jnp.asarray(
        np.stack([((idx >> k) & 1).astype(bool)
                  for k in range(c - 1, -1, -1)]))

    def body(acc, mask):
        plane = _tree_mask_reduce(F, buckets, mask)
        acc = point_double(F, acc)
        plane1 = jax.tree_util.tree_map(lambda a: a[..., None], plane)
        return point_add(F, acc, plane1), None

    acc0 = point_identity_like(
        F, jax.tree_util.tree_map(lambda a: a[..., :1], buckets))
    acc, _ = lax.scan(body, acc0, masks)
    return acc  # trailing axis of size 1


def _msm_core(F, points, digits, c):
    """points: pytree with batch axis B; digits: (W, B) uint32.

    Windows are processed MSB-first under ONE ``lax.scan`` so the compiled
    program contains a single window body regardless of window count.
    Returns a single projective point (trailing axis 1)."""
    n_windows, b = digits.shape
    n_buckets = 1 << c
    iota = jnp.arange(b, dtype=jnp.int32)

    def window_body(acc, keys):
        sorted_keys, order = lax.sort_key_val(keys.astype(jnp.int32), iota)
        gathered = jax.tree_util.tree_map(
            lambda a: jnp.take(a, order, axis=-1), points)
        buckets = _segmented_bucket_sums(F, gathered, sorted_keys, n_buckets)
        w_sum = _weighted_bucket_fold(F, buckets, c)
        for _ in range(c):
            acc = point_double(F, acc)
        return point_add(F, acc, w_sum), None

    acc0 = point_identity_like(
        F, jax.tree_util.tree_map(lambda a: a[..., :1], points))
    acc, _ = lax.scan(window_body, acc0, digits[::-1])
    return acc


@lru_cache(maxsize=None)
def _jit_msm(field_kind, c):
    F = G1F if field_kind == 'g1' else G2F

    @jax.jit
    def run(points, digits):
        return _msm_core(F, points, digits, c)

    return run


def msm_g1_device(points_dev, digits, c):
    """points_dev: (X, Y, Z) Fq arrays (L, B); digits: (W, B) uint32."""
    return _jit_msm('g1', c)(points_dev, jnp.asarray(digits))


def msm_g2_device(points_dev, digits, c):
    return _jit_msm('g2', c)(points_dev, jnp.asarray(digits))


# ---------------- host-facing conveniences ----------------

def msm_g1_host_api(scalars, points, c=None):
    """scalars: python ints; points: host bn254 G1 affine (or None).

    Returns a host affine point (None for infinity)."""
    if len(scalars) == 0:
        return None
    c = c or default_window_bits(len(scalars))
    digits = window_digits_host(scalars, c)
    dev = curve.g1_to_device(points)
    res = msm_g1_device(dev, digits, c)
    return curve.g1_from_device(res)[0]


def msm_g2_host_api(scalars, points, c=None):
    if len(scalars) == 0:
        return None
    c = c or default_window_bits(len(scalars))
    digits = window_digits_host(scalars, c)
    dev = curve.g2_to_device(points)
    res = msm_g2_device(dev, digits, c)
    return curve.g2_from_device(res)[0]


def window_digits_host_np(scalars, c):
    """Vectorized digit extraction: object ndarray / list of ints -> (W, B)
    uint32 (no per-scalar python loop; ~W object passes)."""
    arr = np.asarray(scalars, dtype=object)
    n_windows = (254 + c - 1) // c
    mask = (1 << c) - 1
    out = np.zeros((n_windows, arr.shape[0]), dtype=np.uint32)
    cur = arr
    for w in range(n_windows):
        out[w] = (cur & mask).astype(np.uint32)
        cur = cur >> c
    return out


def window_digits_from_limbs_np(limbs, c):
    """Vectorized host digit extraction from canonical 13-bit limbs
    (L, B) uint32 -> (W, B) uint32: pure numpy uint32 ops, no per-scalar
    python-bigint passes (window_digits_host_np costs ~W object passes;
    this reuses the limb decomposition the witness map needs anyway)."""
    from .fp import LIMB_BITS, NUM_LIMBS
    assert c <= LIMB_BITS
    limbs = np.asarray(limbs)
    n_windows = (254 + c - 1) // c
    mask = np.uint32((1 << c) - 1)
    out = np.zeros((n_windows, limbs.shape[1]), dtype=np.uint32)
    for w in range(n_windows):
        lo_bit = w * c
        i0 = lo_bit // LIMB_BITS
        sh = lo_bit % LIMB_BITS
        d = limbs[i0] >> np.uint32(sh)
        if sh + c > LIMB_BITS and i0 + 1 < NUM_LIMBS:
            d = d | (limbs[i0 + 1] << np.uint32(LIMB_BITS - sh))
        out[w] = d & mask
    return out


def window_digits_device(plain_limbs, c):
    """Digit extraction on device from canonical 13-bit limbs (L, B) ->
    (W, B) uint32.  c <= 13 so each window spans at most two limbs."""
    from .fp import LIMB_BITS, NUM_LIMBS
    assert c <= LIMB_BITS
    n_windows = (254 + c - 1) // c
    mask = jnp.uint32((1 << c) - 1)
    rows = []
    for w in range(n_windows):
        lo_bit = w * c
        i0 = lo_bit // LIMB_BITS
        sh = lo_bit % LIMB_BITS
        d = plain_limbs[i0] >> jnp.uint32(sh)
        if sh + c > LIMB_BITS and i0 + 1 < NUM_LIMBS:
            d = d | (plain_limbs[i0 + 1] << jnp.uint32(LIMB_BITS - sh))
        rows.append(d & mask)
    return jnp.stack(rows)


def msm_g1_chunked(points_dev, digits, c, chunk=512):
    """Chunked MSM: run the (chunk, c) single-window-scan executable per
    chunk and combine partial results on the host.

    Rationale: the per-chunk executable is small (compiles/caches quickly on
    the axon remote-compile service, 2 CPU cores notwithstanding) and MSM is
    additive over point partitions.  Slower than the monolithic graph but
    compile-robust; used as the bench fallback."""
    from . import curve as curve_ops
    from ..bn254 import add as host_add
    x, y, z = points_dev
    n = x.shape[-1]
    assert n % chunk == 0, (n, chunk)
    run = _jit_msm('g1', c)
    acc = None
    for off in range(0, n, chunk):
        sl = slice(off, off + chunk)
        res = run((x[:, sl], y[:, sl], z[:, sl]),
                  jnp.asarray(digits[:, sl]))
        partial = curve_ops.g1_from_device(res)[0]
        acc = host_add(acc, partial)
    return acc
