"""Fused Pallas MSM stages: whole-tile segmented scan and bucket fold.

Why: the generic MSM graph (ops/msm.py) contains dozens of separate Pallas
point-op call sites (associative-scan levels, bucket-fold tree levels); the
axon remote-compile service charges ~10s per site, making 2^20-scale graphs
take tens of minutes to compile.  Here each MSM stage is ONE kernel:

  K_scan  : per-tile segmented inclusive scan (Hillis-Steele levels under an
            in-kernel fori_loop, all in VMEM),
  K_fold  : the whole weighted bucket reduction (bit-plane tree + Horner)
            for one window in a single kernel,
  K_horner: between-window acc <- 2^c*acc + w (c doubles + add).

Carry application across tiles reuses the generic g1_point_add_pallas kernel
(carries broadcast tile-wide in XLA) - Mosaic rejects every per-tile
sub-128-lane block formulation tried (dynamic lane ds(), (1, L, 1) blocks).
All kernels keep vectors at >= 128 lanes; single-point values ride in lane 0
with don't-care ballast lanes (1-lane vector ops do not lower).

Composition, two drivers:
  msm_g1_fused        - host loop per window (compile-cheap, many dispatches)
  msm_g1_fused_onejit - ONE jit: lax.scan over windows, one dispatch per MSM.

G1 only (the prover's three big MSMs); G2 stays on the generic path.
Bit-exactness: pinned against ops/msm.py on CPU-interpret and against the
host oracle on TPU.
"""

from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp

from .pallas_ops import (
    _HAS_PALLAS, L, _mk_field_ops, _g1_consts, _g1_add_body, _g1_double_body)

if _HAS_PALLAS:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

TILE = 512


def _seg_combine(body_add, k1, p1, k2, p2):
    """Segmented-scan monoid on sorted keys: (k2, p1+p2 if k1==k2 else p2).

    keys are (1, T') int32; points are coord-triples of (L, T')."""
    merged = body_add(*p1, *p2)
    same = (k1 == k2)
    out = tuple(jnp.where(same, m, q) for m, q in zip(merged, p2))
    return k2, out


@lru_cache(maxsize=None)
def _k_scan(n_tiles):
    """Per-tile segmented inclusive scan kernel.

    Inputs: keys (1, n_tiles*T) int32, coords x/y/z (L, n_tiles*T).
    Outputs: scanned coords (same shapes).  Tile aggregates are simply the
    last lane of each tile in the scanned output (sliced host-side)."""

    def kernel(consts, keys, x, y, z, ox, oy, oz):
        body = _g1_add_body(consts[:])
        k0 = keys[:]                    # (1, T)
        p0 = (x[:], y[:], z[:])         # each (L, T)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, TILE), 1)
        one = p0[1] * jnp.uint32(0) + consts[:L, 7:8]

        # Hillis-Steele inclusive segmented scan within the tile (all VMEM).
        # Levels run under an in-kernel fori_loop (one point-add body) with
        # dynamic-shift rolls; Mosaic chokes on the fully unrolled form and
        # rejects lane-axis concatenation outright.
        n_levels = TILE.bit_length() - 1

        def level(i, state):
            px_c, py_c, pz_c = state
            shift = jnp.int32(1) << i
            valid = lane >= shift
            k_prev = jnp.where(valid, pltpu.roll(k0, shift, 1),
                               jnp.int32(-1))
            # NOTE: keys need no scan state - after level i, element j's
            # summary covers [j-2^i+1 .. j], whose LAST key is still k0[j].
            qx = jnp.where(valid, pltpu.roll(px_c, shift, 1),
                           px_c * jnp.uint32(0))
            qy = jnp.where(valid, pltpu.roll(py_c, shift, 1), one)
            qz = jnp.where(valid, pltpu.roll(pz_c, shift, 1),
                           pz_c * jnp.uint32(0))
            merged = body(qx, qy, qz, px_c, py_c, pz_c)
            same = (k_prev == k0)
            return tuple(jnp.where(same, m, q)
                         for m, q in zip(merged, (px_c, py_c, pz_c)))

        p = jax.lax.fori_loop(0, n_levels, level, p0)
        ox[:], oy[:], oz[:] = p

    total = n_tiles * TILE
    kspec = pl.BlockSpec((1, TILE), lambda i: (0, i), memory_space=pltpu.VMEM)
    cspec = pl.BlockSpec((L + 1, 8), lambda i: (0, 0), memory_space=pltpu.VMEM)
    spec = pl.BlockSpec((L, TILE), lambda i: (0, i), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[cspec, kspec, spec, spec, spec],
        out_specs=[spec, spec, spec],
        out_shape=[jax.ShapeDtypeStruct((L, total), jnp.uint32)] * 3,
    )


def _apply_carries(keys_p, scanned, carries, carry_keys):
    """Fold each tile's exclusive carry into its elements.

    No dedicated kernel: Mosaic rejects per-tile sub-128-lane carry blocks
    (dynamic lane ds() and (1, L, 1) blocks both fail), so the carry is
    broadcast tile-wide in XLA (``jnp.repeat``) and merged with ONE
    full-width complete point add through the already-validated
    g1_point_add_pallas kernel, followed by a masked select.

    keys_p: (B,) sorted int32 (B = n_tiles*TILE); scanned: coord triple
    (L, B); carries: coord triple (L, n_tiles); carry_keys: (n_tiles,)."""
    from .pallas_ops import g1_point_add_pallas
    carry_full = tuple(jnp.repeat(a, TILE, axis=1) for a in carries)
    ck_full = jnp.repeat(carry_keys, TILE)
    merged = g1_point_add_pallas(scanned, carry_full)
    same = (ck_full == keys_p)[None]
    return tuple(jnp.where(same, m, q) for m, q in zip(merged, scanned))


@lru_cache(maxsize=None)
def _k_fold(c):
    """Whole weighted bucket fold in one kernel: buckets (L, 2^c) coords in
    VMEM -> sum_b b*S_b in LANE 0 of an (L, 2^c) output (lanes >= 1 are
    garbage - Mosaic cannot lower 1-lane vector ops, so every op stays at
    full width and the caller slices lane 0 outside the kernel).

    fori over bit planes (MSB first), each plane a roll-based masked tree
    reduction; Horner double+add between planes."""
    n_buckets = 1 << c

    def kernel(consts, x, y, z, ox, oy, oz):
        body = _g1_add_body(consts[:])
        dbl = _g1_double_body(consts[:])
        bx, by, bz = x[:], y[:], z[:]
        one_full = by * jnp.uint32(0) + consts[:L, 7:8]
        idx = jax.lax.broadcasted_iota(jnp.uint32, (1, n_buckets), 1)
        levels = c  # log2(n_buckets) tree levels

        def plane(k, acc):
            # bit index MSB-first: bit = c-1-k
            bit = jnp.uint32(c - 1) - k.astype(jnp.uint32)
            mask = ((idx >> bit) & 1) != 0
            # masked-out lanes become the identity (0, 1, 0)
            px = jnp.where(mask, bx, bx * jnp.uint32(0))
            py = jnp.where(mask, by, one_full)
            pz = jnp.where(mask, bz, bz * jnp.uint32(0))

            # roll-based halving tree: lanes j < half accumulate j + half;
            # garbage above `half` is never read again (lane 0 = total).
            def tree_level(i, cur):
                half = jnp.int32(n_buckets) >> (i + 1)
                shift = jnp.int32(n_buckets) - half  # left-roll by `half`
                cx2, cy2, cz2 = cur
                rx = pltpu.roll(cx2, shift, 1)
                ry = pltpu.roll(cy2, shift, 1)
                rz = pltpu.roll(cz2, shift, 1)
                return body(cx2, cy2, cz2, rx, ry, rz)

            cur = jax.lax.fori_loop(0, levels, tree_level, (px, py, pz))
            ax, ay, az = dbl(*acc)
            # full-width add: only lane 0 of `cur` is the plane total, and
            # only lane 0 of acc is ever read back
            return body(ax, ay, az, *cur)

        acc = (bx * jnp.uint32(0), one_full, bz * jnp.uint32(0))
        acc = jax.lax.fori_loop(0, c, plane, acc)
        ox[:], oy[:], oz[:] = acc

    cspec = pl.BlockSpec((L + 1, 8), lambda: (0, 0), memory_space=pltpu.VMEM)
    spec = pl.BlockSpec((L, n_buckets), lambda: (0, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        in_specs=[cspec, spec, spec, spec],
        out_specs=[spec] * 3,
        out_shape=[jax.ShapeDtypeStruct((L, n_buckets), jnp.uint32)] * 3,
    )


@lru_cache(maxsize=None)
def _k_horner(c):
    """Window Horner step in one kernel: acc <- 2^c * acc + w.

    acc, w: (L, 128) coord triples - lane 0 is the live value, the other
    lanes are don't-care ballast (Mosaic cannot lower 1-lane vector ops).
    c doublings under fori_loop + one add, all at full width."""

    def kernel(consts, ax, ay, az, wx, wy, wz, ox, oy, oz):
        body = _g1_add_body(consts[:])
        dbl = _g1_double_body(consts[:])
        a = (ax[:], ay[:], az[:])

        def step(_, cur):
            return dbl(*cur)

        a = jax.lax.fori_loop(0, c, step, a)
        out = body(a[0], a[1], a[2], wx[:], wy[:], wz[:])
        ox[:], oy[:], oz[:] = out

    cspec = pl.BlockSpec((L + 1, 8), lambda: (0, 0), memory_space=pltpu.VMEM)
    spec = pl.BlockSpec((L, 128), lambda: (0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        in_specs=[cspec] + [spec] * 6,
        out_specs=[spec] * 3,
        out_shape=[jax.ShapeDtypeStruct((L, 128), jnp.uint32)] * 3,
    )


def _bucket_extract_traced(sorted_keys, sx, sy, sz, n_buckets):
    """Last element of each key run -> bucket slot (traced XLA scatter)."""
    is_last = jnp.concatenate(
        [sorted_keys[1:] != sorted_keys[:-1], jnp.ones((1,), dtype=bool)])
    target = jnp.where(is_last, sorted_keys, n_buckets)
    one = jnp.asarray(_one_mont_col(), dtype=jnp.uint32)
    bx = jnp.zeros((L, n_buckets + 1), dtype=jnp.uint32)
    by = jnp.broadcast_to(one, (L, n_buckets + 1)).astype(jnp.uint32)
    bz = jnp.zeros((L, n_buckets + 1), dtype=jnp.uint32)
    bx = bx.at[:, target].set(sx)
    by = by.at[:, target].set(sy)
    bz = bz.at[:, target].set(sz)
    return bx[:, :n_buckets], by[:, :n_buckets], bz[:, :n_buckets]


@lru_cache(maxsize=None)
def _jit_msm_fused(b, c, n_windows):
    """The single-dispatch fused MSM: every window under ONE lax.scan inside
    ONE jit, so a full MSM is one executable / one host round-trip.  The
    compiled program contains ~6 Pallas call sites (K_scan at 2 tile counts,
    K_apply, K_fold, K_horner) regardless of b and window count - compile
    economy for the axon remote-compile service.

    Takes points (X, Y, Z) each (L, b) and digits (W, b) uint32 (LSB window
    first, as window_digits_host produces); returns the (L, 1) projective
    result triple."""
    n_buckets = 1 << c
    consts_np = _g1_consts()

    @jax.jit
    def run(points, digits):
        consts = jnp.asarray(consts_np)
        x, y, z = points
        iota = jnp.arange(b, dtype=jnp.int32)

        def window_body(acc, keys):
            sk, order = jax.lax.sort_key_val(keys.astype(jnp.int32), iota)
            pts = (jnp.take(x, order, axis=1),
                   jnp.take(y, order, axis=1),
                   jnp.take(z, order, axis=1))
            sx, sy, sz = _seg_scan_fused(sk, pts)
            bx, by, bz = _bucket_extract_traced(sk, sx, sy, sz, n_buckets)
            folded = _k_fold(c)(consts, bx, by, bz)
            # lane 0 of the fold output is live; reshape to the fixed
            # 128-lane ballast width K_horner expects
            if n_buckets >= 128:
                w128 = tuple(a[:, :128] for a in folded)
            else:
                w128 = tuple(
                    jnp.pad(a, ((0, 0), (0, 128 - n_buckets)))
                    for a in folded)
            nx, ny, nz = _k_horner(c)(consts, acc[0], acc[1], acc[2],
                                      *w128)
            return (nx, ny, nz), None

        one = jnp.asarray(_one_mont_col(), dtype=jnp.uint32)
        acc0 = (jnp.zeros((L, 128), jnp.uint32),
                jnp.broadcast_to(one, (L, 128)).astype(jnp.uint32),
                jnp.zeros((L, 128), jnp.uint32))
        acc, _ = jax.lax.scan(window_body, acc0, digits[::-1])
        return tuple(a[:, :1] for a in acc)

    return run


def msm_g1_fused_onejit(points_dev, digits, c):
    """Single-dispatch fused G1 MSM; returns a host affine point."""
    from . import curve as curve_ops
    digits = jnp.asarray(digits)
    n_windows, b = digits.shape
    run = _jit_msm_fused(b, c, n_windows)
    res = run(tuple(jnp.asarray(a) for a in points_dev), digits)
    return curve_ops.g1_from_device(res)[0]


@lru_cache(maxsize=None)
def _k_fold_grid(c, n_win):
    """K_fold over n_win windows in ONE dispatch: grid step i folds the
    (L, 2^c) bucket block of window i.  Input/output (L, n_win*2^c); lane
    w*2^c of the output carries window w's weighted bucket sum."""
    n_buckets = 1 << c

    def kernel(consts, x, y, z, ox, oy, oz):
        body = _g1_add_body(consts[:])
        dbl = _g1_double_body(consts[:])
        bx, by, bz = x[:], y[:], z[:]
        one_full = by * jnp.uint32(0) + consts[:L, 7:8]
        idx = jax.lax.broadcasted_iota(jnp.uint32, (1, n_buckets), 1)
        levels = c

        def plane(kk, acc):
            bit = jnp.uint32(c - 1) - kk.astype(jnp.uint32)
            mask = ((idx >> bit) & 1) != 0
            px = jnp.where(mask, bx, bx * jnp.uint32(0))
            py = jnp.where(mask, by, one_full)
            pz = jnp.where(mask, bz, bz * jnp.uint32(0))

            def tree_level(i, cur):
                half = jnp.int32(n_buckets) >> (i + 1)
                shift = jnp.int32(n_buckets) - half
                cx2, cy2, cz2 = cur
                rx = pltpu.roll(cx2, shift, 1)
                ry = pltpu.roll(cy2, shift, 1)
                rz = pltpu.roll(cz2, shift, 1)
                return body(cx2, cy2, cz2, rx, ry, rz)

            cur = jax.lax.fori_loop(0, levels, tree_level, (px, py, pz))
            ax, ay, az = dbl(*acc)
            return body(ax, ay, az, *cur)

        acc = (bx * jnp.uint32(0), one_full, bz * jnp.uint32(0))
        acc = jax.lax.fori_loop(0, c, plane, acc)
        ox[:], oy[:], oz[:] = acc

    cspec = pl.BlockSpec((L + 1, 8), lambda i: (0, 0),
                         memory_space=pltpu.VMEM)
    spec = pl.BlockSpec((L, n_buckets), lambda i: (0, i),
                        memory_space=pltpu.VMEM)
    total = n_win * n_buckets
    return pl.pallas_call(
        kernel,
        grid=(n_win,),
        in_specs=[cspec, spec, spec, spec],
        out_specs=[spec] * 3,
        out_shape=[jax.ShapeDtypeStruct((L, total), jnp.uint32)] * 3,
    )


@lru_cache(maxsize=None)
def _k_horner_all(c, n_win):
    """Whole window-Horner in ONE kernel: acc <- 2^c*acc + S_w for w from
    MSB (w = n_win-1) down to 0.  Input (L, n_win*128) coord triples with
    window w's value in lane w*128; output (L, 128), lane 0 = the result.

    Windows are brought to lane 0 by cyclic rolls of +128 per iteration
    (roll(x, s)[j] = x[(j-s) mod n]); the accumulator stays at the minimum
    128-lane width so point ops cost 1/n_win of the ballast width."""
    nb = 128
    total = n_win * nb

    def kernel(consts, wx, wy, wz, ox, oy, oz):
        body = _g1_add_body(consts[:])
        dbl = _g1_double_body(consts[:])
        one128 = wy[:, :nb] * jnp.uint32(0) + consts[:L, 7:8]
        # pre-roll so the MSB window (lane (n_win-1)*nb) sits at lane 0
        rx = pltpu.roll(wx[:], nb, 1)
        ry = pltpu.roll(wy[:], nb, 1)
        rz = pltpu.roll(wz[:], nb, 1)
        acc = (one128 * jnp.uint32(0), one128, one128 * jnp.uint32(0))

        def win(i, st):
            ax, ay, az, qx, qy, qz = st

            def d(_, cur):
                return dbl(*cur)

            ax, ay, az = jax.lax.fori_loop(0, c, d, (ax, ay, az))
            ax, ay, az = body(ax, ay, az,
                              qx[:, :nb], qy[:, :nb], qz[:, :nb])
            return (ax, ay, az, pltpu.roll(qx, nb, 1),
                    pltpu.roll(qy, nb, 1), pltpu.roll(qz, nb, 1))

        st = jax.lax.fori_loop(0, n_win, win,
                               (acc[0], acc[1], acc[2], rx, ry, rz))
        ox[:], oy[:], oz[:] = st[0], st[1], st[2]

    cspec = pl.BlockSpec((L + 1, 8), lambda: (0, 0), memory_space=pltpu.VMEM)
    spec = pl.BlockSpec((L, total), lambda: (0, 0), memory_space=pltpu.VMEM)
    ospec = pl.BlockSpec((L, nb), lambda: (0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        in_specs=[cspec] + [spec] * 3,
        out_specs=[ospec] * 3,
        out_shape=[jax.ShapeDtypeStruct((L, nb), jnp.uint32)] * 3,
    )


@lru_cache(maxsize=None)
def _jit_msm_dense_allwin(b, c, k, n_win):
    """All-windows dense-matrix MSM: ~12 device dispatches for the WHOLE
    group of n_win windows (vs ~6 per window for the lax.scan drivers).

    Composite keys (w << c) | digit put every (window, bucket) run side by
    side after ONE key sort; run bounds come from searchsorted, and ONE
    point gather lays the group out as an identity-padded
    (n_win*2^c, k) dense matrix.  Bucket sums = halving tree adds
    (~2 point-adds per element at 2x padding), then a gridded K_fold and a
    single whole-group Horner kernel.

    Returns ((L,1) coord triple, overflow flag).  Overflow (a bucket count
    > k) makes the result unusable; the driver falls back.

    Everything is padded to power-of-two shapes: k must be pow2, and the
    window count is padded to pow2 with phantom empty windows (their
    bounds are start=end=total, so they reduce to identity buckets; they
    sit above the real MSB so the Horner pass keeps acc at identity
    through them).  NON-NEGOTIABLE: at n_slots=7936 (31 windows) the
    reduce produced a wrong tail bucket on hardware while the same data at
    8192 slots was exact - large non-pow2 slot/lane counts hit a lowering
    bug in this stack (a 3*2^j capacity variant corrupted half the slots
    the same way).  Pow2 shapes are validated at 2^12..2^16."""
    n_buckets = 1 << c
    assert n_buckets >= 128 and k >= 1 and (k & (k - 1)) == 0
    n_slots = n_win * n_buckets
    n_win_pad = max(1, 1 << (n_win - 1).bit_length())
    n_slots_pad = n_win_pad * n_buckets
    consts_np = _g1_consts()

    @jax.jit
    def run(points, digits):
        from .pallas_ops import g1_point_add_pallas
        consts = jnp.asarray(consts_np)
        x, y, z = points
        one = jnp.asarray(_one_mont_col(), dtype=jnp.uint32)
        # row-major point copy: TPU gathers on the major axis are ~2x
        # faster than lane-axis gathers even counting the transposes
        rows = jnp.concatenate([x, y, z], axis=0)         # (3L, b)
        rows = jnp.pad(rows, ((0, 64 - 3 * L), (0, 0))).T   # (b, 64)
        woff = (jnp.arange(n_win, dtype=jnp.int32) << c)[:, None]
        comp = digits.astype(jnp.int32) + woff            # (n_win, b)
        flat = comp.reshape(-1)
        iota = jnp.arange(n_win * b, dtype=jnp.int32)
        sk, order = jax.lax.sort_key_val(flat, iota)
        orig = order % b                                  # point index
        total = n_win * b
        slots = jnp.arange(n_slots_pad, dtype=jnp.int32)
        real = slots < n_slots
        q = jnp.minimum(slots, n_slots - 1)
        starts = jnp.where(real, jnp.searchsorted(sk, q, side='left'),
                           total)
        ends = jnp.where(real, jnp.searchsorted(sk, q, side='right'),
                         total)
        ovf = jnp.any(ends - starts > k)
        j = jnp.arange(k, dtype=jnp.int32)
        src_sorted = starts[:, None] + j[None, :]         # (slots_pad, k)
        valid = (src_sorted < ends[:, None]).reshape(-1)[None]
        src_orig = jnp.take(
            orig, jnp.clip(src_sorted.reshape(-1), 0, total - 1))
        g = jnp.take(rows, src_orig, axis=0).T            # (64, M)
        zero_u = jnp.uint32(0)
        dense = (
            jnp.where(valid, g[:L], zero_u),
            jnp.where(valid, g[L:2 * L], one),
            jnp.where(valid, g[2 * L:3 * L], zero_u),
        )
        per = k
        while per > 1:
            resh = tuple(a.reshape(L, n_slots_pad, per) for a in dense)
            half = per // 2
            lhs = tuple(a[:, :, :half].reshape(L, -1) for a in resh)
            rhs = tuple(a[:, :, half:].reshape(L, -1) for a in resh)
            dense = g1_point_add_pallas(lhs, rhs)
            per = half
        folded = _k_fold_grid(c, n_win_pad)(consts, *dense)
        # compact each window's live lane block to 128 lanes (VMEM budget
        # for the Horner kernel)
        w128 = tuple(a.reshape(L, n_win_pad, n_buckets)[:, :, :128]
                     .reshape(L, -1) for a in folded)
        hx, hy, hz = _k_horner_all(c, n_win_pad)(consts, *w128)
        return (hx[:, :1], hy[:, :1], hz[:, :1]), ovf

    return run


@lru_cache(maxsize=None)
def _k_fold_grid_g2(c, n_win):
    """G2 variant of _k_fold_grid: coords are Fq2 pairs (6 limb planes)."""
    from .pallas_ops import _g2_add_body, _g2_double_body, _g2_consts
    n_buckets = 1 << c

    def kernel(consts, b3, x0, x1, y0, y1, z0, z1,
               ox0, ox1, oy0, oy1, oz0, oz1):
        body = _g2_add_body(consts[:], b3[:])
        dbl = _g2_double_body(consts[:], b3[:])
        bx = (x0[:], x1[:])
        by = (y0[:], y1[:])
        bz = (z0[:], z1[:])
        zero = x0[:] * jnp.uint32(0)
        one0 = zero + consts[:L, 7:8]
        idx = jax.lax.broadcasted_iota(jnp.uint32, (1, n_buckets), 1)
        levels = c

        def sel(mask, p, q):
            return tuple(jnp.where(mask, a, b) for a, b in zip(p, q))

        def plane(kk, acc):
            bit = jnp.uint32(c - 1) - kk.astype(jnp.uint32)
            mask = ((idx >> bit) & 1) != 0
            px = sel(mask, bx, (zero, zero))
            py = sel(mask, by, (one0, zero))
            pz = sel(mask, bz, (zero, zero))

            def roll2(p, shift):
                return (pltpu.roll(p[0], shift, 1), pltpu.roll(p[1], shift, 1))

            def tree_level(i, cur):
                half = jnp.int32(n_buckets) >> (i + 1)
                shift = jnp.int32(n_buckets) - half
                cx2, cy2, cz2 = cur
                return body(cx2, cy2, cz2, roll2(cx2, shift),
                            roll2(cy2, shift), roll2(cz2, shift))

            cur = jax.lax.fori_loop(0, levels, tree_level, (px, py, pz))
            ax, ay, az = dbl(*acc)
            return body(ax, ay, az, *cur)

        acc = ((zero, zero), (one0, zero), (zero, zero))
        acc = jax.lax.fori_loop(0, c, plane, acc)
        ox0[:], ox1[:] = acc[0]
        oy0[:], oy1[:] = acc[1]
        oz0[:], oz1[:] = acc[2]

    cspec = pl.BlockSpec((L + 1, 8), lambda i: (0, 0),
                         memory_space=pltpu.VMEM)
    bspec = pl.BlockSpec((L, 2), lambda i: (0, 0), memory_space=pltpu.VMEM)
    spec = pl.BlockSpec((L, n_buckets), lambda i: (0, i),
                        memory_space=pltpu.VMEM)
    total = n_win * n_buckets
    return pl.pallas_call(
        kernel,
        grid=(n_win,),
        in_specs=[cspec, bspec] + [spec] * 6,
        out_specs=[spec] * 6,
        out_shape=[jax.ShapeDtypeStruct((L, total), jnp.uint32)] * 6,
    )


@lru_cache(maxsize=None)
def _k_horner_all_g2(c, n_win):
    """G2 variant of _k_horner_all."""
    from .pallas_ops import _g2_add_body, _g2_double_body
    nb = 128
    total = n_win * nb

    def kernel(consts, b3, wx0, wx1, wy0, wy1, wz0, wz1,
               ox0, ox1, oy0, oy1, oz0, oz1):
        body = _g2_add_body(consts[:], b3[:])
        dbl = _g2_double_body(consts[:], b3[:])
        zero = wx0[:, :nb] * jnp.uint32(0)
        one0 = zero + consts[:L, 7:8]
        q = [wx0[:], wx1[:], wy0[:], wy1[:], wz0[:], wz1[:]]
        q = [pltpu.roll(a, nb, 1) for a in q]
        acc = ((zero, zero), (one0, zero), (zero, zero))

        def win(i, st):
            ax, ay, az = st[0], st[1], st[2]
            qq = st[3:]

            def d(_, cur):
                return dbl(*cur)

            ax, ay, az = jax.lax.fori_loop(0, c, d, (ax, ay, az))
            ax, ay, az = body(
                ax, ay, az,
                (qq[0][:, :nb], qq[1][:, :nb]),
                (qq[2][:, :nb], qq[3][:, :nb]),
                (qq[4][:, :nb], qq[5][:, :nb]))
            return (ax, ay, az) + tuple(pltpu.roll(a, nb, 1) for a in qq)

        st = jax.lax.fori_loop(0, n_win, win,
                               (acc[0], acc[1], acc[2]) + tuple(q))
        ox0[:], ox1[:] = st[0]
        oy0[:], oy1[:] = st[1]
        oz0[:], oz1[:] = st[2]

    cspec = pl.BlockSpec((L + 1, 8), lambda: (0, 0), memory_space=pltpu.VMEM)
    bspec = pl.BlockSpec((L, 2), lambda: (0, 0), memory_space=pltpu.VMEM)
    spec = pl.BlockSpec((L, total), lambda: (0, 0), memory_space=pltpu.VMEM)
    ospec = pl.BlockSpec((L, nb), lambda: (0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        in_specs=[cspec, bspec] + [spec] * 6,
        out_specs=[ospec] * 6,
        out_shape=[jax.ShapeDtypeStruct((L, nb), jnp.uint32)] * 6,
    )


@lru_cache(maxsize=None)
def _jit_msm_dense_allwin_g2(b, c, k, n_win):
    """G2 dense all-windows MSM: same pipeline as the G1 version with Fq2
    coordinate pairs (6 limb planes; row-major gather uses a (b, 128)
    layout since 6L = 120).  Same pow2-shape discipline."""
    from .pallas_ops import _g2_consts
    n_buckets = 1 << c
    assert n_buckets >= 128 and k >= 1 and (k & (k - 1)) == 0
    n_slots = n_win * n_buckets
    n_win_pad = max(1, 1 << (n_win - 1).bit_length())
    n_slots_pad = n_win_pad * n_buckets
    consts_np, b3_np = _g2_consts()

    @jax.jit
    def run(points, digits):
        from .pallas_ops import g2_point_add_pallas
        consts = jnp.asarray(consts_np)
        b3 = jnp.asarray(b3_np)
        (x0, x1), (y0, y1), (z0, z1) = points
        one = jnp.asarray(_one_mont_col(), dtype=jnp.uint32)
        rows = jnp.concatenate([x0, x1, y0, y1, z0, z1], axis=0)  # (6L, b)
        rows = jnp.pad(rows, ((0, 128 - 6 * L), (0, 0))).T        # (b, 128)
        woff = (jnp.arange(n_win, dtype=jnp.int32) << c)[:, None]
        comp = digits.astype(jnp.int32) + woff
        flat = comp.reshape(-1)
        iota = jnp.arange(n_win * b, dtype=jnp.int32)
        sk, order = jax.lax.sort_key_val(flat, iota)
        orig = order % b
        total = n_win * b
        slots = jnp.arange(n_slots_pad, dtype=jnp.int32)
        real = slots < n_slots
        qs = jnp.minimum(slots, n_slots - 1)
        starts = jnp.where(real, jnp.searchsorted(sk, qs, side='left'),
                           total)
        ends = jnp.where(real, jnp.searchsorted(sk, qs, side='right'),
                         total)
        ovf = jnp.any(ends - starts > k)
        j = jnp.arange(k, dtype=jnp.int32)
        src_sorted = starts[:, None] + j[None, :]
        valid = (src_sorted < ends[:, None]).reshape(-1)[None]
        src_orig = jnp.take(
            orig, jnp.clip(src_sorted.reshape(-1), 0, total - 1))
        g = jnp.take(rows, src_orig, axis=0).T                    # (128, M)
        zero_u = jnp.uint32(0)
        planes = []
        for ci in range(6):
            ident = one if ci == 2 else zero_u    # y0 identity-plane = 1
            planes.append(jnp.where(valid, g[ci * L:(ci + 1) * L], ident))
        per = k
        while per > 1:
            resh = [a.reshape(L, n_slots_pad, per) for a in planes]
            half = per // 2
            lhs = [a[:, :, :half].reshape(L, -1) for a in resh]
            rhs = [a[:, :, half:].reshape(L, -1) for a in resh]
            s = g2_point_add_pallas(
                ((lhs[0], lhs[1]), (lhs[2], lhs[3]), (lhs[4], lhs[5])),
                ((rhs[0], rhs[1]), (rhs[2], rhs[3]), (rhs[4], rhs[5])))
            planes = [s[0][0], s[0][1], s[1][0], s[1][1], s[2][0], s[2][1]]
            per = half
        folded = _k_fold_grid_g2(c, n_win_pad)(consts, b3, *planes)
        w128 = tuple(a.reshape(L, n_win_pad, n_buckets)[:, :, :128]
                     .reshape(L, -1) for a in folded)
        outs = _k_horner_all_g2(c, n_win_pad)(consts, b3, *w128)
        res = (((outs[0][:, :1], outs[1][:, :1]),
                (outs[2][:, :1], outs[3][:, :1]),
                (outs[4][:, :1], outs[5][:, :1])))
        return res, ovf

    return run


def msm_g2_dense_allwin(points_dev, digits, c, k=None, max_lanes=1 << 22):
    """Grouped G2 dense all-windows MSM driver; host affine G2 result.

    Falls back to the generic multi-dispatch device MSM for small sizes,
    c < 7, or pathological digit skew."""
    from . import curve as curve_ops
    from . import msm as msm_ops
    from ..bn254 import add as host_add, double as host_double
    digits_np = np.asarray(digits)
    n_windows, b = digits_np.shape

    def fallback():
        res = msm_ops.msm_g2_device(points_dev, digits_np, c)
        return curve_ops.g2_from_device(res)[0]

    if (1 << c) < 128 or b <= (1 << 11):
        return fallback()
    zero_win = [int(digits_np[w].max()) == 0 for w in range(n_windows)]
    ks = ([k] * n_windows if k is not None
          else _window_ks(b, c, digits_np))
    mean = max(1, b >> c)
    groups = []
    g0 = 0
    while g0 < n_windows:
        if zero_win[g0]:
            g0 += 1
            continue
        kg = ks[g0]
        if kg > max(64 * mean, max_lanes // (1 << c)):
            return fallback()
        cap = max(1, max_lanes // ((1 << c) * kg))
        g1 = g0 + 1
        while (g1 < n_windows and not zero_win[g1] and ks[g1] == kg
               and g1 - g0 < cap):
            g1 += 1
        groups.append((g0, g1 - g0, kg))
        g0 = g1
    if not groups:
        return None
    pts = tuple(tuple(jnp.asarray(cc) for cc in coord)
                for coord in points_dev)
    group_results = []
    for g0, nw, kg in groups:
        grp = digits_np[g0:g0 + nw]
        run = _jit_msm_dense_allwin_g2(b, c, kg, nw)
        res, ovf = run(pts, jnp.asarray(grp))
        if bool(ovf):
            return fallback()
        group_results.append(
            (g0, nw, curve_ops.g2_from_device(res)[0]))
    acc = None
    prev_start = None
    for g0, nw, pt in reversed(group_results):
        if acc is not None:
            for _ in range(c * (prev_start - g0)):
                acc = host_double(acc)
        acc = host_add(acc, pt)
        prev_start = g0
    for _ in range(c * prev_start):
        acc = host_double(acc)
    return acc


def _nice_k(need):
    """Smallest power of two >= need (pow2-only: see the lowering-bug note
    in _jit_msm_dense_allwin)."""
    k = 1
    while k < need:
        k *= 2
    return k


def _window_ks(b, c, digits_np):
    """Per-window dense capacity: the top window of 254-bit scalars is
    structurally skewed (it spans fewer than c significant bits, so its
    counts concentrate on a handful of buckets) - a single global k would
    force the whole MSM onto the slow path.  Each window gets the smallest
    nice capacity covering its own observed worst count plus slack (the
    slack keeps one executable across typical random inputs)."""
    import math
    n_buckets = 1 << c
    mean = max(1, b >> c)
    floor = mean + 4 * int(math.isqrt(mean)) + 8
    ks = []
    for w in range(digits_np.shape[0]):
        mx = int(np.bincount(digits_np[w], minlength=n_buckets).max())
        ks.append(_nice_k(max(mx + 4 * int(math.isqrt(mx)) + 8, floor)
                          if mx > floor else floor))
    return ks


def msm_g1_dense_allwin(points_dev, digits, c, k=None, max_lanes=1 << 23):
    """Grouped all-windows dense MSM driver; host affine result.

    Windows are processed in contiguous groups sharing a per-window nice
    capacity (the structurally skewed top window of 254-bit scalars gets
    its own group) and sized so the dense matrix stays under ``max_lanes``
    lanes; group results are Horner-combined on the host (c*group_size
    doublings per group - microseconds).  Falls back to the scan
    formulation for pathologically skewed digit distributions or c < 7."""
    from . import curve as curve_ops
    from ..bn254 import add as host_add, double as host_double
    digits_np = np.asarray(digits)
    n_windows, b = digits_np.shape
    if (1 << c) < 128 or b <= (1 << 13):
        # small MSMs are host-round-trip-bound; the single-group scan
        # driver does one round trip where the grouped dense driver does
        # one per group
        return msm_g1_fused_onejit(points_dev, digits, c)
    # all-zero windows contribute the identity (bucket 0 has weight 0):
    # skip them entirely - the top windows of narrow scalar ranges are
    # all-zero by construction
    zero_win = [int(digits_np[w].max()) == 0 for w in range(n_windows)]
    ks = ([k] * n_windows if k is not None
          else _window_ks(b, c, digits_np))
    mean = max(1, b >> c)
    # groups: contiguous non-zero windows with equal k, capped by the lane
    # budget
    groups = []           # (start, n_win, k)
    g0 = 0
    while g0 < n_windows:
        if zero_win[g0]:
            g0 += 1
            continue
        kg = ks[g0]
        if kg > max(64 * mean, max_lanes // (1 << c)):
            return msm_g1_fused_onejit(points_dev, digits, c)
        cap = max(1, max_lanes // ((1 << c) * kg))
        g1 = g0 + 1
        while (g1 < n_windows and not zero_win[g1] and ks[g1] == kg
               and g1 - g0 < cap):
            g1 += 1
        groups.append((g0, g1 - g0, kg))
        g0 = g1
    if not groups:
        return None          # all scalars zero
    pts = tuple(jnp.asarray(a) for a in points_dev)
    group_results = []      # (start_window, n_win_in_group, affine)
    for g0, nw, kg in groups:
        grp = digits_np[g0:g0 + nw]
        run = _jit_msm_dense_allwin(b, c, kg, nw)
        res, ovf = run(pts, jnp.asarray(grp))
        if bool(ovf):
            return msm_g1_fused_onejit(points_dev, digits, c)
        group_results.append(
            (g0, nw, curve_ops.g1_from_device(res)[0]))
    # result = sum_g 2^(c*start_g) * R_g, combined MSB-group first
    acc = None
    prev_start = None
    for g0, nw, pt in reversed(group_results):
        if acc is not None:
            for _ in range(c * (prev_start - g0)):
                acc = host_double(acc)
        acc = host_add(acc, pt)
        prev_start = g0
    for _ in range(c * prev_start):
        acc = host_double(acc)
    return acc



def _one_mont_col():
    from .fp import Fq as FqCtx
    return FqCtx.one_mont_limbs.reshape(L, 1)


def _bcast_one(like):
    one = jnp.asarray(_one_mont_col(), dtype=jnp.uint32)
    return like * jnp.uint32(0) + one


# ---------------- host-driven composition ----------------

def _pad_to_tiles(keys, pts):
    """Pad (B,) keys / (L, B) coords to a TILE multiple: key -1 (never
    merges), point = identity."""
    b = keys.shape[0]
    pad = (-b) % TILE
    if pad == 0:
        return keys, pts, b
    keys = jnp.concatenate(
        [keys, jnp.full((pad,), -1, dtype=keys.dtype)])
    x, y, z = pts
    zero = jnp.zeros((L, pad), dtype=x.dtype)
    one = jnp.broadcast_to(
        jnp.asarray(_one_mont_col(), dtype=jnp.uint32), (L, pad))
    pts = (jnp.concatenate([x, zero], axis=1),
           jnp.concatenate([y, one], axis=1),
           jnp.concatenate([z, zero], axis=1))
    return keys, pts, b


def _seg_scan_fused(keys, pts):
    """Inclusive segmented scan of (keys (B,), coords (L, B)) via the fused
    tile kernels; returns scanned coords (L, B)."""
    keys_p, pts_p, orig_b = _pad_to_tiles(keys, pts)
    n_tiles = keys_p.shape[0] // TILE
    consts = jnp.asarray(_g1_consts())
    sx, sy, sz = _k_scan(n_tiles)(
        consts, keys_p[None].astype(jnp.int32), *pts_p)
    if n_tiles == 1:
        return (sx[:, :orig_b], sy[:, :orig_b], sz[:, :orig_b])
    # tile aggregates = last lane of each tile (sliced outside pallas)
    ax = sx[:, TILE - 1::TILE]
    ay = sy[:, TILE - 1::TILE]
    az = sz[:, TILE - 1::TILE]
    ak = keys_p[None, TILE - 1::TILE]
    # scan the aggregates recursively (they are "sorted" in the sense the
    # monoid needs: non-decreasing except padded -1 tails, which never match)
    agg_scanned = _seg_scan_fused(ak[0], (ax, ay, az))
    # exclusive carries: shift right one tile; tile 0 gets the identity
    zero = jnp.zeros((L, 1), dtype=sx.dtype)
    one = jnp.asarray(_one_mont_col(), dtype=jnp.uint32)
    cx = jnp.concatenate([zero, agg_scanned[0][:, :n_tiles - 1]], axis=1)
    cy = jnp.concatenate([one, agg_scanned[1][:, :n_tiles - 1]], axis=1)
    cz = jnp.concatenate([zero, agg_scanned[2][:, :n_tiles - 1]], axis=1)
    ck = jnp.concatenate(
        [jnp.full((1,), -2, dtype=jnp.int32),
         ak[0, :n_tiles - 1].astype(jnp.int32)])
    ox, oy, oz = _apply_carries(
        keys_p.astype(jnp.int32), (sx, sy, sz), (cx, cy, cz), ck)
    return (ox[:, :orig_b], oy[:, :orig_b], oz[:, :orig_b])


@lru_cache(maxsize=None)
def _jit_sort_gather(b):
    def run(keys, x, y, z):
        iota = jnp.arange(b, dtype=jnp.int32)
        sk, order = jax.lax.sort_key_val(keys.astype(jnp.int32), iota)
        return sk, (jnp.take(x, order, axis=1),
                    jnp.take(y, order, axis=1),
                    jnp.take(z, order, axis=1))
    return jax.jit(run)


@lru_cache(maxsize=None)
def _jit_bucket_extract(b, n_buckets):
    def run(sorted_keys, sx, sy, sz):
        is_last = jnp.concatenate(
            [sorted_keys[1:] != sorted_keys[:-1],
             jnp.ones((1,), dtype=bool)])
        target = jnp.where(is_last, sorted_keys, n_buckets)
        one = jnp.asarray(_one_mont_col(), dtype=jnp.uint32)
        bx = jnp.zeros((L, n_buckets + 1), dtype=jnp.uint32)
        by = jnp.broadcast_to(one, (L, n_buckets + 1)).astype(jnp.uint32)
        bz = jnp.zeros((L, n_buckets + 1), dtype=jnp.uint32)
        bx = bx.at[:, target].set(sx)
        by = by.at[:, target].set(sy)
        bz = bz.at[:, target].set(sz)
        return bx[:, :n_buckets], by[:, :n_buckets], bz[:, :n_buckets]
    return jax.jit(run)


def msm_g1_fused(points_dev, digits, c):
    """Fused-kernel G1 MSM: host-driven window loop over per-stage jits.

    points_dev: (X, Y, Z) each (L, B); digits (W, B) uint32.
    Returns host affine point."""
    from . import curve as curve_ops
    from ..bn254 import add as host_add, double as host_double
    x, y, z = (jnp.asarray(a) for a in points_dev)
    n_windows, b = digits.shape
    n_buckets = 1 << c
    digits = jnp.asarray(digits)

    acc = None
    for w in range(n_windows - 1, -1, -1):
        sk, sorted_pts = _jit_sort_gather(b)(digits[w], x, y, z)
        sx, sy, sz = _seg_scan_fused(sk, sorted_pts)
        bx, by, bz = _jit_bucket_extract(b, n_buckets)(sk, sx, sy, sz)
        folded = _k_fold(c)(jnp.asarray(_g1_consts()), bx, by, bz)
        w_sum = curve_ops.g1_from_device(
            tuple(a[:, :1] for a in folded))[0]
        if acc is not None:
            for _ in range(c):
                acc = host_double(acc)
        acc = host_add(acc, w_sum)
    return acc
