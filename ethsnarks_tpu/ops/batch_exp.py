"""Device batch fixed-base exponentiation (libff ``batch_exp`` equivalent).

The generator's hot path (SURVEY.md §3.1; reference
src/r1cs_gg_ppzksnark_zok/r1cs_gg_ppzksnark_zok.tcc:358-412) is thousands of
fixed-base scalar multiplications s_i * G.  The reference uses host window
tables + OpenMP; here the window TABLE stays on the host (one-time, ~8k point
adds) and the per-scalar work runs on device:

  digits (W, n) -> gather table[w*2^c + digit] -> tree-reduce over W
  (log2(W) point adds at n lanes == ~(W-1)/W adds per scalar per level
  budget, 31 adds/scalar at c=8).

Results come back affine via one host batch inversion (Montgomery trick).

G1 via the fused Pallas add kernel on TPU (generic traced ops elsewhere);
G2 via the generic traced ops (Fq2 limb kernels).
"""
import numpy as np
import jax
import jax.numpy as jnp

from ..bn254 import G1_GEN, G2_GEN, add, FIELD_MODULUS
from ..field import SNARK_SCALAR_FIELD as P
from . import curve as curve_ops
from .pallas_ops import L, use_pallas


def _host_table(base, c, n_windows, to_device):
    """Flattened window table: entry w*2^c + d = d * 2^(c*w) * base.
    Index 0 of each row is the identity."""
    rows = []
    cur = base
    for _ in range(n_windows):
        acc = None
        rows.append(None)
        for _ in range((1 << c) - 1):
            acc = add(acc, cur)
            rows.append(acc)
        cur = add(acc, cur)   # cur * 2^c
    return to_device(rows)


def _digits_np(scalars, c, n_windows):
    from .fp import Fr, LIMB_BITS
    from .msm import window_digits_from_limbs_np, window_digits_host_np
    if c <= LIMB_BITS:
        # bytes limb decomposition + numpy window extraction (the
        # object-pass path cost whole seconds per 2^16 generator chunk)
        d = window_digits_from_limbs_np(Fr.to_limbs_fast(scalars), c)
    else:
        d = window_digits_host_np([int(s) % P for s in scalars], c)
    assert d.shape[0] == n_windows
    return d.astype(np.int32)


def _batch_affine_g1(p):
    """Device (X,Y,Z) -> host affine list via ONE batched modular inverse."""
    from .fp import Fq as FqCtx
    from ..bn254 import Fq as HostFq
    X = FqCtx.from_limbs(np.asarray(FqCtx.from_mont_jit(p[0])))
    Y = FqCtx.from_limbs(np.asarray(FqCtx.from_mont_jit(p[1])))
    Z = FqCtx.from_limbs(np.asarray(FqCtx.from_mont_jit(p[2])))
    if isinstance(X, int):
        X, Y, Z = [X], [Y], [Z]
    # Montgomery batch inversion over the nonzero Zs
    q = FIELD_MODULUS
    prefix = []
    acc = 1
    for z in Z:
        if z:
            acc = acc * z % q
        prefix.append(acc)
    inv = pow(acc, -1, q)
    out = [None] * len(Z)
    for i in range(len(Z) - 1, -1, -1):
        z = Z[i]
        if not z:
            continue
        # prefix skips zero-z entries, so prefix[i-1] is already the
        # product of the nonzero Zs before i
        before = prefix[i - 1] if i else 1
        zi = inv * before % q
        inv = inv * z % q
        out[i] = (HostFq(X[i] * zi), HostFq(Y[i] * zi))
    return out


class _BatchExp(object):
    """Reusable fixed-base batch exponentiator for one base point."""

    def __init__(self, base, group='g1', c=8, bits=254):
        self.c = c
        self.base = base
        self.group = group
        self.n_windows = (bits + c - 1) // c
        if group == 'g1':
            self._table = _host_table(base, c, self.n_windows,
                                      curve_ops.g1_to_device)
            self._field = curve_ops.G1F
        else:
            self._table = _host_table(base, c, self.n_windows,
                                      curve_ops.g2_to_device)
            self._field = curve_ops.G2F
        self._jit_cache = {}

    def _runner(self, n):
        if n in self._jit_cache:
            return self._jit_cache[n]
        c, W = self.c, self.n_windows
        Wp = 1
        while Wp < W:
            Wp *= 2
        group = self.group
        field = self._field

        @jax.jit
        def run(table, digits):
            # gather per-window points: idx (W, n) -> (W*n,) lanes
            woff = (jnp.arange(W, dtype=jnp.int32) << c)[:, None]
            idx = digits + woff
            if group == 'g1':
                x, y, z = table
                rows = jnp.concatenate([x, y, z], axis=0)      # (3L, 2^c*W)
                rows = jnp.pad(rows, ((0, 64 - 3 * L), (0, 0))).T
                g = jnp.take(rows, idx.reshape(-1), axis=0).T  # (64, W*n)
                cur = (g[:L], g[L:2 * L], g[2 * L:3 * L])
            else:
                cur = tuple(
                    tuple(jnp.take(cc, idx.reshape(-1), axis=1)
                          for cc in coord)
                    for coord in table)
            # pad W to a power of two with identity points
            if Wp != W:
                pad = (Wp - W) * n
                if group == 'g1':
                    from .fp import Fq as FqCtx
                    one = jnp.asarray(
                        FqCtx.one_mont_limbs.reshape(L, 1), jnp.uint32)
                    cur = (jnp.pad(cur[0], ((0, 0), (0, pad))),
                           jnp.concatenate(
                               [cur[1], jnp.broadcast_to(one, (L, pad))],
                               axis=1),
                           jnp.pad(cur[2], ((0, 0), (0, pad))))
                else:
                    from .fp import Fq as FqCtx
                    one = jnp.asarray(
                        FqCtx.one_mont_limbs.reshape(L, 1), jnp.uint32)
                    zero = jnp.zeros((L, pad), jnp.uint32)
                    onep = jnp.broadcast_to(one, (L, pad)).astype(jnp.uint32)
                    cur = (
                        (jnp.pad(cur[0][0], ((0, 0), (0, pad))),
                         jnp.pad(cur[0][1], ((0, 0), (0, pad)))),
                        (jnp.concatenate([cur[1][0], onep], axis=1),
                         jnp.pad(cur[1][1], ((0, 0), (0, pad)))),
                        (jnp.pad(cur[2][0], ((0, 0), (0, pad))),
                         jnp.pad(cur[2][1], ((0, 0), (0, pad)))),
                    )
            # tree-reduce over the window axis
            w = Wp
            while w > 1:
                half = w // 2

                def split(a):
                    r = a.reshape(L, w, n)
                    return (r[:, :half].reshape(L, -1),
                            r[:, half:].reshape(L, -1))
                if group == 'g1':
                    parts = [split(a) for a in cur]
                    lhs = tuple(pp[0] for pp in parts)
                    rhs = tuple(pp[1] for pp in parts)
                    if use_pallas():
                        from .pallas_ops import g1_point_add_pallas
                        cur = g1_point_add_pallas(lhs, rhs)
                    else:
                        cur = curve_ops.point_add(field, lhs, rhs)
                else:
                    parts = [tuple(split(cc) for cc in coord)
                             for coord in cur]
                    lhs = tuple(tuple(ccp[0] for ccp in coord)
                                for coord in parts)
                    rhs = tuple(tuple(ccp[1] for ccp in coord)
                                for coord in parts)
                    cur = curve_ops.point_add(field, lhs, rhs)
                w = half
            return cur

        self._jit_cache[n] = run
        return run

    def mul(self, scalar):
        return self.mul_many([scalar])[0]

    def mul_many(self, scalars, chunk=1 << 16):
        """[s_i] -> [s_i * base] host points (None for s == 0).

        Tiny batches run host double-and-add instead: the generator's
        vk/pk/gammaABC muls otherwise force a fresh 128-lane executable
        per group type (~2 minutes of cold remote compile for a handful
        of points - measured in the 2^20 setup profile)."""
        import os
        n_total = len(scalars)
        host_max = int(os.environ.get('ETHSNARKS_BATCH_EXP_HOST_MAX',
                                      '256'))
        if n_total <= host_max:
            from ..bn254 import multiply
            return [multiply(self.base, int(s) % P) for s in scalars]
        out = []
        for lo in range(0, n_total, chunk):
            sub = scalars[lo:lo + chunk]
            n = len(sub)
            npad = max(128, 1 << (n - 1).bit_length()) if n > 1 else 128
            digs = _digits_np(list(sub) + [0] * (npad - n),
                              self.c, self.n_windows)
            run = self._runner(npad)
            res = run(self._table, jnp.asarray(digs))
            if self.group == 'g1':
                pts = _batch_affine_g1(res)
            else:
                pts = curve_ops.g2_from_device(res)
            out.extend(pts[:n])
        return out


def batch_exp_g1(scalars, base=None, c=8):
    return _BatchExp(base or G1_GEN, 'g1', c).mul_many(scalars)


def batch_exp_g2(scalars, base=None, c=8):
    return _BatchExp(base or G2_GEN, 'g2', c).mul_many(scalars)
