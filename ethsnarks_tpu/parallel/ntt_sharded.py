"""Distributed radix-2 NTT: butterfly stages with cross-chip ppermute.

The domain vector (L, m) is sharded contiguously over the mesh's last axis.
A DIF stage with butterfly span n has pair distance n/2:

 - while n/2 >= chunk (the per-device slice), the partner element lives on
   device d XOR (n/2 / chunk): the stage exchanges whole chunks with ONE
   pairwise ``ppermute`` and each side computes its half of the butterfly
   (low: u+v; high: (u-v)*w^j with the device's twiddle slice),
 - once n/2 < chunk, all remaining stages are device-local reshaped
   butterflies, identical to the single-chip kernel.

log2(n_devices) exchange stages total - the standard "binary-exchange" FFT,
riding ICI neighbor links.  DIT runs the mirror image (local stages first).
Orderings match :mod:`ethsnarks_tpu.ops.ntt`: DIF = natural -> bit-reversed,
DIT = bit-reversed -> natural, so the witness-map pipeline composes without
any global permutation.
"""


import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import PartitionSpec as P

from ..ops.fp import Fr
from ..ops.ntt import NttDomain
from .mesh import AXIS


def _swap_permutation(n_dev, po):
    """Pairwise chunk-swap permutation: d <-> d XOR po."""
    return [(d, d ^ po) for d in range(n_dev)]


def _stage_cross(x, tw_stage, half, chunk, n_dev, inverse_dit=False):
    """One cross-device butterfly stage on local chunk x: (L, chunk)."""
    d = lax.axis_index(AXIS)
    po = half // chunk
    low_side = ((d // po) % 2) == 0
    other = lax.ppermute(x, AXIS, _swap_permutation(n_dev, po))
    # twiddle slice for this device: global j = g mod half, offset (d*ch)%half
    offset = (d * chunk) % half
    tw = lax.dynamic_slice(tw_stage, (0, offset), (Fr.L, chunk))
    if not inverse_dit:
        # DIF: low -> u+v ; high -> (u_recv - v_mine)*tw
        low_out = Fr.add(x, other)
        high_out = Fr.mul(Fr.sub(other, x), tw)
    else:
        # DIT: t = v*tw; low -> u+t ; high -> u_recv - t(mine)
        t_low = Fr.mul(other, tw)   # low device: other = v
        t_high = Fr.mul(x, tw)      # high device: mine = v
        low_out = Fr.add(x, t_low)
        high_out = Fr.sub(other, t_high)
    return jnp.where(low_side, low_out, high_out)


def _stage_local_dif(x, tw_stage, n, chunk):
    half = n // 2
    blocks = chunk // n
    xv = x.reshape(Fr.L, blocks, n)
    u = xv[:, :, :half]
    v = xv[:, :, half:]
    tw = tw_stage[:, None, :]
    a = Fr.add(u, v)
    b = Fr.mul(Fr.sub(u, v), jnp.broadcast_to(tw, u.shape))
    return jnp.concatenate([a, b], axis=2).reshape(Fr.L, chunk)


def _stage_local_dit(x, tw_stage, n, chunk):
    half = n // 2
    blocks = chunk // n
    xv = x.reshape(Fr.L, blocks, n)
    u = xv[:, :, :half]
    v = xv[:, :, half:]
    tw = tw_stage[:, None, :]
    t = Fr.mul(v, jnp.broadcast_to(tw, v.shape))
    return jnp.concatenate([Fr.add(u, t), Fr.sub(u, t)],
                           axis=2).reshape(Fr.L, chunk)


class ShardedNttDomain(NttDomain):
    """NttDomain whose transforms run under shard_map over a 1-D mesh."""

    def __init__(self, m, mesh, coset_gen=None):
        if coset_gen is None:
            super().__init__(m)
        else:
            super().__init__(m, coset_gen)
        self.mesh = mesh
        self.n_dev = mesh.devices.size
        assert m % self.n_dev == 0
        self.chunk = m // self.n_dev
        assert self.chunk >= 2 or self.n_dev == 1

    # local chunk transforms (called inside shard_map)

    def _dif_local(self, x, twiddles):
        m, chunk, n_dev = self.m, self.chunk, self.n_dev
        for s in range(self.k):
            n = m >> s
            half = n // 2
            tw = jnp.asarray(twiddles[s])
            if half >= chunk and n_dev > 1:
                x = _stage_cross(x, tw, half, chunk, n_dev, inverse_dit=False)
            else:
                x = _stage_local_dif(x, tw, n, chunk)
        return x

    def _dit_local(self, x, twiddles):
        m, chunk, n_dev = self.m, self.chunk, self.n_dev
        for s in range(self.k - 1, -1, -1):
            n = m >> s
            half = n // 2
            tw = jnp.asarray(twiddles[s])
            if half >= chunk and n_dev > 1:
                x = _stage_cross(x, tw, half, chunk, n_dev, inverse_dit=True)
            else:
                x = _stage_local_dit(x, tw, n, chunk)
        return x

    # local traced transforms (composable inside a larger shard_map body;
    # x is this device's (L, chunk) shard, scale chunks arrive pre-sharded)

    def ifft_local(self, x):
        """Evaluations -> bitrev coefficients incl 1/m (local shard)."""
        x = self._dif_local(x, self.tw_inv)
        scale = jnp.asarray(self.m_inv_mont)
        return Fr.mul(x, jnp.broadcast_to(scale, x.shape))

    def fft_local(self, x):
        """Bitrev coefficients -> evaluations (local shard)."""
        return self._dit_local(x, self.tw_fwd)

    def coset_fft_local(self, x, scale_chunk):
        """Bitrev coefficients -> evaluations on g*H.  scale_chunk: this
        device's chunk of coset_scale_bitrev."""
        return self._dit_local(Fr.mul(x, scale_chunk), self.tw_fwd)

    def icoset_fft_local(self, x, unscale_chunk):
        """Evaluations on g*H -> bitrev coefficients.  unscale_chunk: this
        device's chunk of coset_unscale_bitrev."""
        x = self.ifft_local(x)
        return Fr.mul(x, unscale_chunk)

    def divide_by_z_local(self, x):
        scale = jnp.asarray(self.z_coset_inv_mont)
        return Fr.mul(x, jnp.broadcast_to(scale, x.shape))

    # sharded public transforms

    def sharded(self, fn_local, n_scales=0):
        """shard_map + jit a local transform; n_scales extra (L, m)
        pointwise-constant operands are sharded like the data."""
        specs = (P(None, AXIS),) * (1 + n_scales)
        return jax.jit(jax.shard_map(
            fn_local, mesh=self.mesh,
            in_specs=specs, out_specs=P(None, AXIS)))

    def fft_coeffs_bitrev_to_evals_sharded(self):
        return self.sharded(self.fft_local)

    def ifft_evals_to_coeffs_bitrev_sharded(self):
        return self.sharded(self.ifft_local)

    def coset_fft_coeffs_bitrev_to_evals_sharded(self):
        fn = self.sharded(self.coset_fft_local, n_scales=1)
        scale = jnp.asarray(self.coset_scale_bitrev)
        return lambda x: fn(x, scale)

    def icoset_fft_evals_to_coeffs_bitrev_sharded(self):
        fn = self.sharded(self.icoset_fft_local, n_scales=1)
        unscale = jnp.asarray(self.coset_unscale_bitrev)
        return lambda x: fn(x, unscale)

    def divide_by_z_on_coset_sharded(self):
        return self.sharded(self.divide_by_z_local)
