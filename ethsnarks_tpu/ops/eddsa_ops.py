"""Batched PureEdDSA verification on TPU (BASELINE config: 16k signatures).

Per signature: lhs = s*B (fixed-base window scan), t = PedersenHash
('EdDSA_Verify.RAM', BITS(R.x) || BITS(A.x) || M) with one batched Fermat
inversion for the hash x-coordinate, rhs = R + t*A (variable-base scan).
The accept mask compares projectively (no inversions).

Oracle: ethsnarks_tpu.eddsa.PureEdDSA (host); tests pin signed batches.
"""

import numpy as np
import jax
import jax.numpy as jnp

from .fp import Fr
from . import jubjub_ops as jj
from ..eddsa import PureEdDSA

L = Fr.L
RAM_P13N = b'EdDSA_Verify.RAM'


def _msg_bits_device(msgs):
    """list of equal-length byte strings -> (nbits, B) uint32 (MSB-first per
    byte, matching host to_bits semantics)."""
    n = len(msgs)
    nbits = len(msgs[0]) * 8
    out = np.zeros((nbits, n), dtype=np.uint32)
    for b, m in enumerate(msgs):
        bits = ''.join(bin(byte)[2:].rjust(8, '0') for byte in m)
        for i, ch in enumerate(bits):
            out[i, b] = int(ch)
    return out


def eddsa_verify_batch(As, sigs, msgs):
    """Host API: lists of A Points, (R, s) signatures, byte messages (equal
    lengths).  Returns list of bools."""
    B = len(As)
    a_dev = jj.point_to_device(As)
    r_dev = jj.point_to_device([sig[0] for sig in sigs])
    s_bits = np.zeros((254, B), dtype=np.uint32)
    for b, sig in enumerate(sigs):
        s = int(sig[1])
        for i in range(254):
            s_bits[i, b] = (s >> i) & 1
    msg_bits = _msg_bits_device(msgs)
    ok = _eddsa_verify_jit(
        a_dev, r_dev, jnp.asarray(s_bits), jnp.asarray(msg_bits))
    return [bool(v) for v in np.asarray(ok)]


def _eddsa_verify_device(a_dev, r_dev, s_bits, msg_bits):
    gen = PureEdDSA.B()
    lhs = jj.fixed_base_mult_device(gen, s_bits)

    # t = pedersen(RAM, bits(R.x) || bits(A.x) || M).x
    rx_bits = jj.mont_to_bits(jj.etec_to_affine_x(r_dev))
    ax_bits = jj.mont_to_bits(jj.etec_to_affine_x(a_dev))
    all_bits = jnp.concatenate([rx_bits, ax_bits, msg_bits], axis=0)
    pad = (-all_bits.shape[0]) % 3
    if pad:
        all_bits = jnp.concatenate(
            [all_bits, jnp.zeros((pad, all_bits.shape[1]),
                                 dtype=all_bits.dtype)], axis=0)
    hash_pt = jj.pedersen_hash_bits_device(RAM_P13N, all_bits)
    t_bits = jj.mont_to_bits(jj.etec_to_affine_x(hash_pt))

    ta = jj.scalar_mult_bits(a_dev, t_bits)
    rhs = jj.etec_add(r_dev, ta)
    return jj.etec_equal(lhs, rhs)


_eddsa_verify_jit = jax.jit(_eddsa_verify_device)
