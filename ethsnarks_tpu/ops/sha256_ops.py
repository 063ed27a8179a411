"""Batched SHA-256 witness trace on device (uint32 lanes).

Master-instance analog for the reference's costliest gadget
(src/gadgets/sha256_many.hpp:20-148, ~27k constraints/compression): ONE
jitted uint32 trace computes every intermediate value the circuit gadgets
in :mod:`ethsnarks_tpu.gadgets.sha256` allocate - xor-chain aux words,
Ch/Maj words, modular-add outputs and carry words - for a whole batch of
instances at once, so the host never runs the per-gadget python witness
recursion.  Same pattern as :mod:`ethsnarks_tpu.ops.poseidon_ops` /
:mod:`ethsnarks_tpu.ops.mimc` for the other batched models.

Compiler shape: the schedule and the 64 rounds run as lax.scans (uniform
bodies), NOT an unrolled 1264-op graph - the unrolled form compiled for
minutes under XLA:CPU with the test suite's virtual-device flag.

The trace's per-compression word stream is aligned, gadget for gadget,
with ``sha256_compression.gadgets`` construction order (see
``WORDS_PER_GADGET`` and models.sha256_batch._build_assignment):

  schedule t=16..63:  [s0_pair, s0_out, s1_pair, s1_out, w_out, w_carry]
  rounds   t=0..63:   [S1_pair, S1_out, ch, t1_out, t1_carry,
                       S0_pair, S0_out, maj_ab, maj_out, t2_out, t2_carry,
                       e_out, e_carry, a_out, a_carry]
  feed-forward i=0..7: [h_out, h_carry]

48*6 + 64*15 + 8*2 = 1264 words per compression, each a (B,) uint32 lane
vector.  xor-pair words are first^second input (the aux ``t`` wire of a
3-wire _XorWords step); carry words hold the full multi-bit carry of a
_ModAdd (bit j = carry wire j).
"""

import jax
import jax.numpy as jnp

from ..gadgets.sha256 import SHA256_K, SHA256_IV

WORDS_PER_COMP = 48 * 6 + 64 * 15 + 8 * 2   # 1264

_U32 = jnp.uint32
_M16 = jnp.uint32(0xffff)


def _rotr(x, n):
    return ((x >> n) | (x << (32 - n))).astype(_U32)


def _modadd(words):
    """Exact sum of uint32 lane vectors via 16-bit halves (no uint64):
    returns (sum mod 2^32, carry = sum >> 32)."""
    lo = words[0] & _M16
    hi = words[0] >> 16
    for w in words[1:]:
        lo = lo + (w & _M16)
        hi = hi + (w >> 16)
    tot_hi = hi + (lo >> 16)
    out = ((tot_hi & _M16) << 16) | (lo & _M16)
    return out.astype(_U32), (tot_hi >> 16).astype(_U32)


def _compression_trace(state, block):
    """One SHA-256 compression over (B,) uint32 lanes.

    state: tuple of 8, block: (16, B).  Returns (new_state tuple,
    ops (WORDS_PER_COMP, B)) - word order per the module docstring."""

    def sched_step(w_last16, _):
        a15, a2 = w_last16[1], w_last16[14]
        p0 = _rotr(a15, 7) ^ _rotr(a15, 18)
        x0 = p0 ^ (a15 >> 3)
        p1 = _rotr(a2, 17) ^ _rotr(a2, 19)
        x1 = p1 ^ (a2 >> 10)
        out, carry = _modadd([w_last16[0], x0, w_last16[9], x1])
        nxt = jnp.concatenate([w_last16[1:], out[None]], axis=0)
        return nxt, jnp.stack([p0, x0, p1, x1, out, carry])

    _, sched_ops = jax.lax.scan(sched_step, block, None, length=48)
    w_all = jnp.concatenate([block, sched_ops[:, 4]], axis=0)   # (64, B)

    def round_step(st, xs):
        wt, kt = xs
        a, b, c, d, e, f, g, h = st
        pS1 = _rotr(e, 6) ^ _rotr(e, 11)
        S1 = pS1 ^ _rotr(e, 25)
        ch = (e & f) ^ (~e & g)
        t1, c1 = _modadd([h, S1, ch, jnp.broadcast_to(kt, e.shape), wt])
        pS0 = _rotr(a, 2) ^ _rotr(a, 13)
        S0 = pS0 ^ _rotr(a, 22)
        mt = a & b
        maj = mt ^ (a & c) ^ (b & c)
        t2, c2 = _modadd([S0, maj])
        ne, ce = _modadd([d, t1])
        na, ca = _modadd([t1, t2])
        ops = jnp.stack([pS1, S1, ch, t1, c1, pS0, S0, mt, maj, t2, c2,
                         ne, ce, na, ca])
        return (na, a, b, c, ne, e, f, g), ops

    ks = jnp.asarray(SHA256_K, dtype=_U32)
    final, round_ops = jax.lax.scan(round_step, tuple(state), (w_all, ks))

    ff = []
    new_state = []
    for i, word in enumerate(final):
        o, cc = _modadd([state[i], word])
        ff += [o, cc]
        new_state.append(o)
    B = block.shape[1]
    ops = jnp.concatenate([
        sched_ops.reshape(48 * 6, B),
        round_ops.reshape(64 * 15, B),
        jnp.stack(ff),
    ], axis=0)
    return tuple(new_state), ops


@jax.jit
def sha256_witness_trace(blocks):
    """blocks: (n_blocks, 16, B) uint32 message-schedule input words
    (constants - padding - included).  Returns (final_state (8, B),
    ops (n_blocks, WORDS_PER_COMP, B))."""
    B = blocks.shape[2]
    init = tuple(jnp.full((B,), iv, _U32) for iv in SHA256_IV)

    def step(state, block):
        return _compression_trace(state, block)

    state, ys = jax.lax.scan(step, init, blocks)
    return jnp.stack(state), ys
