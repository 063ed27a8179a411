"""Batched SHA-256 circuit with device-side witness generation.

TPU-first equivalent of the reference's master-instance template system
for its costliest gadget (src/gadgets/sha256_many.hpp:20-148, ~27k
constraints/compression): the circuit rows are stamped per instance by
:class:`ethsnarks_tpu.gadgets.sha256.sha256_many`, while the witness of
ALL instances is computed by ONE batched uint32 device trace
(:func:`ethsnarks_tpu.ops.sha256_ops.sha256_witness_trace`) and
bulk-assigned into the variable vector - no per-gadget python witness
recursion.  Same pattern as models.poseidon_batch / models.merkle_batch.
"""

import hashlib

import numpy as np
import jax.numpy as jnp

from ..r1cs import ConstraintSystem
from ..gadgets.sha256 import (
    sha256_many, sha256_compression, bits2blocks_padded,
    _XorWords, _Ch, _Maj, _ModAdd)
from ..ops.sha256_ops import sha256_witness_trace, WORDS_PER_COMP


def _build_assignment(comp, word_base):
    """Walk one sha256_compression's gadgets in construction order and pair
    each allocated wire with its (word offset, bit position) in the trace's
    per-compression word stream (ops.sha256_ops module docstring).  Returns
    parallel lists (var_idx, op_idx, bit_pos)."""
    var_idx, op_idx, bit_pos = [], [], []
    cur = word_base
    for g in comp.gadgets:
        if isinstance(g, _XorWords):
            pair, out = cur, cur + 1
            cur += 2
            for step in g.steps:
                if step is None:
                    continue
                wires, const, o, i, t = step
                var_idx.append(o.index)
                op_idx.append(out)
                bit_pos.append(i)
                if t is not None:
                    # aux t = first^second input word bit
                    var_idx.append(t.index)
                    op_idx.append(pair)
                    bit_pos.append(i)
        elif isinstance(g, _Ch):
            for i, vb in enumerate(g.out_bits):
                var_idx.append(vb.index)
                op_idx.append(cur)
                bit_pos.append(i)
            cur += 1
        elif isinstance(g, _Maj):
            for arr, off in ((g.t_bits, 0), (g.out_bits, 1)):
                for i, vb in enumerate(arr):
                    var_idx.append(vb.index)
                    op_idx.append(cur + off)
                    bit_pos.append(i)
            cur += 2
        elif isinstance(g, _ModAdd):
            for i, vb in enumerate(g.out_bits):
                var_idx.append(vb.index)
                op_idx.append(cur)
                bit_pos.append(i)
            for j, vb in enumerate(g.carry_bits):
                var_idx.append(vb.index)
                op_idx.append(cur + 1)
                bit_pos.append(j)
            cur += 2
        else:   # pragma: no cover - new gadget kind added to compression
            raise TypeError("unknown sha256 sub-gadget %r" % type(g))
    assert cur - word_base == WORDS_PER_COMP, (cur - word_base)
    return var_idx, op_idx, bit_pos


def _padded_words(message, n_bits):
    """SHA-256 padded message as (n_blocks, 16) uint32 words."""
    assert len(message) * 8 == n_bits
    n_blocks = bits2blocks_padded(n_bits)
    buf = bytearray(message)
    buf.append(0x80)
    while len(buf) % 64 != 56:
        buf.append(0)
    buf += int(n_bits).to_bytes(8, 'big')
    assert len(buf) == n_blocks * 64
    return np.frombuffer(bytes(buf), dtype='>u4').reshape(
        n_blocks, 16).astype(np.uint32)


class BatchSha256(object):
    """N independent sha256_many instances (byte-aligned messages of
    ``n_bits`` bits) with the digest packed into two public field elements
    each; witness filled by one batched device trace.

    Constraint parity with the per-instance gadget is structural (the same
    sha256_many stamps the rows); tests pin count == N * single-instance
    count and hashlib digests."""

    def __init__(self, n_instances, n_bits=512):
        assert n_bits % 8 == 0, "byte-aligned messages only"
        self.n_instances = n_instances
        self.n_bits = n_bits
        self.n_blocks = bits2blocks_padded(n_bits)
        pb = ConstraintSystem()
        self.digest_vs = []
        for i in range(n_instances):
            self.digest_vs.append(
                (pb.allocate('digest_hi_%d' % i),
                 pb.allocate('digest_lo_%d' % i)))
        pb.set_input_sizes(2 * n_instances)

        self.input_vs = []
        self.gadgets = []
        self._assign = []       # per instance: (var_idx, op_idx, bit_pos)
        for i in range(n_instances):
            in_bits = pb.allocate_array(n_bits, 'msg_%d' % i)
            g = sha256_many(pb, in_bits, 'sha_%d' % i)
            g.generate_r1cs_constraints()
            res = g.result()    # 256 bits, MSB first
            lc_hi = sum(b * (1 << (127 - k)) for k, b in enumerate(res[:128]))
            lc_lo = sum(b * (1 << (127 - k)) for k, b in enumerate(res[128:]))
            d_hi, d_lo = self.digest_vs[i]
            pb.add_constraint(lc_hi, 1, d_hi + 0, 'pack_hi_%d' % i)
            pb.add_constraint(lc_lo, 1, d_lo + 0, 'pack_lo_%d' % i)
            self.input_vs.append(in_bits)
            self.gadgets.append(g)
            vi, oi, bp = [], [], []
            for blk, comp in enumerate(g.comps):
                assert isinstance(comp, sha256_compression)
                a, b, c = _build_assignment(comp, blk * WORDS_PER_COMP)
                vi += a
                oi += b
                bp += c
            self._assign.append((vi, np.asarray(oi, np.int64),
                                 np.asarray(bp, np.uint32)))
        self.pb = pb
        # identical structure across instances: share the op/bit arrays
        self._op_idx = self._assign[0][1]
        self._bit_pos = self._assign[0][2]
        for vi, oi, bp in self._assign[1:]:
            assert np.array_equal(oi, self._op_idx)
            assert np.array_equal(bp, self._bit_pos)

    def set_witness(self, messages):
        """messages: n_instances byte strings of n_bits//8 bytes.  ONE
        batched device trace fills every xor/ch/maj/add wire."""
        assert len(messages) == self.n_instances
        pb = self.pb
        B = self.n_instances

        # input bit wires (MSB-first within the byte stream)
        for i, msg in enumerate(messages):
            bits = np.unpackbits(
                np.frombuffer(msg, dtype=np.uint8)).tolist()
            vs = self.input_vs[i]
            values = pb.values
            for v, bit in zip(vs, bits):
                values[v.index] = bit

        blocks = np.stack([_padded_words(m, self.n_bits)
                           for m in messages])           # (B, n_blocks, 16)
        blocks = np.moveaxis(blocks, 0, 2)               # (n_blocks, 16, B)
        final, ops = sha256_witness_trace(jnp.asarray(blocks))
        W = np.asarray(ops).reshape(self.n_blocks * WORDS_PER_COMP, B)
        bits = ((W[self._op_idx] >> self._bit_pos[:, None]) & 1)  # (A, B)

        values = pb.values
        for i in range(B):
            col = bits[:, i].tolist()
            for vi, bit in zip(self._assign[i][0], col):
                values[vi] = int(bit)

        final = np.asarray(final)                        # (8, B)
        for i, msg in enumerate(messages):
            digest = b''.join(int(final[w, i]).to_bytes(4, 'big')
                              for w in range(8))
            assert digest == hashlib.sha256(msg).digest()
            d_hi, d_lo = self.digest_vs[i]
            pb.setval(d_hi, int.from_bytes(digest[:16], 'big'))
            pb.setval(d_lo, int.from_bytes(digest[16:], 'big'))
        return self

    def digests(self):
        return [(self.pb.val(h), self.pb.val(lo))
                for h, lo in self.digest_vs]
