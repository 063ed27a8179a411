"""Batched prime-field arithmetic on TPU: limb-decomposed Montgomery kernels.

This is the TPU-native replacement for libff's Fp arithmetic (the compute
engine behind every gadget/MSM/NTT in the reference — see SURVEY.md §2.9).
Design:

 - Elements are vectors of ``L`` limbs of ``W`` bits (default 20 x 13) held in
   uint32 arrays with the **limb axis first**: shape ``(L, *batch)``.  The
   batch dims land in TPU vector lanes; every op below is element-wise over
   the batch and fully branch-free (XLA/VPU friendly).
 - Multiplication is CIOS Montgomery multiplication with *lazy carries*:
   13-bit limbs make every partial product fit in 26 bits, so a uint32
   accumulator absorbs all 20 outer iterations (max column value
   ~20*2*(2^13-1)^2 + carries < 2^32) without intermediate normalization.
   A single sequential carry ripple + one conditional subtract canonicalize
   the result.
 - All loop structure is static Python (unrolled into the XLA graph); callers
   wrap larger structures (hash rounds, ladder steps) in ``lax.scan``.

Two instances matter: ``Fp(BN254_R)`` — the R1CS/witness/NTT field (also the
Baby-JubJub base field) — and ``Fp(BN254_Q)`` — the G1/G2 coordinate field
for MSM.  Oracle: :mod:`ethsnarks_tpu.field` (tests pin randomized vectors).
"""

import numpy as np
import jax.numpy as jnp

# BN254 parameter set (matches src/ethsnarks.hpp curve selection).
BN254_R = 21888242871839275222246405745257275088548364400416034343698204186575808495617
BN254_Q = 21888242871839275222246405745257275088696311157297823662689037894645226208583

LIMB_BITS = 13
NUM_LIMBS = 20
LIMB_MASK = (1 << LIMB_BITS) - 1


def _int_to_limbs(value, n=NUM_LIMBS):
    return [(value >> (LIMB_BITS * i)) & LIMB_MASK for i in range(n)]


class Fp:
    """Montgomery arithmetic context for a fixed modulus (R = 2^(13*20))."""

    def __init__(self, modulus):
        self.modulus = modulus
        self.L = NUM_LIMBS
        self.W = LIMB_BITS
        self.R = 1 << (LIMB_BITS * NUM_LIMBS)
        assert modulus < self.R // 2, "need headroom for lazy CIOS"
        self.R_mod = self.R % modulus
        self.R2_mod = (self.R * self.R) % modulus
        # -N^-1 mod 2^W  (CIOS-style single-limb multiplier, kept for
        # reference) and the full -N^-1 mod R used by separated REDC.
        self.n0inv = (-pow(modulus, -1, 1 << LIMB_BITS)) & LIMB_MASK
        self.nprime = (-pow(modulus, -1, self.R)) % self.R
        self.nprime_limbs = np.array(_int_to_limbs(self.nprime), dtype=np.uint32)

        self.n_limbs = np.array(_int_to_limbs(modulus), dtype=np.uint32)
        self.r2_limbs = np.array(_int_to_limbs(self.R2_mod), dtype=np.uint32)
        self.one_mont_limbs = np.array(_int_to_limbs(self.R_mod), dtype=np.uint32)
        self.zero_limbs = np.zeros(NUM_LIMBS, dtype=np.uint32)

        # Jitted entry points for host-driven (eager) use; inside larger jitted
        # programs call the plain methods so everything fuses into one XLA
        # computation.
        import jax
        self.add_jit = jax.jit(self.add)
        self.sub_jit = jax.jit(self.sub)
        self.mul_jit = jax.jit(self.mul)
        self.neg_jit = jax.jit(self.neg)
        self.inv_jit = jax.jit(self.inv)
        self.to_mont_jit = jax.jit(self.to_mont)
        self.from_mont_jit = jax.jit(self.from_mont)

    # ---------------- host <-> device representation ----------------

    def to_limbs(self, values):
        """Python ints (scalar or sequence/ndarray of objects) -> uint32 (L, B)."""
        if isinstance(values, (int,)):
            return np.array(_int_to_limbs(values % self.modulus),
                            dtype=np.uint32)
        values = list(values)
        if len(values) > 64:
            return self.to_limbs_fast(values)
        arr = [int(v) % self.modulus for v in values]
        out = np.zeros((self.L, len(arr)), dtype=np.uint32)
        for b, v in enumerate(arr):
            for i in range(self.L):
                out[i, b] = (v >> (self.W * i)) & LIMB_MASK
        return out

    def _from_limbs_bytes(self, flat):
        """(L, n) uint32 canonical limbs -> list of python ints via 16-bit
        accumulation planes + int.from_bytes (C speed; the per-element
        shift-or loop costs ~2.5us/element and dominated the generator's
        affine downloads at 2^20)."""
        n = flat.shape[1]
        planes = np.zeros((18, n), np.uint64)      # 16-bit planes, 288 bits
        a = flat.astype(np.uint64)
        for i in range(self.L):
            bit0 = i * self.W
            w0, sh = bit0 >> 4, bit0 & 15
            v = a[i] << np.uint64(sh)              # <= W+15 bits
            planes[w0] += v & np.uint64(0xffff)
            planes[w0 + 1] += v >> np.uint64(16)
        for _ in range(4):
            carry = planes >> np.uint64(16)
            if not carry.any():
                break
            planes &= np.uint64(0xffff)
            planes[1:] += carry[:-1]
        buf = planes.T.astype('<u2').tobytes()
        mod = self.modulus
        step = 36
        return [int.from_bytes(buf[k * step:k * step + step],
                               'little') % mod for k in range(n)]

    def from_limbs(self, limbs):
        """uint32 (L, *batch) -> python ints (nested lists follow batch dims)."""
        limbs = np.asarray(limbs)
        flat = limbs.reshape(self.L, -1)
        if flat.shape[1] > 64 and (self.L - 1) * self.W <= 263 \
                and int(flat.max(initial=0)) <= LIMB_MASK:
            vals = self._from_limbs_bytes(flat)
        else:
            vals = []
            for b in range(flat.shape[1]):
                v = 0
                for i in reversed(range(self.L)):
                    v = (v << self.W) | int(flat[i, b])
                vals.append(v % self.modulus)
        if limbs.ndim == 1:
            return vals[0]
        if limbs.ndim == 2:
            return vals
        return np.array(vals, dtype=object).reshape(limbs.shape[1:]).tolist()

    def from_limbs_fast(self, limbs):
        """Vectorized from_limbs: uint32 (L, *batch) -> object ndarray of
        python ints with the batch shape (20 numpy passes, no per-element
        python loop)."""
        arr = np.asarray(limbs)
        out = np.zeros(arr.shape[1:], dtype=object)
        for i in reversed(range(self.L)):
            out = (out << self.W) + arr[i].astype(object)
        return out % self.modulus

    def to_limbs_fast(self, values):
        """Vectorized to_limbs: object/int ndarray (*batch) -> uint32 limbs
        (L, *batch).

        1-D int batches take a bytes fast path (int.to_bytes at C speed +
        numpy byte-window extraction) instead of L python-bigint mask
        passes - the prover's witness-limb phase at 2^20 dropped ~5x."""
        if (self.L - 1) * self.W <= 263 and (
                isinstance(values, (list, tuple)) or (
                    isinstance(values, np.ndarray) and values.ndim == 1)):
            mod = self.modulus
            try:
                buf = b''.join((int(v) % mod).to_bytes(32, 'little')
                               for v in values)
            except (TypeError, AttributeError, OverflowError):
                buf = None
            if buf is not None:
                n = len(values)
                # byte-MAJOR layout: each byte plane contiguous (the
                # column-strided variant was 13x slower)
                rT = np.zeros((36, n), dtype=np.uint32)
                rT[:32] = np.frombuffer(
                    buf, dtype=np.uint8).reshape(n, 32).T
                out = np.empty((self.L, n), dtype=np.uint32)
                mask32 = np.uint32((1 << self.W) - 1)
                for i in range(self.L):
                    bit0 = i * self.W
                    b0, sh = bit0 >> 3, bit0 & 7
                    v = (rT[b0] | (rT[b0 + 1] << np.uint32(8))
                         | (rT[b0 + 2] << np.uint32(16))
                         | (rT[b0 + 3] << np.uint32(24)))
                    out[i] = (v >> np.uint32(sh)) & mask32
                return out
        arr = np.asarray(values, dtype=object) % self.modulus
        out = np.zeros((self.L,) + arr.shape, dtype=np.uint32)
        mask = (1 << self.W) - 1
        cur = arr
        for i in range(self.L):
            out[i] = (cur & mask).astype(np.uint32)
            cur = cur >> self.W
        return out

    def constant_mont(self, value, batch_shape=()):
        """Host int -> Montgomery-form limb array broadcast over batch_shape."""
        m = (int(value) % self.modulus) * self.R_mod % self.modulus  # value*R
        limbs = np.array(_int_to_limbs(m), dtype=np.uint32)
        return np.broadcast_to(limbs.reshape((self.L,) + (1,) * len(batch_shape)),
                               (self.L,) + tuple(batch_shape)).copy()

    # ---------------- canonicalization helpers ----------------

    @staticmethod
    def _shift_up(c):
        """Shift a (K, ...) column array up one limb (carry movement)."""
        return jnp.concatenate([jnp.zeros_like(c[:1]), c[:-1]], axis=0)

    def _carry_exact(self, cols, extra=1):
        """Exact carry propagation of a (K, ...) uint32 column array (values
        arbitrary up to ~2^31.5) into (K+extra, ...) canonical 13-bit limbs.

        Three masked-shift passes bring every digit to <= 2^13, then a
        Kogge-Stone prefix resolves the remaining 0/1 carries in log depth -
        no sequential ripple over limbs."""
        t = cols
        for _ in range(extra):
            t = jnp.concatenate([t, jnp.zeros_like(t[:1])], axis=0)
        # pass 1..3: digits drop to <= 2^13 (8192)
        for _ in range(3):
            t = (t & LIMB_MASK) + self._shift_up(t >> self.W)
        # Kogge-Stone on the residual binary carries:
        # g = digit overflows by itself, p = digit propagates an incoming carry
        g = (t >> self.W).astype(jnp.uint32)        # 1 iff t == 8192
        p = (t == LIMB_MASK)
        shift = 1
        K = t.shape[0]
        while shift < K:
            g_prev = jnp.concatenate(
                [jnp.zeros_like(g[:shift]), g[:-shift]], axis=0)
            p_prev = jnp.concatenate(
                [jnp.zeros((shift,) + p.shape[1:], dtype=bool), p[:-shift]],
                axis=0)
            g = g | (p & g_prev)
            p = p & p_prev
            shift *= 2
        carry_in = self._shift_up(g)
        return (t + carry_in) & LIMB_MASK

    def _carry(self, t):
        """(L, ...) lazy accumulator -> (L+1, ...) canonical limbs."""
        return self._carry_exact(t, extra=1)

    def _ks_sub(self, x, y_np):
        """x (K, ...) canonical limbs minus constant limb array y_np (K,).

        Returns (diff mod 2^(13K) as canonical limbs, underflow flag).
        Borrow resolution is a Kogge-Stone prefix (log depth)."""
        K = x.shape[0]
        y = np.asarray(y_np, dtype=np.int32).reshape((K,) + (1,) * (x.ndim - 1))
        d = x.astype(jnp.int32) - y
        g = d < 0
        p = d == 0
        shift = 1
        while shift < K:
            zeros = jnp.zeros((shift,) + g.shape[1:], dtype=bool)
            g_prev = jnp.concatenate([zeros, g[:-shift]], axis=0)
            p_prev = jnp.concatenate([zeros, p[:-shift]], axis=0)
            g = g | (p & g_prev)
            p = p & p_prev
            shift *= 2
        borrow_in = jnp.concatenate(
            [jnp.zeros((1,) + g.shape[1:], dtype=bool), g[:-1]], axis=0)
        r = ((d - borrow_in.astype(jnp.int32)) & LIMB_MASK).astype(jnp.uint32)
        return r, g[-1]

    def _cond_sub_n(self, t):
        """t is (L+1, ...) canonical limbs with value < 2N: subtract N when
        t >= N, returning (L, ...) canonical limbs < N."""
        n_ext = np.concatenate([self.n_limbs, [0]])
        d, underflow = self._ks_sub(t, n_ext)
        ge_n = jnp.logical_not(underflow)
        return jnp.where(ge_n[None], d[:self.L], t[:self.L])

    # ---------------- field operations (all inputs canonical < N) ----------------

    def add(self, a, b):
        t = self._carry(a + b)
        return self._cond_sub_n(t)

    def _ks_sub_var(self, x, y):
        """x - y for two canonical limb arrays of equal shape (K, ...).

        Returns (diff mod 2^(13K), underflow flag); Kogge-Stone borrows."""
        K = x.shape[0]
        d = x.astype(jnp.int32) - y.astype(jnp.int32)
        g = d < 0
        p = d == 0
        shift = 1
        while shift < K:
            zeros = jnp.zeros((shift,) + g.shape[1:], dtype=bool)
            g = g | (p & jnp.concatenate([zeros, g[:-shift]], axis=0))
            p = p & jnp.concatenate([zeros, p[:-shift]], axis=0)
            shift *= 2
        borrow_in = jnp.concatenate(
            [jnp.zeros((1,) + g.shape[1:], dtype=bool), g[:-1]], axis=0)
        r = ((d - borrow_in.astype(jnp.int32)) & LIMB_MASK).astype(jnp.uint32)
        return r, g[-1]

    def sub(self, a, b):
        """a - b mod N: KS subtract, then add N back on underflow."""
        r, underflow = self._ks_sub_var(a, b)
        n = self.n_limbs.reshape((self.L,) + (1,) * (a.ndim - 1))
        # (r + N) mod 2^260 == a - b + N when a < b (drop the wrap constant).
        plus_n = self._carry_exact(r + n, extra=0)
        return jnp.where(underflow[None], plus_n, r)

    def neg(self, a):
        return self.sub(jnp.zeros_like(a), a)

    def _cond_sub_multiple(self, t, mult):
        """Subtract mult*N from the (K, ...)-limb value t when t >= mult*N.
        Returns (K, ...) limbs.  Used for reducing short lazy sums."""
        K = t.shape[0]
        mn = _int_to_limbs(mult * self.modulus, K)
        d, underflow = self._ks_sub(t, mn)
        return jnp.where(underflow[None], t, d)

    def add_many(self, terms):
        """Modular sum of k canonical terms with one lazy limb-sum, one carry
        ripple, and log2(k) conditional subtracts.  k*2^13 must fit uint32."""
        k = len(terms)
        assert k >= 1
        acc = terms[0]
        for term in terms[1:]:
            acc = acc + term  # lazy uint32 limb sums, max k*(2^13-1)
        t = self._carry(acc)
        mult = 1
        while mult * 2 < k:
            mult *= 2
        while mult >= 1:
            t = self._cond_sub_multiple(t, mult)
            mult //= 2
        return t[:self.L]

    def sum_axis(self, a, axis):
        """Modular reduction along a batch axis of a (L, ...) array (the limb
        axis is 0; ``axis`` counts in the full array's indices, >= 1)."""
        k = a.shape[axis]
        assert k * ((1 << self.W) - 1) < (1 << 32)
        t = self._carry(jnp.sum(a, axis=axis, dtype=jnp.uint32))
        mult = 1
        while mult * 2 < k:
            mult *= 2
        while mult >= 1:
            t = self._cond_sub_multiple(t, mult)
            mult //= 2
        return t[:self.L]

    def mul(self, a, b):
        """Montgomery multiplication a*b/R mod N via separated REDC.

        Schoolbook column products (13-bit limbs make every column sum fit
        uint32 without intermediate carries), one exact carry to get T mod R,
        m = T*N' mod R by a second low product, then (T + m*N)/R.  Shallow
        dependency graph: three column-product loops + three log-depth
        carries, no per-limb sequential chain."""
        L = self.L
        batch = a.shape[1:]
        nd = len(batch)
        n = self.n_limbs.reshape((L,) + (1,) * nd)
        nprime = self.nprime_limbs.reshape((L,) + (1,) * nd)

        # T = a*b as 2L-1 lazy columns.  Derive the accumulator from the
        # inputs (zeros_like + pad) so batch shardings propagate unambiguously
        # through the scatter-adds below.
        pad_cfg = ((0, L - 1),) + ((0, 0),) * nd
        cols = jnp.pad(jnp.zeros_like(a), pad_cfg)
        for i in range(L):
            cols = cols.at[i:i + L].add(a[i] * b)

        # m = (T mod R) * N' mod R.
        t_lo = self._carry_exact(cols[:L], extra=0)  # T mod R, canonical
        mcols = jnp.zeros_like(a)
        for i in range(L):
            mcols = mcols.at[i:].add(t_lo[i] * nprime[:L - i])
        m = self._carry_exact(mcols, extra=0)

        # U = T + m*N; low L limbs vanish; result = U >> (13L).
        u = jnp.pad(cols, ((0, 1),) + ((0, 0),) * nd)
        for i in range(L):
            u = u.at[i:i + L].add(m[i] * n)
        uc = self._carry_exact(u, extra=1)  # (2L+1, ...)
        return self._cond_sub_n(uc[L:])

    def square(self, a):
        return self.mul(a, a)

    def to_mont(self, a):
        r2 = self.r2_limbs.reshape((self.L,) + (1,) * (a.ndim - 1))
        return self.mul(a, jnp.broadcast_to(r2, a.shape).astype(jnp.uint32))

    def from_mont(self, a):
        one = jnp.zeros_like(a).at[0].set(1)
        return self.mul(a, one)

    def pow_const(self, a, exponent):
        """a^exponent for a *static* python-int exponent.

        Small exponents (sbox x^5/x^7) unroll into the graph; large ones
        (Fermat inverse) run as a ``lax.scan`` over the exponent bits to keep
        the compiled program small.  Data-oblivious either way."""
        import jax.lax as lax
        exponent = int(exponent)
        assert exponent >= 1
        bits = bin(exponent)[2:]
        if len(bits) <= 16:
            acc = a
            for bit in bits[1:]:
                acc = self.mul(acc, acc)
                if bit == '1':
                    acc = self.mul(acc, a)
            return acc
        # MSB-first left-to-right ladder: acc = acc^2 * (bit ? a : 1).
        bit_arr = jnp.array([int(b) for b in bits[1:]], dtype=jnp.uint32)

        def step(acc, bit):
            acc = self.mul(acc, acc)
            mul_a = self.mul(acc, a)
            return jnp.where(bit != 0, mul_a, acc), None

        acc, _ = lax.scan(step, a, bit_arr)
        return acc

    def inv(self, a):
        """Fermat inverse a^(N-2); data-oblivious (a must be nonzero)."""
        return self.pow_const(a, self.modulus - 2)

    def is_zero(self, a):
        return jnp.all(a == 0, axis=0)

    def equal(self, a, b):
        return jnp.all(a == b, axis=0)

    def select(self, cond, a, b):
        """cond broadcast over batch dims: where(cond, a, b)."""
        return jnp.where(cond[None], a, b)

    def mont_one(self, batch_shape=()):
        limbs = self.one_mont_limbs.reshape((self.L,) + (1,) * len(batch_shape))
        return jnp.broadcast_to(limbs, (self.L,) + tuple(batch_shape)).astype(jnp.uint32)

    def zero(self, batch_shape=()):
        return jnp.zeros((self.L,) + tuple(batch_shape), dtype=jnp.uint32)


# Singleton contexts for the two BN254 fields.
Fr = Fp(BN254_R)
Fq = Fp(BN254_Q)
