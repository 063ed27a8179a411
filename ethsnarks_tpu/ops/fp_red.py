"""Signed redundant-digit prime-field arithmetic (field core v2).

TPU-native replacement for libff's Fp (SURVEY.md §2.9) optimized for VPU op
count.  The v1 core (ops/fp.py) keeps canonical 13-bit limbs: every add/sub
pays a Kogge-Stone carry/borrow resolve plus a conditional subtract, and a
Montgomery mul pays three exact carry stages.  Measured on v5e, int32
multiply costs the same as add (tools/probe_vpu.py), so total op count is
the only lever.  This core cuts it roughly in half:

 - Elements are ``L = 22`` **signed** int32 digits of ``B = 12`` bits
   (base 2^12, limb axis first, shape ``(22, *batch)``).  Digits are
   *redundant*: any int32 vector with bounded digits represents
   ``sum(d_k * 2^(12 k))`` — values may be negative and exceed N.
 - **Subtraction is digit-wise** (signed digits need no borrow chain) and
   **addition is digit-wise**; each is followed by ONE cheap relax pass
   (mask + shift + add) instead of full carry resolution.
 - **Montgomery REDC (R = 2^264) needs no conditional subtract**: outputs
   stay bounded by ~1.03·N + |T|/R, which self-sustains for all chains the
   point formulas / NTT produce (see bound ledger below).
 - The top digit is never masked (so no value escapes a relax); a single
   RHO-fold inside rmul (RHO = 2^264 mod N) keeps it small across chains.

Bound ledger (int32 safety; worst cases, B = 12, L = 22):
 - standard digits: d[0..20] in [-128, 4224]; the TOP digit (21) is never
   masked by relax_keep (so no value escapes) and grows additively across
   add/sub chains: rmul and mul_small reset it to <= ~4200 via a top-carry
   RHO-fold.  HARD LIMIT: |top| <= 45000 at rmul inputs (column 42 is the
   single product top_a*top_b <= 2.03e9 < 2^31; middle columns
   <= 20*4224^2 + 2*45000*4224 + m*N columns <= 1.2e9).  That allows chains
   of ~10 adds between muls; longer add-only chains (deep NTT ladders along
   the un-multiplied path) must insert fold_top().
 - rmul accepts one un-relaxed add on each side: |d| <= 8448 ->
   column sums <= 22 * 8448^2 + top terms < 1.7e9 < 2^31 - 1.
 - product columns T: |col| <= 22*4224^2 + 2*1100*4224 ~ 4.0e8.
 - m, mN columns, u = T + mN: <= ~8.1e8.  All fit int32.
Values: |v| <= 2^256 standard; REDC needs |a|*|b| < R*N ~ 2^517.5 — holds
through any chain of <= 8 lazy adds (|v| <= 2^259).

Everything here is plain traced jnp on int32 arrays: usable inside Pallas
kernels AND under jit on CPU (the test oracle path).  Oracle:
:mod:`ethsnarks_tpu.field` via exact host conversion.
"""

from functools import lru_cache

import numpy as np
import jax.numpy as jnp

RB = 12                      # digit bits
RL = 22                      # digits per element
RMASK = (1 << RB) - 1        # 4095
RED_R = 1 << (RB * RL)       # Montgomery factor 2^264


def _int_to_digits(value, n=RL):
    return [(value >> (RB * i)) & RMASK for i in range(n)]


class RedField:
    """Host-side constants + conversions for one modulus (Fq or Fr)."""

    def __init__(self, modulus):
        assert modulus < RED_R // 512, "need headroom: R >~ 512*N"
        self.modulus = modulus
        self.r_mod = RED_R % modulus
        self.r2_mod = (RED_R * RED_R) % modulus
        self.r_inv = pow(RED_R, -1, modulus)
        self.nprime = (-pow(modulus, -1, RED_R)) % RED_R
        self.rho = RED_R % modulus          # fold constant for the top digit

        self.n_digits = np.array(_int_to_digits(modulus), dtype=np.int32)
        self.np_digits = np.array(_int_to_digits(self.nprime), dtype=np.int32)
        self.rho_digits = np.array(_int_to_digits(self.rho), dtype=np.int32)
        self.one_mont = np.array(_int_to_digits(self.r_mod), dtype=np.int32)
        # RHO's top digits must be small for the fold's carry argument:
        # rho < N < 2^254 so digit 21 (bits 252..263) is tiny.
        assert self.rho_digits[21] <= 8

    # ---------- host conversions (python ints / object ndarrays) ----------

    def to_digits(self, values):
        """Canonical (non-Montgomery) digits: ints -> (L, B) int32.

        Large batches take the bytes fast path (int.to_bytes + numpy
        byte-window extraction; the object-pass loop cost ~3us/element -
        tens of seconds for a 2^20 proving-key upload)."""
        arr = np.asarray(values, dtype=object).reshape(-1) % self.modulus
        n = arr.shape[0]
        if n > 64:
            buf = b''.join(int(v).to_bytes(32, 'little') for v in arr)
            rT = np.zeros((36, n), dtype=np.uint32)
            rT[:32] = np.frombuffer(buf, dtype=np.uint8).reshape(n, 32).T
            out = np.empty((RL, n), dtype=np.int32)
            for i in range(RL):
                bit0 = i * RB
                b0, sh = bit0 >> 3, bit0 & 7
                v = (rT[b0] | (rT[b0 + 1] << np.uint32(8))
                     | (rT[b0 + 2] << np.uint32(16)))
                out[i] = ((v >> np.uint32(sh))
                          & np.uint32(RMASK)).astype(np.int32)
            return out
        out = np.zeros((RL, n), dtype=np.int32)
        cur = arr
        for i in range(RL):
            out[i] = (cur & RMASK).astype(np.int64).astype(np.int32)
            cur = cur >> RB
        return out

    def to_mont(self, values):
        """ints -> Montgomery digits of v*R mod N."""
        arr = np.asarray(values, dtype=object).reshape(-1)
        return self.to_digits((arr * self.r_mod) % self.modulus)

    def from_digits(self, digits):
        """(L, *batch) signed int digits -> python-int ndarray (mod N)."""
        arr = np.asarray(digits, dtype=object)
        flat = arr.reshape(RL, -1)
        acc = np.zeros(flat.shape[1], dtype=object)
        for i in reversed(range(RL)):
            acc = (acc << RB) + flat[i]
        acc = acc % self.modulus
        return acc.reshape(arr.shape[1:])

    def from_mont(self, digits):
        vals = self.from_digits(digits)
        flat = vals.reshape(-1)
        out = np.array([(int(v) * self.r_inv) % self.modulus for v in flat],
                       dtype=object)
        return out.reshape(vals.shape)

    def packed_consts(self):
        """(L, 8) int32 constants block for kernels: col 0 = N, 1 = N',
        2 = RHO, 3 = one_mont."""
        packed = np.zeros((RL, 8), dtype=np.int32)
        packed[:, 0] = self.n_digits
        packed[:, 1] = self.np_digits
        packed[:, 2] = self.rho_digits
        packed[:, 3] = self.one_mont
        return packed


@lru_cache(maxsize=None)
def _field(modulus):
    return RedField(modulus)


def red_field(modulus):
    return _field(modulus)


# ---------------- traced digit ops (jnp int32; jit- and Pallas-safe) -------

def _shift_up(c):
    """Move digit k's entry to k+1 (drop top)."""
    return jnp.concatenate([jnp.zeros_like(c[:1]), c[:-1]], axis=0)


def _shifted(rows, i, total):
    """Place a (k, ...) block at row offset i within `total` rows (concat,
    not scatter: Mosaic-safe)."""
    parts = []
    if i > 0:
        parts.append(jnp.zeros((i,) + rows.shape[1:], dtype=rows.dtype))
    parts.append(rows)
    tail = total - i - rows.shape[0]
    if tail > 0:
        parts.append(jnp.zeros((tail,) + rows.shape[1:], dtype=rows.dtype))
    return jnp.concatenate(parts, axis=0) if len(parts) > 1 else parts[0]


@lru_cache(maxsize=None)
def _shear_idx_np(k2):
    """(RL, k2) gather indices: sheared[i, k] = prod[i, (k - i) mod k2]."""
    return ((np.arange(k2)[None, :] - np.arange(RL)[:, None]) % k2
            ).astype(np.int32)


def _acc_cols_lean(ai, bj, k2):
    """sum_i _shifted(ai[i] * bj, i, k2) with ~100x fewer HLO ops.

    The schoolbook column accumulation is an anti-diagonal sum of the
    digit outer product.  The unrolled concat chain emits ~850 StableHLO
    ops per field mul, which makes every inlined point-formula body huge -
    XLA:CPU spends tens of minutes optimizing MSM pipelines built from
    them.  This form is ONE broadcast multiply + ONE static gather (a
    per-row circular shear; no wraparound reaches a live column) + ONE
    reduce: identical int32 sums (wrapping add is associative and
    commutative), so results are bit-exact vs the unrolled form.  Not
    Mosaic-safe (2-D gather): only used on the engine='xla' path."""
    prod = ai[:, None] * bj[None, :RL]            # (RL, RL, *batch)
    pad = [(0, 0), (0, k2 - RL)] + [(0, 0)] * (prod.ndim - 2)
    prod = jnp.pad(prod, pad)
    idx = jnp.asarray(_shear_idx_np(k2)).reshape(
        (RL, k2) + (1,) * (prod.ndim - 2))
    sheared = jnp.take_along_axis(
        prod, jnp.broadcast_to(idx, prod.shape), axis=1)
    return sheared.sum(axis=0)                    # (k2, *batch)


def relax_keep(t):
    """One relax pass preserving the exact value: digits 0..K-2 masked to
    [0, 4095], carries move up one row, the TOP row stays unmasked and
    absorbs the incoming carry (nothing escapes)."""
    c = t >> RB
    r = (t & RMASK).astype(jnp.int32)
    r = jnp.concatenate([r[:-1], t[-1:]], axis=0)
    cin = jnp.concatenate([jnp.zeros_like(c[:1]), c[:-1]], axis=0)
    return r + cin


def relax_mod(t):
    """One relax pass modulo 2^(12*K): ALL digits masked, top carry dropped.
    Only valid where the array is used mod R (the m-path inside rmul)."""
    c = t >> RB
    r = (t & RMASK).astype(jnp.int32)
    return r + _shift_up(c)


def mk_red_ops(consts, engine='mosaic'):
    """Field-op closures over a packed (L, 8) int32 constants block.

    `consts` may be a numpy array (host/jit use) or an in-kernel VMEM load.
    Ops take/return (L, *batch) int32 digit arrays and assume "standard"
    digit bounds on inputs (see module docstring); every op returns standard
    digits.  All ops are value-exact mod N (redundant representation).

    engine='mosaic' (default): column accumulations in rmul unroll into
    concat chains (the only Mosaic-legal form; used inside Pallas kernels).
    engine='xla': the same sums via :func:`_acc_cols_lean` - bit-identical
    values, ~100x smaller HLO (used by the jit fallback path so XLA:CPU
    compiles in seconds instead of tens of minutes)."""
    assert engine in ('mosaic', 'xla')
    lean = engine == 'xla'
    n_col = consts[:, 0:1]
    np_col = consts[:, 1:2]
    rho_col = consts[:, 2:3]
    one_col = consts[:, 3:4]

    def reshape_const(col, nd):
        return col.reshape((RL,) + (1,) * max(nd - 1, 1))

    def fold_top(t, nd=None):
        """Mask the top digit to 12 bits and fold its carry through
        RHO = 2^264 mod N (value-exact).  Resets top-digit growth; the
        carry must be small (|c| <= ~16) for one relax to restandardize."""
        rho = reshape_const(rho_col, nd if nd is not None else t.ndim)
        top = t[RL - 1:RL]
        tcar = top >> RB
        top_m = (top & RMASK).astype(jnp.int32)
        t = jnp.concatenate([t[:RL - 1], top_m], axis=0) + tcar * rho
        return relax_keep(t)

    def radd(a, b):
        return relax_keep(a + b)

    def rsub(a, b):
        return relax_keep(a - b)

    def rneg(a):
        return relax_keep(-a)

    def rmul_small(a, s):
        """a * s for a small static python int (|s| <= 16); the top digit is
        re-folded so repeated mul_smalls cannot amplify it."""
        return fold_top(relax_keep(a * jnp.int32(s)))

    def rmul(a, b):
        """Montgomery product a*b*R^-1 mod N (value-exact, standard out).

        Separated REDC on lazy int32 columns; two relax passes where digit
        bounds are needed; exact low-half carry via the rounding identity
        (the low 22 columns of T + m*N are divisible by R); RHO-fold keeps
        the top digit small."""
        nd = a.ndim
        n = reshape_const(n_col, nd)
        npr = reshape_const(np_col, nd)
        rho = reshape_const(rho_col, nd)
        K2 = 2 * RL - 1     # 43 product columns

        if lean:
            # Same column sums via outer-product shear (bit-exact; see
            # _acc_cols_lean).  The m-path computes the discarded high
            # columns too and slices - value over columns < RL identical.
            cols = _acc_cols_lean(a, jnp.broadcast_to(b, a.shape), K2)
            tlo = relax_mod(relax_mod(cols[:RL]))
            m = relax_mod(relax_mod(_acc_cols_lean(
                tlo, jnp.broadcast_to(npr, a.shape), K2)[:RL]))
            u = cols + _acc_cols_lean(
                m, jnp.broadcast_to(n, a.shape), K2)
        else:
            # T = a*b (43 lazy columns)
            cols = _shifted(a[0] * b, 0, K2)
            for i in range(1, RL):
                cols = cols + _shifted(a[i] * b, i, K2)

            # m = (T mod R) * N' mod R  (digit-relaxed mod R)
            tlo = relax_mod(relax_mod(cols[:RL]))
            mcols = _shifted(tlo[0] * npr, 0, RL)
            for i in range(1, RL):
                mcols = mcols + _shifted(tlo[i] * npr[:RL - i], i, RL)
            m = relax_mod(relax_mod(mcols))

            # U = T + m*N;  result = U >> 264 plus the low-half carry.
            u = cols + _shifted(m[0] * n, 0, K2)
            for i in range(1, RL):
                u = u + _shifted(m[i] * n, i, K2)

        lo = u[:RL]
        lo_c = lo >> RB
        lo_r = (lo & RMASK).astype(jnp.int32) + _shift_up(lo_c)
        co = lo_c[RL - 1:RL]                     # carry out of column 21
        # LO' = LO - co*R is an exact multiple of R with small digits; its
        # quotient is recovered by rounding the top two digits (the tail is
        # < 2^-17 of R, and the true quotient is an exact integer).
        est = (lo_r[RL - 1:RL] * jnp.int32(1 << RB) + lo_r[RL - 2:RL - 1]
               + jnp.int32(1 << (2 * RB - 1))) >> (2 * RB)
        carry = co + est                         # (1, ...) total low carry

        hi = u[RL:]                              # 21 columns (22..42)
        res = jnp.concatenate(
            [hi[:1] + carry, hi[1:], jnp.zeros_like(hi[:1])], axis=0)
        res = relax_keep(relax_keep(res))
        # Top-digit fold: mask the top digit to 12 bits and fold its tiny
        # carry (|c| <= 3) back in through RHO = 2^264 mod N.  Folding only
        # the carry (not the whole top) converges in one step regardless of
        # RHO's digit pattern, capping the top at ~4100 like every digit.
        top = res[RL - 1:RL]
        tcar = top >> RB
        top_m = (top & RMASK).astype(jnp.int32)
        res = jnp.concatenate([res[:RL - 1], top_m], axis=0) + tcar * rho
        res = relax_keep(res)
        return res

    def rsquare(a):
        return rmul(a, a)

    def select(cond, a, b):
        return jnp.where(cond, a, b)

    def zero_like(a):
        return jnp.zeros_like(a)

    def one_like(a):
        one = reshape_const(one_col, a.ndim)
        return jnp.broadcast_to(one, a.shape).astype(jnp.int32)

    return {
        'add': radd, 'sub': rsub, 'neg': rneg, 'mul': rmul,
        'square': rsquare, 'mul_small': rmul_small, 'select': select,
        'zero_like': zero_like, 'one_like': one_like, 'fold_top': fold_top,
    }


# ---------------- G1 point bodies (complete RCB15, a=0, 3b=9) -------------

def g1_add_red(ops, p, q):
    """Complete projective addition for y^2 = x^3 + 3 (RCB15 Alg 7 shape,
    same sequence as ops/pallas_ops._g1_add_body, 3b = 9).
    p, q: (x, y, z) triples of (L, *batch) int32 digit arrays."""
    f_add, f_sub, f_mul = ops['add'], ops['sub'], ops['mul']
    f_mul9 = lambda a: ops['mul_small'](a, 9)
    x1, y1, z1 = p
    x2, y2, z2 = q
    t0 = f_mul(x1, x2)
    t1 = f_mul(y1, y2)
    t2 = f_mul(z1, z2)
    t3 = f_mul(f_add(x1, y1), f_add(x2, y2))
    t4 = f_add(t0, t1)
    t3 = f_sub(t3, t4)
    t4 = f_mul(f_add(y1, z1), f_add(y2, z2))
    x3 = f_add(t1, t2)
    t4 = f_sub(t4, x3)
    x3 = f_mul(f_add(x1, z1), f_add(x2, z2))
    y3 = f_add(t0, t2)
    y3 = f_sub(x3, y3)
    x3 = f_add(t0, t0)
    t0 = f_add(x3, t0)
    t2 = f_mul9(t2)
    z3 = f_add(t1, t2)
    t1 = f_sub(t1, t2)
    y3 = f_mul9(y3)
    x3 = f_mul(t4, y3)
    t2 = f_mul(t3, t1)
    x3 = f_sub(t2, x3)
    y3 = f_mul(y3, t0)
    t1 = f_mul(t1, z3)
    y3 = f_add(t1, y3)
    t0 = f_mul(t0, t3)
    z3 = f_mul(z3, t4)
    z3 = f_add(z3, t0)
    return x3, y3, z3


def g1_double_red(ops, p):
    f_add, f_sub, f_mul = ops['add'], ops['sub'], ops['mul']
    f_mul9 = lambda a: ops['mul_small'](a, 9)
    x, y, z = p
    t0 = f_mul(y, y)
    z3 = f_add(t0, t0)
    z3 = f_add(z3, z3)
    z3 = f_add(z3, z3)
    t1 = f_mul(y, z)
    t2 = f_mul(z, z)
    t2 = f_mul9(t2)
    x3 = f_mul(t2, z3)
    y3 = f_add(t0, t2)
    z3 = f_mul(t1, z3)
    t1 = f_add(t2, t2)
    t2 = f_add(t1, t2)
    t0 = f_sub(t0, t2)
    y3 = f_mul(t0, y3)
    y3 = f_add(x3, y3)
    t1 = f_mul(x, y)
    x3 = f_mul(t0, t1)
    x3 = f_add(x3, x3)
    return x3, y3, z3


# ---------------- Fq2 / G2 bodies ------------------------------------------

def mk_fq2_red_ops(ops, b3_pair):
    """Fq2 = Fq[u]/(u^2+1) over the redundant core; elements are (c0, c1)
    digit-array pairs.  b3_pair: ((L,1),(L,1)) int32 Montgomery digits of
    3*b_twist."""
    f_add, f_sub, f_mul = ops['add'], ops['sub'], ops['mul']

    def e_add(a, b):
        return (f_add(a[0], b[0]), f_add(a[1], b[1]))

    def e_sub(a, b):
        return (f_sub(a[0], b[0]), f_sub(a[1], b[1]))

    def e_mul(a, b):
        m0 = f_mul(a[0], b[0])
        m1 = f_mul(a[1], b[1])
        m2 = f_mul(f_add(a[0], a[1]), f_add(b[0], b[1]))
        return (f_sub(m0, m1), f_sub(f_sub(m2, m0), m1))

    def e_mul_b3(a):
        nd = a[0].ndim
        shape = (RL,) + (1,) * max(nd - 1, 1)
        b3 = (b3_pair[0].reshape(shape), b3_pair[1].reshape(shape))
        return e_mul(a, b3)

    return e_add, e_sub, e_mul, e_mul_b3


def g2_add_red(ops, b3_pair, p, q):
    e_add, e_sub, e_mul, e_mul_b3 = mk_fq2_red_ops(ops, b3_pair)
    x1, y1, z1 = p
    x2, y2, z2 = q
    t0 = e_mul(x1, x2)
    t1 = e_mul(y1, y2)
    t2 = e_mul(z1, z2)
    t3 = e_mul(e_add(x1, y1), e_add(x2, y2))
    t4 = e_add(t0, t1)
    t3 = e_sub(t3, t4)
    t4 = e_mul(e_add(y1, z1), e_add(y2, z2))
    x3 = e_add(t1, t2)
    t4 = e_sub(t4, x3)
    x3 = e_mul(e_add(x1, z1), e_add(x2, z2))
    y3 = e_add(t0, t2)
    y3 = e_sub(x3, y3)
    x3 = e_add(t0, t0)
    t0 = e_add(x3, t0)
    t2 = e_mul_b3(t2)
    z3 = e_add(t1, t2)
    t1 = e_sub(t1, t2)
    y3 = e_mul_b3(y3)
    x3 = e_mul(t4, y3)
    t2 = e_mul(t3, t1)
    x3 = e_sub(t2, x3)
    y3 = e_mul(y3, t0)
    t1 = e_mul(t1, z3)
    y3 = e_add(t1, y3)
    t0 = e_mul(t0, t3)
    z3 = e_mul(z3, t4)
    z3 = e_add(z3, t0)
    return x3, y3, z3


def g2_double_red(ops, b3_pair, p):
    e_add, e_sub, e_mul, e_mul_b3 = mk_fq2_red_ops(ops, b3_pair)
    x, y, z = p
    t0 = e_mul(y, y)
    z3 = e_add(t0, t0)
    z3 = e_add(z3, z3)
    z3 = e_add(z3, z3)
    t1 = e_mul(y, z)
    t2 = e_mul(z, z)
    t2 = e_mul_b3(t2)
    x3 = e_mul(t2, z3)
    y3 = e_add(t0, t2)
    z3 = e_mul(t1, z3)
    t1 = e_add(t2, t2)
    t2 = e_add(t1, t2)
    t0 = e_sub(t0, t2)
    y3 = e_mul(t0, y3)
    y3 = e_add(x3, y3)
    t1 = e_mul(x, y)
    x3 = e_mul(t0, t1)
    x3 = e_add(x3, x3)
    return x3, y3, z3
