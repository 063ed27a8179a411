"""Host-side exact BN254 (alt_bn128) curve arithmetic: Fq, Fq2, Fq12, G1, G2.

This is the proof-system coordinate layer (the role libff/mcl play in the
reference, src/ethsnarks.hpp typedefs).  Field towers use the same
parametrization as py_ecc/EIP-196 so that JSON vk/proof files interoperate
byte-for-byte with the reference's ``ethsnarks/verifier.py`` and Verifier.sol:

 - Fq2 = Fq[u]/(u^2+1), coefficients stored [c0, c1],
 - Fq12 = Fq[w]/(w^12 - 18 w^6 + 82), with u = w^6 - 9,
 - G2 is on the sextic twist y^2 = x^3 + 3/(9+u) over Fq2.

Device (TPU) counterparts of G1/Fq live in :mod:`ethsnarks_tpu.ops.curve`.
"""

# Field moduli / orders.
FIELD_MODULUS = 21888242871839275222246405745257275088696311157297823662689037894645226208583
CURVE_ORDER = 21888242871839275222246405745257275088548364400416034343698204186575808495617

# BN parameter x0: q = 36x^4+36x^3+24x^2+6x+1, r = 36x^4+36x^3+18x^2+6x+1.
BN_X = 4965661367192848881
ATE_LOOP_COUNT = 6 * BN_X + 2
LOG_ATE_LOOP_COUNT = ATE_LOOP_COUNT.bit_length() - 2  # highest index below MSB


class Fq(object):
    """Element of the BN254 base field (distinct from field.FQ: fixed modulus)."""

    __slots__ = ('n',)
    modulus = FIELD_MODULUS

    def __init__(self, n):
        self.n = n % FIELD_MODULUS if not isinstance(n, Fq) else n.n

    def __add__(self, other):
        return Fq(self.n + (other.n if isinstance(other, Fq) else other))

    __radd__ = __add__

    def __sub__(self, other):
        return Fq(self.n - (other.n if isinstance(other, Fq) else other))

    def __rsub__(self, other):
        return Fq((other.n if isinstance(other, Fq) else other) - self.n)

    def __mul__(self, other):
        return Fq(self.n * (other.n if isinstance(other, Fq) else other))

    __rmul__ = __mul__

    def __neg__(self):
        return Fq(-self.n)

    def __truediv__(self, other):
        on = other.n if isinstance(other, Fq) else other
        return Fq(self.n * pow(on, -1, FIELD_MODULUS))

    def __pow__(self, e):
        return Fq(pow(self.n, e, FIELD_MODULUS))

    def inv(self):
        return Fq(pow(self.n, -1, FIELD_MODULUS))

    def __eq__(self, other):
        return self.n == (other.n if isinstance(other, Fq) else other % FIELD_MODULUS)

    def __ne__(self, other):
        return not self == other

    def __hash__(self):
        return hash(self.n)

    def __repr__(self):
        return 'Fq(%d)' % self.n

    @classmethod
    def one(cls):
        return cls(1)

    @classmethod
    def zero(cls):
        return cls(0)


class FQP(object):
    """Generic polynomial extension field over Fq.

    Subclasses fix ``degree`` and ``modulus_coeffs`` (the c_i such that
    x^degree = -sum c_i x^i)."""

    degree = None
    modulus_coeffs = None

    def __init__(self, coeffs):
        assert len(coeffs) == self.degree
        self.coeffs = [c % FIELD_MODULUS if isinstance(c, int) else c.n
                       for c in coeffs]

    @classmethod
    def one(cls):
        return cls([1] + [0] * (cls.degree - 1))

    @classmethod
    def zero(cls):
        return cls([0] * cls.degree)

    def __add__(self, other):
        return type(self)([(a + b) % FIELD_MODULUS
                           for a, b in zip(self.coeffs, other.coeffs)])

    def __sub__(self, other):
        return type(self)([(a - b) % FIELD_MODULUS
                           for a, b in zip(self.coeffs, other.coeffs)])

    def __neg__(self):
        return type(self)([-c % FIELD_MODULUS for c in self.coeffs])

    def __mul__(self, other):
        q = FIELD_MODULUS
        d = self.degree
        if isinstance(other, int):
            return type(self)([c * other % q for c in self.coeffs])
        if isinstance(other, Fq):
            return type(self)([c * other.n % q for c in self.coeffs])
        # schoolbook product then reduce by the modulus polynomial
        prod = [0] * (2 * d - 1)
        for i, a in enumerate(self.coeffs):
            if a:
                for j, b in enumerate(other.coeffs):
                    prod[i + j] += a * b
        # reduce x^(d+k) = -sum c_i x^(i+k)
        for k in range(2 * d - 2, d - 1, -1):
            top = prod[k] % q
            if top:
                prod[k] = 0
                for i, c in enumerate(self.modulus_coeffs):
                    if c:
                        prod[k - d + i] = (prod[k - d + i] - top * c)
        return type(self)([c % q for c in prod[:d]])

    __rmul__ = __mul__

    def __truediv__(self, other):
        if isinstance(other, (int, Fq)):
            on = other if isinstance(other, int) else other.n
            return self * pow(on, -1, FIELD_MODULUS)
        return self * other.inv()

    def __pow__(self, e):
        result = type(self).one()
        base = self
        while e > 0:
            if e & 1:
                result = result * base
            base = base * base
            e >>= 1
        return result

    def inv(self):
        """Extended Euclid over Fq[x] against the modulus polynomial."""
        q = FIELD_MODULUS
        d = self.degree
        mpoly = list(self.modulus_coeffs) + [1]  # monic degree-d modulus

        def pdeg(p):
            for i in range(len(p) - 1, -1, -1):
                if p[i]:
                    return i
            return -1

        def pdivmod(a, b):
            """Polynomial divmod over Fq; returns (quotient, remainder)."""
            a = list(a)
            db = pdeg(b)
            inv_lead = pow(b[db], -1, q)
            quot = [0] * (max(pdeg(a) - db + 1, 1))
            for i in range(pdeg(a) - db, -1, -1):
                factor = a[i + db] * inv_lead % q
                quot[i] = factor
                if factor:
                    for j in range(db + 1):
                        a[i + j] = (a[i + j] - factor * b[j]) % q
            return quot, a

        def psub_mul(s, qpoly, t):
            """s - qpoly*t over Fq."""
            out = list(s) + [0] * max(0, pdeg(qpoly) + pdeg(t) + 1 - len(s))
            for i, qc in enumerate(qpoly):
                if qc:
                    for j, tc in enumerate(t):
                        if tc:
                            out[i + j] = (out[i + j] - qc * tc) % q
            return out

        r0, r1 = mpoly, list(self.coeffs)
        s0, s1 = [0], [1]
        while pdeg(r1) > 0:
            qpoly, rem = pdivmod(r0, r1)
            r0, r1 = r1, rem
            s0, s1 = s1, psub_mul(s0, qpoly, s1)
        assert pdeg(r1) == 0, "non-invertible element"
        c = pow(r1[0], -1, q)
        out = [x * c % q for x in s1[:d]]
        return type(self)(out + [0] * (d - len(out)))

    def __eq__(self, other):
        return self.coeffs == other.coeffs

    def __ne__(self, other):
        return not self == other

    def __hash__(self):
        return hash(tuple(self.coeffs))

    def __repr__(self):
        return '%s(%r)' % (type(self).__name__, self.coeffs)

    def frobenius(self):
        """x -> x^q, computed by exponentiation (subclasses may specialize)."""
        return self ** FIELD_MODULUS


class Fq2(FQP):
    degree = 2
    modulus_coeffs = [1, 0]  # u^2 = -1

    def conjugate(self):
        c0, c1 = self.coeffs
        return Fq2([c0, -c1 % FIELD_MODULUS])


class Fq12(FQP):
    degree = 12
    modulus_coeffs = [82, 0, 0, 0, 0, 0, -18, 0, 0, 0, 0, 0]  # w^12 = 18w^6-82


# ---------------------------------------------------------------- curve groups

B1 = Fq(3)
B2 = Fq2([3, 0]) / Fq2([9, 1])
B12 = Fq12([3] + [0] * 11)

G1_GEN = (Fq(1), Fq(2))
G2_GEN = (
    Fq2([10857046999023057135944570762232829481370756359578518086990519993285655852781,
         11559732032986387107991004021392285783925812861821192530917403151452391805634]),
    Fq2([8495653923123431417604973247489272438418190587263600148770280649306958101930,
         4082367875863433681332203403145435568316851327593401208105741076214120093531]))


def is_inf(pt):
    return pt is None


def is_on_curve(pt, b):
    if is_inf(pt):
        return True
    x, y = pt
    return y * y - x * x * x == b


def double(pt):
    if is_inf(pt):
        return None
    x, y = pt
    m = (3 * (x * x)) / (2 * y)
    newx = m * m - 2 * x
    newy = -m * newx + m * x - y
    return (newx, newy)


def add(p1, p2):
    if is_inf(p1):
        return p2
    if is_inf(p2):
        return p1
    x1, y1 = p1
    x2, y2 = p2
    if x2 == x1 and y2 == y1:
        return double(p1)
    if x2 == x1:
        return None
    m = (y2 - y1) / (x2 - x1)
    newx = m * m - x1 - x2
    newy = -m * newx + m * x1 - y1
    return (newx, newy)


def multiply(pt, n):
    if n < 0:
        return multiply(neg(pt), -n)
    if n == 0:
        return None
    result = None
    addend = pt
    while n:
        if n & 1:
            result = add(result, addend)
        addend = double(addend)
        n >>= 1
    return result


def neg(pt):
    if is_inf(pt):
        return None
    x, y = pt
    return (x, -y)


def normalize_g1(pt):
    """(int, int) <- affine G1 point; raises on infinity."""
    assert pt is not None
    return (pt[0].n, pt[1].n)
