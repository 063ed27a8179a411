"""Baby-JubJub twisted Edwards curve over the BN254 scalar field (host oracle).

Coordinate systems and API match the reference
(``/root/reference/ethsnarks/jubjub.py``): affine ``Point``, projective
``ProjPoint`` (BBJLP'08), Montgomery ``MontPoint``, and extended
``EtecPoint`` (HWCD'08), with wNAF scalar multiplication helpers.  Curve:

    a*x^2 + y^2 = 1 + d*x^2*y^2,  a = 168700, d = 168696

over p = SNARK_SCALAR_FIELD; cofactor 8; prime subgroup order JUBJUB_L.
The vectorized device kernels live in :mod:`ethsnarks_tpu.ops.jubjub_ops`.
"""

from os import urandom
from hashlib import sha256
from collections import namedtuple

from .field import FQ, SNARK_SCALAR_FIELD
from .numbertheory import SquareRootError

JUBJUB_Q = SNARK_SCALAR_FIELD
JUBJUB_E = 21888242871839275222246405745257275088614511777268538073601725287587578984328
JUBJUB_C = 8
JUBJUB_L = JUBJUB_E // JUBJUB_C
JUBJUB_A = 168700
JUBJUB_D = 168696

# Birational Montgomery form (BBJLP'08 theorem 3.2).
MONT_A = 168698
MONT_B = 1
MONT_A24 = (MONT_A + 2) // 4
assert MONT_A24 * 4 == MONT_A + 2


def is_negative(v):
    assert isinstance(v, FQ)
    return v.n < (-v).n


class AbstractCurveOps(object):
    def __neg__(self):
        return self.neg()

    def __add__(self, other):
        return self.add(other)

    def __sub__(self, other):
        return self.add(other.neg())

    def __mul__(self, n):
        return self.mult(n)

    def double(self):
        return self.add(self)

    def rescale(self):
        return self

    def compress(self):
        return self.as_point().compress()

    def is_negative(self):
        return is_negative(self.as_point().x)

    def sign(self):
        return 1 if self.is_negative() else 0

    def mult(self, scalar):
        """Binary double-and-add (LSB first)."""
        if isinstance(scalar, FQ):
            if scalar.m not in [SNARK_SCALAR_FIELD, JUBJUB_E, JUBJUB_L]:
                raise ValueError("Invalid field modulus")
            scalar = scalar.n
        acc = self.infinity()
        base = self
        while scalar != 0:
            if scalar & 1:
                acc = acc.add(base)
            base = base.double()
            scalar >>= 1
        return acc

    def mult_wnaf(self, scalar, window=5):
        return mult_naf_lut(self, scalar, window)

    @classmethod
    def all_loworder_points(cls):
        """The 8 low-order (cofactor) points of the curve (curve data; same
        set as the reference's hardcoded list / notloworder.hpp:19-31)."""
        out = [Point(FQ(0), FQ(1)), Point(FQ(0), FQ(-1))]
        # Order-4 points on the x axis: a*x^2 = 1.
        x4 = FQ(JUBJUB_A).inv().sqrt()
        out += [Point(x4, FQ(0)), Point(-x4, FQ(0))]
        # Order-8 points: doubling lands on the x axis, so y^2 = a*x^2 with
        # d*a*(x^2)^2 - 2*a*x^2 + 1 = 0.
        disc = (FQ(JUBJUB_A) * JUBJUB_A - FQ(JUBJUB_A) * JUBJUB_D).sqrt()
        for sgn in (1, -1):
            xsq = (FQ(JUBJUB_A) + sgn * disc) / (FQ(JUBJUB_D) * JUBJUB_A)
            try:
                x8 = xsq.sqrt()
            except SquareRootError:
                continue
            y8 = (xsq * JUBJUB_A).sqrt()
            out += [Point(x8, y8), Point(x8, -y8), Point(-x8, y8), Point(-x8, -y8)]
        return out

    @classmethod
    def decompress(cls, point):
        return Point.decompress(point).as_proj()


class Point(AbstractCurveOps, namedtuple('_Point', ('x', 'y'))):
    def __str__(self):
        return ' '.join(str(_) for _ in self)

    def __eq__(self, other):
        return self.x == other.x and self.y == other.y

    def __hash__(self):
        return hash((self.x, self.y))

    @classmethod
    def generator(cls):
        return cls(
            FQ(16540640123574156134436876038791482806971768689494387082833631921987005038935),
            FQ(20819045374670962167435360035096875258406992893633759881276124905556507972311))

    @staticmethod
    def infinity():
        return Point(FQ(0), FQ(1))

    @classmethod
    def from_y(cls, y, sign=None):
        """Recover x from y: x^2 = (y^2 - 1) / (d*y^2 - a); raises if nonsquare."""
        assert isinstance(y, FQ)
        assert y.m == JUBJUB_Q
        ysq = y * y
        xsq = (ysq - 1) / (JUBJUB_D * ysq - JUBJUB_A)
        x = xsq.sqrt()
        if sign is not None:
            if (x.n & 1) != sign:
                x = -x
        elif is_negative(x):
            x = -x
        return cls(x, y)

    @classmethod
    def from_x(cls, x):
        """Recover y from x: y^2 = (a*x^2 - 1) / (d*x^2 - 1)."""
        assert isinstance(x, FQ)
        assert x.m == JUBJUB_Q
        xsq = x * x
        ysq = (JUBJUB_A * xsq - 1) * (JUBJUB_D * xsq - 1).inv()
        return cls(x, ysq.sqrt())

    @classmethod
    def from_hash(cls, entropy):
        """HashToPoint: sha256 -> y candidate, increment until on-curve, then
        clear the cofactor.  Guaranteed prime-order and non-identity.
        Parity with reference ``Point.from_hash`` (point.cpp:55-88 native)."""
        assert isinstance(entropy, bytes)
        y = FQ(int.from_bytes(sha256(entropy).digest(), 'big'))
        while True:
            try:
                p = cls.from_y(y)
            except SquareRootError:
                y += 1
                continue
            p = p * JUBJUB_C
            if (p * JUBJUB_L) != Point.infinity():
                raise RuntimeError("Point not on prime-ordered subgroup")
            return p

    @classmethod
    def random(cls):
        return cls.from_hash(urandom(32))

    def compress(self):
        return int.to_bytes(self.y.n | ((self.x.n & 1) << 255), 32, 'little')

    @classmethod
    def decompress(cls, point):
        if len(point) != 32:
            raise ValueError("Invalid input length for decompression")
        y = int.from_bytes(point, 'little')
        sign = y >> 255
        y &= (1 << 255) - 1
        return cls.from_y(FQ(y), sign)

    def valid(self):
        xsq = self.x * self.x
        ysq = self.y * self.y
        return (JUBJUB_A * xsq) + ysq == (1 + JUBJUB_D * xsq * ysq)

    def add(self, other):
        assert isinstance(other, Point)
        if self.x == 0 and self.y == 0:
            return other
        (x1, y1), (x2, y2) = (self.x, self.y), (other.x, other.y)
        dxy = JUBJUB_D * x1 * x2 * y1 * y2
        x3 = (x1 * y2 + y1 * x2) / (FQ.one() + dxy)
        y3 = (y1 * y2 - JUBJUB_A * x1 * x2) / (FQ.one() - dxy)
        return Point(x3, y3)

    def neg(self):
        return Point(-self.x, self.y)

    def as_point(self):
        return self

    def as_proj(self):
        return ProjPoint(self.x, self.y, FQ(1))

    def as_etec(self):
        return EtecPoint(self.x, self.y, self.x * self.y, FQ(1))

    def as_mont(self):
        return MontPoint.from_edwards(self)


class ProjPoint(AbstractCurveOps, namedtuple('_ProjPoint', ('x', 'y', 'z'))):
    def __eq__(self, other):
        return self.x == other.x and self.y == other.y and self.z == other.z

    def __hash__(self):
        return hash((self.x, self.y, self.z))

    @staticmethod
    def infinity():
        return ProjPoint(FQ(0), FQ(1), FQ(1))

    def rescale(self):
        return ProjPoint(self.x / self.z, self.y / self.z, FQ(1))

    def valid(self):
        return self.as_point().valid()

    def neg(self):
        return ProjPoint(-self.x, self.y, self.z)

    def as_point(self):
        assert self.z != 0
        zi = self.z.inv()
        return Point(self.x * zi, self.y * zi)

    def as_proj(self):
        return self

    def as_etec(self):
        return EtecPoint(self.x, self.y, self.x * self.y, self.z)

    def as_mont(self):
        return self.as_point().as_mont()

    def add(self, other):
        """Strongly-unified projective addition, add-2008-bbjlp."""
        assert isinstance(other, ProjPoint)
        if self == self.infinity():
            return other
        a = self.z * other.z
        b = a * a
        c = self.x * other.x
        d = self.y * other.y
        e = JUBJUB_D * c * d
        f = b - e
        g = b + e
        x3 = a * f * ((self.x + self.y) * (other.x + other.y) - c - d)
        y3 = a * g * (d - JUBJUB_A * c)
        z3 = f * g
        return ProjPoint(x3, y3, z3)

    def double(self):
        """dbl-2008-bbjlp: 3M + 4S + 1D."""
        if self == self.infinity():
            return self.infinity()
        b = (self.x + self.y) * (self.x + self.y)
        c = self.x * self.x
        d = self.y * self.y
        e = JUBJUB_A * c
        f = e + d
        h = self.z * self.z
        j = f - 2 * h
        x3 = (b - c - d) * j
        y3 = f * (e - d)
        z3 = f * j
        return ProjPoint(x3, y3, z3)


class MontPoint(AbstractCurveOps, namedtuple('_MontPoint', ('u', 'v'))):
    def __eq__(self, other):
        return self.u == other.u and self.v == other.v

    def __hash__(self):
        return hash((self.u, self.v))

    @classmethod
    def infinity(cls):
        return cls(FQ(0), FQ(1))

    @classmethod
    def from_edwards(cls, e):
        """(x, y) -> (u, v) = ((1+y)/(1-y), u/x); special cases map to
        (0,1) [identity] and (0,0) [the order-2 point]."""
        e = e.as_point()
        if e.y == FQ.one():
            return cls(FQ.zero(), FQ.one())
        if e.x == FQ.zero():
            return cls(FQ.zero(), FQ.zero())
        u = (FQ.one() + e.y) / (FQ.one() - e.y)
        return cls(u, u / e.x)

    def as_point(self):
        return Point(self.u / self.v, (self.u - 1) / (self.u + 1))

    def as_etec(self):
        return self.as_point().as_etec()

    def as_proj(self):
        return self.as_point().as_proj()

    def as_mont(self):
        return self

    def valid(self):
        lhs = MONT_B * (self.v ** 2)
        rhs = (self.u ** 3) + MONT_A * (self.u ** 2) + self.u
        return lhs == rhs

    def neg(self):
        return type(self)(self.u, -self.v)

    def double(self):
        if self.v == FQ.zero():
            return self.infinity()
        usq = self.u * self.u
        # slope of the tangent: (3u^2 + 2Au + 1) / 2v
        delta = (1 + 2 * (MONT_A * self.u) + usq + usq * 2) / (2 * self.v)
        u3 = delta * delta - MONT_A - 2 * self.u
        v3 = -((u3 - self.u) * delta + self.v)
        return type(self)(u3, v3)

    def add(self, other):
        other = other.as_mont()
        infinity = self.infinity()
        if other == infinity:
            return self
        if self == infinity:
            return other
        if self.u == other.u:
            if self.v == other.v:
                return self.double()
            return infinity
        delta = (other.v - self.v) / (other.u - self.u)
        u3 = delta * delta - MONT_A - self.u - other.u
        v3 = -((u3 - self.u) * delta + self.v)
        return type(self)(u3, v3)


class EtecPoint(AbstractCurveOps, namedtuple('_EtecPoint', ('x', 'y', 't', 'z'))):
    def __eq__(self, other):
        return (self.x == other.x and self.y == other.y
                and self.t == other.t and self.z == other.z)

    def __hash__(self):
        return hash((self.x, self.y, self.t, self.z))

    @staticmethod
    def infinity():
        return EtecPoint(FQ(0), FQ(1), FQ(0), FQ(1))

    def valid(self):
        return self.as_point().valid()

    def neg(self):
        return EtecPoint(-self.x, self.y, -self.t, self.z)

    def as_point(self):
        zi = self.z.inv()
        return Point(self.x * zi, self.y * zi)

    def as_proj(self):
        return ProjPoint(self.x, self.y, self.z)

    def as_etec(self):
        return self

    def as_mont(self):
        return self.as_point().as_mont()

    def double(self):
        """dbl-2008-hwcd."""
        if self == self.infinity():
            return self.infinity()
        a = self.x * self.x
        b = self.y * self.y
        c = 2 * (self.z * self.z)
        d = JUBJUB_A * a
        e = (self.x + self.y) * (self.x + self.y) - a - b
        g = d + b
        f = g - c
        h = d - b
        return EtecPoint(e * f, g * h, e * h, f * g)

    def add(self, other):
        """HWCD'08 section 3.1 unified addition."""
        assert isinstance(other, EtecPoint)
        if self == self.infinity():
            return other
        assert self.z != 0
        assert other.z != 0
        x1x2 = self.x * other.x
        y1y2 = self.y * other.y
        dt1t2 = (JUBJUB_D * self.t) * other.t
        z1z2 = self.z * other.z
        e = ((self.x + self.y) * (other.x + other.y)) - x1x2 - y1y2
        f = z1z2 - dt1t2
        g = z1z2 + dt1t2
        h = y1y2 - (JUBJUB_A * x1x2)
        return EtecPoint(e * f, g * h, e * h, f * g)


def wNAF(k, width=2):
    """Windowed non-adjacent form digits (MSB first)."""
    k = int(k)
    full, half = 2 ** width, 2 ** (width - 1)
    output = []
    while k > 0:
        if k & 1:
            c = k % full
            k_i = c - full if c > half else c
            k -= k_i
        else:
            k_i = 0
        output.append(k_i)
        k //= 2
    return output[::-1]


def naf_window(point, nbits):
    """Precompute odd multiples +-{1, 3, 5, ...} for width-nbits wNAF."""
    a = (1 << nbits) // 2
    res = {0: None}
    for n in list(range(0, a))[1:]:
        if n == 1:
            p_n = point
        elif n == 2:
            p_n = point.double()
        elif n > 2 and n % 2 == 0:
            continue
        else:
            p_n = res[n - 2] + res[2]
        res[n] = p_n
        res[-n] = -p_n
    return res


def mult_naf(point, scalar):
    acc = point.infinity()
    for k_i in wNAF(scalar):
        acc = acc.double()
        if k_i == 1:
            acc = acc.add(point)
        elif k_i == -1:
            acc = acc.add(point.neg())
    return acc


def mult_naf_lut(point, scalar, width=2):
    acc = point.infinity()
    w = naf_window(point, width)
    for k_i in wNAF(scalar, width):
        acc = acc.double()
        p = w[k_i]
        if p is not None:
            acc = acc.add(p)
    return acc
