"""Host-side exact field arithmetic for the BN254 scalar field (and friends).

API-compatible with the reference Python library
(``/root/reference/ethsnarks/field.py``): ``FQ``/``FR`` wrap arbitrary-precision
ints mod p and are the bit-exactness oracle for every TPU kernel in
:mod:`ethsnarks_tpu.ops`.  Bit sequences are plain '0'/'1' strings (LSB first),
replacing the reference's ``bitstring.BitArray`` dependency while keeping the
same ordering semantics.
"""

from math import ceil, log2
from os import urandom
from collections import defaultdict

from .numbertheory import square_root_mod_prime

# Fq of Baby-JubJub == Fr of BN254 (the R1CS/witness field).
SNARK_SCALAR_FIELD = 21888242871839275222246405745257275088548364400416034343698204186575808495617
# Order of the Baby-JubJub curve group E (8 * prime subgroup order).
FR_ORDER = 21888242871839275222246405745257275088614511777268538073601725287587578984328

_INT_TYPES = (int,)


class FQ(object):
    """An element of a prime field, default ``SNARK_SCALAR_FIELD``."""

    _COUNTS = None

    @classmethod
    def _disable_counting(cls):
        cls._COUNTS = None

    @classmethod
    def _reset_counts(cls):
        cls._COUNTS = defaultdict(int)

    @classmethod
    def _print_counts(cls):
        for k in sorted(cls._COUNTS.keys()):
            print(k, "=", cls._COUNTS[k])
        print()

    @classmethod
    def _count(cls, what):
        if cls._COUNTS is not None:
            cls._COUNTS[what] += 1

    def __init__(self, n, field_modulus=SNARK_SCALAR_FIELD):
        if isinstance(n, self.__class__):
            if n.m != field_modulus:
                raise ValueError("Field modulus mismatch")
            self.m = n.m
            self.n = n.n
        else:
            if not isinstance(n, _INT_TYPES):
                raise ValueError("Invalid number type: " + str(type(n)))
            if not isinstance(field_modulus, _INT_TYPES):
                raise ValueError("Invalid modulus type: " + str(type(field_modulus)))
            self.m = field_modulus
            self.n = n % self.m

    def __int__(self):
        return self.n

    def __hash__(self):
        return hash((self.n, self.m))

    def _other_n(self, other):
        if isinstance(other, FQ):
            if other.m != self.m:
                raise RuntimeError("Other field element has different modulus")
            return other.n
        if not isinstance(other, _INT_TYPES):
            raise RuntimeError("Not a valid value type: " + str(type(other).__name__))
        return other

    def __add__(self, other):
        self._count('add')
        return FQ((self.n + self._other_n(other)) % self.m, self.m)

    __radd__ = __add__

    def __sub__(self, other):
        self._count('sub')
        return FQ((self.n - self._other_n(other)) % self.m, self.m)

    def __rsub__(self, other):
        self._count('sub')
        return FQ((self._other_n(other) - self.n) % self.m, self.m)

    def __mul__(self, other):
        self._count('mul')
        return FQ((self.n * self._other_n(other)) % self.m, self.m)

    __rmul__ = __mul__

    def __pow__(self, e):
        return self.exp(e)

    def exp(self, e):
        self._count('exp')
        return FQ(pow(self.n, self._other_n(e), self.m), self.m)

    def inv(self):
        self._count('inv')
        return FQ(pow(self.n, self.m - 2, self.m), self.m)

    def sqrt(self):
        self._count('sqrt')
        return FQ(square_root_mod_prime(self.n, self.m), self.m)

    def __truediv__(self, other):
        self._count('inv')
        on = self._other_n(other)
        return FQ((self.n * pow(on, self.m - 2, self.m)) % self.m, self.m)

    __floordiv__ = __truediv__
    __div__ = __truediv__

    def __rtruediv__(self, other):
        self._count('inv')
        self._count('mul')
        on = self._other_n(other)
        return FQ((pow(self.n, self.m - 2, self.m) * on) % self.m, self.m)

    __rdiv__ = __rtruediv__

    def __neg__(self):
        self._count('sub')
        return FQ(-self.n, self.m)

    def __eq__(self, other):
        if other == 0.:
            other = 0
        return self.n == self._other_n(other)

    def __ne__(self, other):
        return not self == other

    def __repr__(self):
        return repr(self.n)

    def _nbytes(self):
        nbits = ceil(log2(self.m))
        nbits += 8 - (nbits % 8)
        return nbits // 8

    def to_bytes(self, endian='big'):
        return self.n.to_bytes(self._nbytes(), endian)

    def bits(self):
        """LSB-first bit string of length ceil(log2(m))."""
        nbits = ceil(log2(self.m))
        return bin(self.n)[2:][::-1].ljust(nbits, '0')

    @classmethod
    def random(cls, modulus=SNARK_SCALAR_FIELD):
        if isinstance(modulus, FQ):
            modulus = modulus.m
        nbytes = ceil(ceil(log2(modulus)) / 8) + 1
        rand_n = int.from_bytes(urandom(nbytes), 'little')
        return FQ(rand_n, modulus)

    @classmethod
    def one(cls, modulus=SNARK_SCALAR_FIELD):
        if isinstance(modulus, FQ):
            modulus = modulus.m
        return FQ(1, modulus)

    @classmethod
    def zero(cls, modulus=SNARK_SCALAR_FIELD):
        if isinstance(modulus, FQ):
            modulus = modulus.m
        return FQ(0, modulus)


class FR(FQ):
    """Element of the Baby-JubJub curve-order ring (FR_ORDER)."""

    def __init__(self, n, field_modulus=FR_ORDER):
        FQ.__init__(self, n, field_modulus)
