"""EdDSA over Baby-JubJub: Pure / Pedersen-prehashed / MiMC variants.

Parity with ``/root/reference/ethsnarks/eddsa.py``:
 - nonce r = sha512(k || M) little-endian mod JUBJUB_L,
 - s = r + H(R, A, M) * k mod JUBJUB_E,
 - PureEdDSA: H = x-coordinate of the Pedersen hash of BITS(R)||BITS(A)||BITS(M)
   with personalization 'EdDSA_Verify.RAM',
 - EdDSA: message is pre-hashed with Pedersen ('EdDSA_Verify.M'),
 - MiMCEdDSA: H = MiMC-MP hash of the scalars with seed 'EdDSA_Verify.RAM'.
"""

from collections import namedtuple
from hashlib import sha512

from .field import FQ
from .jubjub import Point, JUBJUB_L, JUBJUB_Q, JUBJUB_E
from .pedersen import pedersen_hash_bytes, pedersen_hash_bits
from .mimc import mimc_hash

P13N_EDDSA_VERIFY_M = 'EdDSA_Verify.M'
P13N_EDDSA_VERIFY_RAM = 'EdDSA_Verify.RAM'


class Signature(object):
    __slots__ = ('R', 's')

    def __init__(self, R, s):
        self.R = R if isinstance(R, Point) else Point(*R)
        self.s = s if isinstance(s, FQ) else FQ(s)
        assert self.s.m == JUBJUB_Q

    def __iter__(self):
        return iter([self.R, self.s])

    def __str__(self):
        return ' '.join(str(_) for _ in [self.R.x, self.R.y, self.s])


class SignedMessage(namedtuple('_SignedMessage', ('A', 'sig', 'msg'))):
    def __str__(self):
        return ' '.join(str(_) for _ in [self.A, self.sig, self.msg])


class _SignatureScheme(object):
    @classmethod
    def to_bytes(cls, *args):
        result = b''
        for M in args:
            if isinstance(M, Point):
                result += M.x.to_bytes('little')
                result += M.y.to_bytes('little')
            elif isinstance(M, FQ):
                result += M.to_bytes('little')
            elif isinstance(M, (list, tuple)):
                result += b''.join(cls.to_bytes(_) for _ in M)
            elif isinstance(M, int):
                result += M.to_bytes(32, 'little')
            elif isinstance(M, str):
                result += M.encode('ascii')
            elif isinstance(M, bytes):
                result += M
            else:
                raise TypeError("Bad type for M: " + str(type(M)))
        return result

    @classmethod
    def to_bits(cls, *args):
        """Concatenated LSB-first bit strings ('0'/'1' chars)."""
        result = ''
        for M in args:
            if isinstance(M, Point):
                result += M.x.bits()
            elif isinstance(M, FQ):
                result += M.bits()
            elif isinstance(M, (list, tuple)):
                for _ in M:
                    result += cls.to_bits(_)
            elif isinstance(M, bytes):
                # Bytes append MSB-first per byte (BitArray semantics).
                result += ''.join(bin(b)[2:].rjust(8, '0') for b in M)
            elif isinstance(M, str) and set(M) <= {'0', '1'}:
                result += M
            else:
                raise TypeError("Bad type for M: " + str(type(M)))
        return result

    @classmethod
    def prehash_message(cls, M):
        return M

    @classmethod
    def hash_public(cls, R, A, M):
        raise NotImplementedError()

    @classmethod
    def hash_secret(cls, k, *args):
        """r = sha512(k || M) interpreted little-endian, reduced mod L."""
        assert isinstance(k, FQ)
        data = b''.join(cls.to_bytes(_) for _ in (k,) + args)
        return int.from_bytes(sha512(data).digest(), 'little') % JUBJUB_L

    @classmethod
    def B(cls):
        return Point.generator()

    @classmethod
    def random_keypair(cls, B=None):
        B = B or cls.B()
        k = FQ.random(JUBJUB_L)
        return k, B * k

    @classmethod
    def sign(cls, msg, key, B=None):
        if not isinstance(key, FQ):
            raise TypeError("Invalid type for parameter k")
        if key.n >= JUBJUB_L or key.n <= 0:
            raise RuntimeError("Strict parsing of k failed")
        B = B or cls.B()
        A = B * key
        M = cls.prehash_message(msg)
        r = cls.hash_secret(key, M)
        R = B * r
        t = cls.hash_public(R, A, M)
        S = (r + (key.n * t)) % JUBJUB_E
        return SignedMessage(A, Signature(R, S), msg)

    @classmethod
    def verify(cls, A, sig, msg, B=None):
        if not isinstance(A, Point):
            A = Point(*A)
        if not isinstance(sig, Signature):
            sig = Signature(*sig)
        R, S = sig
        B = B or cls.B()
        lhs = B * S
        M = cls.prehash_message(msg)
        rhs = R + (A * cls.hash_public(R, A, M))
        return lhs == rhs


class PureEdDSA(_SignatureScheme):
    @classmethod
    def hash_public(cls, *args, p13n=P13N_EDDSA_VERIFY_RAM):
        return pedersen_hash_bits(p13n, cls.to_bits(*args)).x.n


class EdDSA(PureEdDSA):
    @classmethod
    def prehash_message(cls, M, p13n=P13N_EDDSA_VERIFY_M):
        return pedersen_hash_bytes(p13n, M)


def as_scalar(*args):
    """Flatten FQ/int/Point/list arguments into a stream of ints."""
    for x in args:
        if isinstance(x, FQ):
            yield int(x)
        elif isinstance(x, int):
            yield x
        elif isinstance(x, Point):
            yield int(x.x)
            yield int(x.y)
        elif isinstance(x, (tuple, list)):
            for _ in as_scalar(*x):
                yield _
        else:
            raise TypeError("Unknown type " + str(type(x)))


class MiMCEdDSA(_SignatureScheme):
    @classmethod
    def hash_public(cls, *args, p13n=P13N_EDDSA_VERIFY_RAM):
        return mimc_hash(list(as_scalar(*args)), seed=p13n)
