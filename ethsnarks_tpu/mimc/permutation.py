"""MiMC block cipher and Miyaguchi-Preneel / Merkle-Damgard hashes (host oracle).

Behavioral parity with ``/root/reference/ethsnarks/mimc/permutation.py``:
 - round constants are the iterated Keccak-256 chain seeded with
   keccak(b"mimc") (constants are NOT reduced mod p before use; reduction
   happens inside the round arithmetic),
 - MiMC-e7 uses 91 rounds, MiMC-e5 uses 110,
 - ``mimc_hash`` is Miyaguchi-Preneel: k' = k + x + E_k(x),
 - ``mimc_hash_md`` is Merkle-Damgard: k' = E_k(x).

The batched TPU kernel lives in :mod:`ethsnarks_tpu.ops.mimc` and is pinned to
this implementation by tests.
"""

from ..keccak import keccak_256
from ..field import SNARK_SCALAR_FIELD

DEFAULT_EXPONENT = 7
DEFAULT_ROUNDS = 91
DEFAULT_SEED = b'mimc'

_constants_cache = {}


def _as_bytes(value):
    if isinstance(value, str):
        return value.encode('ascii')
    if isinstance(value, bytes):
        return value
    if not isinstance(value, int) and hasattr(value, 'to_bytes'):
        return value.to_bytes('big')  # FQ-style objects
    return int(value).to_bytes(32, 'big')


def H(*args):
    digest = keccak_256(b''.join(_as_bytes(a) for a in args)).digest()
    return int.from_bytes(digest, 'big')


def mimc_constants(seed=DEFAULT_SEED, p=SNARK_SCALAR_FIELD, R=DEFAULT_ROUNDS):
    """Iterated-Keccak round constant chain (a generator, like the reference)."""
    if isinstance(seed, str):
        seed = seed.encode('ascii')
    if isinstance(seed, bytes):
        seed = H(seed)
    else:
        seed = int(seed)
    for _ in range(R):
        seed = H(seed)
        yield seed


def _constants_list(seed, p, R):
    key = (bytes(seed) if isinstance(seed, (bytes, bytearray)) else seed, p, R)
    try:
        return _constants_cache[key]
    except (TypeError, KeyError):
        out = list(mimc_constants(seed, p, R))
        try:
            _constants_cache[key] = out
        except TypeError:
            pass
        return out


def mimc(x, k, seed=DEFAULT_SEED, p=SNARK_SCALAR_FIELD, e=DEFAULT_EXPONENT,
         R=DEFAULT_ROUNDS):
    """MiMC cipher E_k(x): R rounds of x <- (x + k + c_i)^e, then + k."""
    assert R > 2
    x = int(x) % p
    k = int(k)
    for c_i in _constants_list(seed, p, R):
        x = pow((x + k + c_i) % p, e, p)
    return (x + k) % p


def mimc_hash(x, k=0, seed=DEFAULT_SEED, p=SNARK_SCALAR_FIELD,
              e=DEFAULT_EXPONENT, R=DEFAULT_ROUNDS):
    """Miyaguchi-Preneel one-way compression over the MiMC cipher."""
    k = int(k)
    for x_i in x:
        x_i = int(x_i)
        r = mimc(x_i, k, seed, p, e, R)
        k = (k + x_i + r) % p
    return k


def mimc_hash_md(x, k=0, seed=DEFAULT_SEED, p=SNARK_SCALAR_FIELD,
                 e=DEFAULT_EXPONENT, R=DEFAULT_ROUNDS):
    """Merkle-Damgard chaining over the MiMC cipher."""
    k = int(k)
    for x_i in x:
        k = mimc(int(x_i), k, seed, p, e, R)
    return k
