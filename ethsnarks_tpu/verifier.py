"""Groth16 verification + vk/proof JSON interop (host).

Parity with ``/root/reference/ethsnarks/verifier.py`` and the JSON formats of
src/export.cpp / src/import.cpp: G1 points as ["0x..","0x.."], G2 points as
[[X.c1,X.c0],[Y.c1,Y.c0]] (big-endian hex, c1 first - the EVM convention),
inputs as hex strings.  The pairing check is the same 4-product as
contracts/Verifier.sol:

    e(A, B) * e(-vk_x, gamma) * e(-C, delta) * e(-alpha, beta) == 1
"""

import json
import ctypes
from collections import namedtuple

from .bn254 import (
    Fq, Fq2, add, multiply, neg, is_on_curve, B1, B2)
from .pairing import pairing_product_is_one

_VerifyingKeyStruct = namedtuple('_VerifyingKeyStruct',
                                ('alpha', 'beta', 'gamma', 'delta', 'gammaABC'))
_ProofStruct = namedtuple('_ProofStruct', ('A', 'B', 'C', 'input'))


def _parse_int(x):
    """Int, 0x-hex, or decimal string -> int."""
    if isinstance(x, int):
        return x
    x = x.strip()
    if x.startswith('0x') or x.startswith('0X'):
        return int(x, 16)
    return int(x)


def _load_g1_point(point):
    if len(point) < 2:
        raise RuntimeError("Invalid G1 point", point)
    out = (Fq(_parse_int(point[0])), Fq(_parse_int(point[1])))
    if not is_on_curve(out, B1):
        raise ValueError("Invalid G1 point - not on curve", point)
    return out


def _load_g2_point(point):
    x, y = point
    if len(x) != 2 or len(y) != 2:
        raise RuntimeError("Invalid G2 point", point)
    # JSON order is [c1, c0] (EVM); internal representation is [c0, c1].
    out = (Fq2([_parse_int(x[1]), _parse_int(x[0])]),
           Fq2([_parse_int(y[1]), _parse_int(y[0])]))
    if not is_on_curve(out, B2):
        raise ValueError("Invalid G2 point - not on curve", point)
    return out


def _dump_g1(pt):
    return [hex(pt[0].n), hex(pt[1].n)]


def _dump_g2(pt):
    x, y = pt
    return [[hex(x.coeffs[1]), hex(x.coeffs[0])],
            [hex(y.coeffs[1]), hex(y.coeffs[0])]]


class Proof(_ProofStruct):
    def to_json(self):
        return json.dumps(self.to_dict())

    def to_dict(self):
        return {
            'A': _dump_g1(self.A),
            'B': _dump_g2(self.B),
            'C': _dump_g1(self.C),
            'input': [hex(_) for _ in self.input],
        }

    @classmethod
    def from_json(cls, json_data):
        return cls.from_dict(json.loads(json_data))

    @classmethod
    def from_dict(cls, d):
        return cls(
            A=_load_g1_point(d['A'][:2]),
            B=_load_g2_point(d['B']),
            C=_load_g1_point(d['C'][:2]),
            input=[_parse_int(_) for _ in d['input']])


class VerifyingKey(_VerifyingKeyStruct):
    def to_json(self):
        return json.dumps(self.to_dict())

    def to_dict(self):
        return {
            'alpha': _dump_g1(self.alpha),
            'beta': _dump_g2(self.beta),
            'gamma': _dump_g2(self.gamma),
            'delta': _dump_g2(self.delta),
            'gammaABC': [_dump_g1(p) for p in self.gammaABC],
        }

    @classmethod
    def from_json(cls, json_data):
        return cls.from_dict(json.loads(json_data))

    @classmethod
    def from_file(cls, filename):
        with open(filename, 'r') as handle:
            return cls.from_dict(json.load(handle))

    @classmethod
    def from_dict(cls, d):
        return cls(
            alpha=_load_g1_point(d['alpha']),
            beta=_load_g2_point(d['beta']),
            gamma=_load_g2_point(d['gamma']),
            delta=_load_g2_point(d['delta']),
            gammaABC=[_load_g1_point(p) for p in d['gammaABC']])

    def verify(self, proof):
        """Groth16 strong-input-consistency verification (parity:
        r1cs_gg_ppzksnark_zok_verifier_strong_IC, reference tcc:660-670)."""
        if not isinstance(proof, Proof):
            raise TypeError("Invalid proof type")
        if len(proof.input) + 1 != len(self.gammaABC):
            return False
        return self.verify_weak_IC(proof)

    def verify_weak_IC(self, proof):
        """Weak input consistency: accepts |input|+1 <= |gammaABC| (extra
        accumulation entries stay unused; parity tcc:626-658)."""
        if len(proof.input) + 1 > len(self.gammaABC):
            return False
        vk_x = self.gammaABC[0]
        for i, x in enumerate(proof.input):
            vk_x = add(vk_x, multiply(self.gammaABC[i + 1], x))
        return pairing_product_is_one([
            (proof.A, proof.B),
            (neg(vk_x), self.gamma),
            (neg(proof.C), self.delta),
            (neg(self.alpha), self.beta)])

    def process(self):
        """Precompute the fixed-G2 pairing state (parity:
        verifier_process_vk, tcc:552-567)."""
        return ProcessedVerifyingKey(self)


class ProcessedVerifyingKey(object):
    """Processed VK: e(alpha, beta) evaluated once and Miller-loop line
    coefficients precomputed for gamma and delta, so the per-proof online
    check costs 3 coefficient-driven Miller loops + one final
    exponentiation (parity: r1cs_gg_ppzksnark_zok_processed_verification_key
    hpp:386-398 + online_verifier_weak_IC tcc:569-624)."""

    def __init__(self, vk):
        from .pairing import (
            G2Precomp, miller_loop, twist, cast_g1_to_fq12,
            final_exponentiate)
        self.gammaABC = list(vk.gammaABC)
        self.alpha_beta = final_exponentiate(miller_loop(
            twist(vk.beta), cast_g1_to_fq12(vk.alpha)))
        self.gamma_precomp = G2Precomp(vk.gamma)
        self.delta_precomp = G2Precomp(vk.delta)

    def _accumulate(self, inputs):
        vk_x = self.gammaABC[0]
        for i, x in enumerate(inputs):
            vk_x = add(vk_x, multiply(self.gammaABC[i + 1], x))
        return vk_x

    def online_verify_weak_IC(self, proof):
        """e(A, B) == e(alpha, beta) * e(vk_x, gamma) * e(C, delta) with
        precomputed gamma/delta coefficients and one shared final exp
        (parity: online_verifier_weak_IC, tcc:569-624; pairing eqn
        :602-608).  Includes the proof well-formedness (on-curve) check."""
        from .pairing import (
            miller_loop, miller_loop_precomp, twist, cast_g1_to_fq12,
            final_exponentiate)
        if not isinstance(proof, Proof):
            raise TypeError("Invalid proof type")
        if len(proof.input) + 1 > len(self.gammaABC):
            return False
        if not (is_on_curve(proof.A, B1) and is_on_curve(proof.B, B2)
                and is_on_curve(proof.C, B1)):
            return False
        vk_x = self._accumulate(proof.input)
        acc = miller_loop(twist(proof.B), cast_g1_to_fq12(proof.A))
        acc = acc * miller_loop_precomp(self.gamma_precomp, neg(vk_x))
        acc = acc * miller_loop_precomp(self.delta_precomp, neg(proof.C))
        return final_exponentiate(acc) == self.alpha_beta

    def online_verify_strong_IC(self, proof):
        if len(proof.input) + 1 != len(self.gammaABC):
            return False
        return self.online_verify_weak_IC(proof)


def affine_verify_weak_IC(vk, proof):
    """Affine-ate variant (parity: affine_verifier_weak_IC, tcc:672-728).
    This framework's host Miller loop is already affine (pairing.py uses
    affine line functions), so the variant is the weak-IC check on a
    freshly processed VK - kept as a distinct entry point for API parity
    and for tests that pin all three verifier flavors."""
    return ProcessedVerifyingKey(vk).online_verify_weak_IC(proof)


class NativeVerifier(VerifyingKey):
    """ctypes bridge to the C-ABI verifier DLL (native/ethsnarks_verify)."""

    def verify(self, proof, native_library_path):
        if not isinstance(proof, Proof):
            raise TypeError("Invalid proof type")
        vk_cstr = ctypes.c_char_p(self.to_json().encode('ascii'))
        proof_cstr = ctypes.c_char_p(proof.to_json().encode('ascii'))
        lib = ctypes.cdll.LoadLibrary(native_library_path)
        lib_verify = lib.ethsnarks_verify
        lib_verify.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
        lib_verify.restype = ctypes.c_bool
        return lib_verify(vk_cstr, proof_cstr)

    def process_native(self, native_library_path):
        """Processed-VK handle on the native side (the reference's
        online/offline verifier split): process once, verify many."""
        return NativeProcessedVK(self, native_library_path)


class NativeProcessedVK(object):
    """Opaque native processed-VK handle (G2 line coefficients +
    e(alpha,beta) precomputed in C++); weak/strong online verification."""

    def __init__(self, vk, native_library_path):
        lib = ctypes.cdll.LoadLibrary(native_library_path)
        lib.ethsnarks_process_vk.argtypes = [ctypes.c_char_p]
        lib.ethsnarks_process_vk.restype = ctypes.c_void_p
        lib.ethsnarks_verify_prepared.argtypes = [ctypes.c_void_p,
                                                  ctypes.c_char_p]
        lib.ethsnarks_verify_prepared.restype = ctypes.c_bool
        lib.ethsnarks_verify_prepared_strong.argtypes = [ctypes.c_void_p,
                                                         ctypes.c_char_p]
        lib.ethsnarks_verify_prepared_strong.restype = ctypes.c_bool
        lib.ethsnarks_release_vk.argtypes = [ctypes.c_void_p]
        self._lib = lib
        self._handle = lib.ethsnarks_process_vk(
            vk.to_json().encode('ascii'))
        if not self._handle:
            raise ValueError("native process_vk failed")

    def verify(self, proof, strong_ic=True):
        if not isinstance(proof, Proof):
            raise TypeError("Invalid proof type")
        fn = (self._lib.ethsnarks_verify_prepared_strong if strong_ic
              else self._lib.ethsnarks_verify_prepared)
        return fn(self._handle, proof.to_json().encode('ascii'))

    def close(self):
        if self._handle:
            self._lib.ethsnarks_release_vk(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
