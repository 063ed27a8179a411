"""Native C++ verifier (libethsnarks_verify DLL + CLI) vs the static vector.

Builds native/ via make on first use (g++ is part of the baked toolchain).
This is the framework's only cross-language process boundary, mirroring the
reference's python-ctypes-DLL path (ethsnarks/verifier.py:199-212).
"""
import os
import subprocess
import unittest

from ethsnarks_tpu.verifier import NativeVerifier, Proof
from tests.test_verifier import VK_STATIC, PROOF_STATIC

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), '..', 'native')
_LIB = os.path.join(_NATIVE_DIR, 'build', 'libethsnarks_verify.so')
_CLI = os.path.join(_NATIVE_DIR, 'build', 'verify')


def _ensure_built():
    if not (os.path.exists(_LIB) and os.path.exists(_CLI)):
        subprocess.check_call(['make'], cwd=_NATIVE_DIR)


class TestNativeVerifier(unittest.TestCase):
    @classmethod
    def setUpClass(cls):
        _ensure_built()

    def test_dll_verify(self):
        vk = NativeVerifier.from_dict(VK_STATIC)
        proof = Proof.from_dict(PROOF_STATIC)
        self.assertTrue(vk.verify(proof, _LIB))

    def test_dll_reject(self):
        vk = NativeVerifier.from_dict(VK_STATIC)
        proof = Proof.from_dict(PROOF_STATIC)
        bad = Proof(proof.A, proof.B, proof.C, [proof.input[0], 8])
        self.assertFalse(vk.verify(bad, _LIB))

    def test_cli(self):
        import json
        import tempfile
        vk = NativeVerifier.from_dict(VK_STATIC)
        proof = Proof.from_dict(PROOF_STATIC)
        with tempfile.TemporaryDirectory() as td:
            vk_path = os.path.join(td, 'vk.json')
            proof_path = os.path.join(td, 'proof.json')
            with open(vk_path, 'w') as fh:
                fh.write(vk.to_json())
            with open(proof_path, 'w') as fh:
                fh.write(proof.to_json())
            out = subprocess.run([_CLI, vk_path, proof_path],
                                 capture_output=True, text=True)
            self.assertEqual(out.returncode, 0)
            self.assertIn('OK', out.stdout)

    def test_processed_vk_native(self):
        vk = NativeVerifier.from_dict(VK_STATIC)
        proof = Proof.from_dict(PROOF_STATIC)
        pvk = vk.process_native(_LIB)
        try:
            self.assertTrue(pvk.verify(proof))
            self.assertTrue(pvk.verify(proof, strong_ic=False))
            bad = Proof(proof.A, proof.B, proof.C, [proof.input[0], 8])
            self.assertFalse(pvk.verify(bad))
            short = Proof(proof.A, proof.B, proof.C, proof.input[:1])
            self.assertFalse(pvk.verify(short))            # strong: length
            self.assertFalse(pvk.verify(short, strong_ic=False))  # pairing
        finally:
            pvk.close()

    def test_malformed_json(self):
        vk = NativeVerifier.from_dict(VK_STATIC)
        import ctypes
        lib = ctypes.cdll.LoadLibrary(_LIB)
        lib.ethsnarks_verify.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
        lib.ethsnarks_verify.restype = ctypes.c_bool
        self.assertFalse(lib.ethsnarks_verify(b'{not json', b'{}'))
        self.assertFalse(lib.ethsnarks_verify(
            vk.to_json().encode(), b'{"A": ["0x1","0x1"]}'))


if __name__ == "__main__":
    unittest.main()
