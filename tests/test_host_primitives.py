"""Host-layer bit-exactness tests, pinned to the reference test vectors.

Vector sources (reference test files):
 - MiMC:     /root/reference/test/test_mimc.py, ethsnarks/mimc/permutation.py
 - Poseidon: /root/reference/test/test_poseidon.py
 - Keccak:   ethsnarks/mimc/permutation.py H(123) assertion
"""
import unittest

from ethsnarks_tpu.field import FQ, SNARK_SCALAR_FIELD
from ethsnarks_tpu.keccak import keccak_256
from ethsnarks_tpu.mimc import mimc, mimc_hash
from ethsnarks_tpu.poseidon import DefaultParams, poseidon


class TestKeccak(unittest.TestCase):
    def test_empty(self):
        self.assertEqual(
            keccak_256(b'').hexdigest(),
            'c5d2460186f7233c927e7db2dcc703c0e500b653ca82273b7bfad8045d85a470')

    def test_abc(self):
        self.assertEqual(
            keccak_256(b'abc').hexdigest(),
            '4e03657aea45a94fc7d47ba826c8d667c0d1e6e33a64a036ec44f58fa12d6c45')

    def test_streaming(self):
        whole = keccak_256(b'x' * 500).digest()
        h = keccak_256()
        for off in range(0, 500, 7):
            h.update(b'x' * min(7, 500 - off))
        self.assertEqual(h.digest(), whole)


class TestField(unittest.TestCase):
    def test_basic_ops(self):
        a = FQ(SNARK_SCALAR_FIELD - 1)
        self.assertEqual(int(a + 2), 1)
        self.assertEqual(int(a * a), 1)
        self.assertEqual(int(a - a), 0)
        self.assertEqual(int(FQ(7) / FQ(7)), 1)
        self.assertEqual(int(FQ(5).inv() * 5), 1)
        self.assertEqual((-FQ(1)).n, SNARK_SCALAR_FIELD - 1)

    def test_sqrt(self):
        for v in [4, 9, 1234567]:
            r = FQ(v * v)
            s = r.sqrt()
            self.assertEqual(int(s * s), int(r))

    def test_bits_roundtrip(self):
        x = FQ(0b1011)
        bits = x.bits()
        self.assertEqual(len(bits), 254)
        self.assertEqual(bits[:5], '11010')
        self.assertEqual(int(bits[::-1], 2), 0b1011)

    def test_to_bytes(self):
        self.assertEqual(FQ(1).to_bytes('big'), b'\x00' * 31 + b'\x01')
        self.assertEqual(FQ(1).to_bytes('little'), b'\x01' + b'\x00' * 31)


class TestMiMC(unittest.TestCase):
    def test_known(self):
        self.assertEqual(
            mimc(1, 1),
            2447343676970420247355835473667983267115132689045447905848734383579598297563)
        self.assertEqual(
            mimc_hash([1, 1]),
            4087330248547221366577133490880315793780387749595119806283278576811074525767)

    def test_evm_compat(self):
        m0 = 3703141493535563179657531719960160174296085208671919316200479060314459804651
        m1 = 134551314051432487569247388144051420116740427803855572138106146683954151557
        self.assertEqual(
            mimc(m0, m1),
            11437467823393790387399137249441941313717686441929791910070352316474327319704)
        k = 918403109389145570117360101535982733651217667914747213867238065296420114726
        self.assertEqual(
            mimc_hash([m0, m1], k),
            15683951496311901749339509118960676303290224812129752890706581988986633412003)


class TestPoseidon(unittest.TestCase):
    def test_constants(self):
        self.assertEqual(
            DefaultParams.constants_C[0],
            14397397413755236225575615486459253198602422701513067526754101844196324375522)
        self.assertEqual(
            DefaultParams.constants_C[-1],
            10635360132728137321700090133109897687122647659471659996419791842933639708516)
        self.assertEqual(
            DefaultParams.constants_M[0][0],
            19167410339349846567561662441069598364702008768579734801591448511131028229281)
        self.assertEqual(
            DefaultParams.constants_M[-1][-1],
            20261355950827657195644012399234591122288573679402601053407151083849785332516)

    def test_permutation(self):
        self.assertEqual(
            poseidon([1, 2]),
            12242166908188651009877250812424843524687801523336557272219921456462821518061)


if __name__ == "__main__":
    unittest.main()
