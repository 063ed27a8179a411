"""Batched device MiMC/Poseidon vs the host oracle."""
import random
import unittest

from ethsnarks_tpu.field import SNARK_SCALAR_FIELD
from ethsnarks_tpu.mimc import mimc_hash
from ethsnarks_tpu.poseidon import poseidon
from ethsnarks_tpu.ops.mimc import mimc_hash_device
from ethsnarks_tpu.ops.poseidon_ops import poseidon_device


class TestDeviceMiMC(unittest.TestCase):
    def test_known_vector(self):
        m0 = 3703141493535563179657531719960160174296085208671919316200479060314459804651
        m1 = 134551314051432487569247388144051420116740427803855572138106146683954151557
        k = 918403109389145570117360101535982733651217667914747213867238065296420114726
        got = mimc_hash_device([(m0, m1)] * 4, k)
        self.assertEqual(got, [
            15683951496311901749339509118960676303290224812129752890706581988986633412003] * 4)

    def test_random_batch(self):
        rng = random.Random(42)
        msgs = [(rng.randrange(SNARK_SCALAR_FIELD), rng.randrange(SNARK_SCALAR_FIELD))
                for _ in range(16)]
        got = mimc_hash_device(msgs, 0)
        want = [mimc_hash(list(m), 0) for m in msgs]
        self.assertEqual(got, want)


class TestDevicePoseidon(unittest.TestCase):
    def test_known_vector(self):
        got = poseidon_device([(1, 2)] * 3)
        self.assertEqual(got, [
            12242166908188651009877250812424843524687801523336557272219921456462821518061] * 3)

    def test_random_batch(self):
        rng = random.Random(7)
        rows = [(rng.randrange(SNARK_SCALAR_FIELD),
                 rng.randrange(SNARK_SCALAR_FIELD),
                 rng.randrange(SNARK_SCALAR_FIELD))
                for _ in range(8)]
        got = poseidon_device(rows)
        want = [poseidon(list(r)) for r in rows]
        self.assertEqual(got, want)

    def test_chained(self):
        rows = [(5, 6)] * 2
        got = poseidon_device(rows, chained=True)
        want = poseidon([5, 6], chained=True)
        self.assertEqual(got[0], want)
        self.assertEqual(got[1], want)


if __name__ == "__main__":
    unittest.main()
