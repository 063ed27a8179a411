"""Host shamirspoly library vs the reference's static vectors + algebraic
round trips (reference test strategy: test/test_shamir_poly.py)."""
import random
import unittest

from ethsnarks_tpu.field import FQ, SNARK_SCALAR_FIELD
from ethsnarks_tpu.shamirspoly import (
    shamirs_poly, lagrange, inverse_lagrange)

_rng = random.Random(4242)


def _rand_fq():
    return FQ(_rng.randrange(1, SNARK_SCALAR_FIELD))


class TestShamirsPoly(unittest.TestCase):
    def test_static_vectors(self):
        # pinned to /root/reference/test/test_shamir_poly.py:25-35
        alpha = [
            FQ(6808181831819141657160280673506432691407806061837762993142662373500430825792),
            FQ(4138536697521448323155976179625860582331141320072618244300034508091478437877),
            FQ(20259243729221075783953642258755031830946498253783650311586175820530608751936),
            FQ(11227115470523445882235139084890542822660569362938710556861479160600812964997)]
        expected = [
            FQ(6808181831819141657160280673506432691407806061837762993142662373500430825792),
            FQ(20544834857245836424258632451520592838797650598216707762192147676147522484985),
            FQ(10833210933219706719196668784844423052753721417299010433393634464005858464330),
            FQ(1259517139202877390892412692306630092142705895884865660519589327528699562575)]
        got = [shamirs_poly(FQ(i), alpha) for i in range(len(alpha))]
        self.assertEqual(got, expected)

    def test_secret_recovery(self):
        for _ in range(5):
            alpha = [_rand_fq() for _ in range(4)]
            start = _rng.randrange(1, SNARK_SCALAR_FIELD - 8)
            shares = [(FQ(i), shamirs_poly(FQ(i), alpha))
                      for i in range(start, start + 4)]
            self.assertEqual(lagrange(shares, 0), alpha[0])
            # fewer shares than the threshold must NOT recover it
            self.assertNotEqual(lagrange(shares[1:], 0), alpha[0])

    def test_inverse_lagrange_roundtrip(self):
        alpha = [_rand_fq() for _ in range(3)]
        pts = [(FQ(i), shamirs_poly(FQ(i), alpha)) for i in range(1, 4)]
        probe = shamirs_poly(FQ(2), alpha)
        self.assertEqual(inverse_lagrange(pts, probe), FQ(2))

    def test_rejects_non_fq(self):
        with self.assertRaises(TypeError):
            shamirs_poly(1, [FQ(1), FQ(2)])
        with self.assertRaises(ValueError):
            shamirs_poly(FQ(1), [FQ(1)])


if __name__ == "__main__":
    unittest.main()
