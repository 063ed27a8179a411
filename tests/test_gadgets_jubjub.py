"""JubJub gadget tests: witness parity with the host curve/pedersen/eddsa."""
import unittest

from ethsnarks_tpu.field import FQ, SNARK_SCALAR_FIELD
from ethsnarks_tpu.r1cs import ConstraintSystem
from ethsnarks_tpu.jubjub import Point
from ethsnarks_tpu.pedersen import pedersen_hash_bits
from ethsnarks_tpu.eddsa import PureEdDSA
from ethsnarks_tpu.gadgets.jubjub import (
    VariablePoint, PointAdder, PointDoubler, ConditionalPoint, MontgomeryAdder, MontgomeryToEdwards, fixed_base_mul, ScalarMult, NotLowOrder, PointValidator, PedersenHash, PureEdDSA_gadget)

P = SNARK_SCALAR_FIELD


def _alloc_point(pb, pt, name):
    v = VariablePoint.allocate(pb, name)
    pb.setval(v.x, pt.x.n)
    pb.setval(v.y, pt.y.n)
    return v


class TestPointOps(unittest.TestCase):
    def test_adder(self):
        g = Point.generator()
        a, b = g * 3, g * 5
        pb = ConstraintSystem()
        va = _alloc_point(pb, a, 'a')
        vb = _alloc_point(pb, b, 'b')
        adder = PointAdder(pb, va, vb, 'add')
        adder.generate_r1cs_constraints()
        self.assertEqual(pb.num_constraints, 7)
        adder.generate_r1cs_witness()
        r = adder.result()
        expect = a + b
        self.assertEqual(pb.val(r.x), expect.x.n)
        self.assertEqual(pb.val(r.y), expect.y.n)
        self.assertTrue(pb.is_satisfied())

    def test_doubler(self):
        g = Point.generator() * 9
        pb = ConstraintSystem()
        v = _alloc_point(pb, g, 'p')
        d = PointDoubler(pb, v, 'dbl')
        d.generate_r1cs_constraints()
        self.assertEqual(pb.num_constraints, 6)
        d.generate_r1cs_witness()
        expect = g.double()
        self.assertEqual(pb.val(d.result().x), expect.x.n)
        self.assertEqual(pb.val(d.result().y), expect.y.n)
        self.assertTrue(pb.is_satisfied())

    def test_conditional(self):
        g = Point.generator()
        for bit in (0, 1):
            pb = ConstraintSystem()
            v = _alloc_point(pb, g, 'p')
            b = pb.allocate('bit')
            pb.setval(b, bit)
            c = ConditionalPoint(pb, v, b, 'cond')
            c.generate_r1cs_constraints()
            c.generate_r1cs_witness()
            want = g if bit else Point.infinity()
            self.assertEqual(pb.val(c.result().x), want.x.n)
            self.assertEqual(pb.val(c.result().y), want.y.n)
            self.assertTrue(pb.is_satisfied())

    def test_montgomery(self):
        g = Point.generator()
        a, b = (g * 7).as_mont(), (g * 11).as_mont()
        pb = ConstraintSystem()
        va = VariablePoint.allocate(pb, 'a')
        pb.setval(va.x, a.u.n)
        pb.setval(va.y, a.v.n)
        vb = VariablePoint.allocate(pb, 'b')
        pb.setval(vb.x, b.u.n)
        pb.setval(vb.y, b.v.n)
        adder = MontgomeryAdder(pb, va, vb, 'madd')
        conv = MontgomeryToEdwards(pb, adder.result(), 'conv')
        adder.generate_r1cs_constraints()
        conv.generate_r1cs_constraints()
        self.assertEqual(pb.num_constraints, 5)
        adder.generate_r1cs_witness()
        conv.generate_r1cs_witness()
        want = g * 18
        self.assertEqual(pb.val(conv.result().x), want.x.n)
        self.assertEqual(pb.val(conv.result().y), want.y.n)
        self.assertTrue(pb.is_satisfied())

    def test_validators(self):
        g = Point.generator() * 13
        pb = ConstraintSystem()
        v = _alloc_point(pb, g, 'p')
        val = PointValidator(pb, v, 'val')
        val.generate_r1cs_constraints()
        val.generate_r1cs_witness()
        self.assertTrue(pb.is_satisfied())
        # a low-order point must fail NotLowOrder
        low = Point.all_loworder_points()[3]
        pb2 = ConstraintSystem()
        v2 = _alloc_point(pb2, low, 'p')
        nlo = NotLowOrder(pb2, v2, 'nlo')
        nlo.generate_r1cs_constraints()
        nlo.generate_r1cs_witness()
        self.assertFalse(pb2.is_satisfied())


class TestScalarMuls(unittest.TestCase):
    def _bits(self, value, n):
        return [(value >> i) & 1 for i in range(n)]

    def test_fixed_base_mul(self):
        base = Point.generator()
        scalar = 0xdeadbeefcafe
        nbits = 48
        pb = ConstraintSystem()
        bits = pb.allocate_array(nbits, 'bits')
        for i, b in enumerate(self._bits(scalar, nbits)):
            pb.setval(bits[i], b)
        g = fixed_base_mul(pb, base, bits, 'fbm')
        g.generate_r1cs_constraints()
        g.generate_r1cs_witness()
        want = base * scalar
        self.assertEqual(pb.val(g.result().x), want.x.n)
        self.assertEqual(pb.val(g.result().y), want.y.n)
        self.assertTrue(pb.is_satisfied())

    def test_scalar_mult(self):
        point = Point.generator() * 99
        scalar = 0b110101101
        nbits = 9
        pb = ConstraintSystem()
        vp = _alloc_point(pb, point, 'p')
        bits = pb.allocate_array(nbits, 'bits')
        for i, b in enumerate(self._bits(scalar, nbits)):
            pb.setval(bits[i], b)
        g = ScalarMult(pb, vp, bits, 'sm')
        g.generate_r1cs_constraints()
        g.generate_r1cs_witness()
        want = point * scalar
        self.assertEqual(pb.val(g.result().x), want.x.n)
        self.assertEqual(pb.val(g.result().y), want.y.n)
        self.assertTrue(pb.is_satisfied())


class TestPedersenGadget(unittest.TestCase):
    def test_vs_host(self):
        bit_string = '10110011001111100110010010110001010001101010010000101110' \
                     '1001000100100000001111101101'  # 84 bits (28 windows)
        want = pedersen_hash_bits('test', bit_string)
        pb = ConstraintSystem()
        bits = pb.allocate_array(len(bit_string), 'bits')
        for i, ch in enumerate(bit_string):
            pb.setval(bits[i], int(ch))
        g = PedersenHash(pb, 'test', bits, 'ph')
        g.generate_r1cs_constraints()
        g.generate_r1cs_witness()
        self.assertEqual(pb.val(g.result().x), want.x.n)
        self.assertEqual(pb.val(g.result().y), want.y.n)
        self.assertTrue(pb.is_satisfied())

    def test_multi_segment(self):
        """> 62 windows forces a second basepoint segment."""
        bit_string = ('101' * 70)  # 70 windows -> 2 segments
        want = pedersen_hash_bits('test', bit_string)
        pb = ConstraintSystem()
        bits = pb.allocate_array(len(bit_string), 'bits')
        for i, ch in enumerate(bit_string):
            pb.setval(bits[i], int(ch))
        g = PedersenHash(pb, 'test', bits, 'ph')
        g.generate_r1cs_constraints()
        g.generate_r1cs_witness()
        self.assertEqual(pb.val(g.result().x), want.x.n)
        self.assertEqual(pb.val(g.result().y), want.y.n)
        self.assertTrue(pb.is_satisfied())


class TestEdDSAGadget(unittest.TestCase):
    def test_pure_eddsa_known(self):
        """Verify the cross-implementation vector inside the circuit."""
        A = Point(FQ(333671881179914989291633188949569309119725676183802886621140166987382124337),
                  FQ(4050436616325076046600891135828313078248584449767955905006778857958871314574))
        R = Point(FQ(17815983127755465894346158776246779862712623073638768513395595796132990361464),
                  FQ(947174453624106321442736396890323086851143728754269151257776508699019857364))
        s = 13341814865473145800030207090487687417599620847405735706082771659861699337012
        msg = b'abcd'
        msg_bits_str = ''.join(bin(b)[2:].rjust(8, '0') for b in msg)

        pb = ConstraintSystem()
        vA = _alloc_point(pb, A, 'A')
        vR = _alloc_point(pb, R, 'R')
        s_bits = pb.allocate_array(254, 's')
        for i in range(254):
            pb.setval(s_bits[i], (s >> i) & 1)
        msg_bits = pb.allocate_array(len(msg_bits_str), 'm')
        for i, ch in enumerate(msg_bits_str):
            pb.setval(msg_bits[i], int(ch))

        g = PureEdDSA_gadget(pb, PureEdDSA.B(), vA, vR, s_bits, msg_bits,
                             'eddsa')
        g.generate_r1cs_constraints()
        g.generate_r1cs_witness()
        self.assertTrue(pb.is_satisfied())
        # flip one message bit -> hash changes -> unsatisfied
        pb.setval(msg_bits[0], 1 - pb.val(msg_bits[0]))
        g.generate_r1cs_witness()
        self.assertFalse(pb.is_satisfied())

    def test_eddsa_open(self):
        """One-call host helper (reference eddsa_open<T>, eddsa.hpp:62-108)."""
        from ethsnarks_tpu.models import eddsa_open
        from ethsnarks_tpu.eddsa import Signature
        A = Point(FQ(333671881179914989291633188949569309119725676183802886621140166987382124337),
                  FQ(4050436616325076046600891135828313078248584449767955905006778857958871314574))
        R = Point(FQ(17815983127755465894346158776246779862712623073638768513395595796132990361464),
                  FQ(947174453624106321442736396890323086851143728754269151257776508699019857364))
        s = 13341814865473145800030207090487687417599620847405735706082771659861699337012
        self.assertTrue(eddsa_open(A, Signature(R, s), b'abcd'))
        self.assertFalse(eddsa_open(A, Signature(R, s + 1), b'abcd'))
        self.assertFalse(eddsa_open(A, Signature(R, s), b'abce'))

    def test_hasheddsa_open(self):
        """EdDSA variant prehashes in-circuit; message bit lengths that are
        not multiples of 3 must be zero-padded (regression: the gadget used
        to reject them)."""
        from ethsnarks_tpu.models import hasheddsa_open
        from ethsnarks_tpu.eddsa import EdDSA, Signature
        k = FQ(12345678901234567890)
        for msg in (b'abcd', b'xyz'):   # 32 bits (pad 2), 24 bits (pad 0)
            sm = EdDSA.sign(msg, k)
            self.assertTrue(hasheddsa_open(sm.A, sm.sig, msg))
            self.assertFalse(
                hasheddsa_open(sm.A, Signature(sm.sig.R, sm.sig.s + 1), msg))


if __name__ == "__main__":
    unittest.main()
