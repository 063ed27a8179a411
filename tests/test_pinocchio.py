"""Pinocchio .arith interpreter: golden evaluation + constraint round trips.

Circuits exercise every opcode; expected values are hand-computed (the
reference uses the same golden-file diff strategy, Makefile:106-113).
"""
import unittest

from ethsnarks_tpu.field import SNARK_SCALAR_FIELD
from ethsnarks_tpu.pinocchio import CircuitReader

P = SNARK_SCALAR_FIELD

ADD = "total 3\ninput 0\ninput 1\noutput 2\nadd in 2 <0 1> out 1 <2>\n"
MUL = "total 3\ninput 0\ninput 1\noutput 2\nmul in 2 <0 1> out 1 <2>\n"
XOR = "total 3\ninput 0\ninput 1\noutput 2\nxor in 2 <0 1> out 1 <2>\n"
OR = "total 3\ninput 0\ninput 1\noutput 2\nor in 2 <0 1> out 1 <2>\n"
CONST_MUL = "total 2\ninput 0\noutput 1\nconst-mul-ffff in 1 <0> out 1 <1>\n"
CONST_MUL_NEG = ("total 2\ninput 0\noutput 1\n"
                 "const-mul-neg-ffff in 1 <0> out 1 <1>\n")
TABLE1 = "total 2\ninput 0\noutput 1\ntable 1 <7 9> in <0> out <1>\n"
TABLE2 = "total 3\ninput 0\ninput 1\noutput 2\ntable 2 <3 6 9 12> in <0 1> out <2>\n"
SPLIT_PACK = ("total 6\ninput 0\noutput 5\n"
              "split in 1 <0> out 3 <1 2 3>\n"
              "pack in 3 <1 2 3> out 1 <4>\n"
              "add in 2 <4 0> out 1 <5>\n")
ZEROP = ("total 4\ninput 0\noutput 3\n"
         "zerop in 1 <0> out 2 <1 2>\n"
         "add in 2 <2 0> out 1 <3>\n")
NIZK = ("total 4\ninput 0\nnizkinput 1\noutput 3\n"
        "mul in 2 <0 1> out 1 <2>\nadd in 2 <2 1> out 1 <3>\n")


def _run(circuit, inputs, check_constraints=True):
    reader = CircuitReader(circuit)
    reader.set_inputs(inputs)
    out = reader.eval()
    if check_constraints:
        cs, w2v = reader.build_constraint_system()
        reader.fill_witness(cs, w2v)
        assert cs.is_satisfied(), "constraints unsatisfied"
    return out


class TestPinocchioEval(unittest.TestCase):
    def test_add(self):
        self.assertEqual(_run(ADD, "0=2\n1=4"), {2: 6})

    def test_mul(self):
        # input values are HEX (reference readFieldElementFromHex parity)
        self.assertEqual(_run(MUL, "0=100\n1=123"), {2: 0x100 * 0x123})

    def test_xor_or(self):
        self.assertEqual(_run(XOR, "0=1\n1=0"), {2: 1})
        self.assertEqual(_run(XOR, "0=1\n1=1"), {2: 0})
        self.assertEqual(_run(OR, "0=0\n1=0"), {2: 0})
        self.assertEqual(_run(OR, "0=1\n1=1"), {2: 1})

    def test_const_mul(self):
        self.assertEqual(_run(CONST_MUL, "0=2"), {1: 2 * 0xffff})
        self.assertEqual(_run(CONST_MUL_NEG, "0=2"), {1: (P - 2 * 0xffff) % P})

    def test_table(self):
        self.assertEqual(_run(TABLE1, "0=0"), {1: 7})
        self.assertEqual(_run(TABLE1, "0=1"), {1: 9})
        for a in (0, 1):
            for b in (0, 1):
                want = [3, 6, 9, 12][a + 2 * b]
                self.assertEqual(_run(TABLE2, "0=%d\n1=%d" % (a, b)),
                                 {2: want})

    def test_split_pack_roundtrip(self):
        self.assertEqual(_run(SPLIT_PACK, "0=5"), {5: 10})

    def test_zerop(self):
        self.assertEqual(_run(ZEROP, "0=7"), {3: 8})
        self.assertEqual(_run(ZEROP, "0=0"), {3: 0})

    def test_nizk_private_input(self):
        reader = CircuitReader(NIZK)
        reader.set_inputs("0=3\n1=5")
        out = reader.eval()
        self.assertEqual(out, {3: 20})
        cs, w2v = reader.build_constraint_system()
        reader.fill_witness(cs, w2v)
        self.assertTrue(cs.is_satisfied())
        # wire 1 (nizk) must be private: primary = input 0 + output 3
        self.assertEqual(cs.num_inputs, 2)
        self.assertEqual(reader.primary_inputs(), [3, 20])


if __name__ == "__main__":
    unittest.main()
