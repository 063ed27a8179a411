"""In-circuit PureEdDSA signature verification model.

Public input: the signer key A (x, y).  Private: R, s, message bits.
(BASELINE.md config workload: EdDSA+Pedersen verify batches.)
"""

from ..r1cs import ConstraintSystem
from ..gadgets.jubjub import VariablePoint, PureEdDSA_gadget
from ..eddsa import PureEdDSA


class EdDSAVerify(object):
    def __init__(self, msg_bits_len=32):
        assert msg_bits_len % 8 == 0
        pb = ConstraintSystem()
        self.A = VariablePoint.allocate(pb, 'A')
        pb.set_input_sizes(2)
        self.R = VariablePoint.allocate(pb, 'R')
        self.s_bits = pb.allocate_array(254, 's')
        self.msg_bits = pb.allocate_array(msg_bits_len, 'msg')
        self.gadget = PureEdDSA_gadget(
            pb, PureEdDSA.B(), self.A, self.R, self.s_bits, self.msg_bits,
            'eddsa')
        self.gadget.generate_r1cs_constraints()
        self.pb = pb

    def set_witness(self, A, sig, msg):
        pb = self.pb
        pb.setval(self.A.x, A.x.n)
        pb.setval(self.A.y, A.y.n)
        R, s = sig
        pb.setval(self.R.x, R.x.n)
        pb.setval(self.R.y, R.y.n)
        s = int(s)
        for i in range(254):
            pb.setval(self.s_bits[i], (s >> i) & 1)
        bits = ''.join(bin(b)[2:].rjust(8, '0') for b in msg)
        assert len(bits) == len(self.msg_bits)
        for i, ch in enumerate(bits):
            pb.setval(self.msg_bits[i], int(ch))
        self.gadget.generate_r1cs_witness()
        assert pb.is_satisfied()
        return self
