"""In-circuit EdDSA signature verification model + one-call host helpers.

Public input: the signer key A (x, y).  Private: R, s, message bits.
(BASELINE.md config workload: EdDSA+Pedersen verify batches.)

``eddsa_open`` mirrors the reference's ``eddsa_open<T>()`` host helper
(src/jubjub/eddsa.hpp:62-108): build a throwaway constraint system with the
verify gadget, fill the witness, report satisfiability.
"""

from ..r1cs import ConstraintSystem
from ..gadgets.jubjub import (
    VariablePoint, PureEdDSA_gadget, EdDSA_gadget)
from ..eddsa import PureEdDSA


class EdDSAVerify(object):
    def __init__(self, msg_bits_len=32, gadget_class=PureEdDSA_gadget):
        assert msg_bits_len % 8 == 0
        pb = ConstraintSystem()
        self.A = VariablePoint.allocate(pb, 'A')
        pb.set_input_sizes(2)
        self.R = VariablePoint.allocate(pb, 'R')
        self.s_bits = pb.allocate_array(254, 's')
        self.msg_bits = pb.allocate_array(msg_bits_len, 'msg')
        self.gadget = gadget_class(
            pb, PureEdDSA.B(), self.A, self.R, self.s_bits, self.msg_bits,
            'eddsa')
        self.gadget.generate_r1cs_constraints()
        self.pb = pb

    def set_witness(self, A, sig, msg, require_satisfied=True):
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
        if require_satisfied:
            assert pb.is_satisfied()
        return self


def eddsa_open(A, sig, msg, gadget_class=PureEdDSA_gadget):
    """Check a signature by running it through the verify circuit.

    Returns True iff the witnessed circuit is satisfied (a bad signature
    either fails witness generation or leaves constraints unsatisfied,
    exactly like the reference's pb.is_satisfied() return)."""
    try:
        model = EdDSAVerify(msg_bits_len=len(msg) * 8,
                            gadget_class=gadget_class)
        model.set_witness(A, sig, msg, require_satisfied=False)
    except Exception:
        return False
    return model.pb.is_satisfied()


def pureeddsa_open(A, sig, msg):
    return eddsa_open(A, sig, msg, gadget_class=PureEdDSA_gadget)


def hasheddsa_open(A, sig, msg):
    """EdDSA variant: the message is Pedersen-prehashed in-circuit."""
    return eddsa_open(A, sig, msg, gadget_class=EdDSA_gadget)
