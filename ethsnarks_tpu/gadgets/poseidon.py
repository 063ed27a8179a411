"""Poseidon permutation gadget.

Circuit parity with src/gadgets/poseidon.hpp: x^5 sbox costs 3 constraints
(x2, x4, x5); rounds carry the state as linear combinations so ARK and the
MDS mix are free; partial rounds substitute only state[0].  Default instance
(t=6, RF=8, RP=57) costs 3*(8*6 + 57) = 315 constraints + optional output
binds.  The reference's master-instance/translator machinery
(poseidon.hpp:405-517) is unnecessary here: constraints are plain data rows,
deduplicated structurally by construction.
"""

from ..r1cs import Gadget, LinearCombination
from ..poseidon.permutation import DefaultParams
from ..field import SNARK_SCALAR_FIELD

P = SNARK_SCALAR_FIELD


class _FifthPower(Gadget):
    """x^5 via x2, x4, x5 variables (3 constraints)."""

    def __init__(self, pb, x_lc, annotation):
        super().__init__(pb, annotation)
        self.x = LinearCombination() + x_lc
        self.x2 = pb.allocate(self.fmt('x2'))
        self.x4 = pb.allocate(self.fmt('x4'))
        self.x5 = pb.allocate(self.fmt('x5'))

    def generate_r1cs_constraints(self):
        pb = self.pb
        pb.add_constraint(self.x, self.x, self.x2, self.fmt('x^2'))
        pb.add_constraint(self.x2, self.x2, self.x4, self.fmt('x^4'))
        pb.add_constraint(self.x4, self.x, self.x5, self.fmt('x^5'))

    def generate_r1cs_witness(self):
        pb = self.pb
        x = pb.lc_val(self.x)
        pb.setval(self.x2, x * x % P)
        pb.setval(self.x4, pb.val(self.x2) ** 2 % P)
        pb.setval(self.x5, pb.val(self.x4) * x % P)

    def result(self):
        return self.x5


class Poseidon_gadget(Gadget):
    """Poseidon permutation over ``inputs`` LCs (len < t); result() is
    state[0] after the final round (or full state via results())."""

    def __init__(self, pb, inputs, annotation, params=None,
                 constrain_outputs=1):
        super().__init__(pb, annotation)
        self.params = params or DefaultParams
        t = self.params.t
        assert len(inputs) < t
        state = [LinearCombination() + x for x in inputs]
        state += [LinearCombination() for _ in range(t - len(inputs))]

        self.sboxes = []
        half_F = self.params.nRoundsF // 2
        n_p = self.params.nRoundsP
        M = self.params.constants_M
        for i, C_i in enumerate(self.params.constants_C):
            state = [s + C_i for s in state]  # ARK (free)
            full = i < half_F or i >= (half_F + n_p)
            n_sub = t if full else 1
            new_state = []
            for j in range(t):
                if j < n_sub:
                    g = _FifthPower(pb, state[j], self.fmt('r%d_s%d' % (i, j)))
                    self.sboxes.append(g)
                    new_state.append(LinearCombination() + g.result())
                else:
                    new_state.append(state[j])
            # MDS mix (free: linear combination of LCs)
            state = [sum((new_state[k] * M[j][k] for k in range(t)),
                         LinearCombination())
                     for j in range(t)]
        self.final_state = state
        self.outputs = pb.allocate_array(constrain_outputs, self.fmt('out')) \
            if constrain_outputs else []

    def generate_r1cs_constraints(self):
        for g in self.sboxes:
            g.generate_r1cs_constraints()
        for i, out in enumerate(self.outputs):
            self.pb.add_constraint(self.final_state[i], 1, out,
                                   self.fmt('bind_%d' % i))

    def generate_r1cs_witness(self):
        for g in self.sboxes:
            g.generate_r1cs_witness()
        for i, out in enumerate(self.outputs):
            self.pb.setval(out, self.pb.lc_val(self.final_state[i]))

    def result(self):
        return self.outputs[0] if self.outputs else self.final_state[0]

    def results(self):
        return self.final_state
