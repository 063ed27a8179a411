"""Batched Poseidon circuit with device-side witness generation.

TPU-first equivalent of the reference's master-instance template system for
Poseidon (poseidon.hpp:405-517, SURVEY.md §2.3/§5.7): the reference builds
ONE master protoboard holding the constraint template and stamps variable
translations per instance; here the circuit rows are stamped per instance
by the gadget layer while the witness of ALL instances is computed by ONE
batched device trace (ops.poseidon_ops.poseidon_witness_device) and
bulk-assigned into the variable vector - no per-gadget python witness
recursion.  Same pattern as models.merkle_batch for MiMC.
"""

import numpy as np
import jax.numpy as jnp

from ..r1cs import ConstraintSystem
from ..gadgets import Poseidon_gadget
from ..field import SNARK_SCALAR_FIELD
from ..ops.fp import Fr
from ..ops.poseidon_ops import _poseidon_witness_jit
from ..poseidon import DefaultParams, poseidon

P = SNARK_SCALAR_FIELD


class BatchPoseidonHash(object):
    """N independent Poseidon_gadget instances (t=6 permutation, x^5
    sboxes) with public digests; witness filled by one batched device
    trace.  Constraint parity: 3 * (RF*t + RP) = 315 rows per permutation
    plus one digest bind each (reference poseidon.hpp:520-521)."""

    def __init__(self, n_instances, n_inputs=2, params=None):
        self.params = params or DefaultParams
        self.n_instances = n_instances
        self.n_inputs = n_inputs
        pb = ConstraintSystem()
        self.digest_vs = [pb.allocate('digest_%d' % i)
                          for i in range(n_instances)]
        pb.set_input_sizes(n_instances)
        self.input_vs = []
        self.gadgets = []
        for i in range(n_instances):
            ins = pb.allocate_array(n_inputs, 'in_%d' % i)
            g = Poseidon_gadget(pb, [v + 0 for v in ins],
                                'poseidon_%d' % i, params=self.params,
                                constrain_outputs=0)
            g.generate_r1cs_constraints()
            pb.add_constraint(g.final_state[0], 1, self.digest_vs[i] + 0,
                              'bind_%d' % i)
            self.input_vs.append(ins)
            self.gadgets.append(g)
        self.pb = pb

    def set_witness(self, inputs_batch):
        """inputs_batch: n_instances tuples of n_inputs ints.  ONE batched
        device permutation trace fills every sbox variable."""
        assert len(inputs_batch) == self.n_instances
        pb = self.pb
        t = self.params.t
        B = self.n_instances
        state = np.zeros((Fr.L, t, B), dtype=np.uint32)
        for j in range(self.n_inputs):
            col = np.asarray(Fr.to_mont_jit(Fr.to_limbs_fast(
                [row[j] for row in inputs_batch])))
            state[:, j, :] = col
            for i, row in enumerate(inputs_batch):
                pb.setval(self.input_vs[i][j], int(row[j]) % P)

        final, aux = _poseidon_witness_jit(jnp.asarray(state))
        # aux: (n_sboxes, 3, L, B) -> plain ints, bulk-assigned.  Each
        # _FifthPower allocates (x2, x4, x5) contiguously and the gadget
        # appends sboxes in trace order, so instance i's k-th sbox sits at
        # base_k + 0..2.
        n_sb = aux.shape[0]
        aux_plain = Fr.from_limbs_fast(np.asarray(Fr.from_mont_jit(
            jnp.moveaxis(aux, 2, 0).reshape(Fr.L, n_sb * 3 * B))))
        aux_plain = np.asarray(aux_plain, dtype=object).reshape(n_sb, 3, B)
        for i in range(B):
            g = self.gadgets[i]
            assert len(g.sboxes) == n_sb
            for k, sb in enumerate(g.sboxes):
                base = sb.x2.index
                pb.values[base] = int(aux_plain[k, 0, i])
                pb.values[base + 1] = int(aux_plain[k, 1, i])
                pb.values[base + 2] = int(aux_plain[k, 2, i])

        final_plain = Fr.from_limbs_fast(np.asarray(Fr.from_mont_jit(
            final[:, 0, :])))
        for i in range(B):
            pb.setval(self.digest_vs[i], int(final_plain[i]))
        return self

    def digests(self):
        return [self.pb.val(v) for v in self.digest_vs]
