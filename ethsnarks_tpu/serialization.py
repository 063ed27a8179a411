"""r1cs / witness / vk / proof JSON serialization.

Format parity with src/export.cpp: r1cs2json is the snarkjs/circom-style
layout (nPubInputs/nVars/nConstraints + per-constraint {var: coeff} maps,
export.cpp:173-203); witness2json is a flat list of decimal strings
(export.cpp:205-221).  vk/proof JSON live on VerifyingKey/Proof in
:mod:`ethsnarks_tpu.verifier`.
"""

import json


def r1cs_to_dict(cs):
    constraints = []
    for cons in cs.constraints:
        row = []
        for lc in (cons.a, cons.b, cons.c):
            row.append({str(k): str(v) for k, v in sorted(lc.terms.items())})
        constraints.append(row)
    return {
        "nPubInputs": cs.num_inputs,
        "nOutputs": 0,
        "nVars": cs.num_variables,
        "nConstraints": cs.num_constraints,
        "constraints": constraints,
    }


def r1cs2json(cs, path):
    with open(path, 'w') as fh:
        json.dump(r1cs_to_dict(cs), fh)
    return True


def r1cs_from_dict(d):
    """Rebuild a ConstraintSystem (constraints only, no witness/gadgets)."""
    from .r1cs import ConstraintSystem, LinearCombination
    cs = ConstraintSystem()
    for _ in range(d["nVars"] - 1):
        cs.allocate()
    cs.set_input_sizes(d["nPubInputs"])
    for row in d["constraints"]:
        lcs = []
        for terms in row:
            lcs.append(LinearCombination(
                {int(k): int(v) for k, v in terms.items()}))
        cs.add_constraint(*lcs)
    return cs


def witness2json(cs, path):
    with open(path, 'w') as fh:
        json.dump([str(v) for v in cs.values], fh)
    return True


def witness_from_json(path):
    with open(path) as fh:
        return [int(v) for v in json.load(fh)]


def vk2json_file(vk, path):
    with open(path, 'w') as fh:
        fh.write(vk.to_json())


def proof_to_json(proof):
    return proof.to_json()
