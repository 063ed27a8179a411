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


# ---------------- bellman / snarkjs proving-key interop ----------------
#
# Format parity with src/export.cpp pk_bellman2ethsnarks (:267-328): keys
# "A", "B1", "B2", "C" (aux from index 2), "hExps", "vk_alfa_1", "vk_beta_2",
# "vk_delta_2"; points as decimal-string coordinate arrays, projective
# infinity encoded [0, 1, 0].

def _bell_g1(pt):
    from .bn254 import Fq, FIELD_MODULUS
    vals = [int(c) for c in pt]
    if len(vals) >= 3 and vals[2] == 0:
        return None
    if all(v == 0 for v in vals[:2]):
        return None
    if len(vals) >= 3 and vals[2] != 1:
        zi = pow(vals[2], -1, FIELD_MODULUS)
        return (Fq(vals[0] * zi), Fq(vals[1] * zi))
    return (Fq(vals[0]), Fq(vals[1]))


def _bell_g2(pt):
    from .bn254 import Fq2, FIELD_MODULUS
    x = [int(c) for c in pt[0]]
    y = [int(c) for c in pt[1]]
    if len(pt) >= 3:
        z = [int(c) for c in pt[2]]
        if z == [0, 0]:
            return None
        if z != [1, 0]:
            zq = Fq2([z[0], z[1]])
            zi = zq.inv()
            return (Fq2(x) * zi, Fq2(y) * zi)
    return (Fq2(x), Fq2(y))


def _bell_dump_g1(pt):
    if pt is None:
        return ["0", "1", "0"]
    return [str(pt[0].n), str(pt[1].n), "1"]


def _bell_dump_g2(pt):
    if pt is None:
        return [["0", "0"], ["1", "0"], ["0", "0"]]
    return [[str(pt[0].coeffs[0]), str(pt[0].coeffs[1])],
            [str(pt[1].coeffs[0]), str(pt[1].coeffs[1])],
            [["1", "0"][0], "0"]]


def pk_to_bellman_dict(pk, num_variables, domain_bitrev):
    """Serialize our nozk ProvingKey in the bellman layout (dense queries,
    natural-order hExps).  Used for interop tests and export."""
    a_dense = [None] * num_variables
    for i, pt in pk.a_query:
        a_dense[i] = pt
    b1_dense = [None] * num_variables  # nozk has no B-G1; emit zeros
    b2_dense = [None] * num_variables
    for i, pt in pk.b_query:
        b2_dense[i] = pt
    # C: bellman stores per-variable; aux entries start at index 2 in the
    # reference importer; we emit [pad, pad, L...]
    c_list = [None, None] + list(pk.l_query)
    m = len(pk.h_query_bitrev)
    h_natural = [None] * m
    for p, pt in enumerate(pk.h_query_bitrev):
        h_natural[int(domain_bitrev[p])] = pt
    return {
        "A": [_bell_dump_g1(p) for p in a_dense],
        "B1": [_bell_dump_g1(p) for p in b1_dense],
        "B2": [_bell_dump_g2(p) for p in b2_dense],
        "C": [_bell_dump_g1(p) for p in c_list],
        "hExps": [_bell_dump_g1(p) for p in h_natural],
        "vk_alfa_1": _bell_dump_g1(pk.alpha_g1),
        "vk_beta_2": _bell_dump_g2(pk.beta_g2),
        "vk_delta_2": _bell_dump_g2(pk.delta_g2),
        "nPublic": pk.num_inputs,
    }


def pk_from_bellman_dict(d, num_inputs=None):
    """bellman/snarkjs pk JSON -> our nozk ProvingKey (sparse queries, H
    re-permuted to the NTT's bit-reversed layout)."""
    from .groth16 import ProvingKey
    from .ops.ntt import _bitrev_indices

    a_query = []
    for i, pt in enumerate(d["A"]):
        g = _bell_g1(pt)
        if g is not None:
            a_query.append((i, g))
    b_query = []
    for i, pt in enumerate(d["B2"]):
        g = _bell_g2(pt)
        if g is not None:
            b_query.append((i, g))
    l_query = [_bell_g1(p) for p in d["C"][2:]]
    h_natural = [_bell_g1(p) for p in d["hExps"]]
    m = 1
    while m < len(h_natural):
        m *= 2
    h_natural += [None] * (m - len(h_natural))
    bitrev = _bitrev_indices(m)
    h_bitrev = [h_natural[int(bitrev[p])] for p in range(m)]
    if num_inputs is None:
        num_inputs = int(d.get("nPublic", 0))
    return ProvingKey(
        alpha_g1=_bell_g1(d["vk_alfa_1"]),
        beta_g2=_bell_g2(d["vk_beta_2"]),
        delta_g2=_bell_g2(d["vk_delta_2"]),
        a_query=a_query,
        b_query=b_query,
        h_query_bitrev=h_bitrev,
        l_query=l_query,
        num_inputs=num_inputs)


def pk_bellman2ethsnarks(bellman_pk_file, pk_file, num_inputs=None):
    """File-level converter (parity: export.cpp:267-328)."""
    import pickle
    with open(bellman_pk_file) as fh:
        d = json.load(fh)
    pk = pk_from_bellman_dict(d, num_inputs)
    with open(pk_file, 'wb') as fh:
        pickle.dump(pk, fh)
    return True
