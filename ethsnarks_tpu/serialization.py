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
    """File-level converter (parity: export.cpp:267-328).  Output is the
    binary Montgomery-form key stream (write_pk_binary)."""
    with open(bellman_pk_file) as fh:
        d = json.load(fh)
    pk = pk_from_bellman_dict(d, num_inputs)
    write_pk_binary(pk, pk_file)
    return True


# ---------------- binary Montgomery-form key I/O ----------------
#
# Role of the reference's BINARY_OUTPUT + MONTGOMERY_OUTPUT key streams
# (/root/reference/src/utils.hpp:166-185 writeToFile/loadFromFile;
# r1cs_gg_ppzksnark_zok.tcc:108-143 operator<</>>; CMakeLists.txt:115-127):
# field elements are stored as their Montgomery residue x*R mod p
# (R = 2^256, libff's word layout) in 8 little-endian uint32 words, points
# as affine coordinate blocks with a separate infinity bitmap - a flat
# numpy dump that loads 2^20-scale keys in milliseconds, vs pickling a
# python object graph.

_PK_MAGIC = b"ETSNARKS-TPU-PK\x01"
_MONT_R = 1 << 256


def _mont_words_g1(points):
    """[(Fq, Fq) | None] -> ((n, 16) uint32 Montgomery words, (n,) uint8
    infinity flags)."""
    from .bn254 import FIELD_MODULUS
    import numpy as np
    n = len(points)
    out = np.zeros((n, 16), dtype=np.uint32)
    inf = np.zeros(n, dtype=np.uint8)
    for j, p in enumerate(points):
        if p is None:
            inf[j] = 1
            continue
        for k, c in enumerate((p[0].n, p[1].n)):
            m = (int(c) * _MONT_R) % FIELD_MODULUS
            for w in range(8):
                out[j, 8 * k + w] = (m >> (32 * w)) & 0xFFFFFFFF
    return out, inf


def _mont_words_g2(points):
    from .bn254 import FIELD_MODULUS
    import numpy as np
    n = len(points)
    out = np.zeros((n, 32), dtype=np.uint32)
    inf = np.zeros(n, dtype=np.uint8)
    for j, p in enumerate(points):
        if p is None:
            inf[j] = 1
            continue
        coords = (p[0].coeffs[0], p[0].coeffs[1],
                  p[1].coeffs[0], p[1].coeffs[1])
        for k, c in enumerate(coords):
            m = (int(c) * _MONT_R) % FIELD_MODULUS
            for w in range(8):
                out[j, 8 * k + w] = (m >> (32 * w)) & 0xFFFFFFFF
    return out, inf


def _unmont_ints(words):
    """(n, k*8) uint32 Montgomery words -> (n, k) python-int array."""
    from .bn254 import FIELD_MODULUS
    import numpy as np
    rinv = pow(_MONT_R, -1, FIELD_MODULUS)
    n, tot = words.shape
    k = tot // 8
    vals = np.zeros((n, k), dtype=object)
    acc = words.astype(object)
    for c in range(k):
        # fold the 8 little-endian words, then undo the Montgomery factor
        cur = np.zeros(n, dtype=object)
        for w in range(7, -1, -1):
            cur = (cur << 32) | acc[:, 8 * c + w]
        vals[:, c] = (cur * rinv) % FIELD_MODULUS
    return vals


def _g1_from_ints(vals, inf):
    from .bn254 import Fq
    return [None if inf[j] else (Fq(int(vals[j, 0])), Fq(int(vals[j, 1])))
            for j in range(vals.shape[0])]


def _g2_from_ints(vals, inf):
    from .bn254 import Fq2
    return [None if inf[j] else
            (Fq2([int(vals[j, 0]), int(vals[j, 1])]),
             Fq2([int(vals[j, 2]), int(vals[j, 3])]))
            for j in range(vals.shape[0])]


def write_pk_binary(pk, path):
    """nozk ProvingKey -> binary Montgomery-form stream."""
    import numpy as np
    a_idx = np.array([i for i, _ in pk.a_query], dtype=np.uint32)
    b_idx = np.array([i for i, _ in pk.b_query], dtype=np.uint32)
    a_w, a_inf = _mont_words_g1([p for _, p in pk.a_query])
    b_w, b_inf = _mont_words_g2([p for _, p in pk.b_query])
    h_w, h_inf = _mont_words_g1(pk.h_query_bitrev)
    l_w, l_inf = _mont_words_g1(pk.l_query)
    hdr_w, hdr_inf = _mont_words_g1([pk.alpha_g1])
    bet_w, bet_inf = _mont_words_g2([pk.beta_g2, pk.delta_g2])
    header = json.dumps({
        "v": 1, "num_inputs": pk.num_inputs,
        "n_a": len(a_idx), "n_b": len(b_idx),
        "n_h": len(pk.h_query_bitrev), "n_l": len(pk.l_query),
    }).encode("ascii")
    with open(path, "wb") as fh:
        fh.write(_PK_MAGIC)
        fh.write(len(header).to_bytes(4, "little"))
        fh.write(header)
        for arr in (hdr_w, bet_w, a_idx, a_w, a_inf, b_idx, b_w, b_inf,
                    h_w, h_inf, l_w, l_inf):
            fh.write(np.ascontiguousarray(arr).tobytes())
    return True


def read_pk_binary(path):
    """Binary Montgomery-form stream -> nozk ProvingKey."""
    import numpy as np
    from .groth16 import ProvingKey
    with open(path, "rb") as fh:
        magic = fh.read(len(_PK_MAGIC))
        if magic != _PK_MAGIC:
            raise ValueError("not a binary ethsnarks-tpu proving key")
        hlen = int.from_bytes(fh.read(4), "little")
        hdr = json.loads(fh.read(hlen).decode("ascii"))
        buf = fh.read()
    n_a, n_b = hdr["n_a"], hdr["n_b"]
    n_h, n_l = hdr["n_h"], hdr["n_l"]
    off = 0

    def take(dtype, shape):
        nonlocal off
        arr = np.frombuffer(buf, dtype=dtype, offset=off,
                            count=int(np.prod(shape))).reshape(shape)
        off += arr.nbytes
        return arr

    hdr_w = take(np.uint32, (1, 16))
    bet_w = take(np.uint32, (2, 32))
    a_idx = take(np.uint32, (n_a,))
    a_w = take(np.uint32, (n_a, 16))
    a_inf = take(np.uint8, (n_a,))
    b_idx = take(np.uint32, (n_b,))
    b_w = take(np.uint32, (n_b, 32))
    b_inf = take(np.uint8, (n_b,))
    h_w = take(np.uint32, (n_h, 16))
    h_inf = take(np.uint8, (n_h,))
    l_w = take(np.uint32, (n_l, 16))
    l_inf = take(np.uint8, (n_l,))

    alpha = _g1_from_ints(_unmont_ints(hdr_w), [0])[0]
    beta, delta = _g2_from_ints(_unmont_ints(bet_w), [0, 0])
    a_pts = _g1_from_ints(_unmont_ints(a_w), a_inf)
    b_pts = _g2_from_ints(_unmont_ints(b_w), b_inf)
    return ProvingKey(
        alpha_g1=alpha, beta_g2=beta, delta_g2=delta,
        a_query=list(zip((int(i) for i in a_idx), a_pts)),
        b_query=list(zip((int(i) for i in b_idx), b_pts)),
        h_query_bitrev=_g1_from_ints(_unmont_ints(h_w), h_inf),
        l_query=_g1_from_ints(_unmont_ints(l_w), l_inf),
        num_inputs=hdr["num_inputs"])
