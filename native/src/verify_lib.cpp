// Groth16 verification library: vk/proof JSON -> accept/reject.
//
// Native analogue of src/verify.cpp + src/verify_dll.cpp: exports the C ABI
//   bool ethsnarks_verify(const char *vk_json, const char *proof_json)
// consumed via ctypes by ethsnarks_tpu.verifier.NativeVerifier.  Formats are
// identical to the Python/EVM conventions (G2 coefficients c1-first).

#include <array>
#include <cstring>
#include <string>
#include <vector>

#include "json.hpp"
#include "pairing.hpp"

namespace ethsnarks {

// ---- hex / decimal big-int parsing into 4x64 words (mod q fits) ----

static bool parse_bigint_words(const std::string &text, uint64_t out[4]) {
    std::string s = text;
    out[0] = out[1] = out[2] = out[3] = 0;
    bool hex = false;
    size_t i = 0;
    if (s.size() >= 2 && s[0] == '0' && (s[1] == 'x' || s[1] == 'X')) {
        hex = true;
        i = 2;
    }
    if (hex) {
        for (; i < s.size(); ++i) {
            char c = s[i];
            int d;
            if (c >= '0' && c <= '9') d = c - '0';
            else if (c >= 'a' && c <= 'f') d = c - 'a' + 10;
            else if (c >= 'A' && c <= 'F') d = c - 'A' + 10;
            else return false;
            // out = out*16 + d
            uint64_t carry = (uint64_t)d;
            for (int j = 0; j < 4; ++j) {
                uint128_t cur = ((uint128_t)out[j] << 4) | carry;
                out[j] = (uint64_t)cur;
                carry = (uint64_t)(cur >> 64);
            }
            if (carry) return false;  // > 256 bits
        }
    } else {
        for (; i < s.size(); ++i) {
            char c = s[i];
            if (c < '0' || c > '9') return false;
            uint64_t carry = (uint64_t)(c - '0');
            for (int j = 0; j < 4; ++j) {
                uint128_t cur = (uint128_t)out[j] * 10 + carry;
                out[j] = (uint64_t)cur;
                carry = (uint64_t)(cur >> 64);
            }
            if (carry) return false;
        }
    }
    return true;
}

static bool parse_fq(const json::ValuePtr &v, Fq &out) {
    if (!v || v->type != json::Value::STRING) return false;
    uint64_t w[4];
    if (!parse_bigint_words(v->str, w)) return false;
    // reduce mod q if necessary (values should already be < q)
    while (Fq::geq(w, Fq::Q)) {
        uint64_t t[4];
        Fq::sub_limbs(t, w, Fq::Q);
        std::memcpy(w, t, sizeof(t));
    }
    out = Fq::from_words(w);
    return true;
}

static bool parse_g1(const json::ValuePtr &v, G1 &out) {
    if (!v || v->type != json::Value::ARRAY || v->arr.size() < 2) return false;
    Fq x, y;
    if (!parse_fq(v->arr[0], x) || !parse_fq(v->arr[1], y)) return false;
    out = G1(x, y);
    return g1_on_curve(out);
}

static bool parse_g2(const json::ValuePtr &v, G2 &out) {
    // [[x.c1, x.c0], [y.c1, y.c0]]
    if (!v || v->type != json::Value::ARRAY || v->arr.size() != 2) return false;
    const auto &xs = v->arr[0];
    const auto &ys = v->arr[1];
    if (xs->type != json::Value::ARRAY || xs->arr.size() != 2) return false;
    if (ys->type != json::Value::ARRAY || ys->arr.size() != 2) return false;
    Fq2 x, y;
    if (!parse_fq(xs->arr[1], x.c[0]) || !parse_fq(xs->arr[0], x.c[1]))
        return false;
    if (!parse_fq(ys->arr[1], y.c[0]) || !parse_fq(ys->arr[0], y.c[1]))
        return false;
    out = G2(x, y);
    return g2_on_curve(out);
}

// scalar as 4x64 words (for input multiplication)
static bool parse_scalar_words(const json::ValuePtr &v, uint64_t out[4]) {
    if (!v || v->type != json::Value::STRING) return false;
    return parse_bigint_words(v->str, out);
}

struct ParsedVK {
    G1 alpha;
    G2 beta, gamma, delta;
    std::vector<G1> gamma_abc;
};

struct ParsedProof {
    G1 a, c;
    G2 b;
    std::vector<std::array<uint64_t, 4>> inputs;
};

static bool parse_vk(const char *vk_json, ParsedVK &out) {
    json::Parser vkp(vk_json ? vk_json : "");
    auto vk = vkp.parse();
    if (vk->type != json::Value::OBJECT) return false;
    if (!parse_g1(vk->obj["alpha"], out.alpha)) return false;
    if (!parse_g2(vk->obj["beta"], out.beta)) return false;
    if (!parse_g2(vk->obj["gamma"], out.gamma)) return false;
    if (!parse_g2(vk->obj["delta"], out.delta)) return false;
    auto gabc = vk->obj["gammaABC"];
    if (!gabc || gabc->type != json::Value::ARRAY || gabc->arr.empty())
        return false;
    for (auto &pt : gabc->arr) {
        G1 g;
        if (!parse_g1(pt, g)) return false;
        out.gamma_abc.push_back(g);
    }
    return true;
}

static bool parse_proof(const char *proof_json, ParsedProof &out) {
    json::Parser prp(proof_json ? proof_json : "");
    auto proof = prp.parse();
    if (proof->type != json::Value::OBJECT) return false;
    if (!parse_g1(proof->obj["A"], out.a)) return false;
    if (!parse_g2(proof->obj["B"], out.b)) return false;
    if (!parse_g1(proof->obj["C"], out.c)) return false;
    auto inputs = proof->obj["input"];
    if (!inputs || inputs->type != json::Value::ARRAY) return false;
    for (auto &iv : inputs->arr) {
        std::array<uint64_t, 4> w;
        if (!parse_scalar_words(iv, w.data())) return false;
        out.inputs.push_back(w);
    }
    return true;
}

static G1 accumulate_vk_x(const ParsedVK &vk, const ParsedProof &proof) {
    G1 vk_x = vk.gamma_abc[0];
    for (size_t i = 0; i < proof.inputs.size(); ++i)
        vk_x = pt_add(vk_x,
                      pt_mul(vk.gamma_abc[i + 1], proof.inputs[i].data(), 4));
    return vk_x;
}

bool verify_json(const char *vk_json, const char *proof_json) {
    try {
        ParsedVK vk;
        ParsedProof proof;
        if (!parse_vk(vk_json, vk) || !parse_proof(proof_json, proof))
            return false;
        // strong input consistency
        if (proof.inputs.size() + 1 != vk.gamma_abc.size()) return false;
        G1 vk_x = accumulate_vk_x(vk, proof);
        std::vector<std::pair<G1, G2>> pairs;
        pairs.emplace_back(proof.a, proof.b);
        pairs.emplace_back(pt_neg(vk_x), vk.gamma);
        pairs.emplace_back(pt_neg(proof.c), vk.delta);
        pairs.emplace_back(pt_neg(vk.alpha), vk.beta);
        return pairing_product_is_one(pairs);
    } catch (...) {
        return false;
    }
}

// ---- processed verification key (parity: verifier_process_vk +
// online_verifier_weak_IC, reference tcc:552-624) ----

struct ProcessedVK {
    Fq12 alpha_beta;          // e(alpha, beta), final-exponentiated
    G2Precomp gamma_pre, delta_pre;
    std::vector<G1> gamma_abc;
};

ProcessedVK *process_vk_json(const char *vk_json) {
    try {
        ParsedVK vk;
        if (!parse_vk(vk_json, vk)) return nullptr;
        auto *pvk = new ProcessedVK();
        pvk->alpha_beta = final_exponentiate(
            miller_loop(twist(vk.beta), cast_g1(vk.alpha)));
        pvk->gamma_pre = precompute_g2(vk.gamma);
        pvk->delta_pre = precompute_g2(vk.delta);
        pvk->gamma_abc = vk.gamma_abc;
        return pvk;
    } catch (...) {
        return nullptr;
    }
}

bool verify_prepared_json(const ProcessedVK *pvk, const char *proof_json,
                          bool strong_ic) {
    try {
        if (!pvk) return false;
        ParsedProof proof;
        if (!parse_proof(proof_json, proof)) return false;
        if (strong_ic) {
            if (proof.inputs.size() + 1 != pvk->gamma_abc.size())
                return false;
        } else if (proof.inputs.size() + 1 > pvk->gamma_abc.size()) {
            return false;
        }
        G1 vk_x = pvk->gamma_abc[0];
        for (size_t i = 0; i < proof.inputs.size(); ++i)
            vk_x = pt_add(vk_x, pt_mul(pvk->gamma_abc[i + 1],
                                       proof.inputs[i].data(), 4));
        // e(A, B) * e(-vk_x, gamma) * e(-C, delta) == e(alpha, beta)
        Fq12 acc = miller_loop(twist(proof.b), cast_g1(proof.a));
        acc = acc * miller_loop_precomp(pvk->gamma_pre, pt_neg(vk_x));
        acc = acc * miller_loop_precomp(pvk->delta_pre, pt_neg(proof.c));
        return final_exponentiate(acc) == pvk->alpha_beta;
    } catch (...) {
        return false;
    }
}

}  // namespace ethsnarks

extern "C" bool ethsnarks_verify(const char *vk_json, const char *proof_json) {
    return ethsnarks::verify_json(vk_json, proof_json);
}

// Processed-VK C ABI: process once, verify many (the reference's
// online/offline split).  Handle is opaque; release with
// ethsnarks_release_vk.
extern "C" void *ethsnarks_process_vk(const char *vk_json) {
    return ethsnarks::process_vk_json(vk_json);
}

extern "C" bool ethsnarks_verify_prepared(void *handle,
                                          const char *proof_json) {
    return ethsnarks::verify_prepared_json(
        static_cast<ethsnarks::ProcessedVK *>(handle), proof_json, false);
}

extern "C" bool ethsnarks_verify_prepared_strong(void *handle,
                                                 const char *proof_json) {
    return ethsnarks::verify_prepared_json(
        static_cast<ethsnarks::ProcessedVK *>(handle), proof_json, true);
}

extern "C" void ethsnarks_release_vk(void *handle) {
    delete static_cast<ethsnarks::ProcessedVK *>(handle);
}
