// Native stack self-test: field roundtrip, curve checks, pairing identity.
#include <cstdio>
#include <cstring>
#include <vector>

#include "../src/pairing.hpp"

using namespace ethsnarks;

static Fq fq_u64(uint64_t x) {
    uint64_t w[4] = {x, 0, 0, 0};
    return Fq::from_words(w);
}

int main() {
    // field roundtrip
    {
        uint64_t w[4] = {123456789ULL, 42, 0, 0};
        Fq a = Fq::from_words(w);
        uint64_t out[4];
        a.to_words(out);
        if (std::memcmp(w, out, sizeof(w)) != 0) {
            std::printf("FAIL fq roundtrip\n");
            return 1;
        }
        Fq b = fq_u64(7);
        Fq c = a * b;
        Fq d = c * b.inverse();
        if (!(d == a)) {
            std::printf("FAIL fq mul/inv\n");
            return 1;
        }
    }
    // G1 generator on curve
    G1 g1(fq_u64(1), fq_u64(2));
    if (!g1_on_curve(g1)) {
        std::printf("FAIL g1 on curve\n");
        return 1;
    }
    // G2 generator on curve
    auto parse = [](const char *dec) {
        uint64_t w[4] = {0, 0, 0, 0};
        for (const char *p = dec; *p; ++p) {
            uint64_t carry = (uint64_t)(*p - '0');
            for (int j = 0; j < 4; ++j) {
                uint128_t cur = (uint128_t)w[j] * 10 + carry;
                w[j] = (uint64_t)cur;
                carry = (uint64_t)(cur >> 64);
            }
        }
        return Fq::from_words(w);
    };
    Fq2 x2, y2;
    x2.c[0] = parse("10857046999023057135944570762232829481370756359578518086990519993285655852781");
    x2.c[1] = parse("11559732032986387107991004021392285783925812861821192530917403151452391805634");
    y2.c[0] = parse("8495653923123431417604973247489272438418190587263600148770280649306958101930");
    y2.c[1] = parse("4082367875863433681332203403145435568316851327593401208105741076214120093531");
    G2 g2(x2, y2);
    if (!g2_on_curve(g2)) {
        std::printf("FAIL g2 on curve\n");
        return 1;
    }
    // Fq12 inverse sanity
    {
        Fq12 t;
        t.c[0] = fq_u64(3);
        t.c[5] = fq_u64(7);
        t.c[11] = fq_u64(11);
        Fq12 ti = t.inverse();
        if (!(t * ti == Fq12::one())) {
            std::printf("FAIL fq12 inverse\n");
            return 1;
        }
    }
    // pairing identity: e(P,Q) * e(-P,Q) == 1
    std::vector<std::pair<G1, G2>> pairs;
    pairs.emplace_back(g1, g2);
    pairs.emplace_back(pt_neg(g1), g2);
    if (!pairing_product_is_one(pairs)) {
        std::printf("FAIL pairing identity\n");
        return 1;
    }
    // non-identity product must fail
    std::vector<std::pair<G1, G2>> pairs2;
    pairs2.emplace_back(g1, g2);
    pairs2.emplace_back(g1, g2);
    if (pairing_product_is_one(pairs2)) {
        std::printf("FAIL pairing non-identity accepted\n");
        return 1;
    }
    std::printf("OK\n");
    return 0;
}
