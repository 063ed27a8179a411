// BN254 base-field arithmetic: 4x64-bit limbs, Montgomery form (CIOS).
//
// Native analogue of the role libff/mcl play for the reference verifier
// (src/verify.cpp); performance is irrelevant here (verification is O(1)),
// correctness and zero dependencies are the goals.
#pragma once

#include <cstdint>
#include <cstring>
#include <string>
#include <stdexcept>

namespace ethsnarks {

typedef unsigned __int128 uint128_t;

struct Fq {
    // Montgomery representation: value * 2^256 mod q.
    uint64_t v[4];

    static constexpr uint64_t Q[4] = {
        0x3c208c16d87cfd47ULL, 0x97816a916871ca8dULL,
        0xb85045b68181585dULL, 0x30644e72e131a029ULL};
    // -q^-1 mod 2^64
    static constexpr uint64_t Q_INV = 0x87d20782e4866389ULL;
    // 2^256 mod q
    static constexpr uint64_t R1[4] = {
        0xd35d438dc58f0d9dULL, 0x0a78eb28f5c70b3dULL,
        0x666ea36f7879462cULL, 0x0e0a77c19a07df2fULL};
    // (2^256)^2 mod q
    static constexpr uint64_t R2[4] = {
        0xf32cfc5b538afa89ULL, 0xb5e71911d44501fbULL,
        0x47ab1eff0a417ff6ULL, 0x06d89f71cab8351fULL};

    Fq() { v[0] = v[1] = v[2] = v[3] = 0; }

    static Fq zero() { return Fq(); }

    static Fq one() {
        Fq r;
        std::memcpy(r.v, R1, sizeof(r.v));
        return r;
    }

    static bool geq(const uint64_t a[4], const uint64_t b[4]) {
        for (int i = 3; i >= 0; --i) {
            if (a[i] != b[i]) return a[i] > b[i];
        }
        return true;
    }

    static void sub_limbs(uint64_t out[4], const uint64_t a[4],
                          const uint64_t b[4]) {
        uint64_t borrow = 0;
        for (int i = 0; i < 4; ++i) {
            uint128_t d = (uint128_t)a[i] - b[i] - borrow;
            out[i] = (uint64_t)d;
            borrow = (d >> 64) ? 1 : 0;
        }
    }

    static void add_limbs(uint64_t out[4], const uint64_t a[4],
                          const uint64_t b[4], uint64_t &carry_out) {
        uint64_t carry = 0;
        for (int i = 0; i < 4; ++i) {
            uint128_t s = (uint128_t)a[i] + b[i] + carry;
            out[i] = (uint64_t)s;
            carry = (uint64_t)(s >> 64);
        }
        carry_out = carry;
    }

    Fq operator+(const Fq &o) const {
        Fq r;
        uint64_t carry;
        add_limbs(r.v, v, o.v, carry);
        if (carry || geq(r.v, Q)) {
            uint64_t t[4];
            sub_limbs(t, r.v, Q);
            std::memcpy(r.v, t, sizeof(t));
        }
        return r;
    }

    Fq operator-(const Fq &o) const {
        Fq r;
        if (geq(v, o.v)) {
            sub_limbs(r.v, v, o.v);
        } else {
            uint64_t t[4];
            uint64_t carry;
            add_limbs(t, v, Q, carry);
            // t may be 5 limbs; borrow-free subtract handles via carry
            uint64_t borrow = 0;
            for (int i = 0; i < 4; ++i) {
                uint128_t d = (uint128_t)t[i] - o.v[i] - borrow;
                r.v[i] = (uint64_t)d;
                borrow = (d >> 64) ? 1 : 0;
            }
            // carry covers the final borrow
        }
        return r;
    }

    Fq operator-() const { return Fq::zero() - *this; }

    // CIOS Montgomery multiplication.
    Fq operator*(const Fq &o) const {
        uint64_t t[6] = {0, 0, 0, 0, 0, 0};
        for (int i = 0; i < 4; ++i) {
            uint64_t carry = 0;
            for (int j = 0; j < 4; ++j) {
                uint128_t cur = (uint128_t)t[j] + (uint128_t)v[i] * o.v[j] + carry;
                t[j] = (uint64_t)cur;
                carry = (uint64_t)(cur >> 64);
            }
            uint128_t cur = (uint128_t)t[4] + carry;
            t[4] = (uint64_t)cur;
            t[5] = (uint64_t)(cur >> 64);

            uint64_t m = t[0] * Q_INV;
            carry = 0;
            {
                uint128_t c2 = (uint128_t)t[0] + (uint128_t)m * Q[0];
                carry = (uint64_t)(c2 >> 64);
            }
            for (int j = 1; j < 4; ++j) {
                uint128_t c2 = (uint128_t)t[j] + (uint128_t)m * Q[j] + carry;
                t[j - 1] = (uint64_t)c2;
                carry = (uint64_t)(c2 >> 64);
            }
            uint128_t c3 = (uint128_t)t[4] + carry;
            t[3] = (uint64_t)c3;
            t[4] = t[5] + (uint64_t)(c3 >> 64);
        }
        Fq r;
        std::memcpy(r.v, t, sizeof(r.v));
        if (t[4] || geq(r.v, Q)) {
            uint64_t u[4];
            sub_limbs(u, r.v, Q);
            std::memcpy(r.v, u, sizeof(u));
        }
        return r;
    }

    bool operator==(const Fq &o) const {
        return std::memcmp(v, o.v, sizeof(v)) == 0;
    }
    bool operator!=(const Fq &o) const { return !(*this == o); }

    bool is_zero() const {
        return (v[0] | v[1] | v[2] | v[3]) == 0;
    }

    Fq pow_limbs(const uint64_t *e, int n_limbs) const {
        Fq result = Fq::one();
        Fq base = *this;
        for (int i = 0; i < n_limbs; ++i) {
            uint64_t word = e[i];
            for (int b = 0; b < 64; ++b) {
                if (word & 1) result = result * base;
                base = base * base;
                word >>= 1;
            }
        }
        return result;
    }

    Fq inverse() const {
        // Fermat: q - 2
        uint64_t e[4];
        std::memcpy(e, Q, sizeof(e));
        // subtract 2
        uint64_t two[4] = {2, 0, 0, 0};
        uint64_t out[4];
        sub_limbs(out, e, two);
        if (is_zero()) throw std::runtime_error("inverse of zero");
        return pow_limbs(out, 4);
    }

    // Plain (non-Montgomery) import/export.
    static Fq from_words(const uint64_t w[4]) {
        Fq plain;
        std::memcpy(plain.v, w, sizeof(plain.v));
        Fq r2;
        std::memcpy(r2.v, R2, sizeof(r2.v));
        return plain * r2;  // to Montgomery
    }

    void to_words(uint64_t w[4]) const {
        // multiply by 1 (plain) = Montgomery reduce
        Fq one_plain;
        one_plain.v[0] = 1;
        Fq plain = (*this) * one_plain;
        std::memcpy(w, plain.v, sizeof(plain.v));
    }
};

}  // namespace ethsnarks
