// Polynomial extension fields over Fq: Fq2 = Fq[u]/(u^2+1) and
// Fq12 = Fq[w]/(w^12 - 18 w^6 + 82), same parametrization as the Python
// host tower (ethsnarks_tpu/bn254.py) and py_ecc.
#pragma once

#include <array>
#include <vector>

#include "fq.hpp"

namespace ethsnarks {

template <int D>
struct FqP {
    std::array<Fq, D> c;

    FqP() {}

    static FqP zero() { return FqP(); }

    static FqP one() {
        FqP r;
        r.c[0] = Fq::one();
        return r;
    }

    bool operator==(const FqP &o) const {
        for (int i = 0; i < D; ++i)
            if (!(c[i] == o.c[i])) return false;
        return true;
    }
    bool operator!=(const FqP &o) const { return !(*this == o); }

    FqP operator+(const FqP &o) const {
        FqP r;
        for (int i = 0; i < D; ++i) r.c[i] = c[i] + o.c[i];
        return r;
    }

    FqP operator-(const FqP &o) const {
        FqP r;
        for (int i = 0; i < D; ++i) r.c[i] = c[i] - o.c[i];
        return r;
    }

    FqP operator-() const { return zero() - *this; }

    // modulus_coeffs: x^D = -sum(mc[i] * x^i); specialized per degree below.
    static void modulus_coeffs(Fq mc[D]);

    FqP operator*(const FqP &o) const {
        Fq prod[2 * D - 1];
        for (int i = 0; i < 2 * D - 1; ++i) prod[i] = Fq::zero();
        for (int i = 0; i < D; ++i) {
            if (c[i].is_zero()) continue;
            for (int j = 0; j < D; ++j) {
                prod[i + j] = prod[i + j] + c[i] * o.c[j];
            }
        }
        Fq mc[D];
        modulus_coeffs(mc);
        for (int k = 2 * D - 2; k >= D; --k) {
            if (prod[k].is_zero()) continue;
            for (int i = 0; i < D; ++i) {
                prod[k - D + i] = prod[k - D + i] - prod[k] * mc[i];
            }
            prod[k] = Fq::zero();
        }
        FqP r;
        for (int i = 0; i < D; ++i) r.c[i] = prod[i];
        return r;
    }

    bool is_zero() const {
        for (int i = 0; i < D; ++i)
            if (!c[i].is_zero()) return false;
        return true;
    }

    // Extended Euclid over Fq[x] against the (monic) modulus polynomial.
    FqP inverse() const {
        const int N = D + 1;
        std::vector<Fq> r0(N), r1(N), s0(N), s1(N);
        Fq mc[D];
        modulus_coeffs(mc);
        for (int i = 0; i < D; ++i) r0[i] = mc[i];
        r0[D] = Fq::one();
        for (int i = 0; i < D; ++i) r1[i] = c[i];
        s1[0] = Fq::one();

        auto deg = [&](const std::vector<Fq> &p) {
            for (int i = (int)p.size() - 1; i >= 0; --i)
                if (!p[i].is_zero()) return i;
            return -1;
        };

        while (deg(r1) > 0) {
            int d0 = deg(r0), d1 = deg(r1);
            std::vector<Fq> q(N), rem = r0;
            Fq inv_lead = r1[d1].inverse();
            for (int i = d0 - d1; i >= 0; --i) {
                Fq f = rem[i + d1] * inv_lead;
                q[i] = f;
                if (!f.is_zero()) {
                    for (int j = 0; j <= d1; ++j) {
                        rem[i + j] = rem[i + j] - f * r1[j];
                    }
                }
            }
            // (r0, r1) = (r1, rem); (s0, s1) = (s1, s0 - q*s1)
            std::vector<Fq> s_new(2 * N);
            for (int i = 0; i < N; ++i) s_new[i] = s0[i];
            for (int i = 0; i < N; ++i) {
                if (q[i].is_zero()) continue;
                for (int j = 0; j + i < 2 * N && j < N; ++j) {
                    s_new[i + j] = s_new[i + j] - q[i] * s1[j];
                }
            }
            s_new.resize(N);
            r0 = r1;
            r1 = rem;
            s0 = s1;
            s1 = s_new;
        }
        if (deg(r1) != 0) throw std::runtime_error("non-invertible");
        Fq inv_c = r1[0].inverse();
        FqP out;
        for (int i = 0; i < D; ++i) out.c[i] = s1[i] * inv_c;
        return out;
    }

    FqP pow_limbs(const uint64_t *e, int n_limbs) const {
        FqP result = one();
        FqP base = *this;
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
};

typedef FqP<2> Fq2;
typedef FqP<12> Fq12;

template <>
inline void FqP<2>::modulus_coeffs(Fq mc[2]) {
    // u^2 = -1
    mc[0] = Fq::one();
    mc[1] = Fq::zero();
}

template <>
inline void FqP<12>::modulus_coeffs(Fq mc[12]) {
    // w^12 = 18 w^6 - 82
    for (int i = 0; i < 12; ++i) mc[i] = Fq::zero();
    uint64_t w82[4] = {82, 0, 0, 0};
    mc[0] = Fq::from_words(w82);
    uint64_t w18[4] = {18, 0, 0, 0};
    mc[6] = Fq::zero() - Fq::from_words(w18);
}

}  // namespace ethsnarks
