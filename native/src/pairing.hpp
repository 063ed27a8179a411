// Optimal-ate pairing on BN254 (native verifier engine).
//
// Mirrors ethsnarks_tpu/pairing.py: lift G2 via the u = w^6 - 9 embedding,
// affine Miller loop with line functions over Fq12, shared final
// exponentiation with a hardcoded (q^12-1)/r exponent.
#pragma once

#include <vector>

#include "fqp.hpp"

namespace ethsnarks {

// Affine points; infinity encoded by the `inf` flag.
template <typename F>
struct Point {
    F x, y;
    bool inf;
    Point() : inf(true) {}
    Point(const F &x_, const F &y_) : x(x_), y(y_), inf(false) {}
};

typedef Point<Fq> G1;
typedef Point<Fq2> G2;
typedef Point<Fq12> G12;

template <typename F>
Point<F> pt_double(const Point<F> &p) {
    if (p.inf) return p;
    F three = F::one() + F::one() + F::one();
    F two = F::one() + F::one();
    F m = (three * p.x * p.x) * (two * p.y).inverse();
    F nx = m * m - p.x - p.x;
    F ny = -(m * nx) + m * p.x - p.y;
    return Point<F>(nx, ny);
}

template <typename F>
Point<F> pt_add(const Point<F> &a, const Point<F> &b) {
    if (a.inf) return b;
    if (b.inf) return a;
    if (a.x == b.x) {
        if (a.y == b.y) return pt_double(a);
        return Point<F>();
    }
    F m = (b.y - a.y) * (b.x - a.x).inverse();
    F nx = m * m - a.x - b.x;
    F ny = -(m * nx) + m * a.x - a.y;
    return Point<F>(nx, ny);
}

template <typename F>
Point<F> pt_neg(const Point<F> &p) {
    if (p.inf) return p;
    return Point<F>(p.x, -p.y);
}

template <typename F>
Point<F> pt_mul(const Point<F> &p, const uint64_t *e, int n_limbs) {
    Point<F> result;
    Point<F> base = p;
    for (int i = 0; i < n_limbs; ++i) {
        uint64_t w = e[i];
        for (int b = 0; b < 64; ++b) {
            if (w & 1) result = pt_add(result, base);
            base = pt_double(base);
            w >>= 1;
        }
    }
    return result;
}

// Curve b constants.
inline Fq g1_b() {
    uint64_t w3[4] = {3, 0, 0, 0};
    return Fq::from_words(w3);
}

inline Fq2 g2_b() {
    // 3 / (9 + u)
    Fq2 nine_u;
    uint64_t w9[4] = {9, 0, 0, 0};
    nine_u.c[0] = Fq::from_words(w9);
    nine_u.c[1] = Fq::one();
    Fq2 three;
    three.c[0] = g1_b();
    return three * nine_u.inverse();
}

inline bool g1_on_curve(const G1 &p) {
    if (p.inf) return true;
    return p.y * p.y - p.x * p.x * p.x == g1_b();
}

inline bool g2_on_curve(const G2 &p) {
    if (p.inf) return true;
    Fq2 lhs = p.y * p.y - p.x * p.x * p.x;
    return lhs == g2_b();
}

// Lift a G2 point to E(Fq12): undo the 9+u shift (u = w^6 - 9), multiply
// x by w^2 and y by w^3.
inline G12 twist(const G2 &p) {
    if (p.inf) return G12();
    uint64_t w9[4] = {9, 0, 0, 0};
    Fq nine = Fq::from_words(w9);
    Fq xc0 = p.x.c[0] - nine * p.x.c[1];
    Fq yc0 = p.y.c[0] - nine * p.y.c[1];
    Fq12 nx, ny;
    nx.c[0] = xc0;
    nx.c[6] = p.x.c[1];
    ny.c[0] = yc0;
    ny.c[6] = p.y.c[1];
    Fq12 w;
    w.c[1] = Fq::one();
    Fq12 w2 = w * w;
    Fq12 w3 = w2 * w;
    return G12(nx * w2, ny * w3);
}

inline G12 cast_g1(const G1 &p) {
    if (p.inf) return G12();
    Fq12 x, y;
    x.c[0] = p.x;
    y.c[0] = p.y;
    return G12(x, y);
}

inline Fq12 linefunc(const G12 &p1, const G12 &p2, const G12 &t) {
    if (!(p1.x == p2.x)) {
        Fq12 m = (p2.y - p1.y) * (p2.x - p1.x).inverse();
        return m * (t.x - p1.x) - (t.y - p1.y);
    }
    if (p1.y == p2.y) {
        Fq12 three = Fq12::one() + Fq12::one() + Fq12::one();
        Fq12 two = Fq12::one() + Fq12::one();
        Fq12 m = (three * p1.x * p1.x) * (two * p1.y).inverse();
        return m * (t.x - p1.x) - (t.y - p1.y);
    }
    return t.x - p1.x;
}

// ate loop count 6x+2 = 29793968203157093288 - a 65-bit value: bit 64 is
// set, low 64 bits are ate_lo.
inline Fq12 miller_loop(const G12 &q, const G12 &p) {
    if (q.inf || p.inf) return Fq12::one();
    const uint64_t ate_lo = 11347224129447541672ULL;  // ate mod 2^64
    auto ate_bit = [&](int i) -> int {
        if (i == 64) return 1;
        return (int)((ate_lo >> i) & 1);
    };
    const int top = 64;
    G12 r = q;
    Fq12 f = Fq12::one();
    for (int i = top - 1; i >= 0; --i) {
        f = f * f * linefunc(r, r, p);
        r = pt_double(r);
        if (ate_bit(i)) {
            f = f * linefunc(r, q, p);
            r = pt_add(r, q);
        }
    }
    // Frobenius corrections: q1 = q^p, nq2 = -(q1^p)
    G12 q1(q.x.pow_limbs(Fq::Q, 4), q.y.pow_limbs(Fq::Q, 4));
    G12 nq2(q1.x.pow_limbs(Fq::Q, 4), -(q1.y.pow_limbs(Fq::Q, 4)));
    f = f * linefunc(r, q1, p);
    r = pt_add(r, q1);
    f = f * linefunc(r, nq2, p);
    return f;
}

// (q^12 - 1) / r as little-endian 64-bit limbs (hardcoded public constant).
extern const uint64_t FINAL_EXP_LIMBS[44];
extern const int FINAL_EXP_NLIMBS;

inline Fq12 final_exponentiate(const Fq12 &f) {
    return f.pow_limbs(FINAL_EXP_LIMBS, FINAL_EXP_NLIMBS);
}

inline bool pairing_product_is_one(
    const std::vector<std::pair<G1, G2>> &pairs) {
    Fq12 acc = Fq12::one();
    for (const auto &pq : pairs) {
        if (!g1_on_curve(pq.first) || !g2_on_curve(pq.second)) return false;
        acc = acc * miller_loop(twist(pq.second), cast_g1(pq.first));
    }
    return final_exponentiate(acc) == Fq12::one();
}

// ---- precomputed-G2 Miller loop (processed verification key) ----
//
// Role of libff's G2_precomp in the reference's verifier_process_vk
// (r1cs_gg_ppzksnark_zok.tcc:552-567): precompute each Miller step's line
// coefficients for a FIXED G2 point once, so per-proof work is only line
// evaluations (no Fq12 inversions).

struct LineStep {
    bool dbl;       // f = f^2 * line  (else f = f * line)
    bool vertical;  // line is (t.x - x1), no slope
    Fq12 m, x, y;
};

struct G2Precomp {
    std::vector<LineStep> steps;
};

inline LineStep line_coeffs(bool dbl, const G12 &p1, const G12 &p2) {
    LineStep s;
    s.dbl = dbl;
    if (!(p1.x == p2.x)) {
        s.vertical = false;
        s.m = (p2.y - p1.y) * (p2.x - p1.x).inverse();
    } else if (p1.y == p2.y) {
        s.vertical = false;
        Fq12 three = Fq12::one() + Fq12::one() + Fq12::one();
        Fq12 two = Fq12::one() + Fq12::one();
        s.m = (three * p1.x * p1.x) * (two * p1.y).inverse();
    } else {
        s.vertical = true;
    }
    s.x = p1.x;
    s.y = p1.y;
    return s;
}

inline G2Precomp precompute_g2(const G2 &q) {
    G2Precomp pre;
    if (q.inf) return pre;
    const uint64_t ate_lo = 11347224129447541672ULL;
    auto ate_bit = [&](int i) -> int {
        if (i == 64) return 1;
        return (int)((ate_lo >> i) & 1);
    };
    G12 qt = twist(q);
    G12 r = qt;
    for (int i = 63; i >= 0; --i) {
        pre.steps.push_back(line_coeffs(true, r, r));
        r = pt_double(r);
        if (ate_bit(i)) {
            pre.steps.push_back(line_coeffs(false, r, qt));
            r = pt_add(r, qt);
        }
    }
    G12 q1(qt.x.pow_limbs(Fq::Q, 4), qt.y.pow_limbs(Fq::Q, 4));
    G12 nq2(q1.x.pow_limbs(Fq::Q, 4), -(q1.y.pow_limbs(Fq::Q, 4)));
    pre.steps.push_back(line_coeffs(false, r, q1));
    r = pt_add(r, q1);
    pre.steps.push_back(line_coeffs(false, r, nq2));
    return pre;
}

inline Fq12 miller_loop_precomp(const G2Precomp &pre, const G1 &p) {
    if (p.inf || pre.steps.empty()) return Fq12::one();
    G12 t = cast_g1(p);
    Fq12 f = Fq12::one();
    for (const auto &s : pre.steps) {
        Fq12 val = s.vertical ? (t.x - s.x)
                              : (s.m * (t.x - s.x) - (t.y - s.y));
        f = s.dbl ? (f * f * val) : (f * val);
    }
    return f;
}

}  // namespace ethsnarks
