"""Shamir secret-sharing polynomial evaluation + Lagrange interpolation.

Parity with ``/root/reference/ethsnarks/shamirspoly.py``.
"""

from .field import FQ


def shamirs_poly(x, a):
    """Horner-free polynomial evaluation: sum(a_i * x^i)."""
    assert isinstance(a, (list, tuple))
    assert len(a) >= 2
    assert isinstance(x, FQ)
    result = a[0]
    x_pow_i = x
    for a_i in a[1:]:
        assert isinstance(a_i, FQ)
        result = result + a_i * x_pow_i
        x_pow_i *= x
    return result


def lagrange(points, x):
    """Lagrange interpolation evaluated at x."""
    total = 0
    n = len(points)
    for i in range(n):
        xi, yi = points[i]
        assert isinstance(xi, FQ) and isinstance(yi, FQ)
        coeff = 1
        for j in range(n):
            if i == j:
                continue
            xj, _ = points[j]
            coeff = coeff * ((x - xj) / (xi - xj))
        total = total + yi * coeff
    return total


def inverse_lagrange(points, y):
    """Interpolate the x for a given y (swap roles of coordinates)."""
    x = 0
    for i, (x_i, y_i) in enumerate(points):
        for j, (_, y_j) in enumerate(points):
            if j != i:
                x_i = x_i * (y - y_j) / (y_i - y_j)
        x += x_i
    return x
