"""Padé / polynomial algebra on Taylor coefficient sequences.

Reference semantics: pade/pade!/polyval/estimate_pol/conv_radius
(/root/reference/src/NLEVP/LinOpFam.jl:622-766) and the standalone
polynomial module (/root/reference/src/NLEVP/polys_pade.jl)."""
from __future__ import annotations

import numpy as np

from ..utils.config import CDTYPE


def pade(w, L: int, M: int):
    """Taylor -> [L/M] Padé: returns numerator coeffs ``a`` (len L+1) and
    denominator coeffs ``b`` (len M+1, b[0]=1); solves the M×M Toeplitz
    system (LinOpFam.jl:622-642)."""
    w = np.asarray(w, dtype=CDTYPE)
    A = np.zeros((M, M), dtype=CDTYPE)
    for i in range(1, M + 1):
        for j in range(1, M + 1):
            if L + i - j >= 0:
                A[i - 1, j - 1] = w[L + i - j]
    if M > 0:
        rhs = -w[L + 1:L + M + 1]
        b = np.linalg.solve(A, rhs) if M > 0 else np.zeros(0, dtype=CDTYPE)
    else:
        b = np.zeros(0, dtype=CDTYPE)
    b = np.concatenate([[1.0 + 0j], b])
    a = np.zeros(L + 1, dtype=CDTYPE)
    for l in range(L + 1):
        for m in range(l + 1):
            if m <= M:
                a[l] += w[l - m] * b[m]
    return a, b


def pade_vector(V, L: int, M: int):
    """Per-component Padé of a vector-valued Taylor series ``V[k, :]``
    (pade! vector branch, LinOpFam.jl:655-677)."""
    d = V.shape[1]
    A = np.zeros((L + 1, d), dtype=CDTYPE)
    B = np.zeros((M + 1, d), dtype=CDTYPE)
    for i in range(d):
        a, b = pade(V[:, i], L, M)
        A[:, i] = a
        B[:, i] = b
    return A, B


def polyval(p, z):
    """Horner evaluation of Σ p[i] z^i (LinOpFam.jl:715-730)."""
    p = np.asarray(p)
    f = p[-1]
    for i in range(len(p) - 2, -1, -1):
        f = f * z + p[i]
    return f


def polyval_vec(P, z):
    """Horner on stacked per-component coefficients P[k, :]."""
    f = P[-1].copy()
    for i in range(P.shape[0] - 2, -1, -1):
        f = f * z + P[i]
    return f


def poly_roots(p):
    """Roots of Σ p[i] z^i via the companion matrix
    (Householder.jl:195-203)."""
    p = np.asarray(p, dtype=CDTYPE)
    N = len(p) - 1
    while N > 0 and p[N] == 0:
        N -= 1
    if N == 0:
        return np.zeros(0, dtype=CDTYPE)
    C = np.zeros((N, N), dtype=CDTYPE)
    for i in range(1, N):
        C[i, i - 1] = 1.0
    C[:, N - 1] = -p[:N] / p[N]
    return np.linalg.eigvals(C)


def estimate_pol(w):
    """Estimate pole location/strength from consecutive Taylor coefficients
    (LinOpFam.jl:736-752)."""
    w = np.asarray(w, dtype=CDTYPE)
    N = len(w)
    de = np.zeros(N - 2, dtype=CDTYPE)
    k = np.zeros(N - 2, dtype=CDTYPE)
    for j in range(1, N - 1):
        i = j  # 1-based shift: reference i=j-1 with 1-based j from 2
        denom = (i + 1) * w[j + 1] * w[j - 1] - i * w[j] ** 2
        de[j - 1] = w[j] * w[j - 1] / denom
        k[j - 1] = (i ** 2 - 1) * w[j + 1] * w[j - 1] - (i * w[j]) ** 2
    return de, k


def conv_radius(a):
    """Ratio-test convergence-radius sequence |a_n / a_{n+1}|
    (LinOpFam.jl:754-761)."""
    a = np.asarray(a)
    return np.abs(a[:-1] / a[1:]).astype(float)


def taylor_shift(p, z0):
    """Coefficients of q(z) = p(z + z0) (polynomial re-centering,
    polys_pade.jl shift)."""
    p = np.asarray(p, dtype=CDTYPE)
    n = len(p)
    q = np.zeros(n, dtype=CDTYPE)
    import math
    for i in range(n):
        for j in range(i, n):
            q[i] += p[j] * math.comb(j, i) * z0 ** (j - i)
    return q


class Polynomial:
    """Light polynomial arithmetic (Pade.Polynomial, polys_pade.jl:7)."""

    def __init__(self, coeffs):
        self.coeffs = np.trim_zeros(np.asarray(coeffs, dtype=CDTYPE), "b")
        if self.coeffs.size == 0:
            self.coeffs = np.zeros(1, dtype=CDTYPE)

    def __call__(self, z):
        return polyval(self.coeffs, z)

    def __add__(self, other):
        a, b = self.coeffs, other.coeffs
        n = max(len(a), len(b))
        out = np.zeros(n, dtype=CDTYPE)
        out[:len(a)] += a
        out[:len(b)] += b
        return Polynomial(out)

    def __mul__(self, other):
        if isinstance(other, Polynomial):
            return Polynomial(np.convolve(self.coeffs, other.coeffs))
        return Polynomial(self.coeffs * other)

    def __sub__(self, other):
        return self + (other * (-1.0))

    def derivative(self):
        c = self.coeffs
        if len(c) == 1:
            return Polynomial([0.0])
        return Polynomial(c[1:] * np.arange(1, len(c)))

    def roots(self):
        return poly_roots(self.coeffs)

    def shift(self, z0):
        return Polynomial(taylor_shift(self.coeffs, z0))

    def degree(self):
        return len(self.coeffs) - 1


class RationalPolynomial:
    """Numerator/denominator pair (rational approximants,
    polys_pade.jl)."""

    def __init__(self, num: Polynomial, den: Polynomial):
        self.num = num if isinstance(num, Polynomial) else Polynomial(num)
        self.den = den if isinstance(den, Polynomial) else Polynomial(den)

    def __call__(self, z):
        return self.num(z) / self.den(z)

    def poles(self):
        return self.den.roots()

    def zeros(self):
        return self.num.roots()


__all__ = ["pade", "pade_vector", "polyval", "polyval_vec", "poly_roots",
           "estimate_pol", "conv_radius", "taylor_shift", "Polynomial",
           "RationalPolynomial"]
