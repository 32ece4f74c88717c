"""Multipoint (rational Hermite) Padé — the completed version of the
reference's WIP (examples/Pade/pade.jl: confluent Newton table at
:400-476, empty multi_point_pade stub at :501-509)."""
import numpy as np
import pytest

from wavesandeigenvalues_jl_tpu.nlevp import (gallery, mslp, multipoint_pade,
                                              newton_polynomial, perturb_fast,
                                              polyval)


def _taylor_of_poly(c, z0, n):
    """First n Taylor coefficients of the polynomial c (monomial) about z0."""
    import math
    c = np.asarray(c, complex)
    out = []
    for s in range(n):
        val = sum(c[j] * math.comb(j, s) * z0 ** (j - s)
                  for j in range(s, len(c)))
        out.append(val)
    return np.asarray(out)


def test_newton_polynomial_hermite_exact():
    """Confluent interpolation reproduces a cubic from two 2-jet points."""
    p = np.array([1.0, -2.0, 0.0, 1.0], complex)  # 1 - 2z + z^3
    pts = [(0.0, _taylor_of_poly(p, 0.0, 2)),
           (1.0, _taylor_of_poly(p, 1.0, 2))]
    q = newton_polynomial(pts)
    assert np.allclose(q, p, atol=1e-12)


def test_newton_polynomial_plain_nodes():
    """Distinct simple nodes → classic Newton interpolation."""
    p = np.array([2.0, 1.0, -3.0], complex)
    pts = [(z, [polyval(p, z)]) for z in (0.0, 0.5, 2.0)]
    q = newton_polynomial(pts)
    assert np.allclose(q, p, atol=1e-12)


def test_multipoint_pade_exact_rational():
    """[1/2] interpolant recovers f = (1+2z)/(1-0.5z+0.25z²) exactly from
    2-jets at two points."""
    num = np.array([1.0, 2.0], complex)
    den = np.array([1.0, -0.5, 0.25], complex)

    def taylor(z0, n):
        # Taylor of num/den about z0 via series division
        from wavesandeigenvalues_jl_tpu.nlevp.pade import taylor_shift
        a, b = taylor_shift(num, z0), taylor_shift(den, z0)
        a = np.concatenate([a, np.zeros(n, complex)])
        c = np.zeros(n, complex)
        for k in range(n):
            c[k] = (a[k] - sum(c[j] * b[k - j]
                               for j in range(max(0, k - len(b) + 1), k))) / b[0]
        return c

    pts = [(0.0, taylor(0.0, 2)), (0.7, taylor(0.7, 2))]
    r = multipoint_pade(1, 2, pts)
    for z in (0.21 + 0.3j, -0.4, 1.5 + 1j):
        exact = polyval(num, z) / polyval(den, z)
        assert abs(r(z) - exact) < 1e-10


def test_multipoint_pade_condition_count():
    with pytest.raises(ValueError):
        multipoint_pade(2, 2, [(0.0, [1.0, 2.0])])


def test_two_point_pade_rijke_eigenvalue():
    """Two-point Padé of ω(τ) on the gallery Rijke tube: matching low-order
    jets at τ₀ and τ₁ predicts ω at the midpoint better than the pure
    Taylor series of the same total order from τ₀ alone (the use case the
    reference's WIP targets)."""
    L, _grid = gallery.rijke_tube(48)
    tau0, tau1 = 0.2, 0.4
    taum = 0.5 * (tau0 + tau1)

    def omega_and_jet(tau, order):
        L.params["τ"] = tau
        sol, _, flag = mslp(L, 1.0 + 0.3j, tol=1e-12, maxiter=30)
        assert flag >= 0
        perturb_fast(sol, L, "τ", order)
        return sol.params["ω"], np.asarray(sol.eigval_pert["τ/Taylor"])

    om0, jet0 = omega_and_jet(tau0, 3)
    om1, jet1 = omega_and_jet(tau1, 1)
    om_exact, _ = omega_and_jet(taum, 1)

    # total conditions 4+2 = 6 → [2/3] two-point Padé
    r = multipoint_pade(2, 3, [(tau0, jet0), (tau1, jet1)])
    om_2pt = r(taum)

    om_taylor = polyval(jet0, taum - tau0)  # order-3 one-point Taylor

    assert abs(om_2pt - om_exact) < abs(om_taylor - om_exact)
    assert abs(om_2pt - om_exact) < 5e-3 * abs(om_exact)


def test_duplicate_expansion_points_merge_not_nan():
    """Entries sharing a node merge into one confluent jet instead of
    silently producing NaN via the 0/0 divided difference (round-1
    advisor finding)."""
    p = np.array([1.0, -2.0, 0.0, 1.0], complex)  # 1 - 2z + z^3
    pts = [(0.0, _taylor_of_poly(p, 0.0, 1)),
           (0.0, _taylor_of_poly(p, 0.0, 2)),   # same node again, longer jet
           (1.0, _taylor_of_poly(p, 1.0, 2))]
    q = newton_polynomial(pts)
    assert np.all(np.isfinite(q))
    assert np.allclose(q, p, atol=1e-12)
    # inconsistent data at a repeated node is an error, not NaN
    with pytest.raises(ValueError):
        newton_polynomial([(0.0, [1.0]), (0.0, [2.0]), (1.0, [0.0, 1.0])])
