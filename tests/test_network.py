"""Network-module tests (C23): analytic duct resonances, flame coupling,
damper elements, arbitrary-order admittance derivatives.

Analytic fixtures: round-trip condition R_in·R_out·exp(2iωL/c) = 1 gives
quarter-wave f=(2m+1)c/4L for unode–pnode and half-wave f=mc/2L for
pnode–pnode (ANNULIGhT Exercise1 benchmark, SURVEY.md §4)."""
import numpy as np
import pytest

from wavesandeigenvalues_jl_tpu.models import discretize_network
from wavesandeigenvalues_jl_tpu.nlevp import beyn, mslp
from wavesandeigenvalues_jl_tpu.nlevp.algebra import Pow, Reciprocal

C, AREA, LEN = 347.0, 0.01, 1.0


def test_quarter_wave():
    net = [("unode", (C, AREA)), ("duct", (LEN, C, AREA)),
           ("pnode", (C, AREA))]
    L = discretize_network(net)
    assert L.size == 6
    f_exact = C / (4 * LEN)
    sol, n, flag = mslp(L, 2 * np.pi * 80.0, maxiter=30, tol=1e-10)
    assert flag >= 0
    assert np.isclose(sol.params["ω"].real / 2 / np.pi, f_exact, rtol=1e-8)


def test_half_wave_and_multiple_ducts():
    # two ducts in series == one duct of summed length
    net = [("pnode", (C, AREA)), ("duct", (0.4, C, AREA)),
           ("duct", (0.6, C, AREA)), ("pnode", (C, AREA))]
    L = discretize_network(net)
    f_exact = C / (2 * LEN)
    sol, n, flag = mslp(L, 2 * np.pi * 170.0, maxiter=30, tol=1e-10)
    assert flag >= 0
    assert np.isclose(sol.params["ω"].real / 2 / np.pi, f_exact, rtol=1e-8)


def test_flame_passive_limit():
    # n=0 flame with equal sound speeds reduces to plain continuity
    net = [("unode", (C, AREA)), ("duct", (0.5, C, AREA)),
           ("flame", (C, C, AREA)), ("duct", (0.5, C, AREA)),
           ("pnode", (C, AREA))]
    L = discretize_network(net)
    L.params["n"] = 0.0
    L.params["τ"] = 1e-3
    sol, _, flag = mslp(L, 2 * np.pi * 80.0, maxiter=30, tol=1e-10)
    assert flag >= 0
    assert np.isclose(sol.params["ω"].real / 2 / np.pi, C / 4, rtol=1e-8)


def test_flame_active_shifts_and_destabilizes():
    net = [("unode", (C, AREA)), ("duct", (0.25, C, AREA)),
           ("flame", (C, 2 * C, AREA)), ("duct", (0.25, 2 * C, AREA)),
           ("pnode", (2 * C, AREA))]
    L = discretize_network(net)
    L.params["n"] = 0.0
    L.params["τ"] = 1e-3
    sol0, _, flag0 = mslp(L, 2 * np.pi * 200.0, maxiter=40, tol=1e-11)
    assert flag0 >= 0
    assert abs(sol0.params["ω"].imag) < 1e-6  # passive: neutrally stable
    L.params["n"] = 1.0
    sol1, _, flag1 = mslp(L, sol0.params["ω"], maxiter=40, tol=1e-11)
    assert flag1 >= 0
    # active flame moves the eigenvalue off the real axis
    assert abs(sol1.params["ω"].imag) > 1.0
    assert abs(sol1.params["ω"] - sol0.params["ω"]) > 1.0


def test_helmholtz_damper_adds_damping():
    net = [("unode", (C, AREA)), ("duct", (0.5, C, AREA)),
           ("helmholtz", (0.02 ** 3, 0.01, 0.005, C, AREA)),
           ("duct", (0.5, C, AREA)), ("pnode", (C, AREA))]
    L = discretize_network(net)
    sol, _, flag = mslp(L, 2 * np.pi * 86.0, maxiter=40, tol=1e-10)
    assert flag >= 0
    # damper perturbs the quarter-wave mode and the mode stays near it
    assert abs(sol.params["ω"].real / 2 / np.pi - C / 4 / LEN) < 20.0


def test_lhr_element_builds_and_solves():
    net = [("unode", (C, AREA)), ("duct", (0.5, C, AREA)),
           ("lhr", (0.02 ** 3, 0.01, 0.005, C, AREA)),
           ("duct", (0.5, C, AREA)), ("pnode", (C, AREA))]
    L = discretize_network(net)
    sol, _, flag = mslp(L, 2 * np.pi * 86.0, maxiter=40, tol=1e-9)
    assert flag >= 0


def test_beyn_finds_duct_modes():
    net = [("pnode", (C, AREA)), ("duct", (LEN, C, AREA)),
           ("pnode", (C, AREA))]
    L = discretize_network(net)
    f1 = C / 2
    # rectangle around the first two axial modes
    Gamma = 2 * np.pi * np.array([100 - 40j, 400 - 40j, 400 + 40j,
                                  100 + 40j])
    Om, P = beyn(L, Gamma, l=6, K=2, N=64)
    f = np.sort(Om.real / 2 / np.pi)
    found = [any(np.isclose(f, k * f1, rtol=1e-6)) for k in (1, 2)]
    assert all(found), f


def test_reciprocal_derivatives_any_order():
    # 1/(ω²) has k-th derivative (-1)^k (k+1)!/ω^{k+2}
    g = Pow(2)
    r = Reciprocal(g)
    w = 1.7 + 0.3j
    for k in range(6):
        import math
        exact = (-1) ** k * math.factorial(k + 1) / w ** (k + 2)
        assert np.isclose(r.eval((w,), (k,)), exact), k
