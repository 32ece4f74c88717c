"""Element-kernel exactness regression tests.

Every P1/P2 kernel must agree to machine precision with brute-force
high-order quadrature (n=8: exact to degree 13 on the tet, 14 on the
tri).  This guards the quadrature-degree accounting: the collapsed Duffy
rule with n points per axis is exact only to total degree 2n-3 (tet) /
2n-2 (tri) — the Jacobian of the collapse costs degrees (a lesson
learned: an earlier degree-matched 'optimization' silently broke all P2
kernels by 0.5-17%)."""
import numpy as np
import pytest

import wavesandeigenvalues_jl_tpu.fem.elements as fel


@pytest.fixture(scope="module")
def geo():
    rng = np.random.default_rng(0)
    base = np.array([[0, 1, 0, 0, 1, 1, 0, 1],
                     [0, 0, 1, 0, 1, 0, 1, 1],
                     [0, 0, 0, 1, 0, 1, 1, 1]], dtype=float)
    pts = base + 0.25 * rng.standard_normal((3, 8))
    tets = np.array([[0, 1, 2, 3], [4, 5, 6, 7]])
    tris = np.array([[0, 1, 2], [1, 2, 4]])
    c4 = rng.uniform(1, 2, (2, 4))
    c3 = rng.uniform(1, 2, (2, 3))
    return pts, tets, tris, c4, c3


def test_quadrature_exactness_degrees():
    from math import factorial
    pts, w = fel.tet_quadrature(4)
    for (i, j, k) in [(5, 0, 0), (2, 2, 1), (1, 1, 3)]:  # degree 5
        q = np.sum(w * pts[:, 0] ** i * pts[:, 1] ** j * pts[:, 2] ** k)
        exact = factorial(i) * factorial(j) * factorial(k) / factorial(i + j + k + 3)
        assert abs(q - exact) < 1e-14
    pts, w = fel.tri_quadrature(4)
    for (i, j) in [(6, 0), (3, 3)]:  # degree 6
        q = np.sum(w * pts[:, 0] ** i * pts[:, 1] ** j)
        assert abs(q - factorial(i) * factorial(j) / factorial(i + j + 2)) < 1e-14


@pytest.mark.parametrize("order", [1, 2])
@pytest.mark.parametrize("with_c", [False, True])
def test_tet_mass_stiffness_exact(geo, order, with_c):
    pts, tets, tris, c4, c3 = geo
    q, w = fel.tet_quadrature(8)
    N, dN = fel.tet_basis(order, q)
    N1, _ = fel.tet_basis(1, q)
    _, Jinv, det = fel.tet_trafo(pts, tets)
    absdet = np.abs(det)
    c = c4 if with_c else None
    cq = np.einsum("ek,qk->eq", c4, N1) if with_c else np.ones((2, len(w)))
    ref_m = np.einsum("e,eq,q,qi,qj->eij", absdet, cq, w, N, N)
    assert np.abs(fel.tet_mass(pts, tets, order, c) - ref_m).max() < 1e-13
    A = np.einsum("emn,eon->emo", Jinv, Jinv)
    cq2 = cq ** 2 if with_c else cq
    ref_k = np.einsum("e,eq,q,qim,emo,qjo->eij", absdet, cq2, w, dN, A, dN,
                      optimize=True)
    scale = np.abs(ref_k).max()
    assert np.abs(fel.tet_stiffness(pts, tets, order, c) - ref_k).max() \
        < 1e-13 * scale


@pytest.mark.parametrize("order", [1, 2])
@pytest.mark.parametrize("with_c", [False, True])
def test_tri_mass_source_exact(geo, order, with_c):
    pts, tets, tris, c4, c3 = geo
    q, w = fel.tri_quadrature(8)
    N = fel.tri_basis(order, q)
    N1 = fel.tri_basis(1, q)
    _, _, det = fel.tri_trafo(pts, tris)
    absdet = np.abs(det)
    c = c3 if with_c else None
    cq = np.einsum("ek,qk->eq", c3, N1) if with_c else np.ones((2, len(w)))
    ref_m = np.einsum("e,eq,q,qi,qj->eij", absdet, cq, w, N, N)
    assert np.abs(fel.tri_mass(pts, tris, order, c) - ref_m).max() < 1e-13
    ref_s = np.einsum("e,eq,q,qi->ei", absdet, cq, w, N)
    assert np.abs(fel.tri_source(pts, tris, order, c) - ref_s).max() < 1e-13


@pytest.mark.parametrize("orders", [(1, 1), (2, 1), (2, 2)])
@pytest.mark.parametrize("with_c", [False, True])
def test_tet_deriv_exact(geo, orders, with_c):
    pts, tets, tris, c4, c3 = geo
    to, tr = orders
    q, w = fel.tet_quadrature(8)
    Nt, _ = fel.tet_basis(to, q)
    _, dNu = fel.tet_basis(tr, q)
    N1, _ = fel.tet_basis(1, q)
    _, Jinv, det = fel.tet_trafo(pts, tets)
    for d in range(3):
        g = np.einsum("qjm,em->eqj", dNu, Jinv[:, :, d])
        cq = np.einsum("ek,qk->eq", c4, N1) if with_c else np.ones((2, len(w)))
        ref = np.einsum("e,eq,q,qi,eqj->eij", np.abs(det), cq, w, Nt, g,
                        optimize=True)
        got = fel.tet_deriv(pts, tets, to, tr, d, c=c4 if with_c else None)
        assert np.abs(got - ref).max() < 1e-13


def test_tet_source_exact(geo):
    pts, tets, tris, c4, c3 = geo
    q, w = fel.tet_quadrature(8)
    _, _, det = fel.tet_trafo(pts, tets)
    for order in (1, 2):
        N, _ = fel.tet_basis(order, q)
        ref = np.abs(det)[:, None] * np.einsum("q,qi->i", w, N)[None]
        assert np.abs(fel.tet_source(pts, tets, order) - ref).max() < 1e-14


def test_hermite_mass_stiffness_exact(geo):
    """Hermite tables (n=5 → degree 7) cover the cubic² (+linear c)
    integrands exactly: cross-check against n=8 brute force."""
    pts, tets, tris, c4, c3 = geo
    q, w = fel.tet_quadrature(8)
    from wavesandeigenvalues_jl_tpu.fem.elements import (_herm_recomb_tet,
                                                         herm_tet_eval)
    N, dN = herm_tet_eval(q)
    N1, _ = fel.tet_basis(1, q)
    J, Jinv, det = fel.tet_trafo(pts, tets)
    absdet = np.abs(det)
    R = _herm_recomb_tet(J)
    cq = np.einsum("ek,qk->eq", c4, N1)
    M_ref = np.einsum("e,eq,q,qi,qj->eij", absdet, cq, w, N, N,
                      optimize=True)
    M_ref = np.matmul(np.matmul(R, M_ref), R.swapaxes(1, 2))
    got = fel.tet_mass_herm(pts, tets, c4)
    assert np.abs(got - M_ref).max() < 1e-12 * np.abs(M_ref).max()
    A = np.einsum("emn,eon->emo", Jinv, Jinv)
    K_ref = np.einsum("e,eq,q,qim,emo,qjo->eij", absdet, cq ** 2, w, dN, A,
                      dN, optimize=True)
    K_ref = np.matmul(np.matmul(R, K_ref), R.swapaxes(1, 2))
    got = fel.tet_stiffness_herm(pts, tets, c4)
    assert np.abs(got - K_ref).max() < 1e-12 * np.abs(K_ref).max()
