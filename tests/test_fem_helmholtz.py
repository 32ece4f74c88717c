"""FEM assembly + Helmholtz front-end tests against reference baselines
(BASELINE.md): Rijke-tube mesh stats, passive 272/695 Hz modes, active
eigenvalue 1075.33+372.10i rad/s, tutorial-04 Taylor/Padé behavior."""
import os

import numpy as np
import pytest

from wavesandeigenvalues_jl_tpu.fem import aggregate_elements
from wavesandeigenvalues_jl_tpu.fem import elements as fel
from wavesandeigenvalues_jl_tpu.mesh import Mesh, read_mesh
from wavesandeigenvalues_jl_tpu.mesh.generate import box_mesh, rijke_mesh
from wavesandeigenvalues_jl_tpu.models import discretize
from wavesandeigenvalues_jl_tpu.nlevp import (beyn, conv_radius, householder,
                                              mslp, perturb_fast, polyval)

RIJKE_MSH = "/root/reference/docs/src/Rijke_mm.msh"
has_ref = os.path.exists(RIJKE_MSH)

GAMMA, R, TU, TB, P0 = 1.4, 287.05, 300.0, 1200.0, 101325.0
RHO = 1.225
AREA = np.pi * 0.025 ** 2
Q02U0 = P0 * (TB / TU - 1) * AREA * GAMMA / (GAMMA - 1)
CU = np.sqrt(GAMMA * R * TU)
CB = np.sqrt(GAMMA * R * TB)
# analytic 1-D two-zone eigenfrequencies (closed inlet, open outlet,
# c-jump at z=0, L=0.25 each): tan(ωL/c1)tan(ωL/c2) = c2/c1
ANALYTIC_F1 = 272.099
ANALYTIC_F2 = 694.438
# committed reference output (docs/src/tutorial_04_perturbation_theory.md:81)
REF_ACTIVE = 1075.325211506839 + 372.1017670372039j


def rijke_dscrp(n=0.0, tau=1e-3):
    return {
        "Interior": ("interior", ()),
        "Outlet": ("admittance", ("Y", 1e15)),
        "Flame": ("flame", (GAMMA, RHO, Q02U0, [0.0, 0.0, -0.00101],
                            [0.0, 0.0, 1.0], "n", "τ", n, tau)),
    }


def c_field(mesh):
    # per-tet centroid sampling = the reference tutorial's generate_field
    # default (Meshutils.jl:1079-1085); reproduces REF_ACTIVE to ~1e-11
    return mesh.generate_field(
        lambda x, y, z: np.where(z < 0, CU, CB), order="const")


@pytest.fixture(scope="module")
def ref_mesh():
    if not has_ref:
        pytest.skip("reference mesh not available")
    return read_mesh(RIJKE_MSH, scale=1e-3)


@pytest.fixture(scope="module")
def ref_family(ref_mesh):
    return discretize(ref_mesh, rijke_dscrp(), c_field(ref_mesh))


# ---------------------------------------------------------------------------
# element kernels


def test_p1_kernels_vs_closed_form():
    """Quadrature kernels match the textbook closed forms used by the
    reference (s43v1u1 etc., FEM.jl:704, 1745)."""
    rng = np.random.default_rng(3)
    X = rng.standard_normal((3, 4))
    tets = np.array([[0, 1, 2, 3]])
    J = np.stack([X[:, i] - X[:, 3] for i in range(3)], axis=1)
    absdet = abs(np.linalg.det(J))
    M = fel.tet_mass(X, tets, 1)[0]
    Mref = (np.full((4, 4), 1 / 120.0) + np.eye(4) / 120.0) * absdet
    assert np.allclose(M, Mref, atol=1e-14)
    G = np.array([[1, 0, 0], [0, 1, 0], [0, 0, 1], [-1, -1, -1]], float)
    A = np.linalg.inv(J) @ np.linalg.inv(J).T
    Kref = G @ A @ G.T / 6 * absdet
    assert np.allclose(fel.tet_stiffness(X, tets, 1)[0], Kref, atol=1e-12)
    assert np.allclose(fel.tet_source(X, tets, 1)[0], absdet / 24, atol=1e-14)


def test_p2_partition_of_unity_and_quadratic_exactness():
    """P2 basis sums to 1; the P2 stiffness applied to an interpolated
    quadratic equals the exact weak Laplacian (quadrature exactness)."""
    pts, w = fel.tet_quadrature()
    N, dN = fel.tet_basis(2, pts)
    assert np.allclose(N.sum(axis=1), 1.0)
    assert np.allclose(dN.sum(axis=1), 0.0, atol=1e-13)
    # quadratic field u = x² + 2y² - z² + xy on one reference-ish tet
    rng = np.random.default_rng(5)
    X = rng.standard_normal((3, 4)) * 0.5 + np.eye(3, 4)
    m = Mesh(X, tetrahedra=np.array([[0, 1, 2, 3]]))
    m.collect_lines()
    tric, tets, dim = aggregate_elements(m, "quad")
    # node coordinates of all 10 DOFs
    coords = np.concatenate([X.T, X[:, m.lines].mean(axis=2).T])

    def u(p):
        return p[0] ** 2 + 2 * p[1] ** 2 - p[2] ** 2 + p[0] * p[1]

    def gradu(p):
        return np.array([2 * p[0] + p[1], 4 * p[1] + p[0], -2 * p[2]])

    # element matrix is in LOCAL DOF order [v1..v4, edges]; map through tets[0]
    uloc = np.array([u(coords[g]) for g in tets[0]])
    K = fel.tet_stiffness(X, np.array([[0, 1, 2, 3]]), 2)[0]
    lhs = uloc @ K.real @ uloc
    # exact ∫|∇u|² over the tet by quadrature on exact gradient
    _, Jinv, det = fel.tet_trafo(X, np.array([[0, 1, 2, 3]]))
    phys = (X[:, 3][None, :] +
            pts @ np.stack([X[:, 0] - X[:, 3], X[:, 1] - X[:, 3],
                            X[:, 2] - X[:, 3]]))
    gsq = np.array([gradu(p) @ gradu(p) for p in phys])
    rhs = abs(det[0]) * (w * gsq).sum()
    assert abs(lhs - rhs) < 1e-10 * abs(rhs)


def test_aggregate_quad_dims():
    m = box_mesh(1, 1, 1, 2, 2, 2)
    tric, tets, dim = aggregate_elements(m, "quad")
    assert dim == m.n_points + len(m.lines)
    assert tets.shape == (len(m.tetrahedra), 10)
    assert tric.shape == (len(m.triangles), 6)
    assert tets.max() < dim


# ---------------------------------------------------------------------------
# mesh layer


def test_rijke_mesh_stats(ref_mesh):
    """BASELINE.md: 1006 points, 1562 surface triangles, 3380 tets."""
    assert ref_mesh.n_points == 1006
    assert len(ref_mesh.triangles) == 1562
    assert len(ref_mesh.tetrahedra) == 3380
    for dom in ("Interior", "Flame", "Inlet", "Outlet", "Walls"):
        assert dom in ref_mesh.domains


def test_mesh_ops(ref_mesh):
    v = ref_mesh.compute_size("Interior")
    assert abs(v - np.pi * 0.025 ** 2 * 0.5) / v < 0.05  # cylinder volume
    idx = ref_mesh.find_tetrahedron_containing_point([0.0, 0.0, -0.00101])
    lam = ref_mesh.barycentric([0.0, 0.0, -0.00101])[idx]
    assert np.all(lam > -1e-12) and np.all(lam < 1 + 1e-12)
    nrm = ref_mesh.get_normal_vectors(["Outlet"])
    pts = ref_mesh.get_surface_points(["Outlet"])
    # outlet normal is +z
    assert np.allclose(nrm[2, pts], 1.0, atol=1e-6)


def test_box_mesh_volume():
    m = box_mesh(2.0, 1.0, 0.5, 3, 3, 3)
    assert abs(m.tet_volumes().sum() - 1.0) < 1e-12
    assert len(m.triangles) > 0
    # every surface triangle lies on the boundary
    surf_doms = [d for d in m.domains if d != "Interior"]
    n_face_tris = sum(len(m.domains[d]["simplices"]) for d in surf_doms)
    assert n_face_tris == len(m.triangles)


def test_nastran_roundtrip(tmp_path):
    """Minimal Nastran bulk file with HMNAME tags parses correctly."""
    f = tmp_path / "t.nas"
    f.write_text(
        "$HMNAME COMP                   1\"Vol\"\n"
        "$HMNAME COMP                   2\"Surf\"\n"
        "GRID           1        0.0     0.0     0.0\n"
        "GRID           2        1.0     0.0     0.0\n"
        "GRID           3        0.0     1.0     0.0\n"
        "GRID           4        0.0     0.0     1.0\n"
        "CTETRA         1       1       1       2       3       4\n"
        "CTRIA3         2       2       1       2       3\n")
    m = read_mesh(str(f))
    assert m.n_points == 4
    assert len(m.tetrahedra) == 1
    assert len(m.triangles) == 1
    assert "Vol" in m.domains and "Surf" in m.domains
    assert abs(m.tet_volumes()[0] - 1 / 6) < 1e-12


# ---------------------------------------------------------------------------
# Helmholtz physics (reference baselines)


def test_rijke_passive_modes(ref_family):
    """Passive Rijke modes ≈272 Hz and ≈695 Hz
    (tutorial_01_rijke_tube.jl:176-189; analytic two-zone 272.10/694.44)."""
    L = ref_family
    L.params["n"] = 0.0
    sol, n, flag = householder(L, 250 * 2 * np.pi, maxiter=10)
    f1 = sol.params["ω"].real / 2 / np.pi
    assert abs(f1 - ANALYTIC_F1) < 1.0  # P1 discretization ≈ +0.38 Hz
    sol, n, flag = householder(L, 690 * 2 * np.pi, maxiter=10)
    f2 = sol.params["ω"].real / 2 / np.pi
    assert abs(f2 - ANALYTIC_F2) < 1.0  # ≈ +0.53 Hz; reference prints "695"


def test_rijke_beyn_passive(ref_family):
    L = ref_family
    L.params["n"] = 0.0
    Gamma = np.array([150 + 5j, 150 - 5j, 1000 - 5j, 1000 + 5j]) * 2 * np.pi
    # rtol drops the pure-noise singular directions of the Y=1e15-penalized
    # operator (σ/σmax ~ 1e-15), which otherwise limit accuracy to ~1 Hz
    Om, P = beyn(L, Gamma, l=10, N=64, rtol=1e-12)
    f = np.sort(Om.real) / 2 / np.pi
    assert len(f) == 2
    assert abs(f[0] - 272.064) < 0.05
    assert abs(f[1] - 694.968) < 0.05
    assert np.max(np.abs(Om.imag)) < 1e-6


def test_rijke_active_eigenvalue(ref_family):
    """Active flame (n=1, τ=1ms): ω = 1075.325211506839 + 372.1017670372039i
    rad/s (growth rate ≈ 59.2 Hz), the committed output of tutorial_04 —
    reproduced to ~1e-11 rad/s.  (Requires the per-tet centroid c field,
    the tutorial's generate_field(order=:const) default.)"""
    L = ref_family
    L.params["n"] = 1.0
    sol, n, flag = mslp(L, 340 * 2 * np.pi, maxiter=20, tol=1e-11)
    om = sol.params["ω"]
    assert abs(om - REF_ACTIVE) < 1e-7
    growth = om.imag / 2 / np.pi
    assert abs(growth - 59.22) < 0.5
    assert flag in (0, 2)
    assert n <= 12


def test_rijke_taylor_pade_tutorial04(ref_family):
    """Tutorial-04 committed numbers, reproduced to ~1e-10 rad/s: order-20
    τ-Taylor at τ+5e-4 = 916.7085040155473+494.3258317478708i rad/s, exact
    re-solve 916.7036137579256+494.32932528479967i; the estimated
    convergence radius is ≈7e-4 and the [10/10] Padé stays accurate
    outside it where the Taylor sum has diverged."""
    L = ref_family
    L.params["n"] = 1.0
    L.params["τ"] = 1e-3
    sol, _, flag = mslp(L, 340 * 2 * np.pi, maxiter=20, tol=1e-11)
    om0 = sol.params["ω"]
    assert abs(om0 - REF_ACTIVE) < 1e-7
    perturb_fast(sol, L, "τ", 20)
    coeffs = sol.eigval_pert["τ/Taylor"]
    r = conv_radius(coeffs)[-1]
    assert 3e-4 < r < 1.2e-3  # reference estimator: 7.03e-4

    dtau = 5e-4
    est = polyval(coeffs, dtau)
    assert abs(est - (916.7085040155473 + 494.3258317478708j)) < 1e-7
    L.params["τ"] = 1e-3 + dtau
    sol2, _, _ = mslp(L, est, maxiter=20, tol=1e-11)
    exact = sol2.params["ω"]
    assert abs(exact - (916.7036137579256 + 494.32932528479967j)) < 1e-7
    assert abs(est - exact) / abs(exact) < 1e-4

    dtau = 2 * r
    pade_est = sol("τ", 1e-3 + dtau, 10, 10)
    taylor_est = polyval(coeffs, dtau)
    L.params["τ"] = 1e-3 + dtau
    sol3, _, _ = mslp(L, pade_est, maxiter=30, tol=1e-11)
    exact = sol3.params["ω"]
    L.params["τ"] = 1e-3
    assert abs(pade_est - exact) < abs(taylor_est - exact) / 10
    assert abs(pade_est - exact) / abs(exact) < 1e-3


def test_generated_rijke_mesh_end_to_end():
    """Self-contained check (no reference files): generated cylinder mesh
    reproduces the analytic two-zone frequencies within P1 accuracy."""
    mesh = rijke_mesh(n_rings=2, nz_cold=10, nz_hot=10)
    c = c_field(mesh)
    dscrp = {"Interior": ("interior", ()),
             "Outlet": ("admittance", ("Y", 1e15))}
    L = discretize(mesh, dscrp, c)
    sol, _, _ = householder(L, 270 * 2 * np.pi, maxiter=10, tol=1e-10)
    f1 = sol.params["ω"].real / 2 / np.pi
    assert abs(f1 - ANALYTIC_F1) < 4.0


def test_speaker_source(ref_mesh):
    """:speaker boundary forcing returns a parameterized rhs family
    (Helmholtz.jl:251-259, 488-505)."""
    dscrp = {"Interior": ("interior", ()),
             "Outlet": ("admittance", ("Y", 1e15)),
             "Inlet": ("speaker", ("S", 1.0, "Yin", 1e-3))}
    L, rhs = discretize(ref_mesh, dscrp, c_field(ref_mesh), source=True)
    assert "Yin" in L.params
    assert "S" in rhs.params
    v = rhs.terms[0].coeff.to_dense()[:, 0]
    inlet_pts = ref_mesh.get_surface_points(["Inlet"])
    assert np.abs(v[inlet_pts]).sum() > 0
    mask = np.ones(len(v), bool)
    mask[inlet_pts] = False
    assert np.abs(v[mask]).sum() == 0


def test_custom_ftf_equals_ntau(ref_mesh):
    """Custom-FTF flame equals built-in n-τ flame (tutorial_08 check)."""
    from wavesandeigenvalues_jl_tpu.nlevp.algebra import ScalarFunc, _exp

    class NTau(ScalarFunc):
        nargs = 1

        def __init__(self, n, tau):
            self.n, self.tau = n, tau

        def eval(self, values, orders):
            from wavesandeigenvalues_jl_tpu.nlevp.algebra import exp_delay
            (z,) = values
            (k,) = orders
            return self.n * exp_delay.eval((z, self.tau), (k, 0))

    c = c_field(ref_mesh)
    L1 = discretize(ref_mesh, rijke_dscrp(n=1.0), c)
    d2 = rijke_dscrp()
    d2["Flame"] = ("flame", (GAMMA, RHO, Q02U0, [0.0, 0.0, -0.00101],
                             [0.0, 0.0, 1.0], NTau(1.0, 1e-3)))
    L2 = discretize(ref_mesh, d2, c)
    z = 1000.0 + 300j
    A1 = L1(z).to_dense()
    A2 = L2(z).to_dense()
    assert np.allclose(A1, A2, atol=1e-9 * np.abs(A1).max())
