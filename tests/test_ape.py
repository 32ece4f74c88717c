"""APE module tests: Hermite element patch tests, potential-flow solver
(APE.jl:215-321), and quiescent APE acoustic eigenvalues (APE.jl:10-194)."""
import numpy as np
import pytest

from wavesandeigenvalues_jl_tpu.fem import assembly as fea
from wavesandeigenvalues_jl_tpu.fem import elements as fel
from wavesandeigenvalues_jl_tpu.mesh.generate import box_mesh
from wavesandeigenvalues_jl_tpu.models import ape
from wavesandeigenvalues_jl_tpu.nlevp import mslp


# ---------------------------------------------------------------------------
# Hermite element kernels (FEM.jl:171-336, 740-762, 1876-2282)


def _herm_dofs_of(mesh, f, grad):
    """Hermite DOF vector of an analytic field: values, global gradients,
    face-centroid values (aggregate_elements order, FEM.jl:117-166)."""
    _, tet_dofs, dim = fea.aggregate_elements(mesh, "herm")
    pts = mesh.points
    n = mesh.n_points
    u = np.zeros(dim)
    u[:n] = f(pts)
    g = grad(pts)  # [3, n]
    for d in range(3):
        u[(d + 1) * n:(d + 2) * n] = g[d]
    # face bubbles: value at the face centroid
    from wavesandeigenvalues_jl_tpu.fem.assembly import TET_FACES
    t = mesh.tetrahedra
    for fi, fc in enumerate(TET_FACES):
        cent = pts[:, t[:, list(fc)]].mean(axis=2)
        u[tet_dofs[:, 16 + fi]] = f(cent)
    return u, tet_dofs, dim


def test_hermite_patch_constant_and_linear():
    mesh = box_mesh(nx=2, ny=2, nz=2)
    M = fel.tet_mass_herm(mesh.points, mesh.tetrahedra)
    K = fel.tet_stiffness_herm(mesh.points, mesh.tetrahedra)

    # constant field: u'Mu = volume, Ku = 0
    u1, tet_dofs, dim = _herm_dofs_of(
        mesh, lambda p: np.ones(p.shape[1]), lambda p: np.zeros_like(p))
    ue = u1[tet_dofs]
    vol = np.einsum("ei,eij,ej->", ue, M, ue)
    assert abs(vol - 1.0) < 1e-10
    assert np.max(np.abs(np.einsum("eij,ej->ei", K, ue))) < 1e-9

    # linear field f = 2x - y + 3z: ∫|∇f|² = 14·V, exactly representable
    ul, _, _ = _herm_dofs_of(
        mesh, lambda p: 2 * p[0] - p[1] + 3 * p[2],
        lambda p: np.stack([2 * np.ones(p.shape[1]),
                            -np.ones(p.shape[1]),
                            3 * np.ones(p.shape[1])]))
    ue = ul[tet_dofs]
    assert abs(np.einsum("ei,eij,ej->", ue, K, ue) - 14.0) < 1e-9
    # cubic field is reproduced exactly: mass energy of f = x³ equals
    # ∫ x⁶ over the box = 1/7
    uc, _, _ = _herm_dofs_of(
        mesh, lambda p: p[0] ** 3,
        lambda p: np.stack([3 * p[0] ** 2, np.zeros(p.shape[1]),
                            np.zeros(p.shape[1])]))
    ue = uc[tet_dofs]
    assert abs(np.einsum("ei,eij,ej->", ue, M, ue) - 1.0 / 7.0) < 1e-10


def test_hermite_tri_trace_consistency():
    """Surface Hermite mass of a constant equals the surface area."""
    mesh = box_mesh(nx=2, ny=2, nz=2)
    tri_dofs, _, dim = fea.aggregate_elements(mesh, "herm")
    Ms = fel.tri_mass_herm(mesh.points, mesh.triangles)
    u = np.zeros(dim)
    u[:mesh.n_points] = 1.0
    u[4 * mesh.n_points:4 * mesh.n_points + len(mesh.triangles)] = 1.0
    ue = u[tri_dofs]
    area = np.einsum("ei,eij,ej->", ue, Ms, ue)
    assert abs(area - 6.0) < 1e-9
    S = fel.tri_source_herm(mesh.points, mesh.triangles)
    assert abs(np.einsum("ei,ei->", ue, S) - 6.0) < 1e-9


def test_helmholtz_hermite_duct_mode():
    """Helmholtz discretize order='herm' (Helmholtz.jl:134-138): rigid duct
    half-wave mode at c/2L; Hermite getters evaluate the mode shape."""
    from wavesandeigenvalues_jl_tpu.fem import get_p, get_n_grad_p
    from wavesandeigenvalues_jl_tpu.models import discretize

    c = 343.0
    mesh = box_mesh(lx=0.25, ly=0.25, lz=1.0, nx=1, ny=1, nz=4)
    L = discretize(mesh, {"Interior": ("interior", ())},
                   c * np.ones(mesh.n_points), order="herm")
    sol, n, flag = mslp(L, 2 * np.pi * (c / 2) * 1.03, maxiter=30, tol=1e-9)
    f = sol.params["ω"].real / 2 / np.pi
    assert abs(f - c / 2) < 0.005 * c / 2
    # mode shape ∝ cos(πz/L): p(z=0)/p(z=0.43) matches the cosine ratio
    v = sol.v / sol.v[np.argmax(np.abs(sol.v[:mesh.n_points]))]
    pa = get_p(mesh, v, (0.1, 0.1, 0.43))
    pb = get_p(mesh, v, (0.12, 0.1, 0.0))
    ratio = (pa / pb).real
    assert abs(ratio - np.cos(np.pi * 0.43)) < 0.02
    ga = get_n_grad_p(mesh, v, (0.1, 0.1, 0.43), (0, 0, 1.0))
    assert abs((ga / pb).real + np.pi * np.sin(np.pi * 0.43)) < 0.15


# ---------------------------------------------------------------------------
# potential flow (APE.jl:215-321)


@pytest.mark.parametrize("order", ["const", "lin"])
def test_potflow_uniform_duct(order):
    """Inflow q at Zmin, outflow q at Zmax of a straight duct → uniform
    velocity U = (0, 0, q/A)."""
    mesh = box_mesh(lx=0.5, ly=0.5, lz=1.0, nx=2, ny=2, nz=4)
    q = 0.1
    A = 0.25
    U = ape.compute_potflow_field(mesh, {"Zmin": q, "Zmax": -q}, order=order)
    n_cols = len(mesh.tetrahedra) if order == "const" else mesh.n_points
    assert U.shape == (3, n_cols)
    assert np.allclose(U[2], q / A, atol=1e-8 * q / A + 1e-10)
    assert np.max(np.abs(U[:2])) < 1e-8


# ---------------------------------------------------------------------------
# APE discretization (APE.jl:10-194)


def test_ape_quiescent_duct_mode():
    """Quiescent APE in a rigid closed duct: the weak form imposes u·n=0 on
    un-described boundaries, so s ≈ i·ω with ω = π·c/L the half-wave mode."""
    mesh = box_mesh(lx=0.25, ly=0.25, lz=1.0, nx=1, ny=1, nz=12)
    mesh.collect_lines()
    L = ape.discretize(mesh, {})
    n_pts, n_lin = mesh.n_points, len(mesh.lines)
    assert L.size == n_pts + 3 * (n_pts + n_lin)
    c = np.sqrt(ape.AMBIENT_GAMMA * ape.AMBIENT_P / ape.AMBIENT_RHO)
    s_exact = 1j * np.pi * c  # L = 1 m
    sol, n, flag = mslp(L, s_exact * 1.06, maxiter=40, tol=1e-9, output=False)
    assert flag >= 0 or flag == -1
    s = sol.params["s"]
    assert abs(s.real) < 1e-3 * abs(s)
    assert abs(s.imag - np.pi * c) < 0.01 * np.pi * c


def test_ape_admittance_term_present():
    mesh = box_mesh(lx=0.25, ly=0.25, lz=1.0, nx=1, ny=1, nz=4)
    mesh.collect_lines()
    L = ape.discretize(mesh, {"Zmin": 0.1, "Zmax": -0.1})
    assert "Y_Zmin" in L.params and "Y_Zmax" in L.params
    cbar = np.sqrt(ape.AMBIENT_GAMMA * ape.AMBIENT_P / ape.AMBIENT_RHO)
    # normalization: Y = -c̄/(q/|Γ|), |Γ| = 0.0625 (APE.jl:76)
    assert np.isclose(L.params["Y_Zmin"], -cbar / (0.1 / 0.0625))


def test_ape_mean_flow_term():
    """With a uniform mean flow the convection term U is present and the
    mode shifts; with U=0 field the operator equals the quiescent one."""
    mesh = box_mesh(lx=0.25, ly=0.25, lz=0.5, nx=1, ny=1, nz=4)
    mesh.collect_lines()
    U0 = np.zeros((3, mesh.n_points))
    L0 = ape.discretize(mesh, {})
    Lu = ape.discretize(mesh, {}, U=U0)
    assert "v" in Lu.params
    s0 = 1j * 2000.0
    assert np.allclose(L0(s0).to_dense(), Lu(s0).to_dense(), atol=1e-12)


def test_ape_uniform_flow_dispersion():
    """Uniform mean flow U = M·c·ẑ in a rigid duct shifts the axial
    resonances by the convective factor (1−M²): f_n = n·c(1−M²)/2L.  This
    exercises the term-V/VI convection blocks nontrivially (a transposed
    block, wrong sign or wrong derivative direction breaks the ratio)."""
    c = np.sqrt(ape.AMBIENT_GAMMA * ape.AMBIENT_P / ape.AMBIENT_RHO)
    mesh = box_mesh(lx=0.2, ly=0.2, lz=1.0, nx=1, ny=1, nz=14)
    mesh.collect_lines()
    L0 = ape.discretize(mesh, {})
    s0 = mslp(L0, 1j * np.pi * c * 1.03, maxiter=40, tol=1e-10)[0].params["s"]
    M = 0.2
    U = np.zeros((3, mesh.n_points))
    U[2] = M * c
    Lu = ape.discretize(mesh, {}, U=U)
    s = mslp(Lu, s0 * (1 - M ** 2), maxiter=60, tol=1e-10)[0].params["s"]
    ratio = s.imag / s0.imag
    assert abs(ratio - (1 - M ** 2)) < 5e-3
    assert abs(s.real) < 1e-3 * abs(s)
