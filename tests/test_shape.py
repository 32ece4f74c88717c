"""Shape-sensitivity tests (C21): discrete adjoint vs. eigenvalue
finite differences — the reference's own consistency check
(examples/shape/tutorial_09_shape_sensitivity.jl:65-66,
`findmax(abs.(sens-fd_sens))`), plus postprocessing sanity and an
analytic fixture (duct length change shifts the quarter-wave mode by
dω/dL = -ω/L)."""
import numpy as np
import pytest

from wavesandeigenvalues_jl_tpu.mesh.generate import box_mesh
from wavesandeigenvalues_jl_tpu.models import (
    bound_mass_normalize, discrete_adjoint_shape_sensitivity,
    discretize, forward_finite_differences_shape_sensitivity,
    get_surface_point_masks, normal_sensitivity, normalize_sensitivity,
    surface_normal_vectors)
from wavesandeigenvalues_jl_tpu.nlevp import householder

C0 = 340.0


@pytest.fixture(scope="module")
def duct_problem():
    # closed-open box duct along z: f1 = c/4L (quarter wave)
    mesh = box_mesh(lx=0.2, ly=0.2, lz=1.0, nx=2, ny=2, nz=6)
    dscrp = {"Interior": ("interior", ()),
             "Zmax": ("admittance", ("Y", 1e15))}
    c = np.full(len(mesh.tetrahedra), C0)
    L = discretize(mesh, dscrp, c)
    sol, _, flag = householder(L, 2 * np.pi * (C0 / 4) * 0.95, maxiter=20,
                               tol=1e-11, nev=1, order=2)
    assert flag >= 0
    assert np.isclose(sol.params["ω"].real / 2 / np.pi, C0 / 4, rtol=2e-2)
    return mesh, dscrp, c, L, sol


def test_da_matches_fd(duct_problem):
    mesh, dscrp, c, L, sol = duct_problem
    surf, tri_mask, tet_mask = get_surface_point_masks(mesh)
    # restrict to a handful of points to keep runtime sane
    pick = np.linspace(0, len(surf) - 1, 6).astype(int)
    surf_s = surf[pick]
    tri_s = [tri_mask[i] for i in pick]
    tet_s = [tet_mask[i] for i in pick]
    sens = discrete_adjoint_shape_sensitivity(
        mesh, dscrp, c, surf_s, tri_s, tet_s, L, sol, h=1e-8)
    fd = forward_finite_differences_shape_sensitivity(
        mesh, dscrp, c, surf_s, tri_s, tet_s, L, sol, h=1e-6)
    s, f = sens[:, surf_s], fd[:, surf_s]
    scale = np.abs(f).max()
    assert scale > 0
    assert np.abs(s - f).max() / scale < 5e-3, (s, f)


def test_da_analytic_end_stretch(duct_problem):
    """Moving the z=1 end outward stretches the duct: dω/dL = -ω/L.
    Summing DA sensitivities (z-direction) over all end-face points
    equals the derivative w.r.t. a uniform end displacement."""
    mesh, dscrp, c, L, sol = duct_problem
    surf, tri_mask, tet_mask = get_surface_point_masks(mesh)
    zmax = mesh.points[2].max()
    end = np.isclose(mesh.points[2, surf], zmax)
    idx = np.nonzero(end)[0]
    sens = discrete_adjoint_shape_sensitivity(
        mesh, dscrp, c, surf[idx], [tri_mask[i] for i in idx],
        [tet_mask[i] for i in idx], L, sol, h=1e-8)
    # end-face displacement is not uniform shape change of the interior,
    # but total z-sensitivity approximates -ω/L of the 1-D duct
    w0 = sol.params["ω"]
    total = sens[2, surf[idx]].sum()
    assert np.isclose(total.real, (-w0 / 1.0).real, rtol=0.05), (
        total, -w0)


def test_postprocessing_shapes(duct_problem):
    mesh, dscrp, c, L, sol = duct_problem
    surf, tri_mask, tet_mask = get_surface_point_masks(mesh)
    nvec = surface_normal_vectors(mesh)
    assert nvec.shape == (3, len(mesh.triangles))
    # outward normals at z=zmax point in +z
    zmax_tris = np.isclose(mesh.points[2, mesh.triangles].mean(axis=1),
                           mesh.points[2].max())
    assert np.all(nvec[2, zmax_tris] > 0)
    sens = np.random.default_rng(0).normal(size=(3, mesh.n_points)) \
        + 0j
    normed = normalize_sensitivity(surf, nvec, tri_mask, sens)
    assert normed.shape == (3, len(mesh.triangles))
    assert np.isfinite(normed).all()
    nsens = bound_mass_normalize(surf, nvec, tri_mask, mesh, sens)
    assert nsens.shape == sens.shape
    assert np.isfinite(nsens[:, surf]).all()
    ns = normal_sensitivity(nvec, normed)
    assert ns.shape == (len(mesh.triangles),)
