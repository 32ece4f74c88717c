"""Bloch-symmetry stack: half-cell expansion, unit-vs-full eigenvalue
equality (the reference's tutorial-07 invariant), axis handling, P2, and
eigenvector expansion."""
import os

import numpy as np
import pytest

from wavesandeigenvalues_jl_tpu.mesh import read_mesh
from wavesandeigenvalues_jl_tpu.mesh.annular import bloch_expand, extend_mesh
from wavesandeigenvalues_jl_tpu.mesh.generate import annular_halfcell
from wavesandeigenvalues_jl_tpu.models import discretize
from wavesandeigenvalues_jl_tpu.nlevp import mslp

NTNU = "/root/reference/docs/src/NTNU_12.msh"
DSCRP = {"Interior": ("interior", ()), "Outlet": ("admittance", ("Y", 1e15))}


def _c(mesh, c0=340.0):
    return mesh.generate_field(lambda x, y, z: c0 * np.ones_like(z))


def _unit_full(DOS=6, with_axis=False, **kw):
    half = annular_halfcell(DOS=DOS, with_axis=with_axis, **kw)
    doms = [("Interior", "full"), ("Outlet", "full")]
    return (extend_mesh(half, doms, unit=True),
            extend_mesh(half, doms, unit=False))


def test_extend_mesh_counts():
    half = annular_halfcell(DOS=6, nr=2, nphi=2, nz=5)
    doms = [("Interior", "full"), ("Outlet", "full"), ("Inlet", "unit")]
    unit = extend_mesh(half, doms, unit=True)
    full = extend_mesh(half, doms, unit=False)
    dos = unit.dos
    assert dos.DOS == 6
    assert dos.naxis == 0
    # unit cell = 2 half cells; full = DOS unit cells sharing sector planes
    assert unit.n_points == dos.naxis + dos.nxsector + dos.nxbloch
    assert full.n_points == dos.naxis + dos.nxsector * dos.DOS
    assert len(full.tetrahedra) == 2 * 6 * len(half.tetrahedra)
    # per-sector domains exist for :unit degree
    assert "Inlet#0" in unit.domains
    assert all(f"Inlet#{s}" in full.domains for s in range(6))
    # per-cell simplex counts (the reference documents these SymInfo
    # fields, Meshutils.jl:22-23, but never populates them)
    assert dos.nxsector_tet == 2 * len(half.tetrahedra)
    assert full.dos.nxsector_tet == len(full.tetrahedra) // 6
    assert dos.nxsector_tri == full.dos.nxsector_tri \
        == len(full.triangles) // 6 > 0


@pytest.mark.parametrize("with_axis", [False, True])
def test_unit_equals_full_p1(with_axis):
    """Bloch-reduced unit-cell eigenvalues equal the full-annulus values
    (tutorial_07…md:138-139) — including the naxis>0 essential-BC path."""
    unit, full = _unit_full(DOS=4 if with_axis else 6, with_axis=with_axis,
                            nr=2, nphi=2, nz=4)
    l = discretize(unit, DSCRP, _c(unit), b="b")
    L = discretize(full, DSCRP, _c(full))
    for b, guess in ((0, 170.0), (1, 330.0)):
        l.params["b"] = float(b)
        sol, _, _ = mslp(l, guess, tol=1e-11, scale=2 * np.pi, maxiter=25)
        fu = sol.params["ω"] / 2 / np.pi
        solF, _, _ = mslp(L, fu.real, tol=1e-11, scale=2 * np.pi, maxiter=25)
        ff = solF.params["ω"] / 2 / np.pi
        assert abs(fu - ff) < 1e-8, (b, fu, ff)


def test_unit_equals_full_p2():
    unit, full = _unit_full(DOS=4, with_axis=True, nr=2, nphi=2, nz=3)
    l = discretize(unit, DSCRP, _c(unit), order="quad", b="b")
    L = discretize(full, DSCRP, _c(full), order="quad")
    l.params["b"] = 1.0
    sol, _, _ = mslp(l, 330.0, tol=1e-11, scale=2 * np.pi, maxiter=25)
    fu = sol.params["ω"] / 2 / np.pi
    solF, _, _ = mslp(L, fu.real, tol=1e-11, scale=2 * np.pi, maxiter=25)
    assert abs(fu - solF.params["ω"] / 2 / np.pi) < 1e-8


def test_bloch_expand_satisfies_full_operator():
    """The expanded unit-cell eigenvector is an eigenvector of the FULL
    operator (v_s = v·exp(2πi b s/DOS), Bloch.jl:120-143)."""
    unit, full = _unit_full(DOS=6, nr=2, nphi=2, nz=4)
    l = discretize(unit, DSCRP, _c(unit), b="b")
    L = discretize(full, DSCRP, _c(full))
    l.params["b"] = 1.0
    sol, _, _ = mslp(l, 330.0, tol=1e-11, scale=2 * np.pi, maxiter=25)
    v = bloch_expand(unit, sol, "b")
    assert len(v) == full.n_points
    om = sol.params["ω"]
    A = L(om).to_dense()
    res = np.linalg.norm(A @ v) / (np.linalg.norm(v)
                                   * np.linalg.norm(A, "fro"))
    assert res < 1e-12


def test_bloch_expand_p2_satisfies_full_operator():
    """P2 expansion (beyond the reference's P1-only Bloch.jl:120-143):
    point AND edge DOFs of a quad unit-cell eigenvector expand to an
    eigenvector of the full quad operator."""
    unit, full = _unit_full(DOS=4, with_axis=True, nr=2, nphi=2, nz=3)
    l = discretize(unit, DSCRP, _c(unit), order="quad", b="b")
    L = discretize(full, DSCRP, _c(full), order="quad")
    l.params["b"] = 1.0
    sol, _, flag = mslp(l, 330.0, tol=1e-11, scale=2 * np.pi, maxiter=25)
    assert flag == 0
    v = bloch_expand(unit, sol, "b", full_mesh=full)
    assert len(v) == full.n_points + len(full.lines)
    om = sol.params["ω"]
    A = L(om).to_dense()
    res = np.linalg.norm(A @ v) / (np.linalg.norm(v)
                                   * np.linalg.norm(A, "fro"))
    assert res < 1e-12
    # sector-to-sector phase continuity of the edge DOFs
    npt = full.n_points
    assert np.linalg.norm(v[npt:]) > 0


@pytest.mark.skipif(not os.path.exists(NTNU), reason="reference mesh absent")
def test_ntnu_unit_cell():
    """NTNU annular combustor (BASELINE.md): DOS=12 detected from the
    half-cell; b=1 unit-cell modes near the literature's ≈1124 Hz
    plenum-dominant first-order mode."""
    mesh = read_mesh(NTNU, scale=1.0)
    doms = [("Interior", "full"), ("Inlet", "full"), ("Outlet_high", "full"),
            ("Outlet_low", "full"), ("Flame", "unit")]
    unit = extend_mesh(mesh, doms, unit=True)
    assert unit.dos.DOS == 12
    assert len(unit.tetrahedra) == 2 * len(mesh.tetrahedra)
    assert all(f"Flame#{s}" in unit.domains for s in range(1))
    sos = lambda x, y, z: np.where(z < 0.415, 347.0, 850.0)
    dscrp = {"Interior": ("interior", ()),
             "Outlet_high": ("admittance", ("Y_in", 0.0)),
             "Outlet_low": ("admittance", ("Y_out", 0.0))}
    # per-tet centroid c field = the tutorial's generate_field default
    l = discretize(unit, dscrp, unit.generate_field(sos, order="const"),
                   b="b")
    l.params["b"] = 1.0
    sol, n, flag = mslp(l, 1124.0, tol=1e-10, scale=2 * np.pi, maxiter=20)
    f = sol.params["ω"].real / 2 / np.pi
    # plenum-dominant first-order mode: 1123.61 Hz on this P1 mesh
    # (Indlekofer et al. literature value ≈1124 Hz, tutorial_07…md:84-90)
    assert abs(f - 1123.61) < 0.05
    A = l(sol.params["ω"]).to_dense()
    assert (np.linalg.norm(A @ sol.v) / np.linalg.norm(sol.v)
            / np.linalg.norm(A, "fro")) < 1e-12


@pytest.mark.skipif(not os.path.exists(NTNU), reason="reference mesh absent")
def test_ntnu_unit_equals_full_annulus():
    """Bloch headline check (tutorial_07…md:138-139): the b=1 unit-cell
    eigenfrequency equals the full-annulus (12-sector, 23k-point)
    eigenfrequency — here to ~1e-12 Hz."""
    mesh = read_mesh(NTNU, scale=1.0)
    doms = [("Interior", "full"), ("Inlet", "full"), ("Outlet_high", "full"),
            ("Outlet_low", "full"), ("Flame", "unit")]
    unit = extend_mesh(mesh, doms, unit=True)
    full = extend_mesh(mesh, doms, unit=False)
    sos = lambda x, y, z: np.where(z < 0.415, 347.0, 850.0)
    dscrp = {"Interior": ("interior", ()),
             "Outlet_high": ("admittance", ("Y_in", 0.0)),
             "Outlet_low": ("admittance", ("Y_out", 0.0))}
    l = discretize(unit, dscrp, unit.generate_field(sos, order="const"),
                   b="b")
    l.params["b"] = 1.0
    sol_u, _, flag_u = mslp(l, 1124.0, tol=1e-10, scale=2 * np.pi, maxiter=20)
    f_u = sol_u.params["ω"] / 2 / np.pi
    Lf = discretize(full, dscrp, full.generate_field(sos, order="const"))
    sol_f, _, flag_f = mslp(Lf, f_u.real, tol=1e-10, scale=2 * np.pi,
                            maxiter=20)
    f_f = sol_f.params["ω"] / 2 / np.pi
    assert flag_u == 0 and flag_f == 0
    assert abs(f_u - f_f) < 1e-8
    assert abs(f_u.real - 1123.61) < 0.05


def test_bloch_sweep_batched_matches_serial():
    """The device-batched b-sweep (SURVEY §2.9 axis 5, VERDICT r3 #8)
    reproduces the per-b serial mslp results: one batched device
    iteration per Newton step for the whole azimuthal family instead of
    DOS separate eigensolves."""
    from wavesandeigenvalues_jl_tpu.nlevp.bloch_sweep import bloch_mode_sweep

    unit, _full = _unit_full(DOS=6, nr=2, nphi=2, nz=4)
    l = discretize(unit, DSCRP, _c(unit), b="b")
    bvals = [0.0, 1.0, 2.0, 3.0]

    serial = {}
    for b in bvals:
        l.params["b"] = b
        sol, _, flag = mslp(l, 1124.0, tol=1e-10, scale=2 * np.pi,
                            maxiter=25)
        assert flag >= 0
        serial[b] = sol.params["ω"]

    swept = bloch_mode_sweep(l, 1124.0, bvals, tol=1e-10,
                             scale=2 * np.pi, maxiter=25)
    assert len(swept) == len(bvals)
    for b, (sol, its, flag) in zip(bvals, swept):
        assert flag >= 0
        # same branch, same digits (both solvers end in the c128 polish)
        assert abs(sol.params["ω"] - serial[b]) < 1e-6 * abs(serial[b]), (
            b, sol.params["ω"], serial[b])
        # residual-verified eigenpair
        l.params["b"] = b
        A = l(sol.params["ω"]).to_dense()
        res = (np.linalg.norm(A @ sol.v) / np.linalg.norm(sol.v)
               / np.linalg.norm(A, "fro"))
        assert res < 1e-10, (b, res)
