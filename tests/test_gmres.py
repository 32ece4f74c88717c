"""Device GMRES tests: convergence to direct-solve accuracy, right
preconditioning, and the vmapped multi-shift batch (the Beyn quadrature
axis on device)."""
import jax.numpy as jnp
import numpy as np

from wavesandeigenvalues_jl_tpu.nlevp import gallery
from wavesandeigenvalues_jl_tpu.ops.gmres import (block_jacobi, gmres,
                                                  solve_shifted_batch)
from wavesandeigenvalues_jl_tpu.ops.linsolve import factorize
from wavesandeigenvalues_jl_tpu.ops.sparse import CSR


def _rijke_matrix(n=96, z=1.0 + 0.5j):
    L, grid = gallery.rijke_tube(n)
    return L, L(z)


def test_gmres_matches_direct():
    L, A = _rijke_matrix()
    n = A.shape[0]
    rng = np.random.default_rng(0)
    b = rng.standard_normal(n) + 1j * rng.standard_normal(n)
    x_ref = factorize(A).solve(b)

    Ad = jnp.asarray(A.to_dense())
    bd = jnp.asarray(b)
    matvec = lambda x: Ad @ x
    # the gallery operator has kappa ~ 5e16 (Y=1e15 penalty rows):
    # block-Jacobi absorbs the row scaling, without it f64 GMRES stalls
    M = block_jacobi(A, bs=32)
    x, res, its = gmres(matvec, bd, tol=1e-10, restart=110, max_restarts=5,
                        precond=M)
    assert float(res) < 1e-9
    assert np.linalg.norm(np.asarray(x) - x_ref) / np.linalg.norm(x_ref) < 1e-7


def test_gmres_block_jacobi_accelerates():
    L, A = _rijke_matrix(128)
    n = A.shape[0]
    rng = np.random.default_rng(1)
    b = rng.standard_normal(n) + 1j * rng.standard_normal(n)
    Ad = jnp.asarray(A.to_dense())
    matvec = lambda x: Ad @ x
    bd = jnp.asarray(b)
    M = block_jacobi(A, bs=32)
    x_p, res_p, its_p = gmres(matvec, bd, tol=1e-10, restart=30,
                              max_restarts=40, precond=M)
    x_n, res_n, its_n = gmres(matvec, bd, tol=1e-10, restart=30,
                              max_restarts=40)
    assert float(res_p) < 1e-9
    assert int(its_p) <= int(its_n)
    x_ref = factorize(A).solve(b)
    assert np.linalg.norm(np.asarray(x_p) - x_ref) / np.linalg.norm(x_ref) < 1e-6


def test_solve_shifted_batch():
    """Batched shifted solves (one vmapped GMRES over the quadrature axis)
    agree with per-shift direct solves."""
    L, _ = _rijke_matrix(96)
    n = L.size
    rng = np.random.default_rng(2)
    zs = np.array([0.8 + 0.4j, 1.0 + 0.5j, 1.3 + 0.2j])
    B = rng.standard_normal((3, n)) + 1j * rng.standard_normal((3, n))
    X, res = solve_shifted_batch(L, zs, B, tol=1e-10, restart=110,
                                 max_restarts=5, bs=32)
    assert np.all(res < 1e-8)
    for i, z in enumerate(zs):
        x_ref = factorize(L(z)).solve(B[i])
        err = np.linalg.norm(X[i] - x_ref) / np.linalg.norm(x_ref)
        assert err < 1e-6, (i, err)
