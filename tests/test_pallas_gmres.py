"""The single-op Pallas dense GMRES kernel and the fused local solver.

On the CPU test backend the kernel runs in interpret mode — the same
program text the TPU compiles (the Mosaic-specific formulations are plain
jnp either way)."""
import numpy as np
import pytest

from wavesandeigenvalues_jl_tpu.ops.gmres import _block_diag_inv
from wavesandeigenvalues_jl_tpu.ops.pallas_gmres import build_dense_gmres


def _problem(N, seed=0):
    rng = np.random.default_rng(seed)
    A = (rng.standard_normal((N, N)) + 1j * rng.standard_normal((N, N)))
    A = A * 0.05 + np.diag(3.0 + rng.standard_normal(N)
                           + 1j * 0.3 * rng.standard_normal(N))
    b = rng.standard_normal(N) + 1j * rng.standard_normal(N)
    return A, b


def _precondition(G, b, bs=128):
    N = G.shape[0]
    rows, cols = np.meshgrid(np.arange(N), np.arange(N), indexing="ij")
    D = _block_diag_inv(rows.ravel(), cols.ravel(), G.ravel(), N, bs)
    nb = N // bs
    P = np.einsum("bij,bjk->bik", D, G.reshape(nb, bs, N)).reshape(N, N)
    b0 = np.einsum("bij,bj->bi", D, b.reshape(nb, bs)).reshape(N)
    return P, b0


def test_dense_gmres_two_sides():
    N, m = 256, 30
    A, b = _problem(N)
    Ps, b0s, Gs = [], [], []
    for G in (A, A.conj().T):
        P, b0 = _precondition(G, b)
        Ps.append(P)
        b0s.append(b0)
        Gs.append(G)
    P = np.stack(Ps).astype(np.complex64)
    b0 = np.stack(b0s).astype(np.complex64)
    f = build_dense_gmres(N, m, cycles=2, sides=2, interpret=True)
    xr, xi = f(np.ascontiguousarray(P.real), np.ascontiguousarray(P.imag),
               np.ascontiguousarray(b0.real), np.ascontiguousarray(b0.imag))
    x = np.asarray(xr) + 1j * np.asarray(xi)
    for s in range(2):
        rel = np.linalg.norm(Gs[s] @ x[s] - b) / np.linalg.norm(b)
        assert rel < 5e-6, f"side {s}: relres {rel}"


def test_fused_local_matches_host_on_gallery():
    """mslp via the fused-device engine == host engine on the 1-D Rijke
    gallery problem (the fused path runs with interpret-mode pallas on
    CPU)."""
    from wavesandeigenvalues_jl_tpu.nlevp import mslp
    from wavesandeigenvalues_jl_tpu.nlevp.gallery import rijke_tube
    from wavesandeigenvalues_jl_tpu.nlevp.fused_local import try_fused_local
    from wavesandeigenvalues_jl_tpu.utils.config import set_solve_backend

    L, _grid = rijke_tube()
    L.params["n"], L.params["τ"] = 1.0, 0.5
    sol_h, its_h, flag_h = mslp(L, 1.0 + 0.3j, maxiter=30, tol=1e-10)
    om_host = sol_h.params[L.eigval]
    assert flag_h == 0

    L2, _g2 = rijke_tube()
    L2.params["n"], L2.params["τ"] = 1.0, 0.5
    out = try_fused_local(L2, 1.0 + 0.3j, maxiter=30, tol=1e-10, relax=1.0,
                          lam_tol=np.inf, v0=None, v0_adj=None,
                          output=False, scale=1)
    assert out is not None, "fused path refused the gallery problem"
    sol_d, its_d, flag_d = out
    om_dev = sol_d.params[L2.eigval]
    assert abs(om_dev - om_host) < 1e-8 * max(abs(om_host), 1.0)
    # eigentriple quality: residual of the returned eigenpair
    A = L2(om_dev)
    r = np.linalg.norm(A @ sol_d.v) / np.linalg.norm(sol_d.v)
    rh = np.linalg.norm(L(om_host) @ sol_h.v) / np.linalg.norm(sol_h.v)
    assert r < max(10 * rh, 1e-6)
