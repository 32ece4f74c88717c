"""Windowed indexed-BSR SpMM (ops/window_spmm.py): correctness on the
union-pattern Helmholtz operator and on banded random operators, both
through the interpret-mode kernel (the same program text the TPU
compiles)."""
import numpy as np
import pytest
import scipy.sparse as sp

from wavesandeigenvalues_jl_tpu.ops.sparse import CSR
from wavesandeigenvalues_jl_tpu.ops.window_spmm import (TILE, WindowBsr,
                                                        WindowSpmm)


def _banded(n, band, seed=0, deg=12):
    rng = np.random.default_rng(seed)
    ii = np.repeat(np.arange(n), deg)
    jj = np.clip(ii + rng.integers(-band, band + 1, len(ii)), 0, n - 1)
    v = rng.standard_normal(len(ii)) + 1j * rng.standard_normal(len(ii))
    A = sp.csr_matrix((v, (ii, jj)), shape=(n, n))
    A.sum_duplicates()
    return A


@pytest.mark.parametrize("n,band", [(900, 300), (2500, 800)])
def test_window_spmm_banded(n, band):
    A = _banded(n, band)
    wb = WindowBsr.from_csr(CSR(A.indptr, A.indices,
                                A.data.astype(np.complex128), A.shape))
    assert wb.slot_fill > 0.2
    op = WindowSpmm(wb, nrhs=16, interpret=True)
    rng = np.random.default_rng(1)
    X = (rng.standard_normal((n, 16))
         + 1j * rng.standard_normal((n, 16))).astype(np.complex64)
    Y = op(X)
    Yref = A @ X
    assert np.linalg.norm(Y - Yref) / np.linalg.norm(Yref) < 5e-6


def test_window_spmm_rejects_wide_band():
    """Bandwidth beyond the 3-tile window must fail loudly, not silently
    truncate."""
    n = 4 * TILE
    ii = np.array([0, n - 1])
    jj = np.array([n - 1, 0])
    A = sp.csr_matrix((np.ones(2), (ii, jj)), shape=(n, n))
    A = (A + sp.eye(n)).tocsr()
    with pytest.raises(ValueError, match="bandwidth"):
        WindowBsr.from_csr(CSR(A.indptr, A.indices,
                               A.data.astype(np.complex128), A.shape))


def test_window_spmm_helmholtz_operator():
    """End-to-end on the assembled Rijke-cylinder Helmholtz operator
    after Cuthill–McKee (the bench path)."""
    from wavesandeigenvalues_jl_tpu.mesh.generate import rijke_mesh
    from wavesandeigenvalues_jl_tpu.models import discretize
    from wavesandeigenvalues_jl_tpu.ops.reorder import (cuthill_mckee,
                                                        permute_csr)

    mesh = rijke_mesh(n_rings=2, nz_cold=12, nz_hot=12)
    c = mesh.generate_field(lambda x, y, z: 340.0 * np.ones_like(z))
    L = discretize(mesh, {"Interior": ("interior", ()),
                          "Outlet": ("admittance", ("Y", 1e15))}, c)
    L.params["ω"] = 2 * np.pi * 300.0
    A = L.assemble({})
    Ar = permute_csr(A, cuthill_mckee(A))
    wb = WindowBsr.from_csr(Ar)
    op = WindowSpmm(wb, nrhs=8, interpret=True)
    rng = np.random.default_rng(2)
    n = A.shape[0]
    X = (rng.standard_normal((n, 8))
         + 1j * rng.standard_normal((n, 8))).astype(np.complex64)
    Ah = sp.csr_matrix((Ar.data, Ar.indices, Ar.indptr), shape=Ar.shape)
    Y = op(X)
    assert (np.linalg.norm(Y - Ah @ X)
            / np.linalg.norm(Ah @ X)) < 5e-6


def test_chunk_spmm2_matches_host():
    """r5 chunked 8x128 window kernel (ops/window_spmm2.py) vs host CSR."""
    import numpy as np
    import scipy.sparse as sp
    from wavesandeigenvalues_jl_tpu.ops.sparse import CSR
    from wavesandeigenvalues_jl_tpu.ops.window_spmm2 import ChunkBsr, ChunkSpmm

    rng = np.random.default_rng(1)
    n, band, nnz_row = 2200, 350, 10
    rows, cols = [], []
    for i in range(n):
        lo, hi = max(0, i - band), min(n, i + band)
        c = rng.choice(np.arange(lo, hi), size=min(nnz_row, hi - lo),
                       replace=False)
        rows += [i] * len(c)
        cols += list(c)
    rows = np.array(rows)
    cols = np.array(cols)
    vals = rng.standard_normal(len(rows)) + 1j * rng.standard_normal(len(rows))
    A = CSR.from_coo(rows, cols, vals, (n, n))
    cb = ChunkBsr.from_csr(A)
    assert cb.a_bytes < 0.6 * 8.0 * (3 * 8 * 128 * 128 * cb.ntiles * 8)
    op = ChunkSpmm(cb, nrhs=128, interpret=True)
    X = (rng.standard_normal((n, 128))
         + 1j * rng.standard_normal((n, 128))).astype(np.complex64)
    Y = op(X)
    Ah = sp.csr_matrix((A.data, A.indices, A.indptr), shape=A.shape)
    ref = Ah @ X
    rel = np.linalg.norm(Y[:n] - ref) / np.linalg.norm(ref)
    assert rel < 5e-6
