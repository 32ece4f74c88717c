"""Native C++ host-kernel tests: equivalence with the numpy fallbacks."""
import numpy as np
import pytest

from wavesandeigenvalues_jl_tpu import native
from wavesandeigenvalues_jl_tpu.ops.reorder import (adjacency_from_csr,
                                                    bandwidth, cuthill_mckee,
                                                    permute_csr)
from wavesandeigenvalues_jl_tpu.ops.sparse import CSR, coo_sum_duplicates

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native toolchain unavailable")


def _random_csr(n=400, density=0.01, seed=0):
    rng = np.random.default_rng(seed)
    m = int(n * n * density)
    r = rng.integers(0, n, m)
    c = rng.integers(0, n, m)
    v = rng.standard_normal(m) + 1j * rng.standard_normal(m)
    # ensure nonzero diagonal for structural sanity
    d = np.arange(n)
    return CSR.from_coo(np.concatenate([r, d]), np.concatenate([c, d]),
                        np.concatenate([v, np.ones(n) + 0j]), (n, n))


def test_native_coo_dedup_matches_numpy():
    rng = np.random.default_rng(1)
    m, n = 100000, 300
    r = rng.integers(0, n, m)
    c = rng.integers(0, n, m)
    v = rng.standard_normal(m) + 1j * rng.standard_normal(m)
    out = native.coo_dedup(r, c, v)
    assert out is not None
    rn, cn, vn = out
    # numpy reference path (force it by bypassing the size gate)
    key = r * n + c
    order = np.argsort(key, kind="stable")
    uniq, start = np.unique(key[order], return_index=True)
    sums = np.add.reduceat(v[order], start)
    keep = sums != 0
    assert np.array_equal(rn, (uniq // n)[keep])
    assert np.array_equal(cn, (uniq % n)[keep])
    assert np.allclose(vn, sums[keep], atol=1e-12)


def test_native_rcm_reduces_bandwidth():
    A = _random_csr()
    perm = cuthill_mckee(A)
    assert sorted(perm) == list(range(A.shape[0]))
    # RCM should not make the bandwidth worse on a banded-ish matrix
    n = A.shape[0]
    rng = np.random.default_rng(2)
    r = np.arange(n - 3).repeat(3)
    c = r + rng.integers(1, 4, len(r))
    v = np.ones(len(r)) + 0j
    B = CSR.from_coo(np.concatenate([r, c, np.arange(n)]),
                     np.concatenate([c, r, np.arange(n)]),
                     np.concatenate([v, v, np.ones(n) + 0j]), (n, n))
    # scramble, then ask RCM to recover a small bandwidth
    sh = rng.permutation(n)
    Bs = permute_csr(B, sh)
    perm = cuthill_mckee(Bs)
    assert bandwidth(permute_csr(Bs, perm)) <= 3 * bandwidth(B) + 3


def test_native_csr_spmm_matches_dense():
    A = _random_csr(n=250, seed=3)
    rng = np.random.default_rng(4)
    X = rng.standard_normal((250, 7)) + 1j * rng.standard_normal((250, 7))
    Y = native.csr_spmm(A.indptr, A.indices, A.data, X)
    assert Y is not None
    assert np.allclose(Y, A.to_dense() @ X, atol=1e-12)
    y1 = native.csr_spmm(A.indptr, A.indices, A.data, X[:, 0])
    assert np.allclose(y1, A.to_dense() @ X[:, 0], atol=1e-12)


def test_assembly_path_uses_dedup_consistently():
    """CSR.from_coo must give identical matrices through either dedup path."""
    rng = np.random.default_rng(5)
    m, n = (1 << 15) + 17, 200  # above the native-offload gate
    r = rng.integers(0, n, m)
    c = rng.integers(0, n, m)
    v = rng.standard_normal(m) + 1j * rng.standard_normal(m)
    A = CSR.from_coo(r, c, v, (n, n)).to_dense()
    D = np.zeros((n, n), np.complex128)
    np.add.at(D, (r, c), v)
    assert np.allclose(A, D, atol=1e-12)
