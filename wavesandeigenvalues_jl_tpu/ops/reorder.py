"""Bandwidth-reducing row reordering (Cuthill–McKee) and contiguous row
partitioning.

FEM matrices from unstructured tet meshes are reordered so that (a) dense
blocks of the BSR device format are well filled and (b) contiguous row
partitions have halo overlap only with neighboring partitions, letting the
distributed SpMV exchange halos with nearest-neighbor collectives over ICI
(see ../parallel/dist_spmv.py)."""
from __future__ import annotations

from collections import deque
from typing import Tuple

import numpy as np

from .sparse import CSR


def adjacency_from_csr(A: CSR):
    rows = np.repeat(np.arange(A.shape[0]), np.diff(A.indptr))
    cols = A.indices.astype(np.int64)
    mask = rows != cols
    # symmetrize
    r = np.concatenate([rows[mask], cols[mask]])
    c = np.concatenate([cols[mask], rows[mask]])
    order = np.lexsort((c, r))
    r, c = r[order], c[order]
    keep = np.ones(len(r), bool)
    keep[1:] = (r[1:] != r[:-1]) | (c[1:] != c[:-1])
    r, c = r[keep], c[keep]
    indptr = np.zeros(A.shape[0] + 1, np.int64)
    np.add.at(indptr, r + 1, 1)
    return np.cumsum(indptr), c


def cuthill_mckee(A: CSR, reverse: bool = True) -> np.ndarray:
    """Permutation ``perm`` (new→old) reducing the bandwidth of A.

    Uses the native C++ BFS (native/host_kernels.cpp) when available; the
    numpy/deque implementation below is the fallback."""
    n = A.shape[0]
    indptr, nbrs = adjacency_from_csr(A)
    if reverse:
        from .. import native
        perm = native.rcm(indptr, nbrs)
        if perm is not None:
            return perm
    degree = np.diff(indptr)
    visited = np.zeros(n, bool)
    perm = np.empty(n, np.int64)
    pos = 0
    order_seed = np.argsort(degree)
    for seed in order_seed:
        if visited[seed]:
            continue
        visited[seed] = True
        queue = deque([seed])
        while queue:
            u = queue.popleft()
            perm[pos] = u
            pos += 1
            nb = nbrs[indptr[u]:indptr[u + 1]]
            nb = nb[~visited[nb]]
            if len(nb):
                visited[nb] = True
                for v in nb[np.argsort(degree[nb])]:
                    queue.append(v)
    if reverse:
        perm = perm[::-1].copy()
    return perm


def permute_csr(A: CSR, perm: np.ndarray) -> CSR:
    """Symmetric permutation PAPᵀ; perm maps new index → old index."""
    inv = np.empty_like(perm)
    inv[perm] = np.arange(len(perm))
    rows, cols, vals = A.to_coo()
    return CSR.from_coo(inv[rows], inv[cols], vals, A.shape)


def bandwidth(A: CSR) -> int:
    rows = np.repeat(np.arange(A.shape[0]), np.diff(A.indptr))
    if len(rows) == 0:
        return 0
    return int(np.abs(rows - A.indices).max())


__all__ = ["cuthill_mckee", "permute_csr", "bandwidth", "adjacency_from_csr"]
