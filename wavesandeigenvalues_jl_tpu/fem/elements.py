"""FEM element kernels for P1/P2 simplices — batched over all elements.

The reference ships ~2600 lines of hand-expanded closed-form local matrices
(/root/reference/src/FEM/FEM.jl).  Here every kernel is a single einsum over
precomputed reference-element quadrature tables, batched across the whole
element set at once — the natural shape for XLA/TPU (one [ne, k, k] tensor
per operator instead of ne small-matrix calls).  The quadrature (collapsed
Duffy/Gauss tensor rule, exact for polynomial degree ≥ 7) integrates every
P1/P2 mass/stiffness/boundary/source integrand exactly, so results agree
with the reference's symbolic tables to machine precision.

Local DOF ordering matches aggregate_elements (FEM.jl:84-166):
  tet  P1: [v1 v2 v3 v4]
  tet  P2: [v1..v4, e12 e13 e14 e23 e24 e34]
  tri  P1: [v1 v2 v3]
  tri  P2: [v1 v2 v3, e12 e13 e23]
with barycentric coordinates (x, y, z, a=1-x-y-z) assigned to vertices
(1,2,3,4) as in the reference shape functions f1/f2 (FEM.jl:2611-2633).
"""
from __future__ import annotations

from functools import lru_cache
from typing import Tuple

import numpy as np


# ---------------------------------------------------------------------------
# reference-element quadrature (generated, exact to degree 7)


@lru_cache(maxsize=None)
def _gauss01(n: int):
    x, w = np.polynomial.legendre.leggauss(n)
    return (x + 1) / 2, w / 2


@lru_cache(maxsize=None)
def tet_quadrature(n: int = 4):
    """Collapsed (Duffy) tensor rule on the unit tetrahedron
    {x,y,z>0, x+y+z<1}; exact for total degree 2n-1 ≥ 7 with n=4."""
    g, w = _gauss01(n)
    pts, wts = [], []
    for i, (u, wu) in enumerate(zip(g, w)):
        for j, (v, wv) in enumerate(zip(g, w)):
            for k, (t, wt) in enumerate(zip(g, w)):
                x = u
                y = v * (1 - u)
                z = t * (1 - u) * (1 - v)
                jac = (1 - u) ** 2 * (1 - v)
                pts.append((x, y, z))
                wts.append(wu * wv * wt * jac)
    return np.asarray(pts), np.asarray(wts)


@lru_cache(maxsize=None)
def tri_quadrature(n: int = 4):
    """Collapsed tensor rule on the unit triangle {x,y>0, x+y<1}."""
    g, w = _gauss01(n)
    pts, wts = [], []
    for u, wu in zip(g, w):
        for v, wv in zip(g, w):
            x = u
            y = v * (1 - u)
            pts.append((x, y))
            wts.append(wu * wv * (1 - u))
    return np.asarray(pts), np.asarray(wts)


# ---------------------------------------------------------------------------
# reference shape functions (barycentric λ = (x, y, z, 1-x-y-z))


def tet_basis(order: int, pts: np.ndarray):
    """Values N[q, k] and reference gradients dN[q, k, 3] at points [q, 3]."""
    x, y, z = pts[:, 0], pts[:, 1], pts[:, 2]
    a = 1 - x - y - z
    one = np.ones_like(x)
    zero = np.zeros_like(x)
    if order == 1:
        N = np.stack([x, y, z, a], axis=1)
        dN = np.stack([
            np.stack([one, zero, zero], 1),
            np.stack([zero, one, zero], 1),
            np.stack([zero, zero, one], 1),
            np.stack([-one, -one, -one], 1)], axis=1)
        return N, dN
    if order == 2:
        lam = [x, y, z, a]
        dlam = [np.stack([one, zero, zero], 1), np.stack([zero, one, zero], 1),
                np.stack([zero, zero, one], 1), np.stack([-one, -one, -one], 1)]
        edges = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)]
        N = [(2 * l - 1) * l for l in lam]
        dN = [(4 * l - 1)[:, None] * dl for l, dl in zip(lam, dlam)]
        for i, j in edges:
            N.append(4 * lam[i] * lam[j])
            dN.append(4 * (lam[i][:, None] * dlam[j] + lam[j][:, None] * dlam[i]))
        return np.stack(N, 1), np.stack(dN, 1)
    raise ValueError(f"unsupported tet order {order}")


def tri_basis(order: int, pts: np.ndarray):
    x, y = pts[:, 0], pts[:, 1]
    a = 1 - x - y
    if order == 1:
        return np.stack([x, y, a], axis=1)
    if order == 2:
        lam = [x, y, a]
        edges = [(0, 1), (0, 2), (1, 2)]
        N = [(2 * l - 1) * l for l in lam]
        for i, j in edges:
            N.append(4 * lam[i] * lam[j])
        return np.stack(N, 1)
    raise ValueError(f"unsupported tri order {order}")


# ---------------------------------------------------------------------------
# batched geometry (CooTrafo, FEM.jl:2-21)


def tet_trafo(points: np.ndarray, tets: np.ndarray):
    """J[ne,3,3] with columns x_i - x_4, inverse, |det| (CooTrafo)."""
    p = points
    v4 = p[:, tets[:, 3]]
    # J[e] columns are edge vectors: [ne, 3(coord), 3(col)]
    J = np.empty((tets.shape[0], 3, 3))
    for c in range(3):
        J[:, :, c] = (p[:, tets[:, c]] - v4).T
    Jinv = np.linalg.inv(J)
    det = np.linalg.det(J)
    return J, Jinv, det


def tri_trafo(points: np.ndarray, tris: np.ndarray):
    """Surface triangle trafo: 3rd column = unit normal; |det| = 2·area."""
    p = points
    v3 = p[:, tris[:, 2]]
    e1 = (p[:, tris[:, 0]] - v3).T
    e2 = (p[:, tris[:, 1]] - v3).T
    n = np.cross(e1, e2)
    nn = np.linalg.norm(n, axis=1, keepdims=True)
    n = n / nn
    J = np.stack([e1, e2, n], axis=2)
    Jinv = np.linalg.inv(J)
    det = np.linalg.det(J)
    return J, Jinv, det


# ---------------------------------------------------------------------------
# batched operator kernels


def tet_mass(points, tets, order: int, c=None) -> np.ndarray:
    """[ne,k,k] mass matrices ∫ (c²-weighted optional) φi φj
    (s43v1u1 / s43v2u2 / *c1 variants, FEM.jl:704-940).

    ``c`` of shape [ne] (constant per element — multiplies directly) or
    [ne, 4] (P1-interpolated field; integrand weight Σ c_k λ_k)."""
    pts, w = tet_quadrature()
    N, _ = tet_basis(order, pts)
    N1, _ = tet_basis(1, pts)
    _, _, det = tet_trafo(points, tets)
    absdet = np.abs(det)
    if c is None:
        M = np.einsum("q,qi,qj->ij", w, N, N)
        return absdet[:, None, None] * M[None]
    c = np.asarray(c)
    if c.ndim == 1:
        M = np.einsum("q,qi,qj->ij", w, N, N)
        return (absdet * c)[:, None, None] * M[None]
    cq = np.einsum("ek,qk->eq", c, N1)  # field at quadrature points
    return np.einsum("e,eq,q,qi,qj->eij", absdet, cq, w, N, N)


def tet_stiffness(points, tets, order: int, c2=None) -> np.ndarray:
    """[ne,k,k] stiffness ∫ c² ∇φi·∇φj (s43nv1nu1[cc1], s43nv2nu2[cc1],
    FEM.jl:1745-2400).  ``c2``: None, [ne] (c² constant), or [ne,4]
    (per-vertex c, weight (Σ c_k λ_k)²)."""
    pts, w = tet_quadrature()
    _, dN = tet_basis(order, pts)
    N1, _ = tet_basis(1, pts)
    _, Jinv, det = tet_trafo(points, tets)
    absdet = np.abs(det)
    # physical gradients: g[e,q,i,:] = dN[q,i,:] @ Jinv[e]
    if c2 is None:
        A = np.einsum("emn,eon->emo", Jinv, Jinv)  # Jinv Jinv^T
        K = np.einsum("q,qim,emo,qjo->eij", w, dN, A, dN)
        return absdet[:, None, None] * K
    c2 = np.asarray(c2)
    A = np.einsum("emn,eon->emo", Jinv, Jinv)
    if c2.ndim == 1:
        K = np.einsum("q,qim,emo,qjo->eij", w, dN, A, dN)
        return (absdet * c2)[:, None, None] * K
    cq = np.einsum("ek,qk->eq", c2, N1) ** 2
    return np.einsum("e,eq,q,qim,emo,qjo->eij", absdet, cq, w, dN, A, dN)


def tri_mass(points, tris, order: int, c=None) -> np.ndarray:
    """[ne,k,k] boundary mass ∫ c φi φj over surface triangles
    (s33v1u1[c1], s33v2u2[c1], FEM.jl:435-560)."""
    pts, w = tri_quadrature()
    N = tri_basis(order, pts)
    N1 = tri_basis(1, pts)
    _, _, det = tri_trafo(points, tris)
    absdet = np.abs(det)
    if c is None:
        M = np.einsum("q,qi,qj->ij", w, N, N)
        return absdet[:, None, None] * M[None]
    c = np.asarray(c)
    if c.ndim == 1:
        M = np.einsum("q,qi,qj->ij", w, N, N)
        return (absdet * c)[:, None, None] * M[None]
    cq = np.einsum("ek,qk->eq", c, N1)
    return np.einsum("e,eq,q,qi,qj->eij", absdet, cq, w, N, N)


def tet_source(points, tets, order: int) -> np.ndarray:
    """[ne,k] volume source vectors ∫ φi (s43v1/s43v2, FEM.jl:2429-2436)."""
    pts, w = tet_quadrature()
    N, _ = tet_basis(order, pts)
    _, _, det = tet_trafo(points, tets)
    v = np.einsum("q,qi->i", w, N)
    return np.abs(det)[:, None] * v[None]


def tri_source(points, tris, order: int, c=None) -> np.ndarray:
    """[ne,k] wall source ∫ c φi (s33v1[c1]/s33v2[c1], FEM.jl:2557-2608)."""
    pts, w = tri_quadrature()
    N = tri_basis(order, pts)
    N1 = tri_basis(1, pts)
    _, _, det = tri_trafo(points, tris)
    absdet = np.abs(det)
    if c is None:
        v = np.einsum("q,qi->i", w, N)
        return absdet[:, None] * v[None]
    c = np.asarray(c)
    if c.ndim == 1:
        v = np.einsum("q,qi->i", w, N)
        return (absdet * c)[:, None] * v[None]
    cq = np.einsum("ek,qk->eq", c, N1)
    return np.einsum("e,eq,q,qi->ei", absdet, cq, w, N)


def tet_grad_at_point(points, tet: np.ndarray, order: int, n_ref, x_ref):
    """Directional-derivative row: n_ref·∇φi evaluated at physical point
    x_ref inside one tetrahedron (s43nv1rx/s43nv2rx, FEM.jl:2442-2516).
    Returns [k] vector."""
    p = points
    v4 = p[:, tet[3]]
    J = np.stack([p[:, tet[0]] - v4, p[:, tet[1]] - v4, p[:, tet[2]] - v4],
                 axis=1)
    Jinv = np.linalg.inv(J)
    loc = Jinv @ (np.asarray(x_ref, dtype=np.float64) - v4)
    _, dN = tet_basis(order, loc[None, :])
    n_ref = np.asarray(n_ref, dtype=np.float64)
    # physical gradient = dN @ Jinv;  row_i = (dN_i @ Jinv) · n_ref
    return np.einsum("im,mn,n->i", dN[0], Jinv, n_ref)


def shape_values_at_point(points, tet: np.ndarray, order: int, x_ref):
    """Shape-function values at a physical point (f1/f2, FEM.jl:2611-2633)."""
    p = points
    v4 = p[:, tet[3]]
    J = np.stack([p[:, tet[0]] - v4, p[:, tet[1]] - v4, p[:, tet[2]] - v4],
                 axis=1)
    Jinv = np.linalg.inv(J)
    loc = Jinv @ (np.asarray(x_ref, dtype=np.float64) - v4)
    N, _ = tet_basis(order, loc[None, :])
    return N[0]


__all__ = ["tet_quadrature", "tri_quadrature", "tet_basis", "tri_basis",
           "tet_trafo", "tri_trafo", "tet_mass", "tet_stiffness", "tri_mass",
           "tet_source", "tri_source", "tet_grad_at_point",
           "shape_values_at_point"]
