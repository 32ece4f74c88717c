"""Device-side restarted GMRES for shifted sparse systems.

The reference hands every shifted solve L(z)x = b to UMFPACK
(SparseArrays.lu — Householder.jl:100, beyn.jl:62-74).  On TPU the
large / row-partitioned regime instead uses matrix-free GMRES(m): the
Arnoldi loop is a fixed-shape `lax.fori_loop` (jit-compiles once per
(n, m)), the matvec is any jittable closure — the BSR Pallas SpMM, the
distributed halo-exchange SpMV, or a plain XLA scatter SpMV — and many
independent shifts batch with `jax.vmap` (the Beyn quadrature axis).

Everything is complex-dtype jax.numpy: XLA lowers complex64/128 matmuls
to split-plane MXU products on TPU; complex never crosses the host
boundary (callers ship float planes and `lax.complex` them on device).

A block-Jacobi right preconditioner built from the assembled diagonal
blocks is provided (`block_jacobi`) — the natural choice for the
RCM-reordered FEM operators whose mass is near the diagonal.
"""
from __future__ import annotations

from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np


def _givens(a, b):
    """Complex Givens rotation zeroing b: returns (c, s) with
    [c  s; -conj(s) c]ᴴ-style application, c real."""
    denom = jnp.sqrt(jnp.abs(a) ** 2 + jnp.abs(b) ** 2)
    safe = jnp.where(denom == 0, 1.0, denom)
    c = jnp.where(denom == 0, 1.0, jnp.abs(a) / safe)
    s = jnp.where(denom == 0, 0.0 + 0.0j,
                  jnp.where(jnp.abs(a) == 0, 1.0 + 0.0j,
                            (a / jnp.where(jnp.abs(a) == 0, 1.0, jnp.abs(a)))
                            * jnp.conj(b) / safe))
    return c, s


@partial(jax.jit, static_argnames=("matvec", "precond", "restart",
                                   "max_restarts"))
def gmres(matvec: Callable, b: jnp.ndarray, x0: Optional[jnp.ndarray] = None,
          tol: float = 1e-8, restart: int = 40, max_restarts: int = 20,
          precond: Optional[Callable] = None):
    """Restarted GMRES(m) for A x = b with an optional RIGHT preconditioner
    (solves A M⁻¹ u = b, x = M⁻¹ u — residuals are true residuals).

    Returns (x, relres, n_restarts).  Fully jit-compiled: the Arnoldi inner
    loop is fixed shape ``restart``; convergence is checked per restart in a
    `lax.while_loop`."""
    dtype = b.dtype
    n = b.shape[0]
    m = restart
    if x0 is None:
        x0 = jnp.zeros_like(b)
    Minv = precond if precond is not None else (lambda v: v)
    bnorm = jnp.linalg.norm(b)
    bnorm = jnp.where(bnorm == 0, 1.0, bnorm)

    def arnoldi_cycle(x):
        r = b - matvec(x)
        beta = jnp.linalg.norm(r)
        V = jnp.zeros((m + 1, n), dtype)
        H = jnp.zeros((m + 1, m), dtype)
        V = V.at[0].set(r / jnp.where(beta == 0, 1.0, beta))
        # Givens-rotated least-squares state
        cs = jnp.zeros(m)
        sn = jnp.zeros(m, dtype)
        g = jnp.zeros(m + 1, dtype).at[0].set(beta.astype(dtype))

        def body(j, carry):
            V, H, cs, sn, g = carry
            w = matvec(Minv(V[j]))
            # modified Gram-Schmidt (one pass; fixed shape over all m+1
            # rows, rows > j are zero so the dots vanish)
            h = jnp.einsum("kn,n->k", jnp.conj(V), w)
            mask = (jnp.arange(m + 1) <= j)
            h = jnp.where(mask, h, 0.0)
            w = w - jnp.einsum("k,kn->n", h, V)
            hn = jnp.linalg.norm(w)
            V2 = V.at[j + 1].set(w / jnp.where(hn == 0, 1.0, hn))
            Hcol = h.at[j + 1].set(hn.astype(dtype))
            # apply accumulated rotations to the new column
            def rot(i, col):
                hi = cs[i] * col[i] + sn[i] * col[i + 1]
                hip = -jnp.conj(sn[i]) * col[i] + cs[i] * col[i + 1]
                return col.at[i].set(hi).at[i + 1].set(hip)
            Hcol = jax.lax.fori_loop(0, j, rot, Hcol)
            c, s = _givens(Hcol[j], Hcol[j + 1])
            Hcol = Hcol.at[j].set(c * Hcol[j] + s * Hcol[j + 1]).at[j + 1].set(0)
            g2 = g.at[j + 1].set(-jnp.conj(s) * g[j]).at[j].set(c * g[j]
                                                                + s * g[j + 1])
            return (V2, H.at[:, j].set(Hcol), cs.at[j].set(c),
                    sn.at[j].set(s), g2)

        V, H, cs, sn, g = jax.lax.fori_loop(0, m, body, (V, H, cs, sn, g))
        # back substitution on the m×m triangular H
        def back(i_rev, y):
            i = m - 1 - i_rev
            num = g[i] - jnp.dot(H[i, :], y)
            return y.at[i].set(num / jnp.where(H[i, i] == 0, 1.0, H[i, i]))
        y = jax.lax.fori_loop(0, m, back, jnp.zeros(m, dtype))
        x_new = x + Minv(jnp.einsum("k,kn->n", y, V[:m]))
        return x_new

    def cond(state):
        x, it, res = state
        return jnp.logical_and(it < max_restarts, res > tol)

    def step(state):
        x, it, _ = state
        x = arnoldi_cycle(x)
        res = jnp.linalg.norm(b - matvec(x)) / bnorm
        return (x, it + 1, res)

    res0 = jnp.linalg.norm(b - matvec(x0)) / bnorm
    x, its, res = jax.lax.while_loop(cond, step, (x0, jnp.array(0), res0))
    return x, res, its


def block_jacobi(A, bs: int = 64):
    """Right preconditioner v ↦ D⁻¹v from the inverted [bs,bs] diagonal
    blocks of a host CSR matrix; returns a jittable closure over device
    arrays (the standard smoother for RCM-ordered FEM operators)."""
    n = A.shape[0]
    nb = (n + bs - 1) // bs
    npad = nb * bs
    D = np.zeros((nb, bs, bs), dtype=A.data.dtype)
    rows, cols, vals = A.to_coo()
    sel = (rows // bs) == (cols // bs)
    r, c, v = rows[sel], cols[sel], vals[sel]
    D[r // bs, r % bs, c % bs] = v
    # regularize empty pad rows
    for b in range(nb):
        d = np.abs(np.diagonal(D[b]))
        fix = np.where(d == 0)[0]
        D[b, fix, fix] = 1.0
    Dinv = np.linalg.inv(D)
    Dinv_dev = jnp.asarray(Dinv)

    def apply(v):
        vp = jnp.zeros(npad, v.dtype).at[:n].set(v)
        out = jnp.einsum("bij,bj->bi", Dinv_dev, vp.reshape(nb, bs))
        return out.reshape(-1)[:n]

    return apply


def solve_shifted_batch(family, zs, B, tol: float = 1e-8, restart: int = 60,
                        max_restarts: int = 50, bs: int = 64):
    """Solve L(z_s) X_s = B_s for a batch of shifts on device — the Beyn
    quadrature axis (beyn.jl:62-74) as one vmapped GMRES.

    ``family``: an OperatorFamily; ``zs``: [S] complex shifts; ``B``:
    [S, n] right-hand sides.  Uses the union-pattern stacked operator (one
    gather/scatter structure for every shift) and per-shift block-Jacobi
    preconditioners.  Returns [S, n] solutions (host complex)."""
    S = family._stack()
    vals = jnp.asarray(S.values)            # [K, nnz]
    rows = jnp.asarray(S.row_ids(), jnp.int32)
    cols = jnp.asarray(S.indices, jnp.int32)
    n = S.shape[0]

    zs = np.asarray(zs)
    coeffs = np.zeros((len(zs), vals.shape[0]), np.complex128)
    eig = family.eigval
    z_saved = family.params[eig]
    for i, z in enumerate(zs):
        family.params[eig] = complex(z)
        coeffs[i] = family.coefficients({})
    family.params[eig] = z_saved
    cdev = jnp.asarray(coeffs)

    # per-shift block-Jacobi: build on host (sparse diag extraction)
    nb = (n + bs - 1) // bs
    npad = nb * bs
    r_h, c_h = np.asarray(S.row_ids()), np.asarray(S.indices)
    sel = (r_h // bs) == (c_h // bs)
    vals_h = np.asarray(S.values)
    Dinv = np.empty((len(zs), nb, bs, bs), np.complex128)
    for i in range(len(zs)):
        data = coeffs[i] @ vals_h
        D = np.zeros((nb, bs, bs), np.complex128)
        np.add.at(D, (r_h[sel] // bs, r_h[sel] % bs, c_h[sel] % bs),
                  data[sel])
        for b in range(nb):
            d = np.abs(np.diagonal(D[b]))
            fix = np.where(d == 0)[0]
            D[b, fix, fix] = 1.0
        Dinv[i] = np.linalg.inv(D)
    Dinv_dev = jnp.asarray(Dinv)

    def solve_one(c, Dinv_s, b_s):
        data = c @ vals

        def matvec(x):
            return jnp.zeros(n, data.dtype).at[rows].add(data * x[cols])

        def precond(v):
            vp = jnp.zeros(npad, v.dtype).at[:n].set(v)
            out = jnp.einsum("bij,bj->bi", Dinv_s, vp.reshape(nb, bs))
            return out.reshape(-1)[:n]

        x, res, its = gmres(matvec, b_s, tol=tol, restart=restart,
                            max_restarts=max_restarts, precond=precond)
        return x, res

    X, res = jax.vmap(solve_one)(cdev, Dinv_dev, jnp.asarray(B))
    return np.asarray(X), np.asarray(res)


__all__ = ["gmres", "block_jacobi", "solve_shifted_batch"]
