"""Distributed / device-batched Beyn contour integration.

The premier batching axis of the NLEVP stack (SURVEY §2.9 #2): the
|Γ|·N contour-quadrature solves L(z_j)⁻¹V are independent.  Here they are
(a) assembled on device from the family's stacked layout (coefficient
contraction + scatter), (b) LU-solved as one batched dense solve (MXU),
and (c) reduced into moment matrices with a ``psum`` over the shift axis
of the device mesh.  The dense eigen-tail (SVD + small eig) stays on host
(complex ``eig`` has no TPU lowering).
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..nlevp.family import OperatorFamily
from ..nlevp.solvers import gauss_nodes, moments2eigs, pos_test
from ..ops.sparse import StackedOperator
from ..utils.config import device_complex_dtype


def _family_device_data(L: OperatorFamily, dtype):
    """Family stack as HOST arrays: complex values must stay numpy so jit
    embeds them as program constants — an eagerly-created complex device
    array can never be fetched back under the axon runtime (no complex
    transfers), which breaks constant embedding at trace time."""
    S = L._stack()
    values = S.values.astype(dtype)                       # [K, nnz] host
    rows = np.asarray(S.row_ids(), np.int32)
    cols = np.asarray(S.indices, np.int32)
    return values, rows, cols, S.shape[0]


def _coeff_batch(L: OperatorFamily, zs: np.ndarray) -> np.ndarray:
    """Per-term coefficients at each quadrature node (host, exact)."""
    eig = L.eigval
    saved = L.params[eig]
    out = np.zeros((len(zs), len(L.terms)), dtype=np.complex128)
    for b, z in enumerate(zs):
        L.params[eig] = complex(z)
        out[b] = L.coefficients({})
    L.params[eig] = saved
    return out


def batched_moments(L: OperatorFamily, Gamma, V=None, l=5, K=1, N=16,
                    mesh: Optional[Mesh] = None, axis: str = "shift",
                    dtype=None):
    """Moment matrices A_p = Σ_j w_j z_j^p L(z_j)⁻¹V computed as one batched
    dense LU solve over all quadrature nodes — sharded over ``axis`` when a
    device mesh is given (each chip solves its node subset; the weighted
    sums reduce with psum)."""
    dtype = dtype or device_complex_dtype()
    d = L.size
    if V is None:
        from ..nlevp.solvers import initialize_V
        V = initialize_V(d, l)
    V = np.asarray(V)
    d, l = V.shape
    zs, ws = gauss_nodes(Gamma, N)
    B = len(zs)
    coeffs = _coeff_batch(L, zs)                      # [B, K]
    values, rows, cols, _ = _family_device_data(L, dtype)

    # pad batch to a multiple of the mesh axis size
    n_dev = mesh.shape[axis] if mesh is not None else 1
    Bp = -(-B // n_dev) * n_dev
    cpad = np.zeros((Bp, coeffs.shape[1]), coeffs.dtype)
    cpad[:B] = coeffs
    cpad[B:] = coeffs[0]  # padded solves reuse a regular node (weight 0)
    zpad = np.zeros(Bp, np.complex128)
    zpad[:B] = zs
    wpad = np.zeros(Bp, np.complex128)
    wpad[:B] = ws
    # powers z^p·w for p = 0..2K-1: [Bp, 2K]
    powers = wpad[:, None] * zpad[:, None] ** np.arange(2 * K)[None, :]

    Vr = np.ascontiguousarray(V.real).astype(np.float32 if dtype == np.complex64
                                             else np.float64)
    Vi = np.ascontiguousarray(V.imag).astype(Vr.dtype)
    cr = np.ascontiguousarray(cpad.real).astype(Vr.dtype)
    ci = np.ascontiguousarray(cpad.imag).astype(Vr.dtype)
    pr = np.ascontiguousarray(powers.real).astype(Vr.dtype)
    pi = np.ascontiguousarray(powers.imag).astype(Vr.dtype)

    def node_solve(c_re, c_im, Vc):
        c = jax.lax.complex(c_re, c_im).astype(dtype)
        data = c @ values
        A = jnp.zeros((d, d), dtype).at[rows, cols].set(data)
        return jnp.linalg.solve(A, Vc)

    def moments_local(cr_l, ci_l, pr_l, pi_l, Vr_, Vi_):
        Vc = jax.lax.complex(Vr_, Vi_).astype(dtype)
        X = jax.vmap(node_solve, in_axes=(0, 0, None))(cr_l, ci_l, Vc)
        pw = jax.lax.complex(pr_l, pi_l).astype(dtype)  # [b, 2K]
        Am = jnp.einsum("bp,bil->ilp", pw, X)
        # leave the jitted program as float planes (axon: no complex out)
        return jnp.real(Am), jnp.imag(Am)

    if mesh is None:
        f = jax.jit(moments_local)
        Ar, Ai = f(cr, ci, pr, pi, Vr, Vi)
    else:
        from jax import shard_map

        @jax.jit
        @partial(shard_map, mesh=mesh,
                 in_specs=(P(axis), P(axis), P(axis), P(axis), P(), P()),
                 out_specs=(P(), P()))
        def f(cr_l, ci_l, pr_l, pi_l, Vr_, Vi_):
            Ar, Ai = moments_local(cr_l, ci_l, pr_l, pi_l, Vr_, Vi_)
            return jax.lax.psum(Ar, axis), jax.lax.psum(Ai, axis)

        Ar, Ai = f(cr, ci, pr, pi, Vr, Vi)
    return (np.asarray(Ar) + 1j * np.asarray(Ai)).astype(np.complex128)


def beyn_batched(L: OperatorFamily, Gamma, l=5, K=1, N=16, tol=0.0,
                 rtol=0.0, pos_test_flag=True, mesh: Optional[Mesh] = None,
                 axis: str = "shift", dtype=None):
    """Beyn's algorithm with device-batched (and optionally chip-sharded)
    quadrature (drop-in for nlevp.solvers.beyn; ``tol``/``rtol`` are the
    absolute/relative singular-value cutoffs of the Hankel SVD filter)."""
    d = L.size
    K = max(K, (l + d - 1) // d)
    A = batched_moments(L, Gamma, l=l, K=K, N=N, mesh=mesh, axis=axis,
                        dtype=dtype)
    Om, Pv = moments2eigs([A], tol_sigma=tol, rtol_sigma=rtol)
    if pos_test_flag:
        Om, Pv = pos_test(Om, Pv, Gamma)
    return Om, Pv


__all__ = ["batched_moments", "beyn_batched"]
