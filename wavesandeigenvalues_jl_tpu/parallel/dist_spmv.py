"""Distributed SpMV / operator-family application over a device mesh.

Row-partitioned ELL shards (see :mod:`.partition`) are mapped over a mesh
axis with ``shard_map``; the halo columns each shard references are
delivered by two nearest-neighbor ``ppermute`` shifts (left tail / right
head) over ICI — overlapped with the local SpMV by XLA's scheduler.  Dot
products / norms reduce with ``psum`` on the row axis.  A second mesh axis
batches independent evaluation points (contour-quadrature shifts,
parameter sweeps) with no communication at all.

This is the distributed layer the reference lacks (SURVEY §2.9): its
Arnoldi/Beyn hot loops are sequences of exactly these primitives."""
from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .partition import RowPartitionedEll


def halo_exchange(x_local: jnp.ndarray, halo: int, axis: str) -> jnp.ndarray:
    """Extend an owned shard [m, ...] to the window [H | m | H | 0-pad]
    (along the leading row axis; trailing axes, e.g. an RHS-panel axis,
    ride along — ONE ppermute moves the whole panel) with
    nearest-neighbor ppermute shifts (open boundary: edge shards receive
    zeros).  A halo wider than one shard (H > m, e.g. poorly-banded
    patterns) escalates to ⌈H/m⌉ hops per side; after Cuthill–McKee
    reordering of FEM operators one hop is the common case."""
    m = x_local.shape[0]
    pad = jnp.zeros((1,) + x_local.shape[1:], x_local.dtype)
    n_parts = jax.lax.psum(1, axis)
    if halo == 0:
        return jnp.concatenate([x_local, pad])
    nh = -(-halo // m)
    segs = []
    for hop in range(nh, 0, -1):      # shards hop to my left, far first
        segs.append(jax.lax.ppermute(
            x_local, axis, [(i, i + hop) for i in range(n_parts - hop)]))
    segs.append(x_local)
    for hop in range(1, nh + 1):      # shards hop to my right
        segs.append(jax.lax.ppermute(
            x_local, axis, [(i + hop, i) for i in range(n_parts - hop)]))
    ext = jnp.concatenate(segs)       # [(2nh+1)·m, ...]
    window = ext[nh * m - halo: nh * m + m + halo]
    return jnp.concatenate([window, pad])


def local_spmv(vals: jnp.ndarray, cols: jnp.ndarray, x_ext: jnp.ndarray):
    """Owned-rows ELL product against the extended window."""
    return jnp.sum(vals * x_ext[cols], axis=-1)


def local_spmm(vals: jnp.ndarray, cols: jnp.ndarray, X_ext: jnp.ndarray):
    """Owned-rows ELL panel product: vals [m, w], X_ext [window+1, r]
    → [m, r] (the row-sharded SpMM of the Beyn probe panel / block
    Arnoldi, SURVEY §2.9 #3)."""
    return jnp.einsum("mw,mwr->mr", vals, X_ext[cols])


def make_dist_spmv(part: RowPartitionedEll, mesh: Mesh, axis: str = "row",
                   dtype=None):
    """Build a jitted distributed matvec y = A x on sharded vectors.

    Returns (spmv, shard, unshard): ``spmv`` maps a [P*m] device array
    (sharded on ``axis``) to the product; shard/unshard convert host
    vectors.  For K-term families, pass coefficient vectors to
    ``spmv(x, coeffs)`` — the term contraction happens shard-locally."""
    K = part.values.shape[0]
    dtype = dtype or part.values.dtype
    vals_all = jnp.asarray(part.values.astype(dtype))      # [K, P, m, w]
    cols_all = jnp.asarray(part.cols)                      # [P, m, w]
    halo = part.halo

    vspec = NamedSharding(mesh, P(axis))
    dspec = NamedSharding(mesh, P(None, axis))

    from jax import shard_map

    @partial(shard_map, mesh=mesh,
             in_specs=(P(None, axis, None, None), P(axis, None, None),
                       P(axis), P(None)),
             out_specs=P(axis))
    def _spmv(vals, cols, x, coeffs):
        # shard-local shapes: vals [K, 1, m, w], cols [1, m, w], x [m]
        data = jnp.tensordot(coeffs, vals[:, 0], axes=(0, 0))  # [m, w]
        x_ext = halo_exchange(x, halo, axis)
        return local_spmv(data, cols[0], x_ext)

    @jax.jit
    def spmv(x, coeffs=None):
        if coeffs is None:
            c = jnp.zeros(K, dtype).at[0].set(1.0)
        else:
            c = jnp.asarray(coeffs, dtype)
        return _spmv(vals_all, cols_all, x, c)

    def shard(x):
        return jax.device_put(part.shard_vector(np.asarray(x)).reshape(-1),
                              vspec)

    def unshard(y):
        return part.unshard_vector(np.asarray(y).reshape(part.n_parts,
                                                         part.m))

    return spmv, shard, unshard


def make_dist_spmm(part: RowPartitionedEll, mesh: Mesh, axis: str = "row",
                   dtype=None, nrhs: int = 8):
    """Row-sharded multi-RHS SpMM Y = A X for X [n, r] panels: ONE halo
    ppermute moves the whole panel, the local product is a single
    einsum.  Returns (spmm, shard, unshard) where shard/unshard convert
    host [n, r] panels to/from [P·m, r] row-sharded device arrays.
    ``spmm(X, coeffs)`` contracts a K-term family shard-locally first."""
    K = part.values.shape[0]
    dtype = dtype or part.values.dtype
    vals_all = jnp.asarray(part.values.astype(dtype))      # [K, P, m, w]
    cols_all = jnp.asarray(part.cols)                      # [P, m, w]
    halo = part.halo

    vspec = NamedSharding(mesh, P(axis, None))

    from jax import shard_map

    @partial(shard_map, mesh=mesh,
             in_specs=(P(None, axis, None, None), P(axis, None, None),
                       P(axis, None), P(None)),
             out_specs=P(axis, None))
    def _spmm(vals, cols, X, coeffs):
        data = jnp.tensordot(coeffs, vals[:, 0], axes=(0, 0))  # [m, w]
        X_ext = halo_exchange(X, halo, axis)
        return local_spmm(data, cols[0], X_ext)

    @jax.jit
    def spmm(X, coeffs=None):
        if coeffs is None:
            c = jnp.zeros(K, dtype).at[0].set(1.0)
        else:
            c = jnp.asarray(coeffs, dtype)
        return _spmm(vals_all, cols_all, X, c)

    def shard(X):
        X = np.asarray(X)
        Xp = np.zeros((part.n_parts * part.m, X.shape[1]), X.dtype)
        Xp[:part.n] = X[part.perm]
        return jax.device_put(Xp, vspec)

    def unshard(Y):
        flat = np.asarray(Y)[:part.n]
        out = np.empty_like(flat)
        out[part.perm] = flat
        return out

    return spmm, shard, unshard


def dist_dot(x, y, mesh: Mesh, axis: str = "row"):
    """Global conjugated dot product of row-sharded vectors."""
    from jax import shard_map

    @partial(shard_map, mesh=mesh, in_specs=(P(axis), P(axis)),
             out_specs=P())
    def _dot(a, b):
        return jax.lax.psum(jnp.sum(jnp.conj(a) * b), axis)

    return _dot(x, y)


__all__ = ["halo_exchange", "local_spmv", "local_spmm",
           "make_dist_spmv", "make_dist_spmm", "dist_dot"]
