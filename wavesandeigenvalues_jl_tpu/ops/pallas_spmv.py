"""Pallas TPU kernels: block-sparse-row SpMM/SpMV on the MXU.

Layout (see :class:`..ops.device.BsrOperator`): after Cuthill–McKee
reordering the FEM matrix is packed into dense [bs×bs] blocks with a
per-block-row padded list of block-column indices.

Kernel (one grid program per block row):
* the row's blocks are streamed HBM→VMEM by the Pallas pipeline
  (double-buffered via BlockSpec index maps);
* the RHS block panel X[nb, bs, r] is VMEM-resident; the scalar-prefetched
  block-column indices select panels by dynamic indexing — no gather is
  ever materialized in HBM;
* each contribution is a split-plane complex matmul on the MXU
  (4 real [bs,bs]@[bs,r] products):

      Y[row] = Σ_k  blocks[row, k] @ X[cols[row, k]]

Multi-RHS (r = 128 default) is the shape the NLEVP workloads feed the
operator (Beyn probe panels, block Arnoldi).  The VMEM-resident panel
bounds the per-kernel problem size to ~8k rows at r=128 (a Bloch-reduced
sector or one row-partition shard — the distributed SpMV in
``parallel/dist_spmv.py`` tiles larger operators across chips, which is
the intended regime); larger single-chip panels fall back to
:func:`bsr_spmm_xla`, and plain SpMV uses the fused-XLA ELL path in
:mod:`.device`.

Complex data never crosses the host↔device boundary as complex (the axon
TPU runtime rejects complex transfers): public entry points take/return
numpy and ship (real, imag) float32 planes."""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .device import BsrOperator
from ..utils.hostxfer import to_numpy


def _bsr_spmm_kernel(precision, cols_ref, br_re, br_im, x_re, x_im, y_re,
                     y_im):
    """grid program = one block row.  Shapes: br_* [1, maxb, bs, bs]
    (pipeline-streamed), x_* [nb, bs, r] (VMEM-resident), y_* [1, bs, r].

    ``precision``: MXU f32 emulation — Precision.HIGHEST (default; ~1e-7
    rel, 0.037 ms on the bench operator) or "bf16x3", a manual 3-pass
    split-bf16 decomposition hi·hi + hi·lo + lo·hi.  Measured on v5e the
    manual 3-pass is NOT faster (0.040 ms, ~8e-6 rel): the in-kernel
    hi/lo extractions cost more VPU time than the saved MXU passes, so
    HIGHEST stays the default."""
    import jax.experimental.pallas as pl

    row = pl.program_id(0)
    maxb = br_re.shape[1]
    bs = br_re.shape[3]
    r = x_re.shape[2]

    if precision == "bf16x3":
        def dot(a, b):
            ah = a.astype(jnp.bfloat16)
            al = (a - ah.astype(jnp.float32)).astype(jnp.bfloat16)
            bh = b.astype(jnp.bfloat16)
            bl = (b - bh.astype(jnp.float32)).astype(jnp.bfloat16)
            d = lambda u, v: jnp.dot(u, v,
                                     preferred_element_type=jnp.float32)
            return d(ah, bh) + d(ah, bl) + d(al, bh)
    else:
        dot = lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.float32,
                                   precision=precision)

    def body(k, acc):
        acc_re, acc_im = acc
        c = cols_ref[row, k]
        xr = x_re[c]
        xi = x_im[c]
        Ar = br_re[0, k]
        Ai = br_im[0, k]
        acc_re = acc_re + dot(Ar, xr) - dot(Ai, xi)
        acc_im = acc_im + dot(Ar, xi) + dot(Ai, xr)
        return acc_re, acc_im

    acc = (jnp.zeros((bs, r), jnp.float32), jnp.zeros((bs, r), jnp.float32))
    # int32 loop bounds keep every index 32-bit (global x64 mode would make
    # the induction variable i64, which Mosaic rejects)
    acc_re, acc_im = jax.lax.fori_loop(jnp.int32(0), jnp.int32(maxb), body,
                                       acc)
    y_re[0] = acc_re
    y_im[0] = acc_im


@partial(jax.jit, static_argnums=(0, 6, 7))
def _bsr_spmm_jit(shape_meta, cols, blocks_re, blocks_im, x_re, x_im,
                  interpret=False, precision=None):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nbr, maxb, bs, nb, r = shape_meta
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nbr,),
        in_specs=[
            pl.BlockSpec((1, maxb, bs, bs), lambda row, cols: (row, 0, 0, 0)),
            pl.BlockSpec((1, maxb, bs, bs), lambda row, cols: (row, 0, 0, 0)),
            pl.BlockSpec((nb, bs, r), lambda row, cols: (0, 0, 0)),
            pl.BlockSpec((nb, bs, r), lambda row, cols: (0, 0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, bs, r), lambda row, cols: (row, 0, 0)),
            pl.BlockSpec((1, bs, r), lambda row, cols: (row, 0, 0)),
        ),
    )
    out_shape = (jax.ShapeDtypeStruct((nbr, bs, r), jnp.float32),
                 jax.ShapeDtypeStruct((nbr, bs, r), jnp.float32))
    if precision is None:
        precision = jax.lax.Precision.HIGHEST
    return pl.pallas_call(
        partial(_bsr_spmm_kernel, precision),
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(cols, blocks_re, blocks_im, x_re, x_im)


class PallasBsrSpmm:
    """Device-resident BSR SpMM: Y = A X, complex64 semantics, X width r."""

    def __init__(self, bsr: BsrOperator, nrhs: int = 128,
                 interpret: bool = False, precision=None):
        self.bs = bsr.bs
        self.n = bsr.n
        self.nrhs = nrhs
        self.nbr = bsr.blocks.shape[0]
        self.maxb = bsr.blocks.shape[1]
        self.cols = jnp.asarray(bsr.block_cols, jnp.int32)
        b = bsr.blocks.astype(np.complex64)
        self.blocks_re = jnp.asarray(b.real)
        self.blocks_im = jnp.asarray(b.imag)
        self.interpret = interpret
        self.precision = precision
        self.nnz_blocks = int(np.count_nonzero(bsr.block_mask))
        self.flops = 8.0 * self.nnz_blocks * bsr.bs ** 2 * nrhs

    @property
    def meta(self):
        return (self.nbr, self.maxb, self.bs, self.n // self.bs, self.nrhs)

    def apply_split(self, x_re, x_im):
        """f32 planes [nb, bs, r] -> ([nbr, bs, r], [nbr, bs, r]).

        Traced under x64=off: all operands are f32/i32 and Mosaic rejects
        the i64 index arithmetic global x64 mode would insert."""
        with jax.enable_x64(False):
            return _bsr_spmm_jit(self.meta, self.cols, self.blocks_re,
                                 self.blocks_im, x_re, x_im, self.interpret,
                                 self.precision)

    def split_panels(self, X):
        """Host complex [n_logical, r] -> device f32 panel planes."""
        X = np.asarray(X)
        Xp = np.zeros((self.n, self.nrhs), np.complex64)
        Xp[:X.shape[0]] = X
        Xb = Xp.reshape(-1, self.bs, self.nrhs)
        return (jnp.asarray(np.ascontiguousarray(Xb.real), jnp.float32),
                jnp.asarray(np.ascontiguousarray(Xb.imag), jnp.float32))

    def __call__(self, X):
        """X [n_logical, r] complex (host) -> Y [n_logical, r] (host)."""
        n_logical = np.asarray(X).shape[0]
        y_re, y_im = self.apply_split(*self.split_panels(X))
        Y = to_numpy(y_re) + 1j * to_numpy(y_im)
        return Y.reshape(-1, self.nrhs)[:n_logical]


def bsr_spmm_xla(bsr: BsrOperator):
    """XLA (non-Pallas) batched-matmul formulation of the same BSR product:
    portability fallback (any size) + CPU-testable reference for the Pallas
    kernel.  Split-plane I/O."""
    b = bsr.blocks.astype(np.complex64)
    blocks_re = jnp.asarray(b.real)
    blocks_im = jnp.asarray(b.imag)
    cols = jnp.asarray(bsr.block_cols, jnp.int32)
    bs, n = bsr.bs, bsr.n

    @jax.jit
    def apply_split(Xr, Xi):
        hi = jax.lax.Precision.HIGHEST
        ein = lambda a, b: jnp.einsum("rkij,rkjm->rim", a, b, precision=hi)
        Xgr = Xr[cols]
        Xgi = Xi[cols]
        Yr = ein(blocks_re, Xgr) - ein(blocks_im, Xgi)
        Yi = ein(blocks_re, Xgi) + ein(blocks_im, Xgr)
        return Yr, Yi

    def apply(X):
        X = np.asarray(X)
        if X.ndim == 1:
            X = X[:, None]
        nl, r = X.shape
        Xp = np.zeros((n, r), np.complex64)
        Xp[:nl] = X
        Xb = Xp.reshape(-1, bs, r)
        Yr, Yi = apply_split(
            jnp.asarray(np.ascontiguousarray(Xb.real), jnp.float32),
            jnp.asarray(np.ascontiguousarray(Xb.imag), jnp.float32))
        return (to_numpy(Yr) + 1j * to_numpy(Yi)).reshape(-1, r)[:nl]

    apply.apply_split = apply_split
    return apply


__all__ = ["PallasBsrSpmm", "bsr_spmm_xla"]
