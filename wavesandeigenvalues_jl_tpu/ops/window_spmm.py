"""Windowed indexed-BSR SpMM — the round-4 fill-efficient device kernel.

The round-3 kernel (:mod:`.pallas_spmv`) streams a maxb-padded block tensor
whose 128×128 blocks are ~3% filled, so the HBM-bound large-operator apply
moves ~35× redundant bytes (BENCH_r03: 69.5 GB/s of the v5e's 819 GB/s).
This kernel removes both padding axes:

* **A-blocks stream compactly.**  After Cuthill–McKee the operator's
  bandwidth is ≪ n (547 for the 57k-DOF bench operator), so each 1024-row
  tile only touches a 3-tile window of X.  Nonzero 128×128 blocks are
  stored per (tile, block-row) with only the per-block-row slot padding
  (≈20%), not the global maxb padding.
* **X streams as a sliding 3-tile window** with *static* BlockSpec index
  maps (t−1, t, t+1 clamped): measured on the axon v5e, *data-dependent*
  index maps serialize the Pallas pipeline (~µs per DMA), while static maps
  pipeline at full bandwidth.  Total X traffic is 3× the panel, independent
  of fill.
* **The gather is in-kernel**: each block's window column selects one of
  the three resident window thirds (``lax.switch``) and a ``pl.ds``
  dynamic slice inside it — the only data-dependent operation, measured at
  ~0.2–0.3 µs per block, amortized over a 128×128·r MXU contraction.

Complex arithmetic is split-plane (axon rejects complex transfers): four
real matmuls per block at ``precision=HIGHEST``.

Reference counterpart: the WavesAndEigenvalues.jl compute model streams
exactly nnz through SuiteSparse CSR kernels (reference beyn.jl:62-74);
this layout is the TPU analogue — streamed bytes ≈ nonzero payload +
3× panel.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Optional

import numpy as np

from .sparse import CSR

TILE = 1024          # rows per window tile (window = 3 tiles in VMEM)
BS = 128             # block size (MXU native)
RPT = TILE // BS     # block-rows per tile


@dataclass
class WindowBsr:
    """Host-side layout: per (tile, block-row) padded slot lists.

    ``blocks``   [ntiles, RPT, mslot, BS, BS] complex — zero-padded slots
    ``wcol``     [ntiles, RPT, mslot] int32 — window block-col (0..3*RPT-1)
    ``nslot``    [ntiles, RPT] int32 — valid slots per block-row
    """

    blocks: np.ndarray
    wcol: np.ndarray
    nslot: np.ndarray
    ntiles: int
    mslot: int
    n: int            # logical dimension
    npad: int         # ntiles * TILE
    nnz: int

    @classmethod
    def from_csr(cls, A: CSR) -> "WindowBsr":
        import scipy.sparse as sp
        n = A.shape[0]
        ntiles = max((n + TILE - 1) // TILE, 3)
        npad = ntiles * TILE
        As = sp.csr_matrix((A.data, A.indices, A.indptr), shape=A.shape)
        As.resize((npad, npad))
        B = sp.bsr_matrix(As, blocksize=(BS, BS))
        B.sort_indices()
        nbr = npad // BS
        counts = np.diff(B.indptr)
        bcols = B.indices.astype(np.int64)
        brows = np.repeat(np.arange(nbr), counts)
        # window start tile per tile t: wlo = clip(t-1, 0, ntiles-3)
        t_of = brows // RPT
        wlo = np.clip(t_of - 1, 0, ntiles - 3)
        rel = bcols - wlo * RPT
        if rel.min() < 0 or rel.max() >= 3 * RPT:
            raise ValueError(
                "operator bandwidth exceeds the 3-tile window — "
                "apply Cuthill-McKee reordering first "
                f"(rel col range [{rel.min()}, {rel.max()}])")
        mslot = int(counts.max()) if len(counts) else 1
        blocks = np.zeros((ntiles, RPT, mslot, BS, BS), B.data.dtype)
        wcol = np.zeros((ntiles, RPT, mslot), np.int32)
        nslot = counts.reshape(ntiles, RPT).astype(np.int32)
        fill = np.zeros(nbr, np.int64)
        data = B.data
        for b in range(len(brows)):
            i = brows[b]
            t, rr = divmod(i, RPT)
            k = fill[i]
            blocks[t, rr, k] = data[b]
            wcol[t, rr, k] = rel[b]
            fill[i] += 1
        wb = cls(blocks, wcol, nslot, ntiles, mslot, n, npad,
                 int(A.nnz))
        if wb.slot_fill < 0.05:
            import warnings
            warnings.warn(
                f"WindowBsr slot_fill collapsed to {wb.slot_fill:.3f}: "
                "one dense block-row inflates the slot padding for every "
                "(tile, block-row), re-introducing the padded-stream "
                "inefficiency this layout exists to remove — consider the "
                "plain BSR kernel (ops.pallas_spmv) for this operator",
                stacklevel=2)
        return wb

    @property
    def padded_block_bytes(self) -> float:
        """HBM bytes of the streamed A planes (f32 re+im) per apply."""
        return 8.0 * self.blocks.size

    @property
    def slot_fill(self) -> float:
        return float(self.nslot.sum()) / (self.ntiles * RPT * self.mslot)


def _make_kernel(mslot: int, r: int, precision):
    import jax
    import jax.numpy as jnp
    import jax.experimental.pallas as pl

    def kernel(wcol_ref, nslot_ref, a_re, a_im, xm_re, xm_im, x0_re,
               x0_im, xp_re, xp_im, y_re, y_im):
        k = pl.program_id(2)

        @pl.when(k == 0)
        def _():
            y_re[0, 0] = jnp.zeros_like(y_re[0, 0])
            y_im[0, 0] = jnp.zeros_like(y_im[0, 0])

        t = pl.program_id(0)
        rr = pl.program_id(1)

        @pl.when(k < nslot_ref[t, rr])
        def _():
            cc = wcol_ref[t, rr, k]
            third = cc // RPT
            off = (cc % RPT) * BS

            def rd(ref):
                return lambda: ref[0, pl.ds(off, BS), :]

            xg_r = jax.lax.switch(third, [rd(xm_re), rd(x0_re), rd(xp_re)])
            xg_i = jax.lax.switch(third, [rd(xm_im), rd(x0_im), rd(xp_im)])
            dot = lambda a, b: jnp.dot(a, b,
                                       preferred_element_type=jnp.float32,
                                       precision=precision)
            Ar = a_re[0, 0, 0]
            Ai = a_im[0, 0, 0]
            y_re[0, 0] += dot(Ar, xg_r) - dot(Ai, xg_i)
            y_im[0, 0] += dot(Ar, xg_i) + dot(Ai, xg_r)

    return kernel


def _build_call(ntiles: int, mslot: int, r: int, interpret: bool,
                precision):
    import jax
    import jax.numpy as jnp
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nt = ntiles
    kernel = _make_kernel(mslot, r, precision)

    def wlo(t):
        return jnp.clip(t - 1, 0, nt - 3)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,     # wcol, nslot
        grid=(nt, RPT, mslot),
        in_specs=[
            pl.BlockSpec((1, 1, 1, BS, BS),
                         lambda t, i, k, wc, ns: (t, i, k, 0, 0)),
            pl.BlockSpec((1, 1, 1, BS, BS),
                         lambda t, i, k, wc, ns: (t, i, k, 0, 0)),
            pl.BlockSpec((1, TILE, r),
                         lambda t, i, k, wc, ns: (wlo(t), 0, 0)),
            pl.BlockSpec((1, TILE, r),
                         lambda t, i, k, wc, ns: (wlo(t), 0, 0)),
            pl.BlockSpec((1, TILE, r),
                         lambda t, i, k, wc, ns: (wlo(t) + 1, 0, 0)),
            pl.BlockSpec((1, TILE, r),
                         lambda t, i, k, wc, ns: (wlo(t) + 1, 0, 0)),
            pl.BlockSpec((1, TILE, r),
                         lambda t, i, k, wc, ns: (wlo(t) + 2, 0, 0)),
            pl.BlockSpec((1, TILE, r),
                         lambda t, i, k, wc, ns: (wlo(t) + 2, 0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, BS, r),
                         lambda t, i, k, wc, ns: (t, i, 0, 0)),
            pl.BlockSpec((1, 1, BS, r),
                         lambda t, i, k, wc, ns: (t, i, 0, 0)),
        ),
    )
    out_shape = (jax.ShapeDtypeStruct((nt, RPT, BS, r), jnp.float32),
                 jax.ShapeDtypeStruct((nt, RPT, BS, r), jnp.float32))
    try:
        cparams = pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"))
    except TypeError:  # older signature
        cparams = None

    @jax.jit
    def call(wcol, nslot, are, aim, xre, xim):
        with jax.enable_x64(False):
            return pl.pallas_call(
                kernel, grid_spec=grid_spec, out_shape=out_shape,
                interpret=interpret, compiler_params=cparams,
            )(wcol, nslot, are, aim, xre, xim, xre, xim, xre, xim)

    return call


class WindowSpmm:
    """Device-resident windowed indexed-BSR SpMM: Y = A X, c64 semantics.

    ``apply_split`` takes/returns float32 (re, im) planes shaped
    [ntiles, TILE, r]; ``__call__`` is the host complex convenience
    wrapper.  ``chain`` applies the operator m times with renormalization
    in ONE device program (the dispatch-amortized benchmark/power-iteration
    entry point)."""

    def __init__(self, wb: WindowBsr, nrhs: int = 128,
                 interpret: bool = False, precision=None):
        import jax
        import jax.numpy as jnp
        self.wb = wb
        self.nrhs = nrhs
        self.n = wb.n
        self.npad = wb.npad
        if precision is None:
            precision = jax.lax.Precision.HIGHEST
        b = wb.blocks.astype(np.complex64)
        self.are = jax.device_put(jnp.asarray(np.ascontiguousarray(b.real)))
        self.aim = jax.device_put(jnp.asarray(np.ascontiguousarray(b.imag)))
        self.wcol = jax.device_put(jnp.asarray(wb.wcol))
        self.nslot = jax.device_put(jnp.asarray(wb.nslot))
        self._call = _build_call(wb.ntiles, wb.mslot, nrhs, interpret,
                                 precision)
        self._chain = None
        #: HBM bytes per apply: A planes + 3× panel in + panel out
        self.stream_bytes = (wb.padded_block_bytes
                             + 8.0 * wb.npad * nrhs * 4)

    def split_panels(self, X):
        X = np.asarray(X)
        Xp = np.zeros((self.npad, self.nrhs), np.complex64)
        Xp[:X.shape[0]] = X
        Xb = Xp.reshape(self.wb.ntiles, TILE, self.nrhs)
        import jax.numpy as jnp
        return (jnp.asarray(np.ascontiguousarray(Xb.real), jnp.float32),
                jnp.asarray(np.ascontiguousarray(Xb.imag), jnp.float32))

    def apply_split(self, x_re, x_im):
        yr, yi = self._call(self.wcol, self.nslot, self.are, self.aim,
                            x_re, x_im)
        return (yr.reshape(self.wb.ntiles, TILE, self.nrhs),
                yi.reshape(self.wb.ntiles, TILE, self.nrhs))

    def __call__(self, X):
        from ..utils.hostxfer import to_numpy
        nl = np.asarray(X).shape[0]
        yr, yi = self.apply_split(*self.split_panels(X))
        Y = to_numpy(yr) + 1j * to_numpy(yi)
        return Y.reshape(-1, self.nrhs)[:nl]

    def chain_fn(self, m: int):
        """f(x_re, x_im) -> m normalized applies in one device program.

        The operator planes are threaded as jit ARGUMENTS (closing over
        them would inline 100s of MB as constants into the compile
        payload)."""
        import jax
        import jax.numpy as jnp

        ntiles, tile, r = self.wb.ntiles, TILE, self.nrhs
        inner = self._call

        @jax.jit
        def chain(wcol, nslot, are, aim, x_re, x_im):
            def body(carry, _):
                xr, xi = carry
                yr, yi = inner(wcol, nslot, are, aim, xr, xi)
                yr = yr.reshape(ntiles, tile, r)
                yi = yi.reshape(ntiles, tile, r)
                s = 1.0 / jnp.maximum(
                    jnp.sqrt(jnp.sum(yr * yr) + jnp.sum(yi * yi)), 1e-30)
                return (yr * s, yi * s), 0
            (yr, yi), _ = jax.lax.scan(body, (x_re, x_im), None, length=m)
            return yr, yi

        def call(x_re, x_im):
            return chain(self.wcol, self.nslot, self.are, self.aim,
                         x_re, x_im)

        return call


__all__ = ["WindowBsr", "WindowSpmm", "TILE", "BS"]
