"""Pallas TPU kernel: block-tridiagonal (Thomas) forward+backward
substitution as ONE device operation.

Role: the inner solve of the fused local NLEVP solver at dimensions
where the dense [N, N] VMEM planes of :mod:`.pallas_gmres` cannot fit
(FUSED_MAX_DIM≈1400).  The operator is factorized ONCE per Newton step
by an XLA block-Thomas scan (see :mod:`..nlevp.fused_slab`), which
precomputes per-slab

    W_i  = Dt_i⁻¹ L_i        (forward coupling)
    C_i  = Dt_i⁻¹ U_i        (backward coupling)

so every subsequent solve is the pure recursion

    y_i = Dt_i⁻¹ b_i − W_i y_{i−1}          (forward,  i = 0..m−1)
    x_i = y_i − C_i x_{i+1}                 (backward, i = m−1..0)

— m sequential [1,s]×[s,s] complex dots.  An XLA-level loop would pay
the ~45-200 µs per-iteration runtime overhead 2m times per solve
(VERDICT r3/r4 dispatch-overhead analysis); this kernel runs the whole
recursion in one Pallas launch with the W/C block streams fed through
the grid pipeline from HBM (static index maps — the blocks do not fit
VMEM at the 7k-DOF bench size: 2 sides × 2m × s² × 2 planes ≈ 124 MB).

Layout contract (row-vector convention, all f32 (re, im) planes):

* ``stream``  [sides, 2m, s, s] — Wᵀ_i at [side, i], Cᵀ_{m−1−i} at
  [side, m+i] (i.e. the backward blocks pre-reversed so the grid reads
  both phases with the STATIC index map (side, p, i) → (side, p·m+i)).
* ``bt``      [sides, m, s] — Dt⁻¹-pre-applied RHS, slab layout.
* output x    [sides, m, s] — slab layout solution.

Grid (sides, 2, m): phase p=0 forward, p=1 backward; carry and the
intermediate Y panel live in VMEM scratch (zeroed per side — Mosaic
scratch is NOT zero-initialized and NaN·0 poisons masked reads).

Reference counterpart: UMFPACK triangular backsolves inside the local
solvers' shift-invert iteration (Householder.jl:100-101); the slab
structure itself re-designs that role for the MXU (ops/slab_solve.py).
"""
from __future__ import annotations

import functools

import numpy as np


@functools.lru_cache(maxsize=16)
def build_slab_thomas(m: int, s: int, sides: int = 2,
                      interpret: bool = False):
    """Returns jitted f(stream_r, stream_i, btr, bti) -> (xr, xi).

    stream_* [sides, 2m, s, s] f32; bt* [sides, m, 1, s] f32.
    Output [sides, m, 1, s] f32 planes (unit axis: Mosaic block tiling
    needs the last two block dims divisible by (8, 128) or equal to the
    array dims).  ``s`` must be a lane multiple
    (128) for efficient layout."""
    import jax
    import jax.numpy as jnp
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    f32 = jnp.float32
    hiP = jax.lax.Precision.HIGHEST

    def kernel(w_r, w_i, bt_r, bt_i, x_r, x_i, Yr, Yi, pr, pi):
        p = pl.program_id(1)
        i = pl.program_id(2)

        @pl.when(i == 0)
        def _():
            pr[...] = jnp.zeros((1, s), f32)
            pi[...] = jnp.zeros((1, s), f32)

        Bt_r = w_r[0, 0]
        Bt_i = w_i[0, 0]
        prev_r = pr[...]
        prev_i = pi[...]
        dd = lambda u, A: jax.lax.dot_general(
            u, A, (((1,), (0,)), ((), ())),
            preferred_element_type=f32, precision=hiP)
        c_r = dd(prev_r, Bt_r) - dd(prev_i, Bt_i)
        c_i = dd(prev_r, Bt_i) + dd(prev_i, Bt_r)

        @pl.when(p == 0)
        def _fwd():
            y_r = bt_r[0, 0] - c_r
            y_i = bt_i[0, 0] - c_i
            Yr[pl.ds(i, 1), :] = y_r
            Yi[pl.ds(i, 1), :] = y_i
            pr[...] = y_r
            pi[...] = y_i
            x_r[0, 0] = y_r
            x_i[0, 0] = y_i

        @pl.when(p == 1)
        def _bwd():
            j = m - 1 - i
            xx_r = Yr[pl.ds(j, 1), :] - c_r
            xx_i = Yi[pl.ds(j, 1), :] - c_i
            pr[...] = xx_r
            pi[...] = xx_i
            x_r[0, 0] = xx_r
            x_i[0, 0] = xx_i

    def bwd_slab(side, p, i):
        # p=0 writes slab i (placeholder, overwritten by the final p=1
        # visit of the same block later in grid order); p=1 writes m−1−i
        return (side, i + p * (m - 1 - 2 * i), 0, 0)

    grid = (sides, 2, m)
    in_specs = [
        pl.BlockSpec((1, 1, s, s), lambda side, p, i: (side, p * m + i,
                                                       0, 0)),
        pl.BlockSpec((1, 1, s, s), lambda side, p, i: (side, p * m + i,
                                                       0, 0)),
        pl.BlockSpec((1, 1, 1, s), lambda side, p, i: (side, i, 0, 0)),
        pl.BlockSpec((1, 1, 1, s), lambda side, p, i: (side, i, 0, 0)),
    ]
    out_specs = (pl.BlockSpec((1, 1, 1, s), bwd_slab),
                 pl.BlockSpec((1, 1, 1, s), bwd_slab))
    out_shape = (jax.ShapeDtypeStruct((sides, m, 1, s), np.float32),
                 jax.ShapeDtypeStruct((sides, m, 1, s), np.float32))
    scratch = [
        pltpu.VMEM((m, s), np.float32),          # Y re
        pltpu.VMEM((m, s), np.float32),          # Y im
        pltpu.VMEM((1, s), np.float32),          # carry re
        pltpu.VMEM((1, s), np.float32),          # carry im
    ]
    try:
        cparams = pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
            vmem_limit_bytes=64 * 1024 * 1024)
    except TypeError:
        cparams = None

    @jax.jit
    def solve(stream_r, stream_i, btr, bti):
        with jax.enable_x64(False):
            return pl.pallas_call(
                kernel,
                grid=grid,
                in_specs=in_specs,
                out_specs=out_specs,
                out_shape=out_shape,
                scratch_shapes=scratch,
                compiler_params=cparams,
                interpret=interpret,
            )(stream_r, stream_i, btr, bti)

    return solve


__all__ = ["build_slab_thomas"]
