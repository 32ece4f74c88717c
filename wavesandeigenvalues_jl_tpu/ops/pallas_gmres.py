"""Pallas TPU kernel: a COMPLETE dense preconditioned GMRES(m) solve as
ONE device operation.

Motivation (round 4, measured on the axon v5e): the runtime charges
~45-200 µs of overhead per XLA fusion/loop iteration, so an XLA-level
GMRES at n≈1000 costs ~1 ms per Arnoldi step — dispatch overhead, not
compute (the actual flops are ~10 µs).  The local NLEVP solvers need
O(10) such solves per Newton step.  Fusing the entire solve into one
Pallas kernel makes each solve one op.

Mosaic lowering rules (established by bisection on this toolchain):

* broadcast-multiply + axis-reduce matvecs FAIL inside ``fori_loop``
  ("Offset change") — in-loop matvecs must be 2D×2D ``dot_general``
  with [1, N] row vectors;
* chained reductions (sum+sum) fuse into reductions with non-constant
  accumulators and FAIL — every scalar comes from ONE full reduce;
* 1-D→3-D reshapes and multi-contracting-dim matmuls FAIL;
* dynamic ROW slicing (``pl.ds`` on the sublane dim) works; dynamic
  lane indexing does not — small-vector element access is done with
  iota masks + full reduces.

Conventions inside the kernel: N-vectors are [1, N] rows; the Krylov
basis V is [m+1, N]; the rotated-triangular store Ht[j, k] = R[k, j]
(row j of the store holds rotated column j); g/cs/sn are [1, m+1] rows.

Semantics: solves  P x = b  for a dense complex operator P with a FIXED
m-step Arnoldi cycle and ``cycles`` restarts, complex arithmetic as
(re, im) float32 planes.  Callers pass the PRE-preconditioned operator
P = D⁻¹G and RHS D⁻¹b (LEFT block-Jacobi — penalty-BC operators have
rows spanning ~16 orders of magnitude, left scaling normalizes them);
forming D⁻¹G is one XLA batched matmul outside the kernel.  The adjoint
side passes P = D_H⁻¹Gᴴ explicitly — no transpose variant needed.

This is the reference's UMFPACK-backsolve role (Householder.jl:100-101)
for the small/medium operators the local solvers iterate on; accuracy
beyond f32 comes from the f64-pair refinement in
:mod:`..nlevp.fused_local`.
"""
from __future__ import annotations

import functools

import numpy as np

LANE = 128


@functools.lru_cache(maxsize=32)
def build_dense_gmres(N: int, m: int, cycles: int = 2, sides: int = 1,
                      interpret: bool = False):
    """Returns jitted f(ar, ai, br, bi) -> (xr, xi).

    ar/ai [sides,N,N] f32 pre-preconditioned operator planes; br/bi
    [sides,N] f32 (pre-preconditioned) RHS planes.  The ``sides``
    independent systems solve sequentially INSIDE one kernel launch —
    each pallas invocation costs ~5 ms of launch overhead on this
    runtime, so the two-sided local solvers batch their direct and
    adjoint solves into one call.  N must be a multiple of 128."""
    import jax
    import jax.numpy as jnp
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    assert N % LANE == 0

    def kernel(ar, ai, br, bi, xr_o, xi_o,
               Vr, Vi, Hr, Hi, csv, snr, sni, gr, gi):
        f32 = jnp.float32
        hiP = jax.lax.Precision.HIGHEST
        # lane-indexed [1, m+1] and sublane-indexed [m+1, 1] iotas
        ioL = jax.lax.broadcasted_iota(jnp.int32, (1, m + 1), 1)
        ioS = jax.lax.broadcasted_iota(jnp.int32, (m + 1, 1), 0)

        def rowdot(u, Vmat):
            # [1,N] x [m+1,N] -> [1, m+1]
            return jax.lax.dot_general(
                u, Vmat, (((1,), (1,)), ((), ())),
                preferred_element_type=f32, precision=hiP)

        def comb(h, Vmat):
            # [1,m+1] x [m+1,N] -> [1,N]
            return jax.lax.dot_general(
                h, Vmat, (((1,), (0,)), ((), ())),
                preferred_element_type=f32, precision=hiP)

        def matvec(A_r, A_i, xr, xi):
            # w[0,i] = Σ_j x[0,j]·A[i,j]  (contract both dim-1)
            dd = lambda u, A: jax.lax.dot_general(
                u, A, (((1,), (1,)), ((), ())),
                preferred_element_type=f32, precision=hiP)
            yr = dd(xr, A_r) - dd(xi, A_i)
            yi = dd(xi, A_r) + dd(xr, A_i)
            return yr, yi

        def vnorm2(ur, ui):
            # single full reduce (chained sums make Mosaic-rejected
            # non-constant reduction accumulators)
            return jnp.sum(ur * ur + ui * ui)

        def solve_one(side):
            # read this side's operator ONCE: every ``ref[...]`` read
            # materializes a fresh [N,N] value and the scoped-VMEM
            # allocator charges each of them
            A_r = ar[side]
            A_i = ai[side]
            b0r = br[pl.ds(side, 1), :]
            b0i = bi[pl.ds(side, 1), :]
            mv = lambda xr, xi: matvec(A_r, A_i, xr, xi)
            return _gmres_cycles(mv, b0r, b0i)

        def _gmres_cycles(matvec, b0r, b0i):
            def cycle(cyc, xcar):
                xr, xi = xcar
                axr, axi = matvec(xr, xi)
                rr = b0r - axr
                ri = b0i - axi
                beta = jnp.sqrt(jnp.maximum(vnorm2(rr, ri), 1e-37))
                # zero-init scratch: uninitialized VMEM can hold NaN and
                # NaN·0 from the masks below would poison every reduce
                Vr[...] = jnp.zeros((m + 1, N), f32)
                Vi[...] = jnp.zeros((m + 1, N), f32)
                Hr[...] = jnp.zeros((m + 1, m + 1), f32)
                Hi[...] = jnp.zeros((m + 1, m + 1), f32)
                Vr[pl.ds(0, 1), :] = rr / beta
                Vi[pl.ds(0, 1), :] = ri / beta
                gr[...] = jnp.where(ioL == 0, beta, 0.0)
                gi[...] = jnp.zeros((1, m + 1), f32)
                csv[...] = jnp.zeros((1, m + 1), f32)
                snr[...] = jnp.zeros((1, m + 1), f32)
                sni[...] = jnp.zeros((1, m + 1), f32)

                def arnoldi(j, _):
                    vjr = Vr[pl.ds(j, 1), :]
                    vji = Vi[pl.ds(j, 1), :]
                    wr, wi = matvec(vjr, vji)
                    maskL = (ioL <= j).astype(f32)        # [1, m+1]

                    def proj(wr, wi):
                        V_r, V_i = Vr[...], Vi[...]
                        h_r = (rowdot(wr, V_r) + rowdot(wi, V_i)) * maskL
                        h_i = (rowdot(wi, V_r) - rowdot(wr, V_i)) * maskL
                        wr = wr - (comb(h_r, V_r) - comb(h_i, V_i))
                        wi = wi - (comb(h_i, V_r) + comb(h_r, V_i))
                        return h_r, h_i, wr, wi

                    h1r, h1i, wr, wi = proj(wr, wi)
                    h2r, h2i, wr, wi = proj(wr, wi)
                    hr = h1r + h2r                        # [1, m+1]
                    hi_ = h1i + h2i
                    hn = jnp.sqrt(jnp.maximum(vnorm2(wr, wi), 1e-37))
                    Vr[pl.ds(j + 1, 1), :] = wr / hn
                    Vi[pl.ds(j + 1, 1), :] = wi / hn
                    hr = jnp.where(ioL == j + 1, hn, hr)

                    # apply accumulated rotations 0..j-1 to the new column
                    def rot(k, hcol):
                        hr, hi_ = hcol
                        onek = (ioL == k).astype(f32)
                        onek1 = (ioL == (k + 1)).astype(f32)
                        c = jnp.sum(csv[...] * onek)
                        s_r = jnp.sum(snr[...] * onek)
                        s_i = jnp.sum(sni[...] * onek)
                        hk_r = jnp.sum(hr * onek)
                        hk_i = jnp.sum(hi_ * onek)
                        hk1_r = jnp.sum(hr * onek1)
                        hk1_i = jnp.sum(hi_ * onek1)
                        nk_r = c * hk_r + s_r * hk1_r - s_i * hk1_i
                        nk_i = c * hk_i + s_r * hk1_i + s_i * hk1_r
                        nk1_r = -(s_r * hk_r + s_i * hk_i) + c * hk1_r
                        nk1_i = -(s_r * hk_i - s_i * hk_r) + c * hk1_i
                        hr = jnp.where(ioL == k, nk_r, hr)
                        hr = jnp.where(ioL == k + 1, nk1_r, hr)
                        hi_ = jnp.where(ioL == k, nk_i, hi_)
                        hi_ = jnp.where(ioL == k + 1, nk1_i, hi_)
                        return hr, hi_

                    hr, hi_ = jax.lax.fori_loop(0, j, rot, (hr, hi_))

                    onej = (ioL == j).astype(f32)
                    onej1 = (ioL == (j + 1)).astype(f32)
                    a_r = jnp.sum(hr * onej)
                    a_i = jnp.sum(hi_ * onej)
                    b_r = jnp.sum(hr * onej1)
                    b_i = jnp.sum(hi_ * onej1)
                    absa = jnp.sqrt(jnp.maximum(a_r * a_r + a_i * a_i, 0.0))
                    den = jnp.sqrt(jnp.maximum(
                        a_r * a_r + a_i * a_i + b_r * b_r + b_i * b_i, 1e-37))
                    c = jnp.where(den == 0, 1.0, absa / den)
                    safe_a = jnp.where(absa == 0, 1.0, absa)
                    ph_r = jnp.where(absa == 0, 1.0, a_r / safe_a)
                    ph_i = jnp.where(absa == 0, 0.0, a_i / safe_a)
                    s_r = (ph_r * b_r + ph_i * b_i) / den
                    s_i = (ph_i * b_r - ph_r * b_i) / den
                    csv[...] = csv[...] * (1.0 - onej) + c * onej
                    snr[...] = snr[...] * (1.0 - onej) + s_r * onej
                    sni[...] = sni[...] * (1.0 - onej) + s_i * onej
                    nj_r = c * a_r + s_r * b_r - s_i * b_i
                    nj_i = c * a_i + s_r * b_i + s_i * b_r
                    hr = (jnp.where(ioL == j, nj_r, hr)) * (1.0 - onej1)
                    hi_ = (jnp.where(ioL == j, nj_i, hi_)) * (1.0 - onej1)
                    gj_r = jnp.sum(gr[...] * onej)
                    gj_i = jnp.sum(gi[...] * onej)
                    g1_r = -(s_r * gj_r + s_i * gj_i)
                    g1_i = -(s_r * gj_i - s_i * gj_r)
                    gr[...] = (gr[...] * (1.0 - onej) * (1.0 - onej1)
                               + (c * gj_r) * onej + g1_r * onej1)
                    gi[...] = (gi[...] * (1.0 - onej) * (1.0 - onej1)
                               + (c * gj_i) * onej + g1_i * onej1)
                    # store rotated column j into row j of Ht (sublane-mask
                    # write; the [1,m+1] h row broadcasts over lanes there)
                    rowj = (ioS == j)                     # [m+1, 1]
                    Hr[...] = jnp.where(rowj, hr, Hr[...])
                    Hi[...] = jnp.where(rowj, hi_, Hi[...])
                    return 0

                jax.lax.fori_loop(0, m, arnoldi, 0)

                # back substitution: y_i = (g_i − Σ_{c>i} R[i,c] y_c)/R[i,i]
                # with Ht[j, k] = R[k, j]: Σ_c R[i,c]·y_c = (y · Ht)[i].
                yr = jnp.zeros((1, m + 1), f32)
                yi = jnp.zeros((1, m + 1), f32)

                def back(irev, ycar):
                    yr, yi = ycar
                    i = m - 1 - irev
                    coli = (ioL == i).astype(f32)         # [1, m+1] lane mask
                    dd = lambda u, A: jax.lax.dot_general(
                        u, A, (((1,), (0,)), ((), ())),
                        preferred_element_type=f32, precision=hiP)
                    ytHr = dd(yr, Hr[...])                # Σ_c y_c Ht[c, :]
                    ytHi_r = dd(yi, Hr[...])
                    ytHr_i = dd(yr, Hi[...])
                    ytHi = dd(yi, Hi[...])
                    dot_r = jnp.sum((ytHr - ytHi) * coli)
                    dot_i = jnp.sum((ytHi_r + ytHr_i) * coli)
                    gi_r = jnp.sum(gr[...] * coli)
                    gi_i = jnp.sum(gi[...] * coli)
                    num_r = gi_r - dot_r
                    num_i = gi_i - dot_i
                    # R[i,i] = Ht[i,i]
                    dii_r = jnp.sum(Hr[...] * coli * (ioS == i))
                    dii_i = jnp.sum(Hi[...] * coli * (ioS == i))
                    d2 = jnp.maximum(dii_r * dii_r + dii_i * dii_i, 1e-37)
                    q_r = (num_r * dii_r + num_i * dii_i) / d2
                    q_i = (num_i * dii_r - num_r * dii_i) / d2
                    yr = yr * (1.0 - coli) + q_r * coli
                    yi = yi * (1.0 - coli) + q_i * coli
                    return yr, yi

                yr, yi = jax.lax.fori_loop(0, m, back, (yr, yi))
                dxr = comb(yr, Vr[...]) - comb(yi, Vi[...])
                dxi = comb(yi, Vr[...]) + comb(yr, Vi[...])
                return (xr + dxr, xi + dxi)

            xr = jnp.zeros((1, N), jnp.float32)
            xi = jnp.zeros((1, N), jnp.float32)
            xr, xi = jax.lax.fori_loop(0, cycles, cycle, (xr, xi))
            return xr, xi

        for s_ in range(sides):
            xr, xi = solve_one(s_)
            xr_o[pl.ds(s_, 1), :] = xr
            xi_o[pl.ds(s_, 1), :] = xi

    out_shape = (jax.ShapeDtypeStruct((sides, N), np.float32),
                 jax.ShapeDtypeStruct((sides, N), np.float32))
    scratch = [
        pltpu.VMEM((m + 1, N), np.float32),          # Vr
        pltpu.VMEM((m + 1, N), np.float32),          # Vi
        pltpu.VMEM((m + 1, m + 1), np.float32),      # Ht re
        pltpu.VMEM((m + 1, m + 1), np.float32),      # Ht im
        pltpu.VMEM((1, m + 1), np.float32),          # cs
        pltpu.VMEM((1, m + 1), np.float32),          # sn re
        pltpu.VMEM((1, m + 1), np.float32),          # sn im
        pltpu.VMEM((1, m + 1), np.float32),          # g re
        pltpu.VMEM((1, m + 1), np.float32),          # g im
    ]

    try:
        # the default scoped-VMEM cap (16 MB) is conservative; the input
        # planes plus their one materialized copy need ~17 MB at N=1024
        cparams = pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024)
    except TypeError:
        cparams = None

    @jax.jit
    def solve(ar, ai, br, bi):
        with jax.enable_x64(False):
            return pl.pallas_call(
                kernel,
                out_shape=out_shape,
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
                out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                           pl.BlockSpec(memory_space=pltpu.VMEM)),
                scratch_shapes=scratch,
                compiler_params=cparams,
                interpret=interpret,
            )(ar, ai, br, bi)

    return solve


__all__ = ["build_dense_gmres", "LANE"]
