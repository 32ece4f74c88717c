"""Block-tridiagonal direct panel solver ("slab solver") on device.

The scalable DIRECT alternative to the GMRES panel path for the Beyn
contour quadrature (/root/reference/src/NLEVP/beyn.jl:62-74 runs |Γ|·N
independent UMFPACK factorizations; here all shifts in a chunk factorize
together as batched dense MXU work).

Key observation: BFS level sets of ANY sparse operator's adjacency graph
have the property that every edge connects the same or adjacent levels —
so ordering DOFs by (merged) BFS level makes the operator block
tridiagonal with dense-padded slab blocks [s, s].  A block-Thomas
factorization is then m sequential steps of batched dense linear algebra

    Dt_i   = D_i − L_i · C_{i−1}
    C_i    = Dt_i⁻¹ U_i,     y_i = Dt_i⁻¹ (b_i − L_i y_{i−1})
    x_m    = y_m,            x_i = y_i − C_i x_{i+1}

batched over shifts — exactly the shape the MXU wants.  For the 42.5k-DOF
octosplit Rijke operator this is m=131 slabs of width ≤602.

TPU-specific design rules (learned on the axon v5e):

* EVERY pass is one ``lax.scan`` dispatch: the batched dense solve
  inside the factorization scan compiles in ~10 s on this stack
  (measured; the round-2 "solve-in-scan blows up compile" assumption
  does not hold here), and the matmul-only backward/refinement scans
  are trivially safe.  Host-driven per-slab loops cost 10-25 ms of
  tunnel dispatch latency per step — at m≈111 slabs and ~10 passes per
  chunk that latency alone dominated the solver.
* All chunk-constant arrays (data planes, RHS planes, scatter/gather
  maps) are ``device_put`` ONCE; passing numpy into per-step jits
  re-transfers ~60 MB per step over the tunnel (the round-2 version did
  exactly that and lost 25 min per chunk to it).
* The per-slab block inverses ``Dt_i⁻¹`` are kept device-resident —
  refinement sweeps then need only matmuls, so iterative refinement
  against exact complex128 host residuals costs a few percent of the
  factorization.
* Rows are equilibrated per shift (1/max|row|) on host before shipping:
  penalty-BC rows (admittance Y~1e15) otherwise destroy the f32 block
  factorization, and the refinement acceptance norm matches the scaled
  system.
* All complex crosses the host↔device boundary as (re, im) float planes
  (axon runtime rejects complex transfers).
"""
from __future__ import annotations

import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.config import device_complex_dtype

#: device-memory budget (bytes) for the stored block inverses of a chunk
SLAB_BUDGET = float(os.environ.get("WAE_SLAB_BUDGET", "6.0e9"))


def _concat_ranges(starts, counts):
    """Concatenate ranges(starts[i], starts[i]+counts[i]) vectorized."""
    total = int(counts.sum())
    if total == 0:
        return np.empty(0, np.int64)
    out = np.ones(total, np.int64)
    ends = np.cumsum(counts)
    out[0] = starts[0]
    nz = counts > 0
    first = np.flatnonzero(nz)
    # at each range boundary, jump to the next start
    prev_end = starts[first[:-1]] + counts[first[:-1]]
    out[ends[first[:-1]]] = starts[first[1:]] - prev_end + 1
    return np.cumsum(out)


def bfs_levels(indptr, nbrs, n: int):
    """BFS level of every vertex from a pseudo-peripheral seed (two-pass);
    disconnected components continue the level numbering (no cross edges,
    so sharing slab indices across components stays block-tridiagonal)."""
    lvl = np.full(n, -1, np.int64)
    deg = np.diff(indptr)

    def _bfs(start, base, write):
        seen = lvl >= 0 if write else np.zeros(n, bool)
        local = np.full(n, -1, np.int64)
        frontier = np.array([start], np.int64)
        local[start] = 0
        seen[start] = True
        d = 0
        while frontier.size:
            counts = (indptr[frontier + 1] - indptr[frontier])
            nb = nbrs[_concat_ranges(indptr[frontier], counts)]
            nb = np.unique(nb[~seen[nb]])
            seen[nb] = True
            d += 1
            local[nb] = d
            frontier = nb
        if write:
            sel = local >= 0
            lvl[sel] = base + local[sel]
        return local

    base = 0
    todo = np.ones(n, bool)
    while todo.any():
        seed = int(np.flatnonzero(todo)[np.argmin(deg[todo])])
        l0 = _bfs(seed, 0, write=False)
        # farthest reached vertex of this component = better peripheral seed
        reach = l0 >= 0
        far = int(np.flatnonzero(reach)[np.argmax(l0[reach])])
        l1 = _bfs(far, base, write=True)
        comp = l1 >= 0
        base = int(lvl[lvl >= 0].max()) + 1
        todo &= ~comp
    return lvl


class SlabPartition:
    """DOF ordering by merged BFS levels: ``perm`` (new→old), slab sizes
    and, for every union-pattern nnz entry, its (slab, block, row, col)
    destination — everything the device assembly gathers/scatters need."""

    def __init__(self, indptr, indices, n: int, target: Optional[int] = None):
        from .reorder import adjacency_from_csr
        from .sparse import CSR
        A = CSR(np.asarray(indptr), np.asarray(indices),
                np.ones(len(indices)), (n, n))
        aptr, nbrs = adjacency_from_csr(A)
        lvl = bfs_levels(aptr, nbrs, n)
        sizes = np.bincount(lvl)
        if target is None:
            target = int(sizes.max())
        # greedy merge of consecutive levels (edges only ever span one
        # level, so merged slabs stay tridiagonal)
        slab_of_level = np.empty(len(sizes), np.int64)
        cur, acc = 0, 0
        for k, sz in enumerate(sizes):
            if acc and acc + sz > target:
                cur += 1
                acc = 0
            slab_of_level[k] = cur
            acc += sz
        slab = slab_of_level[lvl]
        self.m = int(slab.max()) + 1
        self.sizes = np.bincount(slab, minlength=self.m)
        self.smax = int(self.sizes.max())
        order = np.lexsort((np.arange(n), slab))
        self.perm = order                       # new -> old
        self.iperm = np.empty(n, np.int64)
        self.iperm[order] = np.arange(n)
        self.slab_of_new = slab[order]
        starts = np.zeros(self.m + 1, np.int64)
        np.cumsum(self.sizes, out=starts[1:])
        self.starts = starts
        self.loc_of_new = np.arange(n) - starts[self.slab_of_new]
        self.n = n

    def entry_destinations(self, rows, cols):
        """Per-nnz (slab i, block d∈{0:L,1:D,2:U}, row loc, col loc)."""
        rn = self.iperm[np.asarray(rows, np.int64)]
        cn = self.iperm[np.asarray(cols, np.int64)]
        si, sj = self.slab_of_new[rn], self.slab_of_new[cn]
        d = sj - si + 1
        if d.min() < 0 or d.max() > 2:
            raise AssertionError("BFS slab partition violated "
                                 "tridiagonality — this cannot happen")
        return si, d, self.loc_of_new[rn], self.loc_of_new[cn]


def _band_ell(si, rl, cl, sel, m: int, s: int, nnz: int):
    """Padded-ELL map of one off-diagonal band: for every (slab, row-loc)
    the nnz ids and column locs of its entries, padded to the widest row
    (sentinel id ``nnz`` gathers the appended zero value, col 0).  Lets
    the scan passes apply L·y / U·x as gather+reduce instead of
    re-scattering dense [s, s] blocks every step."""
    s_i = np.asarray(si)[sel]
    r_i = np.asarray(rl)[sel]
    c_i = np.asarray(cl)[sel]
    eids = np.flatnonzero(sel)
    key = s_i * s + r_i
    order = np.argsort(key, kind="stable")
    ks = key[order]
    if len(ks):
        first = np.r_[True, ks[1:] != ks[:-1]]
        start = np.maximum.accumulate(
            np.where(first, np.arange(len(ks)), 0))
        slot = np.arange(len(ks)) - start
        w = int(slot.max()) + 1
    else:
        slot = np.empty(0, np.int64)
        w = 1
    eid = np.full((m, s, w), nnz, np.int32)
    col = np.zeros((m, s, w), np.int32)
    eid[s_i[order], r_i[order], slot] = eids[order]
    col[s_i[order], r_i[order], slot] = c_i[order]
    return eid, col


# ---------------------------------------------------------------------------
# jitted device passes (one scan dispatch each — see module docstring)


@jax.jit
def _factor_pass(dP, bP, eidx, dest, rmap, sizes, eidU, colU, src):
    """Full block-Thomas factorization + solve in ONE dispatch: forward
    elimination scan (with the batched dense solve in the body — on this
    stack its While lowering inside scan compiles in ~10 s, measured,
    contrary to the round-2 assumption), then backward substitution and
    the un-permute gather.  In/out planes are PACKED [2, ...] (re, im)
    arrays — each host↔device transfer over the tunnel costs a round
    trip, so one packed array beats two planes.  Returns stacked solution
    planes and the stored block inverses for refinement re-solves."""
    dr, di = dP[0], dP[1]
    br, bi = bP[0], bP[1]
    B = dr.shape[0]
    s = rmap.shape[1]
    l = br.shape[-1]
    b = jax.lax.complex(br, bi)
    arange_s = jnp.arange(s)

    def body(carry, xs):
        Cr, Ci, yr, yi = carry
        eidx_i, dest_i, rmap_i, size_i = xs
        blk = _scan_blk(dr, di, eidx_i, dest_i, s, B)
        Lb, Db, Ub = blk[:, 0], blk[:, 1], blk[:, 2]
        C = jax.lax.complex(Cr, Ci)
        y = jax.lax.complex(yr, yi)
        # pad empty tail rows of a short slab to identity
        pad = (arange_s >= size_i).astype(Db.dtype)
        Dt = Db - Lb @ C + jnp.diag(pad)[None]
        Eye = jnp.broadcast_to(jnp.eye(s, dtype=Dt.dtype), (B, s, s))
        Dtinv = jnp.linalg.solve(Dt, Eye)
        Cn = Dtinv @ Ub
        yn = Dtinv @ (b[:, rmap_i] - Lb @ y)
        carry = (jnp.real(Cn), jnp.imag(Cn), jnp.real(yn), jnp.imag(yn))
        ys = (jnp.real(Dtinv), jnp.imag(Dtinv),
              jnp.real(yn), jnp.imag(yn))
        return carry, ys

    C0 = jnp.zeros((B, s, s), dr.dtype)
    y0 = jnp.zeros((B, s, l), dr.dtype)
    _, (DTr, DTi, Yr, Yi) = jax.lax.scan(
        body, (C0, C0, y0, y0), (eidx, dest, rmap, sizes))
    Xr, Xi = _bwd_core(DTr, DTi, Yr, Yi, dr, di, eidU, colU, src)
    return jnp.stack([Xr, Xi]), DTr, DTi


def _scan_blk(dr, di, eidx_i, dest_i, s: int, B: int):
    """Assemble one slab's [B, 3, s, s] block panel from the chunk's
    data planes (gather + scatter-add, shapes static inside the scan)."""
    blkr = jnp.zeros((B, 3 * s * s + 1), dr.dtype).at[:, dest_i].add(
        dr[:, eidx_i])
    blki = jnp.zeros((B, 3 * s * s + 1), di.dtype).at[:, dest_i].add(
        di[:, eidx_i])
    return jax.lax.complex(blkr, blki)[:, :3 * s * s].reshape(B, 3, s, s)


def _band_apply(dr, di, eid_i, col_i, v):
    """(band_i @ v) via padded-ELL gather+reduce: ``eid_i/col_i`` [s, w]
    per-row nnz ids / neighbor-slab column locs, ``v`` [B, s, l] the
    neighboring slab's panel.  No dense [s, s] block is materialized —
    this is what keeps the scan passes off the serializing scatter."""
    vals = jax.lax.complex(dr[:, eid_i], di[:, eid_i])    # [B, s, w]
    vg = v[:, col_i, :]                                   # [B, s, w, l]
    return jnp.einsum("bsw,bswl->bsl", vals, vg)


def _bwd_core(DTr, DTi, Yr, Yi, dr, di, eidU, colU, src):
    """Backward substitution x_i = y_i − Dt_i⁻¹ U_i x_{i+1} over ALL
    slabs as one reverse scan, followed by the un-permute gather back to
    original DOF order — matmul/gather only, so unlike the factorization
    it is safe (and fast) inside a scan."""
    m, B, s = DTr.shape[0], DTr.shape[1], DTr.shape[2]
    l = Yr.shape[-1]

    def body(carry, xs):
        xr, xi = carry
        DTr_i, DTi_i, Yr_i, Yi_i, eidU_i, colU_i = xs
        Dtinv = jax.lax.complex(DTr_i, DTi_i)
        y_i = jax.lax.complex(Yr_i, Yi_i)
        x = jax.lax.complex(xr, xi)
        xn = y_i - Dtinv @ _band_apply(dr, di, eidU_i, colU_i, x)
        out = (jnp.real(xn), jnp.imag(xn))
        return out, out

    x0 = (jnp.zeros((B, s, l), DTr.dtype), jnp.zeros((B, s, l), DTr.dtype))
    _, (Xr, Xi) = jax.lax.scan(body, x0, (DTr, DTi, Yr, Yi, eidU, colU),
                               reverse=True)
    flat_r = Xr.transpose(1, 0, 2, 3).reshape(B, m * s, l)
    flat_i = Xi.transpose(1, 0, 2, 3).reshape(B, m * s, l)
    return flat_r[:, src, :], flat_i[:, src, :]


@jax.jit
def _resolve_pass(DTr, DTi, dP, bP, eidL, colL, eidU, colU,
                  rmap, src):
    """One full refinement re-solve with the STORED block inverses —
    forward scan y_i = Dt_i⁻¹ (b_i − L_i y_{i−1}), reverse scan backward
    substitution, un-permute gather: ONE device dispatch per sweep
    (the host-loop version cost ~2·m dispatches over the tunnel).
    Packed [2, ...] planes in and out (one transfer each way)."""
    dr, di = dP[0], dP[1]
    br, bi = bP[0], bP[1]
    m, B, s = DTr.shape[0], DTr.shape[1], DTr.shape[2]
    l = br.shape[-1]
    b = jax.lax.complex(br, bi)

    def body(carry, xs):
        yr, yi = carry
        DTr_i, DTi_i, eidL_i, colL_i, rmap_i = xs
        Dtinv = jax.lax.complex(DTr_i, DTi_i)
        y = jax.lax.complex(yr, yi)
        yn = Dtinv @ (b[:, rmap_i]
                      - _band_apply(dr, di, eidL_i, colL_i, y))
        out = (jnp.real(yn), jnp.imag(yn))
        return out, out

    y0 = (jnp.zeros((B, s, l), DTr.dtype), jnp.zeros((B, s, l), DTr.dtype))
    _, (Yr, Yi) = jax.lax.scan(body, y0, (DTr, DTi, eidL, colL, rmap))
    Xr, Xi = _bwd_core(DTr, DTi, Yr, Yi, dr, di, eidU, colU, src)
    return jnp.stack([Xr, Xi])


class SlabSolver:
    """Matrix-free-assembled block-tridiagonal DIRECT solver for
    L(z_j) X_j = V panels at many shifts (same contract as
    :class:`.panel_solve.ShiftedPanelSolver`).

    Each chunk of shifts runs one batched block-Thomas factorization
    (a single scan dispatch of m steps of [B,s,s] dense device ops) and
    stores the block inverses, after which every refinement re-solve is
    one matmul/ELL-gather scan dispatch.  Mixed precision: f32
    factorization + exact complex128 host residuals + iterative
    refinement, judged in the row-equilibrated norm (the factorization
    itself runs on the equilibrated system)."""

    def __init__(self, family, chunk: Optional[int] = None,
                 target: Optional[int] = None,
                 refine_sweeps: int = 4, refine_tol: float = 1e-11):
        import scipy.sparse as sp
        self.family = family
        S = family._stack()
        self.n = int(S.shape[0])
        self.K = int(S.values.shape[0])
        self.nnz = int(S.nnz)
        self.refine_sweeps, self.refine_tol = refine_sweeps, refine_tol
        cdt = device_complex_dtype()
        self._rdt = np.float32 if cdt == np.complex64 else np.float64
        self._sp = sp
        self._indptr = np.asarray(S.indptr)
        self._indices = np.asarray(S.indices)
        self._values128 = np.asarray(S.values, np.complex128)
        rows = np.asarray(S.row_ids(), np.int64)
        self._rows = rows
        part = SlabPartition(S.indptr, S.indices, self.n, target=target)
        self.part = part
        m, s = part.m, part.smax
        si, d, rl, cl = part.entry_destinations(rows, self._indices)
        # per-slab scatter maps, padded to the widest slab: (eidx into the
        # data vector [nnz]+sentinel, dest into the [3*s*s] block panel
        # +dump slot).  Sentinel data is 0 so dump-slot collisions add 0.
        counts = np.bincount(si, minlength=m)
        self.emax = int(counts.max())
        eidx = np.full((m, self.emax), self.nnz, np.int32)
        dest = np.full((m, self.emax), 3 * s * s, np.int32)
        order = np.argsort(si, kind="stable")
        flat_dest = ((d * s + rl) * s + cl).astype(np.int32)
        pos = np.zeros(m, np.int64)
        off = np.concatenate([[0], np.cumsum(counts)])
        for i in range(m):
            sl = order[off[i]:off[i + 1]]
            eidx[i, :len(sl)] = sl
            dest[i, :len(sl)] = flat_dest[sl]
        self._eidx, self._dest = eidx, dest
        # per-slab RHS row map (new-order rows; sentinel row n is zero)
        rmap = np.full((m, s), self.n, np.int32)
        for i in range(m):
            rows_i = part.perm[part.starts[i]:part.starts[i + 1]]
            rmap[i, :len(rows_i)] = rows_i
        self._rmap = rmap
        # original DOF -> flat padded slab slot (device un-permute gather)
        newidx = part.iperm
        self._src = (part.slab_of_new[newidx] * s
                     + part.loc_of_new[newidx]).astype(np.int32)
        # padded-ELL maps of the L (d=0) and U (d=2) bands for the scan
        # passes (band matvecs without dense block re-assembly)
        self._eidL, self._colL = _band_ell(si, rl, cl, d == 0, m, s,
                                           self.nnz)
        self._eidU, self._colU = _band_ell(si, rl, cl, d == 2, m, s,
                                           self.nnz)
        self._dev_maps_cache = None
        self._chunk = chunk
        self.timings = {"prep_s": 0.0, "device_s": 0.0, "residual_s": 0.0,
                        "factor_steps": 0, "resolve_steps": 0}

    # -- host helpers ------------------------------------------------------

    def coefficients(self, zs) -> np.ndarray:
        L = self.family
        eig = L.eigval
        saved = L.params[eig]
        out = np.zeros((len(zs), self.K), np.complex128)
        for i, z in enumerate(np.asarray(zs)):
            L.params[eig] = complex(z)
            out[i] = L.coefficients({})
        L.params[eig] = saved
        return out

    def _host_csr(self, coeff):
        data = coeff @ self._values128
        return self._sp.csr_matrix((data, self._indices, self._indptr),
                                   shape=(self.n, self.n))

    def _auto_chunk(self) -> int:
        per_shift = (2 * self.part.m * self.part.smax ** 2    # Dtinv planes
                     + 2 * self.part.m * self.part.smax * 8   # y planes
                     ) * (4 if self._rdt == np.float32 else 8)
        return int(max(1, min(16, SLAB_BUDGET // per_shift)))

    def default_group(self, l: int) -> int:
        """Natural shift-group size for contour drivers (one chunk)."""
        return self._chunk or self._auto_chunk()

    def _planes(self, x):
        x = np.asarray(x)
        return (np.ascontiguousarray(x.real).astype(self._rdt),
                np.ascontiguousarray(x.imag).astype(self._rdt))

    def _packed(self, x):
        """One [2, ...] (re, im) array on device — a single tunnel
        transfer instead of two."""
        x = np.asarray(x)
        P = np.empty((2,) + x.shape, self._rdt)
        P[0], P[1] = x.real, x.imag
        return jax.device_put(P)

    def _equilibrate(self, coeffs):
        """Per-shift row scalings 1/max|row| of L(z) ([B, n]) and the
        scaled data planes ([B, nnz+1], sentinel 0 appended)."""
        B = coeffs.shape[0]
        data = coeffs @ self._values128                    # [B, nnz]
        absd = np.abs(data)
        srow = np.empty((B, self.n))
        seg = np.maximum.reduceat(absd, self._indptr[:-1], axis=1)
        empty = np.diff(self._indptr) == 0
        seg[:, empty] = 1.0
        srow[:] = 1.0 / np.where(seg == 0, 1.0, seg)
        data *= srow[:, self._rows]
        dpad = np.concatenate([data, np.zeros((B, 1), data.dtype)], axis=1)
        return srow, dpad

    # -- device sweeps -----------------------------------------------------

    def _factor_solve_chunk(self, dpad, bsc):
        """Factorize + solve one chunk: ``dpad`` [B, nnz+1] equilibrated
        data, ``bsc`` [B, n+1, l] equilibrated RHS (row n zero).  Returns
        (X [B, n, l] host c128, device buffers (DTr, DTi) for re-solves).

        One device dispatch: the chunk's planes ship once (per-step numpy
        arguments would re-transfer ~60 MB per slab over the tunnel) and
        the whole factorization runs as a fused scan program."""
        dP = self._packed(dpad)
        bP = self._packed(bsc)
        d = self._dev_maps()
        X2, DTr, DTi = _factor_pass(
            dP, bP, d["eidx"], d["dest"], d["rmap"], d["sizes"],
            d["eidU"], d["colU"], d["src"])
        self.timings["factor_steps"] += self.part.m
        X2h = np.asarray(X2, np.float64)
        X = X2h[0] + 1j * X2h[1]                          # [B, n, l]
        return X, (DTr, DTi, dP)

    def _dev_maps(self):
        """Device-resident scatter/gather maps (shipped once per solver)."""
        if self._dev_maps_cache is None:
            host = {"eidx": self._eidx, "dest": self._dest,
                    "rmap": self._rmap, "src": self._src,
                    "sizes": np.asarray(self.part.sizes, np.int32),
                    "eidL": self._eidL, "colL": self._colL,
                    "eidU": self._eidU, "colU": self._colU}
            self._dev_maps_cache = {k: jax.device_put(v)
                                    for k, v in host.items()}
        return self._dev_maps_cache

    def _resolve_chunk(self, fact, bsc, l):
        """Re-solve with stored inverses — one scan dispatch per sweep."""
        DTr, DTi, dP = fact
        bP = self._packed(bsc)
        d = self._dev_maps()
        X2 = _resolve_pass(DTr, DTi, dP, bP,
                           d["eidL"], d["colL"], d["eidU"], d["colU"],
                           d["rmap"], d["src"])
        self.timings["resolve_steps"] += self.part.m
        X2h = np.asarray(X2, np.float64)
        return X2h[0] + 1j * X2h[1]

    # -- public API --------------------------------------------------------

    def solve(self, zs, V, output: bool = False, X0=None):
        """X[j] = L(z_j)⁻¹ V to complex128 accuracy (same contract as
        ShiftedPanelSolver.solve; ``X0`` accepted for interface parity and
        ignored — a direct solve needs no warm start)."""
        zs = np.asarray(zs)
        Sn = len(zs)
        V = np.asarray(V, np.complex128)
        if V.ndim == 2:
            Bfull = np.broadcast_to(V[None], (Sn,) + V.shape).copy()
        else:
            Bfull = np.ascontiguousarray(V)              # [S, n, l]
        l = Bfull.shape[2]
        coeffs = self.coefficients(zs)
        cmax = self._chunk or self._auto_chunk()
        X = np.empty((Sn, self.n, l), np.complex128)
        relres = np.empty((Sn, l))
        s0 = 0
        while s0 < Sn:
            rem = Sn - s0
            chunk = min(cmax, 1 << (rem - 1).bit_length())
            s1 = min(s0 + chunk, Sn)
            pad = chunk - (s1 - s0)
            c = coeffs[s0:s1]
            b = Bfull[s0:s1]
            if pad:
                c = np.concatenate([c, np.repeat(c[-1:], pad, 0)])
                b = np.concatenate([b, np.repeat(b[-1:], pad, 0)])
            t0 = time.perf_counter()
            mats = [self._host_csr(c[j]) for j in range(chunk)]
            srow, dpad = self._equilibrate(c)
            bsc = np.zeros((chunk, self.n + 1, l), np.complex128)
            bsc[:, :self.n] = b * srow[:, :, None]
            bnorm = np.linalg.norm(bsc, axis=1)          # [B, l] scaled
            bnorm = np.where(bnorm == 0, 1.0, bnorm)
            t1 = time.perf_counter()
            Xc, fact = self._factor_solve_chunk(dpad, bsc)
            t2 = time.perf_counter()
            # exact c128 residuals in the equilibrated norm + refinement
            best = Xc
            R = np.empty_like(bsc)
            best_res = np.empty((chunk, l))
            for j in range(chunk):
                R[j, :self.n] = (b[j] - mats[j] @ best[j]) * srow[j][:, None]
                R[j, self.n] = 0.0
                best_res[j] = np.linalg.norm(R[j], axis=0) / bnorm[j]
            t3 = time.perf_counter()
            prev_max = np.inf
            for sweep in range(self.refine_sweeps):
                cur_max = float(best_res.max())
                if output:
                    print(f"slab refine sweep {sweep}: max relres "
                          f"{cur_max:.3e}")
                if cur_max < self.refine_tol or cur_max > 0.25 * prev_max:
                    break
                prev_max = cur_max
                dX = self._resolve_chunk(fact, R, l)
                cand = best + dX
                for j in range(chunk):
                    Rc = np.zeros_like(R[j])
                    Rc[:self.n] = ((b[j] - mats[j] @ cand[j])
                                   * srow[j][:, None])
                    rc = np.linalg.norm(Rc, axis=0) / bnorm[j]
                    upd = rc < best_res[j]
                    best[j][:, upd] = cand[j][:, upd]
                    best_res[j][upd] = rc[upd]
                    R[j][:, upd] = Rc[:, upd]
            t4 = time.perf_counter()
            self.timings["prep_s"] += t1 - t0
            self.timings["device_s"] += (t2 - t1) + (t4 - t3)
            self.timings["residual_s"] += t3 - t2
            if output:
                print(f"slab chunk [{s0}:{s1}]: prep {t1 - t0:.1f}s  "
                      f"factor+bwd {t2 - t1:.1f}s  residual {t3 - t2:.1f}s  "
                      f"refine {t4 - t3:.1f}s")
            X[s0:s1] = best[:s1 - s0]
            relres[s0:s1] = best_res[:s1 - s0]
            del fact
            s0 = s1
        info = {"relres": relres, "max_relres": float(relres.max()),
                "timings": dict(self.timings)}
        return X, info


__all__ = ["SlabSolver", "SlabPartition", "bfs_levels", "SLAB_BUDGET"]
