"""Big-mesh end-to-end scale run: matrix-free device Beyn on an
octosplit-refined Rijke mesh (VERDICT r1 #5).

Octosplits the reference's Rijke_mm.msh ``--nsplit`` times (×2 →
216,320 tets / ~44k P1 DOF — a size whose dense-node device path cannot
even allocate one [d,d] factor), assembles the passive Helmholtz family,
and solves the passive modes with the two-grid-preconditioned
matrix-free device Beyn (ops/panel_solve.py).  No host densification
anywhere on the path; the coarse level of the preconditioner is the
ORIGINAL 1006-DOF mesh via composed P1 prolongations.

Writes SCALE.json at the repo root (bench.py surfaces it) with the
passive eigenfrequencies, their drift vs the coarse-mesh values
(physical mesh-convergence, expected ≲1 Hz), and wall times.

Usage:  python examples/scale_beyn.py [--nsplit 2] [--N 32] [--chunk 16]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nsplit", type=int, default=2)
    ap.add_argument("--N", type=int, default=32, help="Gauss nodes/edge")
    ap.add_argument("--l", type=int, default=8)
    ap.add_argument("--chunk", type=int, default=16)
    ap.add_argument("--restart", type=int, default=30)
    ap.add_argument("--max-restarts", type=int, default=10)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax

    from wavesandeigenvalues_jl_tpu.mesh import octosplit, read_mesh
    from wavesandeigenvalues_jl_tpu.mesh.refine import p1_prolongation
    from wavesandeigenvalues_jl_tpu.models import discretize
    from wavesandeigenvalues_jl_tpu.nlevp.solvers import beyn
    from wavesandeigenvalues_jl_tpu.ops.panel_solve import (CoarseGrid,
                                                            MultiGrid)
    from wavesandeigenvalues_jl_tpu.parallel.dist_beyn import beyn_batched

    g, R, Tu, Tb = 1.4, 287.05, 300.0, 1200.0
    ds = {"Interior": ("interior", ()),
          "Outlet": ("admittance", ("Y", 1e15))}

    def fld(m):
        return m.generate_field(
            lambda x, y, z: np.where(z < 0, np.sqrt(g * R * Tu),
                                     np.sqrt(g * R * Tb)), order="const")

    t0 = time.time()
    coarse = read_mesh("/root/reference/docs/src/Rijke_mm.msh", scale=1e-3)
    meshes, Ps = [coarse], []
    for _ in range(args.nsplit):
        Ps.append(p1_prolongation(meshes[-1]))
        meshes.append(octosplit(meshes[-1]))
    fine = meshes[-1]
    t_mesh = time.time() - t0

    t0 = time.time()
    fams = [discretize(m, ds, fld(m)) for m in meshes]
    Lc, Lf = fams[0], fams[-1]
    t_assemble = time.time() - t0
    # full multilevel hierarchy: each V-cycle level only bridges one 8×
    # octosplit refinement (a single 2-level jump stalls near 1e-3)
    if args.nsplit == 1:
        cg = CoarseGrid(Lc, Ps[0])
    else:
        cg = MultiGrid(fams[-2::-1], Ps[::-1], bs=64)

    Gamma = [2 * np.pi * (150 - 5j), 2 * np.pi * (1000 - 5j),
             2 * np.pi * (1000 + 5j), 2 * np.pi * (150 + 5j)]

    # coarse-mesh ground truth (host LU Beyn, BASELINE.md: ≈272/695 Hz)
    t0 = time.time()
    Om_c, _ = beyn(Lc, Gamma, l=args.l, N=64, rtol=1e-12)
    t_coarse = time.time() - t0
    f_coarse = np.sort(Om_c.real) / 2 / np.pi

    t0 = time.time()
    Om, _ = beyn_batched(Lf, Gamma, l=args.l, N=args.N, rtol=1e-12,
                         dense=False, output=True, coarse=cg,
                         restart=args.restart,
                         max_restarts=args.max_restarts, chunk=args.chunk,
                         checkpoint="/tmp/scale_moments.npz")
    t_fine = time.time() - t0
    f_fine = np.sort(Om.real) / 2 / np.pi

    drift = [float(min(abs(f_fine - fc))) if len(f_fine) else None
             for fc in f_coarse]
    rec = {
        "nsplit": args.nsplit,
        "device_kind": jax.devices()[0].device_kind,
        "fine_dim": int(Lf.size),
        "fine_nnz": int(Lf._stack().nnz),
        "fine_tets": int(len(fine.tetrahedra)),
        "coarse_dim": int(Lc.size),
        "contour_nodes": 4 * args.N,
        "probe_cols": args.l,
        "passive_hz_fine": [float(f) for f in f_fine],
        "passive_hz_coarse": [float(f) for f in f_coarse],
        "drift_vs_coarse_hz": drift,
        "wall_s": {"mesh": t_mesh, "assemble": t_assemble,
                   "beyn_fine_device": t_fine, "beyn_coarse_host": t_coarse},
        "solver": {"restart": args.restart,
                   "max_restarts": args.max_restarts, "chunk": args.chunk},
    }
    out = args.out or os.path.join(
        os.path.dirname(os.path.abspath(__file__)), os.pardir, "SCALE.json")
    with open(out, "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
