"""Profile the matrix-free panel solver on the scale mesh (VERDICT r2 #1).

Solves one chunk of contour-node shifts on the octosplit Rijke mesh and
prints the phase breakdown (host prep / device GMRES / host residuals),
GMRES restart counts, and the per-node wall time — the numbers that
decide where the 42.5k-DOF device Beyn loses to host sparse LU.

Usage: python examples/profile_panel.py [--nsplit 2] [--nodes 16]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir))
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nsplit", type=int, default=2)
    ap.add_argument("--nodes", type=int, default=16)
    ap.add_argument("--l", type=int, default=8)
    ap.add_argument("--chunk", type=int, default=16)
    ap.add_argument("--restart", type=int, default=30)
    ap.add_argument("--max-restarts", type=int, default=10)
    ap.add_argument("--warm", action="store_true",
                    help="second half of nodes warm-started from first")
    args = ap.parse_args()

    from wavesandeigenvalues_jl_tpu.mesh import octosplit, read_mesh
    from wavesandeigenvalues_jl_tpu.mesh.refine import p1_prolongation
    from wavesandeigenvalues_jl_tpu.models import discretize
    from wavesandeigenvalues_jl_tpu.nlevp.solvers import (gauss_nodes,
                                                          initialize_V)
    from wavesandeigenvalues_jl_tpu.ops.panel_solve import (CoarseGrid,
                                                            MultiGrid,
                                                            ShiftedPanelSolver)

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
    fams = [discretize(m, ds, fld(m)) for m in meshes]
    Lf = fams[-1]
    if args.nsplit == 1:
        cg = CoarseGrid(fams[0], Ps[0])
    else:
        cg = MultiGrid(fams[-2::-1], Ps[::-1], bs=64)
    print(f"setup (mesh+assembly): {time.time()-t0:.1f}s  "
          f"dim={Lf.size} nnz={Lf._stack().nnz}")

    Gamma = [2 * np.pi * (150 - 5j), 2 * np.pi * (1000 - 5j),
             2 * np.pi * (1000 + 5j), 2 * np.pi * (150 + 5j)]
    zs_all, _ = gauss_nodes(Gamma, 32)
    # take a contiguous run of nodes from the first (long, lower) edge —
    # representative frequency span
    zs = zs_all[:args.nodes]
    V = initialize_V(Lf.size, args.l)

    solver = ShiftedPanelSolver(Lf, chunk=args.chunk, coarse=cg,
                                restart=args.restart,
                                max_restarts=args.max_restarts)
    t0 = time.time()
    if args.warm:
        half = args.nodes // 2
        X1, info1 = solver.solve(zs[0::2], V, output=True)
        # seed each odd node with the even neighbor's solution
        X0 = X1
        X2, info2 = solver.solve(zs[1::2], V, output=True, X0=X0)
        info = info2
        t_solve = time.time() - t0
        print(f"[warm pass] restarts/solve: "
              f"cold {info1['restarts_per_solve']:.1f}")
    else:
        X, info = solver.solve(zs, V, output=True)
        t_solve = time.time() - t0
    tm = info["timings"]
    other = t_solve - sum(tm.values())
    print(f"\nnodes={args.nodes} l={args.l} chunk={args.chunk} "
          f"restart={args.restart} max_restarts={args.max_restarts}")
    print(f"total solve wall:   {t_solve:8.1f}s  "
          f"({t_solve/args.nodes:.2f}s/node)")
    print(f"  host prep:        {tm['prep_s']:8.1f}s")
    print(f"  device gmres:     {tm['device_s']:8.1f}s")
    print(f"  host residuals:   {tm['residual_s']:8.1f}s")
    print(f"  other (xfer/py):  {other:8.1f}s")
    print(f"restarts/solve:     {info['restarts_per_solve']:8.1f}")
    print(f"max relres:         {info['max_relres']:.2e}")


if __name__ == "__main__":
    main()
