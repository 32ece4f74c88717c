"""Profile the block-tridiagonal slab direct solver on the scale mesh.

Times partition + factorization + refinement for a batch of contour-node
shifts on the octosplit Rijke operator and cross-checks one shift against
host sparse LU.  This is the direct device path meant to beat the
reference's UMFPACK envelope (beyn.jl:62-74; host baseline in SCALE.json:
1492 s for 128 nodes).

Usage: python examples/profile_slab.py [--nsplit 2] [--nodes 16] [--chunk 8]
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
    ap.add_argument("--chunk", type=int, default=8)
    ap.add_argument("--check", action="store_true",
                    help="cross-check one shift against host sparse LU")
    args = ap.parse_args()

    from wavesandeigenvalues_jl_tpu.mesh import octosplit, read_mesh
    from wavesandeigenvalues_jl_tpu.models import discretize
    from wavesandeigenvalues_jl_tpu.nlevp.solvers import (gauss_nodes,
                                                          initialize_V)
    from wavesandeigenvalues_jl_tpu.ops.slab_solve import SlabSolver

    g, R, Tu, Tb = 1.4, 287.05, 300.0, 1200.0
    ds = {"Interior": ("interior", ()),
          "Outlet": ("admittance", ("Y", 1e15))}

    t0 = time.time()
    mesh = read_mesh("/root/reference/docs/src/Rijke_mm.msh", scale=1e-3)
    for _ in range(args.nsplit):
        mesh = octosplit(mesh)
    c = mesh.generate_field(
        lambda x, y, z: np.where(z < 0, np.sqrt(g * R * Tu),
                                 np.sqrt(g * R * Tb)), order="const")
    L = discretize(mesh, ds, c)
    t_setup = time.time() - t0

    t0 = time.time()
    solver = SlabSolver(L, chunk=args.chunk)
    t_part = time.time() - t0
    print(f"setup {t_setup:.1f}s  partition {t_part:.1f}s  "
          f"dim={L.size} nnz={L._stack().nnz} m={solver.part.m} "
          f"smax={solver.part.smax} emax={solver.emax} "
          f"auto_chunk={solver._auto_chunk()}")

    Gamma = [2 * np.pi * (150 - 5j), 2 * np.pi * (1000 - 5j),
             2 * np.pi * (1000 + 5j), 2 * np.pi * (150 + 5j)]
    zs_all, _ = gauss_nodes(Gamma, 32)
    zs = zs_all[:args.nodes]
    V = initialize_V(L.size, args.l)

    t0 = time.time()
    X, info = solver.solve(zs, V, output=True)
    t_solve = time.time() - t0
    tm = info["timings"]
    other = t_solve - tm["prep_s"] - tm["device_s"] - tm["residual_s"]
    print(f"\nnodes={args.nodes} l={args.l} chunk={args.chunk} "
          f"s={solver.part.smax} m={solver.part.m}")
    print(f"total solve wall:   {t_solve:8.1f}s  "
          f"({t_solve/args.nodes:.2f}s/node)")
    print(f"  host prep:        {tm['prep_s']:8.1f}s")
    print(f"  device sweeps:    {tm['device_s']:8.1f}s "
          f"({tm['factor_steps']} factor, {tm['resolve_steps']} resolve "
          f"steps)")
    print(f"  host residuals:   {tm['residual_s']:8.1f}s")
    print(f"  other (xfer/py):  {other:8.1f}s")
    print(f"max relres:         {info['max_relres']:.2e}")

    if args.check:
        import scipy.sparse.linalg as spl
        t0 = time.time()
        A0 = solver._host_csr(solver.coefficients(zs[:1])[0]).tocsc()
        lu = spl.splu(A0)
        Xe = lu.solve(V)
        t_host = time.time() - t0
        err = np.linalg.norm(X[0] - Xe) / np.linalg.norm(Xe)
        print(f"host splu 1 node:   {t_host:8.1f}s   rel err vs device "
              f"{err:.2e}")


if __name__ == "__main__":
    main()
