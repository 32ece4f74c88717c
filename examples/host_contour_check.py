"""Standalone host splu contour timing (the reference's compute model).

Re-measures the tier-1 host number UNCONTENDED (the in-run host check of
scale_beyn.py can share the 2-core host with other work; this driver is
meant to run alone) and patches SCALE.json's
``wall_s.beyn_fine_host_lu_solo`` in place.

Usage: python examples/host_contour_check.py [--nsplit 2] [--N 32]
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
    ap.add_argument("--N", type=int, default=32)
    ap.add_argument("--l", type=int, default=8)
    ap.add_argument("--max-nodes", type=int, default=None,
                    help="measure only this many quadrature nodes and "
                         "extrapolate linearly (per-node splu cost is "
                         "node-independent); VERDICT r4 #4 asks >= 8 "
                         "measured nodes for the tier-2 baseline")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")   # no device session needed

    import scipy.sparse as sp
    import scipy.sparse.linalg as spl

    from wavesandeigenvalues_jl_tpu.mesh import octosplit, read_mesh
    from wavesandeigenvalues_jl_tpu.models import discretize
    from wavesandeigenvalues_jl_tpu.nlevp.solvers import (gauss_nodes,
                                                          initialize_V)

    g, R, Tu, Tb = 1.4, 287.05, 300.0, 1200.0
    mesh = read_mesh("/root/reference/docs/src/Rijke_mm.msh", scale=1e-3)
    for _ in range(args.nsplit):
        mesh = octosplit(mesh)
    c = mesh.generate_field(
        lambda x, y, z: np.where(z < 0, np.sqrt(g * R * Tu),
                                 np.sqrt(g * R * Tb)), order="const")
    L = discretize(mesh, {"Interior": ("interior", ()),
                          "Outlet": ("admittance", ("Y", 1e15))}, c)
    Gamma = [2 * np.pi * (150 - 5j), 2 * np.pi * (1000 - 5j),
             2 * np.pi * (1000 + 5j), 2 * np.pi * (150 + 5j)]
    zs, ws = gauss_nodes(Gamma, args.N)
    V = initialize_V(L.size, args.l)
    S = L._stack()
    vals = np.asarray(S.values, np.complex128)
    eig = L.eigval
    n_run = len(zs) if args.max_nodes is None else min(args.max_nodes,
                                                       len(zs))
    print(f"dim {L.size}, {n_run}/{len(zs)} nodes", flush=True)
    t0 = time.time()
    per_node = []
    A = np.zeros((L.size, args.l, 2), np.complex128)
    for i, (z, w) in enumerate(zip(zs[:n_run], ws[:n_run])):
        tn = time.time()
        L.params[eig] = complex(z)
        data = L.coefficients({}) @ vals
        M = sp.csr_matrix((data, S.indices, S.indptr),
                          shape=S.shape).tocsc()
        X = spl.splu(M).solve(V)
        A[:, :, 0] += w * X
        A[:, :, 1] += w * z * X
        per_node.append(time.time() - tn)
        print(f"  node {i + 1}/{n_run}  ({time.time() - t0:.0f}s)",
              flush=True)
    t_host = time.time() - t0
    print(f"host splu contour ({n_run} nodes): {t_host:.1f} s")

    out = args.out or os.path.join(
        os.path.dirname(os.path.abspath(__file__)), os.pardir, "SCALE.json")
    if os.path.exists(out):
        with open(out) as f:
            rec = json.load(f)
        w_ = rec.setdefault("wall_s", {})
        if n_run == len(zs):
            w_["beyn_fine_host_lu_solo"] = t_host
            w_["note"] = (
                "beyn_fine_host_lu_solo measured UNCONTENDED by "
                "examples/host_contour_check.py")
        else:
            w_["host_lu_subset"] = t_host
            w_["beyn_fine_host_lu_extrapolated"] = (
                t_host * len(zs) / n_run)
            rec["host_lu_subset_nodes"] = n_run
            rec["host_lu_per_node_s"] = per_node
            rec["host_s_per_node"] = t_host / n_run
            w_["host_note"] = (
                f"host subset measured UNCONTENDED over {n_run} of "
                f"{len(zs)} nodes by examples/host_contour_check.py; "
                "total extrapolated linearly (per-node splu cost is "
                "node-independent)")
        with open(out, "w") as f:
            json.dump(rec, f, indent=1)
        print(f"patched {out}")
    else:
        with open(out, "w") as f:
            json.dump({"nsplit": args.nsplit, "N": args.N, "l": args.l,
                       "nodes_measured": n_run, "nodes_total": len(zs),
                       "host_subset_s": t_host,
                       "host_s_per_node": t_host / n_run,
                       "host_lu_per_node_s": per_node,
                       "extrapolated_s": t_host * len(zs) / n_run}, f,
                      indent=1)
        print(f"wrote {out}")


if __name__ == "__main__":
    main()
