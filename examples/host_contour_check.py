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
    print(f"dim {L.size}, {len(zs)} nodes")
    t0 = time.time()
    A = np.zeros((L.size, args.l, 2), np.complex128)
    for i, (z, w) in enumerate(zip(zs, ws)):
        L.params[eig] = complex(z)
        data = L.coefficients({}) @ vals
        M = sp.csr_matrix((data, S.indices, S.indptr),
                          shape=S.shape).tocsc()
        X = spl.splu(M).solve(V)
        A[:, :, 0] += w * X
        A[:, :, 1] += w * z * X
        if (i + 1) % 16 == 0:
            print(f"  node {i + 1}/{len(zs)}  ({time.time() - t0:.0f}s)")
    t_host = time.time() - t0
    print(f"host splu contour: {t_host:.1f} s")

    out = args.out or os.path.join(
        os.path.dirname(os.path.abspath(__file__)), os.pardir, "SCALE.json")
    if os.path.exists(out):
        with open(out) as f:
            rec = json.load(f)
        rec.setdefault("wall_s", {})["beyn_fine_host_lu_solo"] = t_host
        rec["wall_s"]["note"] = (
            "beyn_fine_host_lu_solo measured UNCONTENDED by "
            "examples/host_contour_check.py; beyn_fine_host_lu from the "
            "combined run shared the host CPU with a test suite for its "
            "first ~10 min")
        with open(out, "w") as f:
            json.dump(rec, f, indent=1)
        print(f"patched {out}")


if __name__ == "__main__":
    main()
