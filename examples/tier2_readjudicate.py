"""Tier-2 re-adjudication on the host (VERDICT r4 #3): verify modes of
the 313k-DOF octosplit^3 Rijke operator with the ROW-EQUILIBRATED
residual metric and warm-started host mslp polishes.

Two jobs in one artifact (TIER2_READJUDICATION.json):

1. The reference's two passive modes (≈272 / ≈695 Hz, BASELINE.md) are
   located at tier-2 size by mslp from the tier-1 fine values — the
   evidence VERDICT r4 flagged missing ("tier 2 never sees the
   fundamental").
2. Round 4's four [680, 700] Hz contour candidates (three of which
   matched nothing at any other resolution) are retested: mslp from
   each estimate; a REAL mode converges in a couple of Newton steps to
   a nearby frequency with a small equilibrated residual, a spurious
   one runs away or collapses onto a neighbor.

Each mslp iteration is one 313k sparse LU (~6 min, the reference's
UMFPACK compute model — beyn.jl:62-74); everything runs on host CPUs.

``--only name1,name2`` restricts to a candidate subset and MERGES the
new records into an existing TIER2_READJUDICATION.json (a full polish
is ~1 h/candidate on the 2-core host, so candidates are adjudicated
incrementally); ``--maxiter k`` bounds the Newton steps — one step is
already decisive for spuriousness when the eigenvalue update is large
(a real mode's first update is ~1e-2 Hz here, a spurious candidate's
is ~Hz).
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
    ap.add_argument("--only", default=None,
                    help="comma-separated candidate names; merge into "
                         "the existing artifact instead of overwriting")
    ap.add_argument("--maxiter", type=int, default=4)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")

    from wavesandeigenvalues_jl_tpu.mesh import octosplit, read_mesh
    from wavesandeigenvalues_jl_tpu.models import discretize
    from wavesandeigenvalues_jl_tpu.nlevp import mslp
    from wavesandeigenvalues_jl_tpu.nlevp.solvers import (
        row_equilibrated_residual)

    g, R, Tu, Tb = 1.4, 287.05, 300.0, 1200.0
    t0 = time.time()
    mesh = read_mesh("/root/reference/docs/src/Rijke_mm.msh", scale=1e-3)
    for _ in range(3):
        mesh = octosplit(mesh)
    c = mesh.generate_field(
        lambda x, y, z: np.where(z < 0, np.sqrt(g * R * Tu),
                                 np.sqrt(g * R * Tb)), order="const")
    L = discretize(mesh, {"Interior": ("interior", ()),
                          "Outlet": ("admittance", ("Y", 1e15))}, c)
    print(f"dim {L.size} assembled in {time.time() - t0:.0f}s", flush=True)

    # start estimates: the two reference modes (from the tier-1 fine
    # values, SCALE.json) and round 4's four tier-2 contour candidates
    candidates = [
        ("fundamental_272", 272.0037),
        ("second_694", 694.4615),
        ("r4_t2_687.80", 687.8000470336153),
        ("r4_t2_689.68", 689.6821910572149),
        ("r4_t2_693.32", 693.315039458943),
        ("r4_t2_694.41", 694.4055546616016),
    ]
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        os.pardir, "TIER2_READJUDICATION.json")
    if args.only:
        names = set(args.only.split(","))
        candidates = [c for c in candidates if c[0] in names]
        with open(path) as f:
            out = json.load(f)
    else:
        out = {"dim": int(L.size), "nnz": int(L._stack().nnz), "modes": []}
    for name, f_hz in candidates:
        t0 = time.time()
        rec = {"name": name, "start_hz": f_hz}
        if args.maxiter != 4:
            rec["maxiter"] = args.maxiter
        try:
            sol, its, flag = mslp(L, 2 * np.pi * f_hz,
                                  maxiter=args.maxiter, tol=1e-9)
            om = sol.params[sol.eigval]
            req = row_equilibrated_residual(L(complex(om)), sol.v)
            rec.update({
                "converged_hz": [om.real / 2 / np.pi, om.imag / 2 / np.pi],
                "moved_hz": abs(om / 2 / np.pi - f_hz),
                "iters": int(its), "flag": int(flag),
                "equilibrated_residual": float(req),
            })
        except Exception as e:
            rec["error"] = f"{type(e).__name__}: {e}"
        rec["wall_s"] = time.time() - t0
        out["modes"] = [m for m in out["modes"] if m["name"] != name]
        out["modes"].append(rec)
        print(json.dumps(rec), flush=True)
        with open(path, "w") as f:       # write incrementally: each mode
            json.dump(out, f, indent=1)  # is evidence on its own
    print("done")


if __name__ == "__main__":
    main()
