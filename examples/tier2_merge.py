"""Merge the tier-2 host re-adjudication into SCALE_TIER2.json.

Round 4's 313,829-DOF device contour covered [680, 700] Hz and accepted
four candidates under the Frobenius-normalized residual metric — which
the Y=1e15 penalty rows deflate by ~16 orders (VERDICT r4 #3), so that
acceptance filtered nothing.  Round 5 re-adjudicated at tier-2 size with
host mslp polishes under the ROW-EQUILIBRATED metric
(examples/tier2_readjudicate.py -> TIER2_READJUDICATION.json):

* the FUNDAMENTAL, which the r4 contour never covered, converges at
  313,829 DOF to 271.99104 Hz (flag 0, equilibrated residual 6.7e-16);
* the r4 candidate 694.4056 Hz converges 3.5e-3 Hz away to
  694.40902 Hz (flag 0, residual 6.9e-16) — verified;
* the r4 candidate 687.80 Hz COLLAPSES onto 694.40902 Hz (moves
  6.6 Hz, flag 1) — spurious confirmed;
* 689.68 / 693.32 Hz were not individually polished (each tier-2 host
  polish costs ~1 h on the 2-core host); with the adjacent candidate
  collapsing and no counterpart at any other resolution (VERDICT r4),
  they are classed unverified and DROPPED from the verified set.

This script promotes the verified, equilibrated-metric mode set to the
top-level ``passive_hz_fine`` (what downstream consumers read), keeps
the full r4 device-contour record under ``r4_device_contour`` for
provenance, and re-labels the deflated r4 residual column.

Reference parity: docs/src/tutorial_00_NLEVP.md:291-302 (per-eigenpair
residual check) and tutorial_01_rijke_tube.jl:176-189 (the 272/695 Hz
passive pair).
"""
import json
import os

ROOT = os.path.join(os.path.dirname(os.path.abspath(__file__)), os.pardir)


def main():
    with open(os.path.join(ROOT, "SCALE_TIER2.json")) as f:
        t2 = json.load(f)
    with open(os.path.join(ROOT, "TIER2_READJUDICATION.json")) as f:
        readj = json.load(f)

    if "r4_device_contour" in t2:
        print("SCALE_TIER2.json already merged; nothing to do")
        return

    by_name = {m["name"]: m for m in readj["modes"]}
    fund = by_name["fundamental_272"]
    second = by_name["second_694"]
    collapsed = by_name["r4_t2_687.80"]

    r4 = {k: t2[k] for k in (
        "passive_hz_fine", "eig_residuals", "res_tol", "n_modes_fine",
        "checkpoint_resume") if k in t2}
    r4["residual_metric"] = (
        "frobenius-normalized — deflated ~16 orders by the Y=1e15 "
        "penalty rows (VERDICT r4 #3); superseded by the equilibrated "
        "re-adjudication below")
    r4["contour_hz"] = [680.0, 700.0]

    # device-vs-host at tier-2 size: the 694.409 mode is the one with a
    # direct device-contour estimate; the fundamental's device evidence
    # is the tier-1 (42.5k-DOF) contour + host mslp convergence from it
    # at 313k (start 272.0037 -> 271.99104, i.e. mesh drift 0.0127 Hz).
    dev_vs_host = [None, abs(694.4055546616016 -
                             second["converged_hz"][0])]

    merged = dict(t2)
    merged["r4_device_contour"] = r4
    merged["passive_hz_fine"] = [fund["converged_hz"][0],
                                 second["converged_hz"][0]]
    merged["n_modes_fine"] = 2
    merged["eig_residuals"] = [fund["equilibrated_residual"],
                               second["equilibrated_residual"]]
    merged["residual_metric"] = "row_equilibrated"
    merged["res_tol"] = 1e-6
    merged["device_vs_host_hz"] = dev_vs_host
    merged["mode_provenance"] = [
        "host mslp at 313,829 DOF (flag 0, 3 iters) warm-started from "
        "the tier-1 device contour estimate 272.0037 Hz; the [680,700] "
        "r4 device contour did not cover the fundamental",
        "r4 device-contour candidate 694.4056 Hz polished by host mslp "
        "(flag 0, 3 iters) to 694.40902 Hz — device contour vs "
        "converged: 3.5e-3 Hz",
    ]
    merged["spurious_dropped"] = [
        {"hz": collapsed["start_hz"],
         "status": "retested: collapses onto 694.40902 Hz "
                   "(moved 6.61 Hz, flag 1) — spurious"},
        {"hz": 689.6821910572149,
         "status": "not individually polished (tier-2 host polish ~1 h "
                   "each); no counterpart at any other resolution — "
                   "unverified, dropped"},
        {"hz": 693.315039458943,
         "status": "not individually polished; no counterpart at any "
                   "other resolution — unverified, dropped"},
    ]
    merged["drift_vs_coarse_hz"] = [
        abs(fund["converged_hz"][0] - 272.06422317427166),
        abs(second["converged_hz"][0] - 694.9676518655496),
    ]
    merged["passive_hz_coarse"] = [272.06422317427166, 694.9676518655496]
    merged["n_modes_coarse"] = 2
    merged["readjudication"] = readj

    with open(os.path.join(ROOT, "SCALE_TIER2.json"), "w") as f:
        json.dump(merged, f, indent=1)
    print("merged: passive_hz_fine =", merged["passive_hz_fine"],
          "residuals =", merged["eig_residuals"])


if __name__ == "__main__":
    main()
