"""Fold a fresh tier-1 device rerun (SCALE_HEALTHY.json, produced by a
chip-health-gated rerun of examples/scale_beyn.py) into SCALE.json.

The device contour timing is the only part that depends on chip health;
the host-side evidence is invariant and is KEPT from the existing
artifact: the uncontended standalone host LU baseline
(beyn_fine_host_lu_solo, measured solo in round 4 — the host path is
unchanged) and the per-mode host mslp cross-checks (mode_checks).  The
previous device record is preserved under ``throttled_run`` with its
chip-health context so the history of what ran under throttle stays
auditable.

Usage: python examples/scale_merge.py [--pre TFLOPS,GBPS] [--post T,G]
(the health stamps bracketing the rerun, from the watcher log).
"""
import argparse
import json
import os

ROOT = os.path.join(os.path.dirname(os.path.abspath(__file__)), os.pardir)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pre", default=None)
    ap.add_argument("--post", default=None)
    args = ap.parse_args()

    with open(os.path.join(ROOT, "SCALE.json")) as f:
        old = json.load(f)
    with open(os.path.join(ROOT, "SCALE_HEALTHY.json")) as f:
        new = json.load(f)

    # sanity: same configuration, same physics
    for k in ("nsplit", "method", "fine_dim", "contour_nodes"):
        assert old[k] == new[k], (k, old[k], new[k])
    assert all(abs(a - b) < 1e-3 for a, b in
               zip(old["passive_hz_fine"], new["passive_hz_fine"])), (
        old["passive_hz_fine"], new["passive_hz_fine"])

    merged = dict(new)
    host_solo = old["wall_s"].get("beyn_fine_host_lu_solo")
    if host_solo:
        merged["wall_s"]["beyn_fine_host_lu_solo"] = host_solo
        merged["wall_s"]["note"] = old["wall_s"].get("note")
    for k in ("mode_checks", "device_vs_host_hz"):
        if k in old and k not in merged:
            merged[k] = old[k]
    merged["throttled_run"] = {
        "wall_s": old["wall_s"],
        "chip_health_context": old.get("chip_health_context"),
    }
    stamps = {}
    if args.pre:
        stamps["pre"] = [float(x) for x in args.pre.split(",")]
    if args.post:
        stamps["post"] = [float(x) for x in args.post.split(",")]
    if stamps:
        merged["chip_health_context"] = dict(
            stamps, invalid_throttled=not all(
                s[0] >= 30.0 and s[1] >= 120.0 for s in stamps.values()))
    if host_solo and merged["wall_s"].get("beyn_fine_device"):
        merged["device_vs_host_speedup_solo"] = (
            host_solo / merged["wall_s"]["beyn_fine_device"])
    with open(os.path.join(ROOT, "SCALE.json"), "w") as f:
        json.dump(merged, f, indent=1)
    print("merged: device",
          merged["wall_s"].get("beyn_fine_device"), "s; speedup",
          merged.get("device_vs_host_speedup_solo"))


if __name__ == "__main__":
    main()
