"""Driver-contract guards for bench.py (VERDICT r4 #1).

The driver records only a 2,000-char tail of bench output and parses
the final JSON line; round 4's record was lost because the line grew
past the window.  These tests pin the contract pieces that do not need
a TPU: the headline throttle flag, the line-length guard, and that a
representative contract line (the committed BENCH_DETAIL headline plus
the worst-case optional fields) stays under the limit.
"""
import json
import os
import sys

import pytest

ROOT = os.path.join(os.path.dirname(os.path.abspath(__file__)), os.pardir)
sys.path.insert(0, ROOT)

import bench  # noqa: E402


def test_headline_throttle_flag_prefers_large_section():
    large = {"nnz_per_s": 1.0, "invalid_throttled": True}
    best = {"invalid_throttled": False}
    assert bench.headline_throttle_flag(large, best) is True
    large["invalid_throttled"] = False
    best["invalid_throttled"] = True
    assert bench.headline_throttle_flag(large, best) is False


def test_headline_throttle_flag_falls_back_to_sweep():
    large = {"error": "RuntimeError: boom"}
    assert bench.headline_throttle_flag(large, {"invalid_throttled": True})
    assert not bench.headline_throttle_flag(large, {})


def test_contract_line_guard_rejects_oversize():
    ok = json.dumps({"metric": "m", "value": 1.0})
    assert bench.check_contract_line(ok) == ok
    with pytest.raises(AssertionError):
        bench.check_contract_line("x" * bench.CONTRACT_LINE_LIMIT)


def test_committed_headline_fits_capture_window():
    """The committed BENCH_DETAIL headline — with the throttle flag and
    the inline last-healthy record forced on (the largest the line can
    get) — must stay under the driver's capture window."""
    path = os.path.join(ROOT, "BENCH_DETAIL.json")
    if not os.path.exists(path):
        pytest.skip("no committed BENCH_DETAIL.json")
    with open(path) as f:
        headline = json.load(f)["headline"]
    headline["invalid_throttled"] = True
    headline.setdefault("extra", {})["last_healthy_record"] = {
        "round": 3,
        "metric": "helmholtz_operator_spmm128_nnz_per_s_per_chip",
        "value": 3.7083686748e10, "vs_baseline": 61.8}
    line = json.dumps(headline)
    assert len(line) < bench.CONTRACT_LINE_LIMIT, len(line)
