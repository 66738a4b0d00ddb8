"""Committed performance/parity artifacts stay consistent with their cost
models and schemas (BASELINE.md kernel-efficiency + parity rows)."""

import json
import os

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_roofline_artifact_tracks_cost_model():
    """docs/roofline.json: measured kernel throughput is within sane
    bounds of the profiling cost model — above 2% of peak (the model is
    not wildly over-counting work) and at most peak (not under-counting)."""
    path = os.path.join(HERE, "docs", "roofline.json")
    with open(path) as f:
        rec = json.load(f)
    assert rec["peaks"]["hbm_GBps"] > 0
    assert len(rec["kernels"]) >= 1
    for k in rec["kernels"]:
        xf = k["xupdate"]["frac_of_hbm_peak"]
        ff = k["factorize"]["frac_of_f32_peak"]
        assert 0.02 <= xf <= 1.0, (k["N"], xf)
        assert 0.02 <= ff <= 1.0, (k["N"], ff)
        assert k["xupdate"]["measured_s"] > 0
        assert k["factorize"]["measured_s"] > 0


def test_roofline_cost_model_shapes():
    """The analytic cost model scales the way the kernels do: x-update
    bytes quadratic in the padded block size, factorization flops cubic."""
    from ba_path_planning_tpu.utils.profiling import (direct_xupdate_cost,
                                                      factorize_X_cost,
                                                      lane_pad)
    a = direct_xupdate_cost(20, 50)
    b = direct_xupdate_cost(40, 50)
    assert b["hbm_bytes"] / a["hbm_bytes"] == (lane_pad(240) / lane_pad(120)) ** 2
    fa = factorize_X_cost(20, 50, ns_iters=2)
    fb = factorize_X_cost(40, 50, ns_iters=2)
    assert 7.5 <= fb["flops"] / fa["flops"] <= 8.5      # ~ (np ratio)^3


def test_nsweep_artifact_schema():
    path = os.path.join(HERE, "docs", "soak_nsweep_v5e.json")
    with open(path) as f:
        rec = json.load(f)
    assert rec["soak"]["solves_per_sec"] > 0
    ns = [r["N"] for r in rec["n_sweep"]]
    assert ns == sorted(ns) and len(ns) >= 3
