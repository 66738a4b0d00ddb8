"""CLI + viz smoke tests: end-to-end console-script equivalents, schema parity."""

import csv
import json
from pathlib import Path

import numpy as np

import pytest

pytestmark = pytest.mark.slow


def test_package_public_api():
    import ba_path_planning_tpu as bapp
    assert callable(bapp.SCP)
    assert callable(bapp.generate_positions)
    assert callable(bapp.make_boxplot)


def test_compute_trajectories_cli(tmp_path):
    from ba_path_planning_tpu.cli.compute_trajectories import main
    out = tmp_path / "traj.pdf"
    rc = main(["--n-vehicles", "3", "--time-horizon", "6", "--time-step",
               "0.5", "--min-distance", "0.8", "--seed", "3",
               "--trajectories-out", str(out)])
    assert rc == 0
    assert out.exists()


def test_batch_cli_schema(tmp_path):
    from ba_path_planning_tpu.cli.compute_trajectories_batch import main
    rd = tmp_path / "results"
    rc = main(["--ns", "3", "--trials-per-n", "4", "--time-horizon", "5",
               "--time-step", "0.5", "--min-distance", "0.8",
               "--max-iterations", "8", "--rng-seed", "0",
               "--results-dir", str(rd), "--dtype", "float64"])
    assert rc == 0

    jsons = list(rd.glob("scp_benchmark_*.json"))
    csvs = list(rd.glob("scp_benchmark_*.csv"))
    assert len(jsons) == 1 and len(csvs) == 1

    doc = json.loads(jsons[0].read_text())
    # reference schema surface (compute_trajectories_batch.py:91-100)
    assert doc["meta"]["schema_version"] == "1.0"
    assert set(doc) == {"meta", "runs", "summary"}
    assert len(doc["runs"]) == 4
    for r in doc["runs"]:
        assert {"N", "trial_index", "status", "time_sec", "K", "T",
                "h"} <= set(r)
    s = doc["summary"]["3"]
    assert {"count", "errors", "min", "max", "mean", "median", "p25", "p75",
            "std"} <= set(s)

    with open(csvs[0]) as f:
        rows = list(csv.DictReader(f))
    assert rows[0].keys() == {"N", "trial_index", "status", "time_sec", "K",
                              "T", "h", "error"}


def test_boxplot_from_batch_output(tmp_path):
    """Full pipeline: batch CSV -> boxplot PDF (reference scp-boxplot flow)."""
    from ba_path_planning_tpu.viz.boxplot import make_boxplot
    rd = tmp_path / "results"
    rd.mkdir()
    # synthetic CSV in the reference schema
    with open(rd / "scp_benchmark_test.csv", "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["N", "trial_index", "status",
                                          "time_sec", "K", "T", "h", "error"])
        w.writeheader()
        rng = np.random.default_rng(0)
        for n in (18, 20):
            for t in range(10):
                w.writerow({"N": n, "trial_index": t, "status": "success",
                            "time_sec": float(rng.uniform(0.1, 2.0)),
                            "K": 50, "T": 10.0, "h": 0.2, "error": ""})
    out = tmp_path / "plots" / "box.pdf"
    saved = make_boxplot(str(rd), str(out))
    assert Path(saved).exists()


def test_boxplot_missing_dir_errors(tmp_path):
    from ba_path_planning_tpu.cli.boxplot import main
    rc = main(["--data-dir", str(tmp_path / "nope"),
               "--out-path", str(tmp_path / "x.pdf")])
    assert rc == 1


def test_position_generator_cli(tmp_path):
    from ba_path_planning_tpu.cli.position_generator import main
    out = tmp_path / "scenario.pdf"
    rc = main(["--n-vehicles", "8", "--min-distance", "0.8", "--seed", "5",
               "--out", str(out)])
    assert rc == 0
    assert out.exists()


def test_collision_net_train_and_roundtrip(tmp_path):
    """train-network CLI end-to-end on a tiny problem: trains, evaluates,
    saves; params reload bit-exactly and predict identically.
    (Implements the reference's intended-but-missing train-network script,
    reference pyproject.toml:57.)"""
    import jax
    import jax.numpy as jnp
    from ba_path_planning_tpu.cli.train_collision_network import main
    from ba_path_planning_tpu.models.collision_net import (
        load_params, make_train_state, predict_logits, save_params)

    out = tmp_path / "cnet.npz"
    rc = main(["--n-vehicles", "3", "--samples", "96", "--label-chunk", "48",
               "--batch-size", "32", "--epochs", "3", "--time-horizon",
               "2.0", "--min-distance", "0.6", "--out", str(out)])
    assert rc == 0
    assert out.exists()

    params, _, apply_fn, _ = make_train_state(jax.random.key(1), 3)
    save_params(str(tmp_path / "p.npz"), params)
    params2 = load_params(str(tmp_path / "p.npz"), params)
    p0 = jnp.asarray(np.random.default_rng(0).uniform(2, 18, (4, 3, 2)),
                     jnp.float32)
    pf = jnp.asarray(np.random.default_rng(1).uniform(2, 18, (4, 3, 2)),
                     jnp.float32)
    l1 = predict_logits(params, p0, pf, apply_fn=apply_fn)
    l2 = predict_logits(params2, p0, pf, apply_fn=apply_fn)
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))


def test_plot_collisions_cli(tmp_path):
    """plot-collisions CLI: solves a small batch and writes the analysis
    figure (reference's intended plot-collisions script, pyproject.toml:55)."""
    from ba_path_planning_tpu.viz.plot_collisions import main
    out = tmp_path / "col.png"
    rc = main(["--n-vehicles", "3", "--trials", "4", "--time-horizon", "2.0",
               "--min-distance", "0.6", "--out-path", str(out)])
    assert rc == 0
    assert out.exists()
