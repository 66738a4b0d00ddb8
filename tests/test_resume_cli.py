"""Batch-CLI checkpoint/resume (--resume-dir, utils.checkpoint.ChunkedRun).

A run killed mid-way must resume from the completed chunks and produce a
merged result identical to an uninterrupted run (VERDICT r3 task 7).
Reference analogue: persisted benchmark records,
compute_trajectories_batch.py:153-164.
"""

import numpy as np
import pytest

from ba_path_planning_tpu.cli import compute_trajectories_batch as cli
from ba_path_planning_tpu.parallel.mesh import ShardedSCPSolver

CFG = {
    "Ns": [4],
    "trials_per_N": 16,
    "time_horizon": 3.0,
    "time_step": 0.5,
    "min_distance": 0.6,
    "space_dims": [0, 0, 20, 20],
    "max_iterations": 4,
    "rng_seed": 7,
}


def _rows(resume_dir=None, resume_chunk=8):
    import jax.numpy as jnp
    return cli.run_batch_for_n(4, CFG, jnp.float32,
                               resume_dir=resume_dir,
                               resume_chunk=resume_chunk)


@pytest.mark.slow
def test_killed_run_resumes_to_identical_result(tmp_path, monkeypatch):
    straight = _rows()

    # first attempt dies after the first chunk completes (simulated kill)
    calls = {"n": 0}
    orig = ShardedSCPSolver.solve_compacted

    def dying(self, *a, **kw):
        if calls["n"] >= 1:
            raise RuntimeError("simulated kill")
        calls["n"] += 1
        return orig(self, *a, **kw)

    monkeypatch.setattr(ShardedSCPSolver, "solve_compacted", dying)
    with pytest.raises(RuntimeError, match="simulated kill"):
        _rows(resume_dir=str(tmp_path / "run"))
    monkeypatch.setattr(ShardedSCPSolver, "solve_compacted", orig)

    # chunk 0 persisted, later chunks absent
    chunks = sorted((tmp_path / "run" / "N4").glob("chunk_*.npz"))
    assert len(chunks) == 1, chunks

    # resume completes the remaining chunks only and matches the straight run
    resumed = _rows(resume_dir=str(tmp_path / "run"))
    assert len(resumed) == len(straight) == CFG["trials_per_N"]
    for a, b in zip(resumed, straight):
        assert a["status"] == b["status"]
        assert a["scp_iterations"] == b["scp_iterations"]
        np.testing.assert_allclose(a["goal_error_m"], b["goal_error_m"],
                                   atol=1e-7)

    # a second rerun is a no-op (all chunks done) with identical rows
    rerun = _rows(resume_dir=str(tmp_path / "run"))
    for a, b in zip(rerun, resumed):
        assert a["status"] == b["status"]
        assert a["scp_iterations"] == b["scp_iterations"]


@pytest.mark.slow
def test_resume_refuses_config_mismatch(tmp_path):
    _rows(resume_dir=str(tmp_path / "run"))
    bad = dict(CFG, max_iterations=9)
    import jax.numpy as jnp
    with pytest.raises(ValueError, match="different config"):
        cli.run_batch_for_n(4, bad, jnp.float32,
                            resume_dir=str(tmp_path / "run"))
