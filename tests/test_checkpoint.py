"""Checkpoint/resume subsystem tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ba_path_planning_tpu.solvers.scp import SCPEngine, SCPResult
from ba_path_planning_tpu.scenarios import generate_scenario_batch
from ba_path_planning_tpu.utils import ProblemConfig, SolverConfig
from ba_path_planning_tpu.utils.checkpoint import (ChunkedRun, load_meta,
                                                   load_result, save_result)


def _small_batch(B=6):
    problem = ProblemConfig(n_vehicles=2, time_horizon=4.0, time_step=0.5,
                            min_distance=0.8, max_iterations=5)
    eng = SCPEngine(problem, SolverConfig(max_iter=500), dtype=jnp.float64)
    sc = generate_scenario_batch(jax.random.key(0), B, n_vehicles=2,
                                 min_distance=0.8, dtype=jnp.float64)
    v0 = jnp.zeros((B, 2, 2), dtype=jnp.float64)
    keys = jax.random.split(jax.random.key(1), B)
    res = eng.solve_batch(sc.initial, v0, sc.final, v0, keys)
    return res


@pytest.mark.slow
def test_save_load_roundtrip(tmp_path):
    res = _small_batch()
    p = tmp_path / "result.npz"
    save_result(p, res, meta={"seed": 0, "n_vehicles": 2})
    back = load_result(p, SCPResult)
    np.testing.assert_allclose(back.positions, np.asarray(res.positions))
    np.testing.assert_array_equal(back.status, np.asarray(res.status))
    assert load_meta(p)["n_vehicles"] == 2


@pytest.mark.slow
def test_chunked_resume(tmp_path):
    res = _small_batch(6)
    cfg = {"n": 2, "seed": 0}
    run = ChunkedRun(tmp_path / "run", cfg)

    # first pass: complete only chunk 0
    pend = list(run.pending(6, 2))
    assert [i for i, _ in pend] == [0, 1, 2]
    idx, (lo, hi) = pend[0]
    run.save_chunk(idx, SCPResult(*[np.asarray(getattr(res, f))[lo:hi]
                                    for f in SCPResult._fields]))

    # resume: chunk 0 skipped
    run2 = ChunkedRun(tmp_path / "run", cfg)
    pend2 = list(run2.pending(6, 2))
    assert [i for i, _ in pend2] == [1, 2]
    for idx, (lo, hi) in pend2:
        run2.save_chunk(idx, SCPResult(*[np.asarray(getattr(res, f))[lo:hi]
                                         for f in SCPResult._fields]))

    merged = run2.merge(SCPResult)
    np.testing.assert_allclose(merged.positions, np.asarray(res.positions))

    # config mismatch protection
    with pytest.raises(ValueError):
        ChunkedRun(tmp_path / "run", {"n": 3, "seed": 0})


@pytest.mark.slow
def test_merge_validates_completeness(tmp_path):
    """merge(total=, chunk=) refuses incomplete or mis-chunked runs
    (ADVICE r4: a killed run or a stray chunk layout must not produce a
    silently truncated/garbled merged batch)."""
    res = _small_batch(6)
    run = ChunkedRun(tmp_path / "run", {"n": 2})

    def piece(lo, hi):
        return SCPResult(*[np.asarray(getattr(res, f))[lo:hi]
                           for f in SCPResult._fields])

    # only chunks 0 and 2 of 3 present -> missing chunk detected
    run.save_chunk(0, piece(0, 2))
    run.save_chunk(2, piece(4, 6))
    with pytest.raises(ValueError, match="missing chunks \\[1\\]"):
        run.merge(SCPResult, total=6, chunk=2)
    # unvalidated merge also refuses: indices are non-contiguous
    with pytest.raises(ValueError, match="non-contiguous"):
        run.merge(SCPResult)

    # complete run passes and returns exactly `total` rows
    run.save_chunk(1, piece(2, 4))
    merged = run.merge(SCPResult, total=6, chunk=2)
    assert len(merged.positions) == 6
    np.testing.assert_allclose(merged.positions, np.asarray(res.positions))

    # a stray chunk from a different layout is rejected
    run.save_chunk(3, piece(0, 2))
    with pytest.raises(ValueError, match="unexpected chunks \\[3\\]"):
        run.merge(SCPResult, total=6, chunk=2)
