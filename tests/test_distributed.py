"""Multi-"host"-style tests on the virtual 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp

from ba_path_planning_tpu.parallel.distributed import (host_local_slice,
                                                       scaling_report)
from ba_path_planning_tpu.utils import ProblemConfig, SolverConfig


def test_host_local_slice_single_process():
    lo, hi = host_local_slice(64)
    assert (lo, hi) == (0, 64)


def test_scaling_report_runs_on_virtual_mesh():
    problem = ProblemConfig(n_vehicles=2, time_horizon=3.0, time_step=0.5,
                            min_distance=0.8, max_iterations=3)
    rec = scaling_report(problem, SolverConfig(max_iter=200, cg_iters=5),
                         per_chip_batch=2, dtype=jnp.float64)
    assert "1chip" in rec["configs"] and "8chips" in rec["configs"]
    assert rec["configs"]["8chips"]["batch"] == 16
    for cfg in rec["configs"].values():
        assert cfg["solves_per_sec"] > 0
        assert 0 <= cfg["collision_free_frac"] <= 1
    assert rec["configs"]["1chip"]["scaling_efficiency"] == 1.0
