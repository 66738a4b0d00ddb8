"""checkify sanitizer harness (utils/debug.py): NaN detection + clean runs."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ba_path_planning_tpu.solvers.scp import SCPEngine
from ba_path_planning_tpu.utils import ProblemConfig, SolverConfig
from ba_path_planning_tpu.utils.debug import (checked, checked_jit,
                                              find_nan_lanes)


def _engine():
    problem = ProblemConfig(n_vehicles=3, time_horizon=2.0, time_step=0.4,
                            min_distance=0.5, max_iterations=3)
    solver = SolverConfig(method="direct", polish=False, adaptive_rho=False,
                          max_iter=60, check_interval=30)
    return SCPEngine(problem, solver, dtype=jnp.float32)


def _inputs(N=3):
    p0 = jnp.asarray([[5.0, 5.0], [10.0, 10.0], [15.0, 5.0]], jnp.float32)
    pf = jnp.asarray([[15.0, 15.0], [5.0, 12.0], [10.0, 15.0]], jnp.float32)
    v0 = jnp.zeros((N, 2), jnp.float32)
    return p0, v0, pf, v0, jax.random.key(0)


def test_clean_solve_passes_checks():
    eng = _engine()
    err, res = checked_jit(eng.solve_fn())(*_inputs())
    err.throw()          # no check fired
    assert bool(jnp.all(jnp.isfinite(res.positions)))


def test_nan_input_is_caught():
    eng = _engine()
    p0, v0, pf, vf, key = _inputs()
    p0 = p0.at[1, 0].set(jnp.nan)
    err, _ = checked_jit(eng.solve_fn())(p0, v0, pf, vf, key)
    with pytest.raises(Exception):
        err.throw()


def test_find_nan_lanes_flags_only_poisoned_lane():
    eng = _engine()
    p0, v0, pf, vf, key = _inputs()
    B = 4
    p0b = jnp.broadcast_to(p0, (B, 3, 2)).copy()
    p0b = p0b.at[2, 0, 0].set(jnp.nan)
    res = eng.solve_batch(p0b, jnp.broadcast_to(v0, (B, 3, 2)),
                          jnp.broadcast_to(pf, (B, 3, 2)),
                          jnp.broadcast_to(vf, (B, 3, 2)),
                          jax.random.split(key, B))
    bad = np.asarray(find_nan_lanes(res))
    assert bad[2]
    assert not bad[0] and not bad[1] and not bad[3]
