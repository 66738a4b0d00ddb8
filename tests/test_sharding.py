"""Sharded batch solves on the virtual 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp

from ba_path_planning_tpu.parallel.mesh import ShardedSCPSolver, make_mesh
from ba_path_planning_tpu.scenarios import generate_scenario_batch
from ba_path_planning_tpu.solvers.scp import SCPEngine
from ba_path_planning_tpu.utils import ProblemConfig, SolverConfig
import pytest


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert mesh.devices.size == 8


@pytest.mark.slow
def test_sharded_batch_matches_unsharded():
    problem = ProblemConfig(n_vehicles=3, time_horizon=5.0, time_step=0.5,
                            min_distance=0.8, max_iterations=8)
    # adaptive rho branches amplify cross-compilation FP noise into different
    # (equally valid) iterate paths; disable it for the exact-match check
    solver = SolverConfig(eps_abs=1e-5, eps_rel=1e-5, max_iter=4000,
                          adaptive_rho=False)
    B = 16
    sc = generate_scenario_batch(jax.random.key(0), B,
                                 n_vehicles=problem.n_vehicles,
                                 min_distance=problem.min_distance,
                                 dtype=jnp.float64)
    v0 = jnp.zeros((B, problem.n_vehicles, 2), dtype=jnp.float64)
    keys = jax.random.split(jax.random.key(1), B)

    sharded = ShardedSCPSolver(problem, solver, dtype=jnp.float64)
    res_sh = sharded.solve(sc.initial, v0, sc.final, v0, keys)

    eng = SCPEngine(problem, solver, dtype=jnp.float64)
    res_un = eng.solve_batch(sc.initial, v0, sc.final, v0, keys)

    np.testing.assert_allclose(np.asarray(res_sh.positions),
                               np.asarray(res_un.positions), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(res_sh.status),
                                  np.asarray(res_un.status))
    # outputs actually sharded over the scenario axis
    shard_devs = {d for s in res_sh.positions.addressable_shards
                  for d in [s.device]}
    assert len(shard_devs) == 8


@pytest.mark.slow
def test_microbatched_matches_unchunked():
    problem = ProblemConfig(n_vehicles=3, time_horizon=5.0, time_step=0.5,
                            min_distance=0.8, max_iterations=8)
    solver = SolverConfig(eps_abs=1e-5, eps_rel=1e-5, max_iter=4000,
                          adaptive_rho=False)
    B = 32
    sc = generate_scenario_batch(jax.random.key(5), B,
                                 n_vehicles=problem.n_vehicles,
                                 min_distance=problem.min_distance,
                                 dtype=jnp.float64)
    v0 = jnp.zeros((B, problem.n_vehicles, 2), dtype=jnp.float64)
    keys = jax.random.split(jax.random.key(6), B)

    full = ShardedSCPSolver(problem, solver, dtype=jnp.float64)
    micro = ShardedSCPSolver(problem, solver, dtype=jnp.float64, microbatch=2)
    res_f = full.solve(sc.initial, v0, sc.final, v0, keys)
    res_m = micro.solve(sc.initial, v0, sc.final, v0, keys)
    np.testing.assert_allclose(np.asarray(res_m.positions),
                               np.asarray(res_f.positions), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(res_m.status),
                                  np.asarray(res_f.status))


@pytest.mark.slow
def test_compacted_matches_plain():
    """Straggler-compacted driver must produce the same trajectories and
    statuses as the monolithic batched while_loop (resume is exact: the
    PRNG fold is keyed by the carried global iteration index)."""
    problem = ProblemConfig(n_vehicles=4, time_horizon=5.0, time_step=0.5,
                            min_distance=0.8, max_iterations=8,
                            stop_mode="feasible")
    solver = SolverConfig.production(pallas=False)
    B = 16
    sc = generate_scenario_batch(jax.random.key(2), B,
                                 n_vehicles=problem.n_vehicles,
                                 min_distance=problem.min_distance,
                                 dtype=jnp.float32)
    v0 = jnp.zeros((B, problem.n_vehicles, 2), dtype=jnp.float32)
    keys = jax.random.split(jax.random.key(3), B)

    sh = ShardedSCPSolver(problem, solver, dtype=jnp.float32)
    res_plain = sh.solve(sc.initial, v0, sc.final, v0, keys)
    res_comp = sh.solve_compacted(sc.initial, v0, sc.final, v0, keys,
                                  chunk=8)

    np.testing.assert_array_equal(np.asarray(res_comp.status),
                                  np.asarray(res_plain.status))
    np.testing.assert_array_equal(np.asarray(res_comp.iterations),
                                  np.asarray(res_plain.iterations))
    np.testing.assert_allclose(np.asarray(res_comp.positions),
                               np.asarray(res_plain.positions), atol=1e-6)
    assert np.asarray(res_comp.feasible_final).all()
