"""Agent-pair parallelism (SURVEY 2.3): one large-N scenario sharded over a
'pairs' mesh axis must reproduce the unsharded engine exactly.

The sharded path reuses the engine's start/step/finalize functions with a
shard-local PairIndex and psum/pmax/pmin collectives at the reduction
points (normal-equation collision blocks, A^T contributions, residual
norms, feasibility all-reduce), so agreement here pins the collective
placement, the inert-pad-pair masking, and the replicated x-update.
"""

import numpy as np
import jax
import jax.numpy as jnp

from ba_path_planning_tpu.parallel.pair_sharded import (PairShardedSCPSolver,
                                                        make_pair_mesh,
                                                        padded_pair_index)
from ba_path_planning_tpu.scenarios import generate_scenario
from ba_path_planning_tpu.solvers.scp import SCPEngine
from ba_path_planning_tpu.utils import ProblemConfig, SolverConfig
import pytest


def _problem(**kw):
    base = dict(n_vehicles=6, time_horizon=4.0, time_step=0.2,
                min_distance=0.8, max_iterations=10, stop_mode="feasible")
    base.update(kw)
    return ProblemConfig(**base)


def _solver():
    return SolverConfig(method="direct", adaptive_rho=False, polish=False,
                        max_iter=60, check_interval=30, rho=1.6,
                        collision_margin=0.05)


def test_padded_pair_index_inert_pads():
    pi = padded_pair_index(6, 4)          # P = 15 -> padded to 16
    assert pi.E.shape == (6, 16)
    assert int(pi.valid.sum()) == 15
    np.testing.assert_array_equal(np.asarray(pi.E[:, 15]), 0.0)


@pytest.mark.slow
def test_pair_sharded_matches_unsharded():
    problem = _problem()
    cfg = _solver()
    sc = generate_scenario(jax.random.key(3), n_vehicles=6, min_distance=0.8)
    v0 = jnp.zeros((6, 2), jnp.float64)

    eng = SCPEngine(problem, cfg, dtype=jnp.float64)
    base = eng.solve(sc.initial, v0, sc.final, v0, key=jax.random.key(7))

    mesh = make_pair_mesh(jax.devices()[:4])
    ps = PairShardedSCPSolver(problem, cfg, mesh=mesh, dtype=jnp.float64)
    got = ps.solve(sc.initial, v0, sc.final, v0, key=jax.random.key(7))

    assert int(got.iterations) == int(base.iterations)
    assert int(got.status) == int(base.status)
    assert bool(got.feasible_final) == bool(base.feasible_final)
    np.testing.assert_allclose(np.asarray(got.positions),
                               np.asarray(base.positions), atol=1e-9)
    np.testing.assert_allclose(np.asarray(got.accelerations),
                               np.asarray(base.accelerations), atol=1e-9)


@pytest.mark.slow
def test_pair_sharded_feasible_scenario():
    """An asymmetric crossing that needs collision iterations ends
    collision-free and matches the unsharded result.

    (A perfectly symmetric crossing would be chaotic: the psum changes
    float summation ORDER, and per-iteration 1e-14 differences then get
    amplified through the SCP relinearization — verified per-iteration
    agreement stays at float precision; end-to-end comparison needs a
    dynamically stable scenario.)
    """
    problem = _problem(n_vehicles=4, min_distance=1.0, max_iterations=12,
                       time_horizon=8.0)
    cfg = _solver()
    p0 = jnp.asarray([[4.0, 9.0], [16.0, 11.5], [9.0, 4.0], [11.5, 16.0]],
                     jnp.float64)
    pf = jnp.asarray([[16.0, 10.2], [4.0, 8.6], [10.2, 16.0], [8.6, 4.0]],
                     jnp.float64)
    v0 = jnp.zeros((4, 2), jnp.float64)

    eng = SCPEngine(problem, cfg, dtype=jnp.float64)
    base = eng.solve(p0, v0, pf, v0, key=jax.random.key(0))
    assert bool(base.feasible_final)
    assert int(base.iterations) >= 1      # actually exercises collision rows

    ps = PairShardedSCPSolver(problem, cfg,
                              mesh=make_pair_mesh(jax.devices()[:3]),
                              dtype=jnp.float64)   # P=6 -> 2 pairs/shard
    got = ps.solve(p0, v0, pf, v0, key=jax.random.key(0))
    # multi-iteration SCP amplifies summation-order noise near linearization
    # branch points, so the cross-implementation contract here is SEMANTIC:
    # collision-free end state, terminal constraints met.  (Bit-level
    # agreement on a dynamically stable solve is pinned by
    # test_pair_sharded_matches_unsharded.)
    assert bool(got.feasible_final)
    assert int(got.iterations) >= 1
    from ba_path_planning_tpu.ops.collisions import (make_pair_index,
                                                     min_pairwise_distance)
    pairs = make_pair_index(4, dtype=jnp.float64)
    dmin = float(min_pairwise_distance(np.asarray(got.positions), pairs))
    assert dmin >= problem.min_distance - 0.01
    # terminal equality is on p[K] (one step past the last rollout index)
    h = problem.time_step
    pK = (np.asarray(got.positions)[:, -1] + h * np.asarray(got.velocities)[:, -1]
          + 0.5 * h * h * np.asarray(got.accelerations)[:, -1])
    np.testing.assert_allclose(pK, np.asarray(pf), atol=1e-2)


@pytest.mark.slow
def test_pair_sharded_polish_matches_unsharded():
    """Accuracy parity for the polished path (VERDICT r4 weak #6): with
    polish=True, the pair-sharded solve must match the unsharded
    engine-with-polish — the AL polish's collision blocks / A^T reductions
    psum over the pair axis, so the polished x is replicated and identical."""
    problem = _problem()
    cfg = _solver().replace(polish=True)
    sc = generate_scenario(jax.random.key(5), n_vehicles=6, min_distance=0.8)
    v0 = jnp.zeros((6, 2), jnp.float64)

    eng = SCPEngine(problem, cfg, dtype=jnp.float64)
    base = eng.solve(sc.initial, v0, sc.final, v0, key=jax.random.key(9))

    mesh = make_pair_mesh(jax.devices()[:4])
    ps = PairShardedSCPSolver(problem, cfg, mesh=mesh, dtype=jnp.float64)
    got = ps.solve(sc.initial, v0, sc.final, v0, key=jax.random.key(9))

    assert int(got.iterations) == int(base.iterations)
    assert bool(got.feasible_final) == bool(base.feasible_final)
    np.testing.assert_allclose(np.asarray(got.positions),
                               np.asarray(base.positions), atol=1e-8)
    np.testing.assert_allclose(np.asarray(got.accelerations),
                               np.asarray(base.accelerations), atol=1e-8)
