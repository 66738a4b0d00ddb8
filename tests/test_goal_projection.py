"""Exact terminal-equality projection (goal polish).

The reference enforces p[K]=pf / v[K]=vf as hard QP equalities
(scp.py:242-257); the production fixed-budget ADMM leaves a cm-level
terminal residual.  ``DoubleIntegrator2D.goal_projection`` closes it in
closed form; these tests pin the algebra and the SCP wiring.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ba_path_planning_tpu.models.double_integrator import DoubleIntegrator2D
from ba_path_planning_tpu.solvers.scp import SCPEngine
from ba_path_planning_tpu.utils import ProblemConfig, SolverConfig


def _model(K=17, h=0.3):
    return DoubleIntegrator2D(n_steps=K, time_step=h)


def _terminal(model, a, p0, v0):
    K, h = model.n_steps, model.time_step
    c2 = (h * h) * (K - np.arange(K) - 0.5)
    vK = v0 + h * a.sum(axis=-2)
    pK = p0 + K * h * v0 + (c2[:, None] * a).sum(axis=-2)
    return pK, vK


def test_projection_hits_terminal_state_exactly():
    rng = np.random.default_rng(0)
    model = _model()
    N, K = 4, model.n_steps
    a = rng.normal(size=(N, K, 2))
    p0 = rng.uniform(0, 20, (N, 2))
    v0 = rng.normal(size=(N, 2))
    pf = rng.uniform(0, 20, (N, 2))
    vf = rng.normal(size=(N, 2))
    a_proj = np.asarray(model.goal_projection(
        jnp.asarray(a), jnp.asarray(p0), jnp.asarray(v0), jnp.asarray(pf),
        jnp.asarray(vf)))
    pK, vK = _terminal(model, a_proj, p0, v0)
    np.testing.assert_allclose(pK, pf, atol=1e-9)
    np.testing.assert_allclose(vK, vf, atol=1e-9)


def test_projection_is_identity_when_terminal_already_exact():
    rng = np.random.default_rng(1)
    model = _model()
    K = model.n_steps
    a = rng.normal(size=(3, K, 2))
    p0 = rng.uniform(0, 20, (3, 2))
    v0 = rng.normal(size=(3, 2))
    pK, vK = _terminal(model, a, p0, v0)
    a_proj = np.asarray(model.goal_projection(
        jnp.asarray(a), jnp.asarray(p0), jnp.asarray(v0), jnp.asarray(pK),
        jnp.asarray(vK)))
    np.testing.assert_allclose(a_proj, a, atol=1e-10)


def test_projection_is_least_norm_correction():
    """da must equal the pseudoinverse solution of G da = r (numpy lstsq)."""
    rng = np.random.default_rng(2)
    model = _model(K=11, h=0.25)
    K, h = model.n_steps, model.time_step
    a = rng.normal(size=(K, 2))
    p0 = np.zeros(2)
    v0 = rng.normal(size=2)
    pf = rng.uniform(0, 5, 2)
    vf = rng.normal(size=2)
    a_proj = np.asarray(model.goal_projection(
        jnp.asarray(a), jnp.asarray(p0), jnp.asarray(v0), jnp.asarray(pf),
        jnp.asarray(vf)))
    pK, vK = _terminal(model, a, p0, v0)
    G = np.stack([np.full(K, h), (h * h) * (K - np.arange(K) - 0.5)])
    for ax in range(2):
        r = np.array([vf[ax] - vK[ax], pf[ax] - pK[ax]])
        da_ref = np.linalg.lstsq(G, r, rcond=None)[0]
        np.testing.assert_allclose(a_proj[:, ax] - a[:, ax], da_ref,
                                   atol=1e-10)


@pytest.mark.parametrize("method", ["direct", "cg"])
def test_scp_goal_project_reaches_goal_exactly(method):
    """Production-style solve with goal_project: terminal error collapses to
    roundoff while the trajectory stays collision-free."""
    p0 = np.array([[6.0, 10.0], [14.0, 10.0], [10.0, 6.0]])
    pf = np.array([[14.0, 10.1], [6.0, 9.9], [10.0, 14.0]])
    v0 = np.zeros((3, 2))

    problem = ProblemConfig(n_vehicles=3, time_horizon=10.0, time_step=0.5,
                            min_distance=1.0, max_iterations=15,
                            stop_mode="feasible", goal_project=True)
    solver = SolverConfig(method=method, polish=False, adaptive_rho=False,
                          max_iter=200, check_interval=50,
                          collision_margin=0.05)
    eng = SCPEngine(problem, solver, dtype=jnp.float32)
    res = eng.solve(p0, v0, pf, v0, key=jax.random.key(0))
    assert bool(res.feasible_final), (res.status, res.rel_step)

    model = DoubleIntegrator2D(n_steps=problem.n_steps,
                               time_step=problem.time_step)
    pK, vK = model.terminal_state(res.positions, res.velocities,
                                  res.accelerations)
    goal_err = float(np.linalg.norm(np.asarray(pK) - pf, axis=-1).max())
    vel_err = float(np.linalg.norm(np.asarray(vK) - v0, axis=-1).max())
    # float32 rollout roundoff only — far inside the 5 cm gate
    assert goal_err < 1e-3, goal_err
    assert vel_err < 1e-3, vel_err


@pytest.mark.slow
def test_compacting_driver_matches_monolithic_with_goal_project():
    """solve_compacted and the monolithic batched solve agree (statuses
    and iteration counts exactly; floats to batching-width roundoff) with
    goal_project enabled."""
    from ba_path_planning_tpu.parallel.mesh import ShardedSCPSolver, make_mesh
    from ba_path_planning_tpu.scenarios import generate_scenario_batch

    problem = ProblemConfig(n_vehicles=4, time_horizon=4.0, time_step=0.4,
                            min_distance=0.8, max_iterations=6,
                            stop_mode="feasible", goal_project=True)
    solver = SolverConfig(method="direct", polish=False, adaptive_rho=False,
                          max_iter=100, check_interval=25,
                          collision_margin=0.05)
    mesh = make_mesh(jax.devices()[:4])
    sh = ShardedSCPSolver(problem, solver, mesh=mesh, dtype=jnp.float32)
    B = 8
    sc = generate_scenario_batch(jax.random.key(3), B,
                                 n_vehicles=problem.n_vehicles,
                                 min_distance=problem.min_distance)
    v0 = jnp.zeros((B, 4, 2), jnp.float32)
    keys = jax.random.split(jax.random.key(4), B)
    r_mono = sh.solve(sc.initial, v0, sc.final, v0, keys)
    r_comp = sh.solve_compacted(sc.initial, v0, sc.final, v0, keys, chunk=4)
    # identical semantics; float results agree to batching-width roundoff
    # (XLA lowers different vmap widths differently)
    np.testing.assert_allclose(np.asarray(r_mono.accelerations),
                               np.asarray(r_comp.accelerations),
                               rtol=5e-3, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(r_mono.status),
                                  np.asarray(r_comp.status))
    np.testing.assert_array_equal(np.asarray(r_mono.iterations),
                                  np.asarray(r_comp.iterations))
