"""State-space (banded) solver tests: operators, assembly, factorization, QP."""

import numpy as np
import jax
import jax.numpy as jnp

from ba_path_planning_tpu.ops import make_pair_index
from ba_path_planning_tpu.solvers import banded
from ba_path_planning_tpu.solvers.banded import (RowVals, StateVars, apply_A,
                                                 apply_AT, apply_M,
                                                 assemble_blocks, build_bounds,
                                                 factorize, from_stacked,
                                                 row_scaling_state,
                                                 rho_pattern, solve_factorized,
                                                 solve_qp_state, to_stacked)
from ba_path_planning_tpu.solvers.admm import make_solver_params
from ba_path_planning_tpu.utils import Limits, SolverConfig
import pytest


def _rand_state(rng, N, K):
    return StateVars(a=jnp.asarray(rng.normal(size=(N, K, 2))),
                     p=jnp.asarray(rng.normal(size=(N, K, 2))),
                     v=jnp.asarray(rng.normal(size=(N, K, 2))))


def _rand_rows(rng, N, K, P):
    return RowVals(dyn_p=jnp.asarray(rng.normal(size=(N, K, 2))),
                   dyn_v=jnp.asarray(rng.normal(size=(N, K, 2))),
                   jerk=jnp.asarray(rng.normal(size=(N, K - 1, 2))),
                   acc=jnp.asarray(rng.normal(size=(N, K, 2))),
                   vbox=jnp.asarray(rng.normal(size=(N, K, 2))),
                   pbox=jnp.asarray(rng.normal(size=(N, K, 2))),
                   col=jnp.asarray(rng.normal(size=(K, P))))


def test_apply_A_adjoint_identity():
    rng = np.random.default_rng(0)
    N, K, h = 4, 7, 0.2
    P = N * (N - 1) // 2
    pairs = make_pair_index(N, dtype=jnp.float64)
    eta_raw = rng.normal(size=(K, P, 2))
    eta = jnp.asarray(eta_raw / np.linalg.norm(eta_raw, axis=-1, keepdims=True))
    xv = _rand_state(rng, N, K)
    yv = _rand_rows(rng, N, K, P)
    lhs = sum(jnp.vdot(a, b) for a, b in zip(apply_A(xv, eta, pairs.E, h), yv))
    rhs = sum(jnp.vdot(a, b) for a, b in zip(xv, apply_AT(yv, eta, pairs.E, h)))
    assert abs(float(lhs - rhs)) < 1e-10 * max(1.0, abs(float(lhs)))


def _mk_rho(N, K, P, h, cfg, lower, upper):
    scaling = row_scaling_state(K, h, dtype=jnp.float64)
    rho = rho_pattern(lower, upper, scaling, cfg.static_part(),
                      jnp.asarray(cfg.rho, jnp.float64),
                      jnp.asarray(cfg.col_rho_boost, jnp.float64),
                      (K, P))
    col_off = jnp.isinf(lower.col)
    return rho._replace(col=jnp.where(col_off, 1e-6, rho.col))


def _mk_problem(N, K, h, seed=0, with_col=True):
    rng = np.random.default_rng(seed)
    P = N * (N - 1) // 2
    pairs = make_pair_index(N, dtype=jnp.float64)
    p0 = jnp.asarray(rng.uniform(4, 16, (N, 2)))
    pf = p0 + jnp.asarray(rng.uniform(-1, 1, (N, 2)))
    v0 = jnp.zeros((N, 2), jnp.float64)
    vf = jnp.zeros((N, 2), jnp.float64)
    lower, upper = build_bounds(p0, v0, pf, vf, n_vehicles=N, n_steps=K, h=h,
                                limits=Limits(), n_pairs=P)
    if with_col:
        eta_raw = rng.normal(size=(K, P, 2))
        eta = jnp.asarray(eta_raw / np.linalg.norm(eta_raw, axis=-1,
                                                   keepdims=True))
        col_lo = jnp.asarray(rng.uniform(-2.0, -0.5, (K, P)))
        col_lo = col_lo.at[0].set(-jnp.inf)
        lower = lower._replace(col=col_lo)
    else:
        eta = jnp.zeros((K, P, 2), jnp.float64)
    return pairs, p0, v0, pf, vf, lower, upper, eta


@pytest.mark.slow
def test_assembled_blocks_match_operator():
    """D/B block application == P + sigma I + A^T rho A as operators."""
    N, K, h = 3, 6, 0.2
    P = N * (N - 1) // 2
    cfg = SolverConfig()
    pairs, p0, v0, pf, vf, lower, upper, eta = _mk_problem(N, K, h)
    rho = _mk_rho(N, K, P, h, cfg, lower, upper)
    sigma = jnp.asarray(cfg.sigma, jnp.float64)
    D, B = assemble_blocks(rho, eta, pairs.E, h=h, sigma=sigma, n_vehicles=N)

    rng = np.random.default_rng(1)
    xv = _rand_state(rng, N, K)
    want = to_stacked(apply_M(xv, rho, eta, pairs.E, h=h, sigma=sigma))
    u = to_stacked(xv)                                       # (K, 6N)
    got = jnp.einsum('kij,kj->ki', D, u)
    got = got.at[1:].add(jnp.einsum('kij,kj->ki', B, u[:-1]))
    got = got.at[:-1].add(jnp.einsum('kji,kj->ki', B, u[1:]))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-10)


@pytest.mark.slow
def test_factorize_solve_roundtrip():
    N, K, h = 3, 6, 0.2
    P = N * (N - 1) // 2
    cfg = SolverConfig()
    pairs, p0, v0, pf, vf, lower, upper, eta = _mk_problem(N, K, h)
    rho = _mk_rho(N, K, P, h, cfg, lower, upper)
    sigma = jnp.asarray(cfg.sigma, jnp.float64)
    D, B = assemble_blocks(rho, eta, pairs.E, h=h, sigma=sigma, n_vehicles=N)
    L, Eb = factorize(D, B)

    rng = np.random.default_rng(2)
    xv = _rand_state(rng, N, K)
    b = to_stacked(apply_M(xv, rho, eta, pairs.E, h=h, sigma=sigma))
    x_rec = solve_factorized(L, Eb, b)
    np.testing.assert_allclose(np.asarray(x_rec), np.asarray(to_stacked(xv)),
                               atol=1e-8)


def test_stacking_roundtrip():
    rng = np.random.default_rng(3)
    xv = _rand_state(rng, 3, 5)
    back = from_stacked(to_stacked(xv), 3)
    for a, b in zip(xv, back):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_state_qp_matches_v1_solver():
    """Same QP solved in acceleration space (v1) and state space (v2)."""
    from ba_path_planning_tpu.ops import (static_bounds, linearize,
                                          collision_lower_bounds)
    from ba_path_planning_tpu.ops.constraints import ConstraintBlocks
    from ba_path_planning_tpu.ops.rollout import rollout
    from ba_path_planning_tpu.solvers.admm import (QPData, solve_qp_impl,
                                                   build_static_normal_inverse)
    from ba_path_planning_tpu.solvers.banded import (
        collision_lower_bounds_state)

    N, K, h, R = 2, 10, 0.2, 1.0
    P = 1
    p0 = jnp.asarray([[6.0, 10.0], [14.0, 10.0]], jnp.float64)
    pf = jnp.asarray([[14.0, 10.1], [6.0, 9.9]], jnp.float64)
    v0 = jnp.zeros((N, 2), jnp.float64)
    vf = jnp.zeros((N, 2), jnp.float64)
    pairs = make_pair_index(N, dtype=jnp.float64)
    lim = Limits(vel_min=-20, vel_max=20, acc_min=-50, acc_max=50,
                 jerk_min=-200, jerk_max=200)

    # previous iterate: straight lines (collision mid-way)
    t = jnp.linspace(0, 1, K)[None, :, None]
    prev = p0[:, None, :] * (1 - t) + pf[:, None, :] * t
    eta, dist = linearize(prev, pairs, jax.random.key(0))

    cfg = SolverConfig(eps_abs=1e-6, eps_rel=1e-6, max_iter=20000,
                       cg_iters=30, polish=False, adaptive_rho=True)
    params = make_solver_params(cfg, jnp.float64)

    # ---- v1 (acceleration space)
    lo, up = static_bounds(p0, v0, pf, vf, n_vehicles=N, n_steps=K, h=h,
                           limits=lim)
    col_lo = collision_lower_bounds(eta, dist, prev, p0, v0, pairs, h=h,
                                    min_distance=R)
    data = QPData(eta=eta, col_mask=jnp.asarray(1.0, jnp.float64),
                  lower=ConstraintBlocks(col=col_lo, **lo),
                  upper=ConstraintBlocks(
                      col=jnp.full((K, P), jnp.inf, jnp.float64), **up))
    pc = build_static_normal_inverse(K, h, cfg, dtype=jnp.float64)
    v1 = solve_qp_impl(data, pairs.E, pc, jnp.zeros((N, K, 2), jnp.float64),
                       params, h=h, static=cfg.static_part())
    assert bool(v1.converged)

    # ---- v2 (state space)
    lower, upper = build_bounds(p0, v0, pf, vf, n_vehicles=N, n_steps=K, h=h,
                                limits=lim, n_pairs=P)
    col_lo2 = collision_lower_bounds_state(eta, dist, prev, pairs,
                                           min_distance=R)
    lower = lower._replace(col=col_lo2)
    pos_w, vel_w = rollout(jnp.zeros((N, K, 2), jnp.float64), p0, v0, h)
    x0 = StateVars(a=jnp.zeros((N, K, 2), jnp.float64),
                   p=jnp.zeros((N, K, 2), jnp.float64),
                   v=jnp.zeros((N, K, 2), jnp.float64))
    v2 = solve_qp_state(lower, upper, eta, x0, params, pairs.E, h=h,
                        static=cfg.static_part(), n_vehicles=N)
    assert bool(v2.converged), (v2.prim_res, v2.dual_res, v2.iters)

    np.testing.assert_allclose(np.asarray(v2.x.a), np.asarray(v1.x),
                               atol=3e-4, rtol=1e-3)
    # Both converge in the same ballpark under adaptive rho (v1=150,
    # v2=200 at check-interval granularity).  The former strict
    # v2.iters < v1.iters assertion pinned a pre-9a58967 rho trajectory:
    # the OSQP-semantics dual fix (no y rescale on rho updates) moved both
    # solvers' adaptive-rho paths, and the exact-x-update advantage shows
    # in per-iteration cost, not count, at this tiny (N=2, K=10) size.
    assert int(v2.iters) <= 2 * int(v1.iters)


@pytest.mark.slow
def test_scp_direct_end_to_end():
    """Full SCP with the direct solver: crossing scenario, collision-free."""
    from ba_path_planning_tpu.solvers.scp import SCPEngine
    from ba_path_planning_tpu.utils import ProblemConfig

    p0 = np.array([[6.0, 10.0], [14.0, 10.0]])
    pf = np.array([[14.0, 10.1], [6.0, 9.9]])
    problem = ProblemConfig(n_vehicles=2, time_horizon=10.0, time_step=0.5,
                            min_distance=1.0, max_iterations=15)
    cfg = SolverConfig(method="direct", eps_abs=1e-5, eps_rel=1e-5,
                       max_iter=2000, polish=False)
    eng = SCPEngine(problem, cfg, dtype=jnp.float64)
    res = eng.solve(p0, np.zeros((2, 2)), pf, np.zeros((2, 2)),
                    key=jax.random.key(0))
    assert not bool(res.feasible_initial)
    assert bool(res.feasible_final), (res.status, res.rel_step)
    # matches the cg-path engine on the same scenario
    eng_cg = SCPEngine(problem, cfg.replace(method="cg", max_iter=20000,
                                            cg_iters=30),
                       dtype=jnp.float64)
    res_cg = eng_cg.solve(p0, np.zeros((2, 2)), pf, np.zeros((2, 2)),
                          key=jax.random.key(0))
    np.testing.assert_allclose(np.asarray(res.positions),
                               np.asarray(res_cg.positions), atol=5e-3)


@pytest.mark.slow
def test_scp_direct_matches_oracle_scp():
    """Direct-solver SCP vs the dense scipy oracle at reference control flow
    (three vehicles forced through a shared corridor)."""
    from ba_path_planning_tpu.solvers.scp import SCPEngine
    from ba_path_planning_tpu.utils import ProblemConfig
    from oracles import reference_math as oracle

    N, K, h, R = 3, 14, 0.5, 1.0
    p0 = np.array([[6.0, 9.0], [14.0, 10.0], [6.0, 11.0]])
    pf = np.array([[14.0, 10.5], [6.0, 10.0], [14.0, 9.5]])
    v0 = np.zeros((N, 2))
    vf = np.zeros((N, 2))
    problem = ProblemConfig(n_vehicles=N, time_horizon=K * h, time_step=h,
                            min_distance=R, max_iterations=15)
    cfg = SolverConfig(method="direct", eps_abs=1e-6, eps_rel=1e-6,
                       max_iter=20000, polish=False)
    eng = SCPEngine(problem, cfg, dtype=jnp.float64)
    res = eng.solve(p0, v0, pf, vf, key=jax.random.key(0))

    ref = oracle.scp_solve(p0, v0, pf, vf, R=R, h=h, K=K, max_iterations=15)
    assert int(res.iterations) == ref["iterations"]
    np.testing.assert_allclose(np.asarray(res.positions), ref["positions"],
                               atol=2e-3)


@pytest.mark.slow
def test_channel_factorization_matches_full():
    """No-collision system: the shared (K, 3, 3) channel factorization must
    reproduce the full (6N)^2 block-tridiagonal solve exactly."""
    N, K, h = 4, 9, 0.2
    P = N * (N - 1) // 2
    cfg = SolverConfig(method="direct")
    rng = np.random.default_rng(3)
    p0 = jnp.asarray(rng.uniform(1, 19, (N, 2)))
    pf = jnp.asarray(rng.uniform(1, 19, (N, 2)))
    v0 = jnp.zeros((N, 2), jnp.float64)
    lower, upper = build_bounds(p0, v0, pf, v0, n_vehicles=N, n_steps=K,
                                h=h, limits=Limits(), n_pairs=P)
    pairs = make_pair_index(N, dtype=jnp.float64)
    eta0 = jnp.zeros((K, P, 2), jnp.float64)
    scaling = row_scaling_state(K, h, dtype=jnp.float64)
    rho_m = banded.rho_pattern_masks(scaling, cfg.static_part(),
                                     jnp.asarray(cfg.rho, jnp.float64),
                                     jnp.asarray(cfg.col_rho_boost, jnp.float64),
                                     n_steps=K, n_pairs=P, col_enabled=False,
                                     dtype=jnp.float64)
    sigma = jnp.asarray(cfg.sigma, jnp.float64)

    # mask-based pattern == value-based pattern (disabled collision rows)
    rho_v = _mk_rho(N, K, P, h, cfg, lower, upper)
    for name in RowVals._fields:
        got = jnp.broadcast_to(getattr(rho_m, name),
                               getattr(rho_v, name).shape)
        np.testing.assert_allclose(np.asarray(got),
                                   np.asarray(getattr(rho_v, name)), rtol=1e-12)

    D, B = assemble_blocks(rho_m, eta0, pairs.E, h=h, sigma=sigma,
                           n_vehicles=N)
    Lf, Ef = factorize(D, B)
    Dc, Bc = banded.assemble_channel(rho_m, h=h, sigma=sigma)
    Lc, Ec = factorize(Dc, Bc)

    b = jnp.asarray(rng.normal(size=(K, 6 * N)))
    x_full = solve_factorized(Lf, Ef, b)
    x_chan = banded.solve_factorized_channel(
        Lc, Ec, b.reshape(K, 3, 2 * N)).reshape(K, 6 * N)
    np.testing.assert_allclose(np.asarray(x_chan), np.asarray(x_full),
                               rtol=1e-9, atol=1e-11)


@pytest.mark.slow
def test_qp_channel_phase_matches_full_phase():
    """solve_qp_state with col_enabled=False (channel path) must agree with
    the full path on a collision-disabled QP."""
    N, K, h = 3, 8, 0.2
    P = N * (N - 1) // 2
    cfg = SolverConfig(method="direct", polish=False, adaptive_rho=False,
                       max_iter=400, check_interval=50)
    params = make_solver_params(cfg, jnp.float64)
    rng = np.random.default_rng(7)
    p0 = jnp.asarray(rng.uniform(2, 18, (N, 2)))
    pf = jnp.asarray(rng.uniform(2, 18, (N, 2)))
    v0 = jnp.zeros((N, 2), jnp.float64)
    lower, upper = build_bounds(p0, v0, pf, v0, n_vehicles=N, n_steps=K,
                                h=h, limits=Limits(), n_pairs=P)
    pairs = make_pair_index(N, dtype=jnp.float64)
    eta0 = jnp.zeros((K, P, 2), jnp.float64)
    x0 = StateVars(a=jnp.zeros((N, K, 2), jnp.float64),
                   p=jnp.zeros((N, K, 2), jnp.float64),
                   v=jnp.zeros((N, K, 2), jnp.float64))
    r_chan = solve_qp_state(lower, upper, eta0, x0, params, pairs.E, h=h,
                            static=cfg.static_part(), n_vehicles=N,
                            col_enabled=False)
    r_full = solve_qp_state(lower, upper, eta0, x0, params, pairs.E, h=h,
                            static=cfg.static_part(), n_vehicles=N,
                            col_enabled=True)
    np.testing.assert_allclose(np.asarray(r_chan.x.a), np.asarray(r_full.x.a),
                               rtol=1e-6, atol=1e-8)
