"""Pallas kernel equivalence tests (interpret mode on the CPU mesh)."""

import numpy as np
import jax
import jax.numpy as jnp

from ba_path_planning_tpu.ops import make_pair_index
from ba_path_planning_tpu.ops.pallas.banded_solve import solve_factorized_pallas
from ba_path_planning_tpu.solvers.banded import (assemble_blocks, factorize,
                                                 row_scaling_state,
                                                 rho_pattern, solve_factorized,
                                                 build_bounds)
from ba_path_planning_tpu.utils import Limits, SolverConfig
import pytest


@pytest.mark.slow
def test_pallas_banded_solve_matches_scan():
    N, K, h = 3, 8, 0.2
    n = 6 * N
    P = N * (N - 1) // 2
    B = 4
    rng = np.random.default_rng(0)
    pairs = make_pair_index(N, dtype=jnp.float32)
    cfg = SolverConfig(method="direct", adaptive_rho=False)

    p0 = jnp.asarray(rng.uniform(4, 16, (B, N, 2)), jnp.float32)
    pf = p0 + 0.5
    v0 = jnp.zeros((B, N, 2), jnp.float32)
    lower, upper = jax.vmap(
        lambda a, b_, c, d: build_bounds(a, b_, c, d, n_vehicles=N,
                                         n_steps=K, h=h, limits=Limits(),
                                         n_pairs=P))(p0, v0, pf, v0)
    eta = jnp.asarray(rng.normal(size=(B, K, P, 2)), jnp.float32)
    eta = eta / jnp.linalg.norm(eta, axis=-1, keepdims=True)
    scaling = row_scaling_state(K, h, dtype=jnp.float32)

    def mk(low, up, eta1):
        rho_b = rho_pattern(low, up, scaling, cfg.static_part(),
                            jnp.float32(cfg.rho),
                            jnp.float32(cfg.col_rho_boost), (K, P))
        D, Bm = assemble_blocks(rho_b, eta1, pairs.E, h=h,
                                sigma=jnp.float32(cfg.sigma), n_vehicles=N)
        return factorize(D, Bm)

    Linv, Eb = jax.vmap(mk)(lower, upper, eta)
    b = jnp.asarray(rng.normal(size=(B, K, n)), jnp.float32)

    want = jax.vmap(solve_factorized)(Linv, Eb, b)
    got = solve_factorized_pallas(Linv, Eb, b, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5,
                               rtol=1e-4)


@pytest.mark.slow
def test_scp_direct_pallas_end_to_end_interpret():
    """Full direct SCP with the Pallas solve path (interpret on CPU)."""
    from jax.experimental.pallas import tpu as pltpu
    from ba_path_planning_tpu.solvers.scp import SCPEngine
    from ba_path_planning_tpu.utils import ProblemConfig

    p0 = np.array([[6.0, 10.0], [14.0, 10.0]])
    pf = np.array([[14.0, 10.1], [6.0, 9.9]])
    problem = ProblemConfig(n_vehicles=2, time_horizon=6.0, time_step=0.5,
                            min_distance=1.0, max_iterations=8)
    cfg = SolverConfig(method="direct", pallas=True, max_iter=500,
                       polish=False, adaptive_rho=False)
    eng = SCPEngine(problem, cfg, dtype=jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        res = eng.solve(p0, np.zeros((2, 2)), pf, np.zeros((2, 2)),
                        key=jax.random.key(0))
        res = jax.tree.map(np.asarray, res)
    assert bool(res.feasible_final), (res.status, res.rel_step)

    eng2 = SCPEngine(problem, cfg.replace(pallas=False), dtype=jnp.float32)
    res2 = eng2.solve(p0, np.zeros((2, 2)), pf, np.zeros((2, 2)),
                      key=jax.random.key(0))
    np.testing.assert_allclose(np.asarray(res.positions),
                               np.asarray(res2.positions), atol=1e-3)


@pytest.mark.slow
def test_grouped_solve_matches_scan():
    """Scenario-grouped streaming kernel equals the XLA scan solve
    (interpret mode), including the batch-pad (B % G != 0) path."""
    from ba_path_planning_tpu.ops.pallas.group_solve import (
        grouped_solver, pad_factors)
    N, K, h = 3, 8, 0.2
    n = 6 * N
    P = N * (N - 1) // 2
    B = 3                              # not a multiple of group=2
    rng = np.random.default_rng(7)
    pairs = make_pair_index(N, dtype=jnp.float32)
    cfg = SolverConfig(method="direct", adaptive_rho=False)
    p0 = jnp.asarray(rng.uniform(4, 16, (B, N, 2)), jnp.float32)
    pf = p0 + 0.5
    v0 = jnp.zeros((B, N, 2), jnp.float32)
    lower, upper = jax.vmap(
        lambda a, b_, c, d: build_bounds(a, b_, c, d, n_vehicles=N,
                                         n_steps=K, h=h, limits=Limits(),
                                         n_pairs=P))(p0, v0, pf, v0)
    eta = jnp.asarray(rng.normal(size=(B, K, P, 2)), jnp.float32)
    eta = eta / jnp.linalg.norm(eta, axis=-1, keepdims=True)
    scaling = row_scaling_state(K, h, dtype=jnp.float32)

    def mk(low, up, eta1):
        rho_b = rho_pattern(low, up, scaling, cfg.static_part(),
                            jnp.float32(cfg.rho),
                            jnp.float32(cfg.col_rho_boost), (K, P))
        D, Bm = assemble_blocks(rho_b, eta1, pairs.E, h=h,
                                sigma=jnp.float32(cfg.sigma), n_vehicles=N)
        return factorize(D, Bm)

    Linv, Eb = jax.vmap(mk)(lower, upper, eta)
    b = jnp.asarray(rng.normal(size=(B, K, n)), jnp.float32)
    want = jax.vmap(solve_factorized)(Linv, Eb, b)
    Lp, Ep = pad_factors(Linv, Eb)
    got = np.asarray(jax.vmap(grouped_solver(2))(Lp, Ep, b))
    np.testing.assert_allclose(got, np.asarray(want), atol=1e-5, rtol=1e-4)
    # unbatched fallback
    one = np.asarray(grouped_solver(2)(Lp[0], Ep[0], b[0]))
    np.testing.assert_allclose(one, np.asarray(want[0]), atol=1e-5,
                               rtol=1e-4)


@pytest.mark.slow
def test_scp_direct_grouped_end_to_end():
    """Full SCP with the grouped streaming solve: same trajectories as the
    plain direct path (interpret mode on CPU)."""
    from ba_path_planning_tpu.solvers.scp import SCPEngine
    from ba_path_planning_tpu.utils import ProblemConfig

    problem = ProblemConfig(n_vehicles=3, time_horizon=2.0, time_step=0.2,
                            min_distance=0.8, max_iterations=8,
                            stop_mode="feasible")
    p0 = np.array([[6.0, 10.0], [14.0, 10.0], [10.0, 6.0]])
    pf = np.array([[14.0, 10.1], [6.0, 9.9], [10.0, 14.0]])
    v0 = np.zeros((3, 2))

    def run(group):
        cfg = SolverConfig(method="direct", adaptive_rho=False, polish=False,
                           max_iter=40, check_interval=40, rho=1.6,
                           collision_margin=0.05, group=group)
        eng = SCPEngine(problem, cfg, dtype=jnp.float32)
        b0 = np.stack([p0, p0 + 0.1])
        bf = np.stack([pf, pf - 0.1])
        bv = np.zeros((2, 3, 2))
        keys = jax.random.split(jax.random.key(0), 2)
        return eng.solve_batch(b0, bv, bf, bv, keys)

    base = run(0)
    grp = run(2)
    assert np.asarray(grp.feasible_final).all()
    np.testing.assert_allclose(np.asarray(grp.positions),
                               np.asarray(base.positions), atol=1e-3)


@pytest.mark.slow
def test_grouped_L_solve_matches_scan():
    """L-only grouped kernel (streams half the factor bytes) equals the
    (Linv, Eb) scan solve; C slot scalars shared across the batch."""
    from ba_path_planning_tpu.ops.pallas.group_solve import (
        grouped_solver_L, pad_factors)
    from ba_path_planning_tpu.solvers.banded import (assemble_D, factorize_L,
                                                     rho_pattern_masks,
                                                     solve_factorized_L)
    N, K, h, B = 4, 9, 0.2, 5
    n = 6 * N
    P = N * (N - 1) // 2
    rng = np.random.default_rng(3)
    pairs = make_pair_index(N, dtype=jnp.float32)
    cfg = SolverConfig(method="direct", adaptive_rho=False)
    scaling = row_scaling_state(K, h, dtype=jnp.float32)
    rho_b = rho_pattern_masks(scaling, cfg.static_part(), jnp.float32(1.7),
                              jnp.float32(1.0), n_steps=K, n_pairs=P,
                              col_enabled=True, dtype=jnp.float32)
    eta = jnp.asarray(rng.normal(size=(B, K, P, 2)), jnp.float32)
    eta = eta / jnp.linalg.norm(eta, axis=-1, keepdims=True)

    def mk(e):
        D, C = assemble_D(rho_b, e, pairs.E, h=h, sigma=jnp.float32(1e-6),
                          n_vehicles=N)
        return factorize_L(D, C), C

    Linv, C = jax.vmap(mk, out_axes=(0, None))(eta)
    b = jnp.asarray(rng.normal(size=(B, K, n)), jnp.float32)
    want = jax.vmap(lambda L, bb: solve_factorized_L(L, C, bb))(Linv, b)
    # also pin vs the (Linv, Eb) oracle through the full dense route
    oracle = jax.vmap(solve_factorized)(
        *jax.vmap(lambda e: factorize(*assemble_blocks(
            rho_b, e, pairs.E, h=h, sigma=jnp.float32(1e-6),
            n_vehicles=N)))(eta), b)
    np.testing.assert_allclose(np.asarray(want), np.asarray(oracle),
                               atol=1e-4, rtol=1e-3)
    Lp = pad_factors(Linv)
    got = np.asarray(jax.vmap(grouped_solver_L(2), in_axes=(0, None, 0))(
        Lp, C, b))
    np.testing.assert_allclose(got, np.asarray(want), atol=1e-5, rtol=1e-4)


@pytest.mark.slow
def test_grouped_X_solve_matches_scan():
    """X-form grouped kernel (symmetric inverses, one matvec per step)
    equals the L-form scan solve; exact and Newton-Schulz factorizations."""
    from ba_path_planning_tpu.ops.pallas.group_solve import (
        grouped_solver_X, pad_factors)
    from ba_path_planning_tpu.solvers.banded import (assemble_D, factorize_L,
                                                     factorize_X,
                                                     rho_pattern_masks,
                                                     solve_factorized_L)
    N, K, h, B = 4, 9, 0.2, 5
    n = 6 * N
    P = N * (N - 1) // 2
    rng = np.random.default_rng(5)
    pairs = make_pair_index(N, dtype=jnp.float32)
    cfg = SolverConfig(method="direct", adaptive_rho=False)
    scaling = row_scaling_state(K, h, dtype=jnp.float32)
    rho_b = rho_pattern_masks(scaling, cfg.static_part(), jnp.float32(1.7),
                              jnp.float32(1.0), n_steps=K, n_pairs=P,
                              col_enabled=True, dtype=jnp.float32)
    eta = jnp.asarray(rng.normal(size=(B, K, P, 2)), jnp.float32)
    eta = eta / jnp.linalg.norm(eta, axis=-1, keepdims=True)

    def mk(e):
        D, C = assemble_D(rho_b, e, pairs.E, h=h, sigma=jnp.float32(1e-6),
                          n_vehicles=N)
        return D, C

    D, C = jax.vmap(mk, out_axes=(0, None))(eta)
    b = jnp.asarray(rng.normal(size=(B, K, n)), jnp.float32)
    want = jax.vmap(lambda d, bb: solve_factorized_L(factorize_L(d, C), C,
                                                     bb))(D, b)
    Xp = pad_factors(jax.vmap(lambda d: factorize_X(d, C))(D))
    got = np.asarray(jax.vmap(grouped_solver_X(2), in_axes=(0, None, 0))(
        Xp, C, b))
    np.testing.assert_allclose(got, np.asarray(want), atol=1e-4, rtol=1e-3)
    # unbatched fallback
    one = np.asarray(grouped_solver_X(2)(Xp[0], C, b[0]))
    np.testing.assert_allclose(one, np.asarray(want[0]), atol=1e-4,
                               rtol=1e-3)


@pytest.mark.slow
def test_scp_direct_X_form_end_to_end():
    """Full SCP with the Newton-Schulz X-form factorization: trajectories
    match the exact L-form path within SCP tolerance (interpret on CPU)."""
    from ba_path_planning_tpu.solvers.scp import SCPEngine
    from ba_path_planning_tpu.utils import ProblemConfig

    problem = ProblemConfig(n_vehicles=3, time_horizon=2.0, time_step=0.2,
                            min_distance=0.8, max_iterations=8,
                            stop_mode="feasible")
    p0 = np.array([[6.0, 10.0], [14.0, 10.0], [10.0, 6.0]])
    pf = np.array([[14.0, 10.1], [6.0, 9.9], [10.0, 14.0]])
    v0 = np.zeros((3, 2))

    def run(**kw):
        cfg = SolverConfig(method="direct", adaptive_rho=False, polish=False,
                           max_iter=40, check_interval=40, rho=1.6,
                           collision_margin=0.05, group=2, **kw)
        eng = SCPEngine(problem, cfg, dtype=jnp.float32)
        b0 = np.stack([p0, p0 + 0.1])
        bf = np.stack([pf, pf - 0.1])
        bv = np.zeros((2, 3, 2))
        keys = jax.random.split(jax.random.key(0), 2)
        return eng.solve_batch(b0, bv, bf, bv, keys)

    base = run()
    xf = run(factor_form="X", ns_iters=3)
    assert np.asarray(xf.feasible_final).all()
    np.testing.assert_allclose(np.asarray(xf.positions),
                               np.asarray(base.positions), atol=1e-3)
