"""Whole-interval fused ADMM kernel: equivalence vs the XLA iteration path.

The fused kernel (``ops/pallas/admm_fused.py``) must reproduce the
``admm_iter`` body of ``solvers/banded.py:solve_qp_state`` exactly — same
operations, same order — so the direct SCP path produces the same
trajectories with ``fused=True``.  Run in interpret mode on the CPU mesh.
"""

import numpy as np
import jax
import jax.numpy as jnp

from ba_path_planning_tpu.ops import make_pair_index
from ba_path_planning_tpu.ops.pallas.admm_fused import (
    bound_planes, pair_matrices, planes_to_rowvals, rowvals_to_planes)
from ba_path_planning_tpu.solvers import banded
from ba_path_planning_tpu.solvers.admm import make_solver_params
from ba_path_planning_tpu.solvers.banded import RowVals
from ba_path_planning_tpu.utils import Limits, ProblemConfig, SolverConfig
import pytest


def _rand_rowvals(rng, N, K, P, dtype=jnp.float32):
    def r(*s):
        return jnp.asarray(rng.normal(size=s), dtype)
    return RowVals(dyn_p=r(N, K, 2), dyn_v=r(N, K, 2), jerk=r(N, K - 1, 2),
                   acc=r(N, K, 2), vbox=r(N, K, 2), pbox=r(N, K, 2),
                   col=r(K, P))


def test_plane_roundtrip():
    rng = np.random.default_rng(0)
    N, K, P = 3, 7, 3
    rv = _rand_rowvals(rng, N, K, P)
    s, c = rowvals_to_planes(rv)
    assert s.shape == (K, 12 * N)
    back = planes_to_rowvals(s, c, N, RowVals)
    for a, b in zip(jax.tree.leaves(rv), jax.tree.leaves(back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_bound_planes_jerk_dummy():
    rng = np.random.default_rng(1)
    N, K, P = 2, 5, 1
    rv = _rand_rowvals(rng, N, K, P)
    s, _ = bound_planes(rv, -jnp.inf)
    n2 = 2 * N
    jerk_block = np.asarray(s[:, 2 * n2:3 * n2])
    assert np.all(np.isinf(jerk_block[-1]))
    np.testing.assert_array_equal(
        jerk_block[:-1], np.asarray(_flatten(rv.jerk)))


def _flatten(leaf):
    return jnp.swapaxes(leaf, -3, -2).reshape(leaf.shape[-2], -1)


def test_pair_matrices_agree_with_einsum():
    rng = np.random.default_rng(2)
    N, K = 4, 6
    pairs = make_pair_index(N)
    P = pairs.E.shape[1]
    E2, E2T, Sx, SxT = pair_matrices(N)
    p = jnp.asarray(rng.normal(size=(N, K, 2)), jnp.float32)
    # forward: dp[k,p,c] = sum_n E[n,p] pos[k,n,c]
    want = jnp.einsum('np,nkc->kpc', pairs.E, p)
    pst = _flatten(p)                                  # (K, 2N)
    got = (pst @ E2).reshape(K, P, 2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)
    # channel sum / expand
    v2 = jnp.asarray(rng.normal(size=(K, 2 * P)), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(v2 @ SxT), np.asarray(v2.reshape(K, P, 2).sum(-1)),
        atol=1e-6)
    s1 = jnp.asarray(rng.normal(size=(K, P)), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(s1 @ Sx),
        np.asarray(jnp.repeat(s1, 2, axis=-1)), atol=1e-6)


def _solve_pair(N, K, fused, B=3, max_iter=24, seed=3, **cfg_kw):
    """Collision QP solved with/without the fused kernel on a random batch."""
    rng = np.random.default_rng(seed)
    h = 0.2
    pairs = make_pair_index(N, dtype=jnp.float32)
    P = pairs.E.shape[1]
    cfg = SolverConfig(method="direct", adaptive_rho=False, polish=False,
                       max_iter=max_iter, check_interval=max_iter // 2,
                       rho=1.6, fused=fused, **cfg_kw)
    params = make_solver_params(cfg, jnp.float32)
    static = cfg.static_part()
    limits = Limits()

    p0 = jnp.asarray(rng.uniform(5, 15, (B, N, 2)), jnp.float32)
    pf = jnp.asarray(rng.uniform(5, 15, (B, N, 2)), jnp.float32)
    v0 = jnp.zeros((B, N, 2), jnp.float32)

    from ba_path_planning_tpu.ops.rollout import rollout
    from ba_path_planning_tpu.ops.collisions import linearize
    from ba_path_planning_tpu.solvers.scp import _warm_state

    a0 = jnp.zeros((B, N, K, 2), jnp.float32)
    pos, _ = jax.vmap(lambda a, p, v: rollout(a, p, v, h))(a0, p0, v0)
    keys = jax.random.split(jax.random.key(9), B)
    eta, dist = jax.vmap(lambda pp, k: linearize(pp, pairs, k))(pos, keys)

    def one(p0_, v0_, pf_, e, d, pp):
        lower, upper = banded.build_bounds(p0_, v0_, pf_, v0_[0:0].sum() + v0_,
                                           n_vehicles=N, n_steps=K, h=h,
                                           limits=limits, n_pairs=P)
        col_lo = banded.collision_lower_bounds_state(
            e, d, pp, pairs, min_distance=0.8)
        lower = lower._replace(col=col_lo)
        x0 = _warm_state(jnp.zeros((N, K, 2), jnp.float32), p0_, v0_, h)
        return banded.solve_qp_state(lower, upper, e, x0, params, pairs.E,
                                     h=h, static=static, n_vehicles=N)
    return jax.vmap(one)(p0, v0, pf, eta, dist, pos)


@pytest.mark.slow
def test_fused_interval_matches_xla_path():
    base = _solve_pair(4, 10, fused=False)
    fused = _solve_pair(4, 10, fused=True)
    np.testing.assert_allclose(np.asarray(fused.x.a), np.asarray(base.x.a),
                               atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(fused.x.p), np.asarray(base.x.p),
                               atol=2e-4, rtol=1e-3)
    for la, lb in zip(jax.tree.leaves(fused.y), jax.tree.leaves(base.y)):
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                   atol=5e-3, rtol=1e-2)
    np.testing.assert_array_equal(np.asarray(fused.iters),
                                  np.asarray(base.iters))


@pytest.mark.slow
def test_scp_direct_fused_end_to_end():
    """Full SCP with the fused kernel: same trajectories as the plain path."""
    from ba_path_planning_tpu.solvers.scp import SCPEngine

    problem = ProblemConfig(n_vehicles=3, time_horizon=2.0, time_step=0.2,
                            min_distance=0.8, max_iterations=8,
                            stop_mode="feasible")
    p0 = np.array([[6.0, 10.0], [14.0, 10.0], [10.0, 6.0]])
    pf = np.array([[14.0, 10.1], [6.0, 9.9], [10.0, 14.0]])
    v0 = np.zeros((3, 2))

    def run(fused):
        cfg = SolverConfig(method="direct", adaptive_rho=False, polish=False,
                           max_iter=40, check_interval=40, rho=1.6,
                           collision_margin=0.05, fused=fused)
        eng = SCPEngine(problem, cfg, dtype=jnp.float32)
        return eng.solve(p0, v0, pf, v0, key=jax.random.key(0))

    base = run(False)
    fused = run(True)
    assert bool(fused.feasible_final)
    np.testing.assert_allclose(np.asarray(fused.positions),
                               np.asarray(base.positions), atol=1e-3)
    np.testing.assert_array_equal(np.asarray(fused.iterations),
                                  np.asarray(base.iterations))


def test_fused_X_interval_matches_xla_path():
    """X-form fused kernel (symmetric inverses + slot scalars, ns_iters=0
    exact) reproduces the plain XLA iteration path."""
    base = _solve_pair(4, 10, fused=False)
    fx = _solve_pair(4, 10, fused=True, factor_form="X", ns_iters=0)
    np.testing.assert_allclose(np.asarray(fx.x.a), np.asarray(base.x.a),
                               atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(fx.x.p), np.asarray(base.x.p),
                               atol=2e-4, rtol=1e-3)
    for la, lb in zip(jax.tree.leaves(fx.y), jax.tree.leaves(base.y)):
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                   atol=5e-3, rtol=1e-2)
    np.testing.assert_array_equal(np.asarray(fx.iters),
                                  np.asarray(base.iters))


@pytest.mark.slow
def test_fused_XG_interleaved_matches_single_scenario_kernel():
    """The G-scenario-interleaved X-form kernel (r5) is an issue-order
    change only: forcing group=2/group=4 on the same batch must reproduce
    the one-scenario-per-grid-step kernel's iterates exactly (interpret
    mode runs both paths with identical per-scenario op order)."""
    import functools
    from ba_path_planning_tpu.ops.pallas import admm_fused as af

    orig = af._fused_batched_X

    def run(group):
        def patched(*args, **kw):
            kw["group"] = group
            return orig(*args, **kw)
        af._fused_batched_X = patched
        # rebuild the custom_vmap wrappers' captured function by calling
        # through _solve_pair, which routes via admm_interval_fused_X ->
        # module-level _fused_batched_X at trace time
        try:
            return _solve_pair(4, 10, fused=True, factor_form="X",
                               ns_iters=0, B=4)
        finally:
            af._fused_batched_X = orig

    base = run(1)
    for g in (2, 4):
        inter = run(g)
        np.testing.assert_allclose(np.asarray(inter.x.a),
                                   np.asarray(base.x.a), atol=1e-6)
        np.testing.assert_allclose(np.asarray(inter.x.p),
                                   np.asarray(base.x.p), atol=1e-6)
        np.testing.assert_array_equal(np.asarray(inter.iters),
                                      np.asarray(base.iters))
