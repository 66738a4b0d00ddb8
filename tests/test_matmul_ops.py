"""Matmul-form operators must match the scan-form operators exactly."""

import numpy as np
import jax.numpy as jnp

from ba_path_planning_tpu.ops import (apply_static, apply_collision,
                                      apply_static_adjoint,
                                      apply_collision_adjoint,
                                      make_pair_index)
from ba_path_planning_tpu.ops.matmul_ops import (
    apply_static_matmul, apply_static_adjoint_matmul, apply_collision_matmul,
    apply_collision_adjoint_matmul)


def test_matmul_static_matches_scan():
    rng = np.random.default_rng(0)
    N, K, h = 4, 13, 0.2
    a = jnp.asarray(rng.normal(size=(N, K, 2)))
    for s, m in zip(apply_static(a, h), apply_static_matmul(a, h)):
        np.testing.assert_allclose(np.asarray(m), np.asarray(s), atol=1e-12)


def test_matmul_static_adjoint_matches_scan():
    rng = np.random.default_rng(1)
    N, K, h = 3, 11, 0.1
    ys = [jnp.asarray(rng.normal(size=(N, K - 1, 2)))] + \
         [jnp.asarray(rng.normal(size=(N, K, 2))) for _ in range(3)]
    s = apply_static_adjoint(*ys, h)
    m = apply_static_adjoint_matmul(*ys, h)
    np.testing.assert_allclose(np.asarray(m), np.asarray(s), atol=1e-12)


def test_matmul_collision_matches_scan():
    rng = np.random.default_rng(2)
    N, K, h = 5, 9, 0.25
    P = N * (N - 1) // 2
    pairs = make_pair_index(N, dtype=jnp.float64)
    a = jnp.asarray(rng.normal(size=(N, K, 2)))
    eta = jnp.asarray(rng.normal(size=(K, P, 2)))
    y = jnp.asarray(rng.normal(size=(K, P)))
    np.testing.assert_allclose(
        np.asarray(apply_collision_matmul(a, eta, pairs.E, h)),
        np.asarray(apply_collision(a, eta, pairs.E, h)), atol=1e-12)
    np.testing.assert_allclose(
        np.asarray(apply_collision_adjoint_matmul(y, eta, pairs.E, h)),
        np.asarray(apply_collision_adjoint(y, eta, pairs.E, h)), atol=1e-12)


def test_solver_matmul_impl_matches_scan_impl():
    """Full QP solve identical (up to FP noise) under either operator impl."""
    from ba_path_planning_tpu.ops import static_bounds
    from ba_path_planning_tpu.ops.constraints import ConstraintBlocks
    from ba_path_planning_tpu.solvers.admm import (
        QPData, solve_qp, build_static_normal_inverse)
    from ba_path_planning_tpu.utils import Limits, SolverConfig

    N, K, h = 2, 8, 0.25
    P = 1
    rng = np.random.default_rng(3)
    p0 = rng.uniform(4, 16, (N, 2))
    pf = p0 + rng.uniform(-1, 1, (N, 2))
    v0 = np.zeros((N, 2)); vf = np.zeros((N, 2))
    pairs = make_pair_index(N, dtype=jnp.float64)
    lo, up = static_bounds(jnp.asarray(p0), jnp.asarray(v0), jnp.asarray(pf),
                           jnp.asarray(vf), n_vehicles=N, n_steps=K, h=h,
                           limits=Limits())
    lower = ConstraintBlocks(col=jnp.full((K, P), -jnp.inf, dtype=jnp.float64), **lo)
    upper = ConstraintBlocks(col=jnp.full((K, P), jnp.inf, dtype=jnp.float64), **up)
    data = QPData(eta=jnp.zeros((K, P, 2), dtype=jnp.float64),
                  col_mask=jnp.asarray(0.0, jnp.float64),
                  lower=lower, upper=upper)
    x0 = jnp.zeros((N, K, 2), dtype=jnp.float64)

    outs = {}
    for impl in ("scan", "matmul"):
        cfg = SolverConfig(eps_abs=1e-6, eps_rel=1e-6, operator_impl=impl,
                           adaptive_rho=False)
        pc = build_static_normal_inverse(K, h, cfg, dtype=jnp.float64)
        outs[impl] = solve_qp(data, pairs.E, pc, x0, h=h, cfg=cfg)
        assert bool(outs[impl].converged)
    np.testing.assert_allclose(np.asarray(outs["matmul"].x),
                               np.asarray(outs["scan"].x), atol=1e-8)
