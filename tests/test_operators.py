"""Differential tests for the matrix-free constraint operators vs. dense oracles."""

import numpy as np
import jax.numpy as jnp
import pytest

from ba_path_planning_tpu.ops import (apply_static, apply_static_adjoint,
                                      apply_collision, apply_collision_adjoint,
                                      static_bounds, make_pair_index,
                                      linearize, collision_lower_bounds,
                                      check_feasible)
from ba_path_planning_tpu.utils import Limits
from oracles import reference_math as oracle
import jax


@pytest.mark.parametrize("N,K", [(2, 2), (3, 8), (5, 30)])
def test_static_rows_match_oracle(N, K):
    rng = np.random.default_rng(0)
    h = 0.1
    a = rng.normal(size=(N, K, 2))
    jerk_o, acc_o, vel_o, pos_o = oracle.static_rows(a, h)
    jerk, acc, vel, pos = apply_static(jnp.asarray(a), h)
    np.testing.assert_allclose(np.asarray(jerk), jerk_o, atol=1e-12)
    np.testing.assert_allclose(np.asarray(acc), acc_o, atol=1e-12)
    np.testing.assert_allclose(np.asarray(vel), vel_o, atol=1e-12)
    np.testing.assert_allclose(np.asarray(pos), pos_o, atol=1e-11)


def test_static_rows_match_dense_matrices():
    """Operator application equals dense-matrix multiplication in flat layout."""
    rng = np.random.default_rng(1)
    N, K, h = 3, 10, 0.2
    a = rng.normal(size=(N, K, 2))
    x = oracle.flatten(a)
    mats = oracle.static_dense_matrices(N, K, h)
    jerk, acc, vel, pos = apply_static(jnp.asarray(a), h)
    np.testing.assert_allclose(np.asarray(jerk).reshape(-1), mats["jerk"] @ x, atol=1e-11)
    np.testing.assert_allclose(np.asarray(vel).reshape(-1), mats["vel"] @ x, atol=1e-11)
    np.testing.assert_allclose(np.asarray(pos).reshape(-1), mats["pos"] @ x, atol=1e-11)


def test_static_adjoint_dot_identity():
    rng = np.random.default_rng(2)
    N, K, h = 4, 12, 0.1
    a = jnp.asarray(rng.normal(size=(N, K, 2)))
    yj = jnp.asarray(rng.normal(size=(N, K - 1, 2)))
    ya = jnp.asarray(rng.normal(size=(N, K, 2)))
    yv = jnp.asarray(rng.normal(size=(N, K, 2)))
    yp = jnp.asarray(rng.normal(size=(N, K, 2)))
    jerk, acc, vel, pos = apply_static(a, h)
    lhs = (jnp.vdot(jerk, yj) + jnp.vdot(acc, ya) + jnp.vdot(vel, yv)
           + jnp.vdot(pos, yp))
    rhs = jnp.vdot(a, apply_static_adjoint(yj, ya, yv, yp, h))
    assert abs(float(lhs - rhs)) < 1e-9 * max(1.0, abs(float(lhs)))


@pytest.mark.parametrize("N,K", [(2, 4), (4, 9)])
def test_collision_rows_match_oracle(N, K):
    rng = np.random.default_rng(3)
    h, R = 0.2, 0.5
    a = rng.normal(size=(N, K, 2))
    p0 = rng.normal(size=(N, 2)) * 5
    v0 = rng.normal(size=(N, 2))
    pairs = make_pair_index(N, dtype=jnp.float64)

    # previous positions from a rollout (non-degenerate with overwhelming prob.)
    prev_pos, _ = oracle.rollout(a, p0, v0, h)
    A_o, l_o, eta_o = oracle.collision_rows(prev_pos, p0, v0, R, h)

    eta, dist = linearize(jnp.asarray(prev_pos), pairs, jax.random.key(0))
    np.testing.assert_allclose(np.asarray(eta), eta_o, atol=1e-11)

    rows = apply_collision(jnp.asarray(a), eta, pairs.E, h)   # (K, P)
    x = oracle.flatten(a)
    np.testing.assert_allclose(np.asarray(rows).reshape(-1), A_o @ x, atol=1e-10)

    l = collision_lower_bounds(eta, dist, jnp.asarray(prev_pos),
                               jnp.asarray(p0), jnp.asarray(v0), pairs,
                               h=h, min_distance=R)
    np.testing.assert_allclose(np.asarray(l).reshape(-1), l_o, atol=1e-10)


def test_collision_adjoint_dot_identity():
    rng = np.random.default_rng(4)
    N, K, h = 5, 11, 0.1
    P = N * (N - 1) // 2
    pairs = make_pair_index(N, dtype=jnp.float64)
    a = jnp.asarray(rng.normal(size=(N, K, 2)))
    eta_raw = rng.normal(size=(K, P, 2))
    eta = jnp.asarray(eta_raw / np.linalg.norm(eta_raw, axis=-1, keepdims=True))
    y = jnp.asarray(rng.normal(size=(K, P)))
    lhs = jnp.vdot(apply_collision(a, eta, pairs.E, h), y)
    rhs = jnp.vdot(a, apply_collision_adjoint(y, eta, pairs.E, h))
    assert abs(float(lhs - rhs)) < 1e-9 * max(1.0, abs(float(lhs)))


def test_degenerate_pair_uses_unit_eta_and_dist_one():
    """Coincident previous positions -> random unit eta, dist forced to 1."""
    N, K = 2, 3
    pairs = make_pair_index(N, dtype=jnp.float64)
    prev = jnp.zeros((N, K, 2), dtype=jnp.float64)   # all pairs degenerate
    eta, dist = linearize(prev, pairs, jax.random.key(7))
    np.testing.assert_allclose(np.asarray(jnp.sum(eta**2, axis=-1)), 1.0,
                               atol=1e-12)
    np.testing.assert_allclose(np.asarray(dist), 1.0, atol=0)
    # linearization term eta.diff - dist == -1 -> bound = R - 1 - 0 (p0 equal)
    l = collision_lower_bounds(eta, dist, prev, jnp.zeros((N, 2)),
                               jnp.zeros((N, 2)), pairs, h=0.1,
                               min_distance=0.5)
    np.testing.assert_allclose(np.asarray(l), 0.5 - 1.0, atol=1e-12)


def test_static_bounds_match_oracle():
    rng = np.random.default_rng(5)
    N, K, h = 3, 8, 0.2
    p0 = rng.normal(size=(N, 2)) * 5 + 10
    v0 = rng.normal(size=(N, 2))
    pf = rng.normal(size=(N, 2)) * 5 + 10
    vf = rng.normal(size=(N, 2))
    lim = Limits()
    lo_o, uo_o = oracle.static_bounds(
        p0, v0, pf, vf, K=K, h=h, vel_min=lim.vel_min, vel_max=lim.vel_max,
        acc_min=lim.acc_min, acc_max=lim.acc_max, jerk_min=lim.jerk_min,
        jerk_max=lim.jerk_max, pos_min=lim.pos_min, pos_max=lim.pos_max)
    lo, uo = static_bounds(jnp.asarray(p0), jnp.asarray(v0), jnp.asarray(pf),
                           jnp.asarray(vf), n_vehicles=N, n_steps=K, h=h,
                           limits=lim)
    for kkey in ("jerk", "acc", "vel", "pos"):
        np.testing.assert_allclose(np.asarray(lo[kkey]), lo_o[kkey], atol=1e-12,
                                   err_msg=f"lower {kkey}")
        np.testing.assert_allclose(np.asarray(uo[kkey]), uo_o[kkey], atol=1e-12,
                                   err_msg=f"upper {kkey}")


def test_feasibility_check_matches_oracle():
    rng = np.random.default_rng(6)
    N, K, R = 4, 6, 0.8
    pairs = make_pair_index(N, dtype=jnp.float64)
    # spread-out positions: feasible
    pos = rng.uniform(0, 20, size=(N, K, 2)) + np.arange(N).reshape(N, 1, 1) * 40
    assert bool(check_feasible(jnp.asarray(pos), pairs, R)) == oracle.check_feasible(pos, R)
    # force a violation
    pos2 = pos.copy()
    pos2[1, 3] = pos2[0, 3] + np.array([R - 0.02, 0.0])
    assert bool(check_feasible(jnp.asarray(pos2), pairs, R)) is False
    assert oracle.check_feasible(pos2, R) is False
    # within the 1cm slack: counts as feasible (scp.py:610)
    pos3 = pos.copy()
    pos3[1, :] = pos3[0, :] + np.array([R - 0.005, 0.0])
    assert bool(check_feasible(jnp.asarray(pos3), pairs, R)) is True
