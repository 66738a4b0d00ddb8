"""Differential tests: batched ADMM QP solver vs. scipy trust-constr oracle."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ba_path_planning_tpu.ops import make_pair_index, static_bounds, linearize
from ba_path_planning_tpu.ops.constraints import ConstraintBlocks
from ba_path_planning_tpu.solvers.admm import (QPData, solve_qp,
                                               build_static_normal_inverse)
from ba_path_planning_tpu.utils import Limits, SolverConfig
from oracles import reference_math as oracle


def _mk_problem(N, K, h, seed, spread=6.0):
    rng = np.random.default_rng(seed)
    p0 = rng.uniform(2, 18, size=(N, 2))
    # goals must be reachable within vel/acc limits over the short horizon K*h
    pf = p0 + rng.uniform(-1.0, 1.0, size=(N, 2))
    v0 = np.zeros((N, 2))
    vf = np.zeros((N, 2))
    lim = Limits(pos_min=(0.0, 0.0), pos_max=(20.0, 20.0))
    lo, up = static_bounds(jnp.asarray(p0), jnp.asarray(v0), jnp.asarray(pf),
                           jnp.asarray(vf), n_vehicles=N, n_steps=K, h=h,
                           limits=lim)
    lo_o, up_o = oracle.static_bounds(
        p0, v0, pf, vf, K=K, h=h, vel_min=lim.vel_min, vel_max=lim.vel_max,
        acc_min=lim.acc_min, acc_max=lim.acc_max, jerk_min=lim.jerk_min,
        jerk_max=lim.jerk_max, pos_min=lim.pos_min, pos_max=lim.pos_max)
    return p0, v0, pf, vf, lim, lo, up, lo_o, up_o


def _oracle_static_qp(N, K, h, lo_o, up_o):
    mats = oracle.static_dense_matrices(N, K, h)
    A = np.vstack([mats["jerk"], mats["acc"], mats["vel"], mats["pos"]])
    l = np.concatenate([lo_o[k].reshape(-1) for k in ("jerk", "acc", "vel", "pos")])
    u = np.concatenate([up_o[k].reshape(-1) for k in ("jerk", "acc", "vel", "pos")])
    return A, l, u


@pytest.mark.parametrize("N,K", [(2, 6), (3, 10)])
def test_admm_static_only_matches_oracle(N, K):
    """No collision rows: ADMM solution vs scipy high-accuracy oracle."""
    h = 0.2
    P = N * (N - 1) // 2
    p0, v0, pf, vf, lim, lo, up, lo_o, up_o = _mk_problem(N, K, h, seed=0)
    pairs = make_pair_index(N, dtype=jnp.float64)

    # disabled collision rows
    eta = jnp.zeros((K, P, 2), dtype=jnp.float64)
    col_lo = jnp.full((K, P), -jnp.inf, dtype=jnp.float64)
    col_up = jnp.full((K, P), jnp.inf, dtype=jnp.float64)
    lower = ConstraintBlocks(col=col_lo, **lo)
    upper = ConstraintBlocks(col=col_up, **up)

    cfg = SolverConfig(eps_abs=1e-6, eps_rel=1e-6, max_iter=4000)
    Minv = build_static_normal_inverse(K, h, cfg, dtype=jnp.float64)
    data = QPData(eta=eta, col_mask=jnp.asarray(0.0, jnp.float64),
                  lower=lower, upper=upper)
    x0 = jnp.zeros((N, K, 2), dtype=jnp.float64)
    out = solve_qp(data, pairs.E, Minv, x0, h=h, cfg=cfg)
    assert bool(out.converged), (out.prim_res, out.dual_res, out.iters)

    A, l, u = _oracle_static_qp(N, K, h, lo_o, up_o)
    x_star = oracle.solve_qp(A, l, u)
    np.testing.assert_allclose(np.asarray(out.x).reshape(-1), x_star,
                               atol=2e-4, rtol=1e-3)


def test_admm_with_collision_rows_matches_oracle():
    """Active linearized collision rows: close vehicles forced apart."""
    N, K, h, R = 2, 8, 0.2, 1.0
    P = 1
    rng = np.random.default_rng(1)
    # head-on crossing: vehicles swap positions -> straight lines collide
    p0 = np.array([[5.0, 10.0], [15.0, 10.0]])
    pf = np.array([[15.0, 10.05], [5.0, 9.95]])
    v0 = np.zeros((N, 2))
    vf = np.zeros((N, 2))
    lim = Limits(vel_min=-20, vel_max=20, acc_min=-50, acc_max=50,
                 jerk_min=-200, jerk_max=200,
                 pos_min=(0.0, 0.0), pos_max=(20.0, 20.0))
    pairs = make_pair_index(N, dtype=jnp.float64)

    lo, up = static_bounds(jnp.asarray(p0), jnp.asarray(v0), jnp.asarray(pf),
                           jnp.asarray(vf), n_vehicles=N, n_steps=K, h=h,
                           limits=lim)
    lo_o, up_o = oracle.static_bounds(
        p0, v0, pf, vf, K=K, h=h, vel_min=lim.vel_min, vel_max=lim.vel_max,
        acc_min=lim.acc_min, acc_max=lim.acc_max, jerk_min=lim.jerk_min,
        jerk_max=lim.jerk_max, pos_min=lim.pos_min, pos_max=lim.pos_max)

    # previous iterate: straight-line interpolation rollout (from zero accel)
    prev_pos = np.zeros((N, K, 2))
    for i in range(N):
        for k in range(K):
            t = k / (K - 1)
            prev_pos[i, k] = p0[i] * (1 - t) + pf[i] * t

    eta, dist = linearize(jnp.asarray(prev_pos), pairs, jax.random.key(0))
    from ba_path_planning_tpu.ops import collision_lower_bounds
    col_lo = collision_lower_bounds(eta, dist, jnp.asarray(prev_pos),
                                    jnp.asarray(p0), jnp.asarray(v0), pairs,
                                    h=h, min_distance=R)
    col_up = jnp.full((K, P), jnp.inf, dtype=jnp.float64)
    lower = ConstraintBlocks(col=col_lo, **lo)
    upper = ConstraintBlocks(col=col_up, **up)

    cfg = SolverConfig(eps_abs=1e-5, eps_rel=1e-5, max_iter=8000, cg_iters=40)
    Minv = build_static_normal_inverse(K, h, cfg, dtype=jnp.float64)
    data = QPData(eta=eta, col_mask=jnp.asarray(1.0, jnp.float64),
                  lower=lower, upper=upper)
    x0 = jnp.zeros((N, K, 2), dtype=jnp.float64)
    out = solve_qp(data, pairs.E, Minv, x0, h=h, cfg=cfg)
    assert bool(out.converged), (out.prim_res, out.dual_res, out.iters)

    # oracle: dense stacked QP
    A_col, l_col, _ = oracle.collision_rows(prev_pos, p0, v0, R, h,
                                            eta_override=np.asarray(eta))
    A_s, l_s, u_s = _oracle_static_qp(N, K, h, lo_o, up_o)
    A = np.vstack([A_s, A_col])
    l = np.concatenate([l_s, l_col])
    u = np.concatenate([u_s, np.full(len(l_col), np.inf)])
    x_star = oracle.solve_qp(A, l, u)

    np.testing.assert_allclose(np.asarray(out.x).reshape(-1), x_star,
                               atol=5e-4, rtol=5e-3)


def test_admm_vmap_batch():
    """vmapped solves equal individual solves."""
    N, K, h = 2, 6, 0.2
    P = 1
    B = 3
    pairs = make_pair_index(N, dtype=jnp.float64)
    cfg = SolverConfig(eps_abs=1e-6, eps_rel=1e-6)
    Minv = build_static_normal_inverse(K, h, cfg, dtype=jnp.float64)

    datas = []
    for b in range(B):
        *_, lo, up, _, _ = _mk_problem(N, K, h, seed=10 + b)
        lower = ConstraintBlocks(col=jnp.full((K, P), -jnp.inf, dtype=jnp.float64), **lo)
        upper = ConstraintBlocks(col=jnp.full((K, P), jnp.inf, dtype=jnp.float64), **up)
        datas.append(QPData(eta=jnp.zeros((K, P, 2), dtype=jnp.float64),
                            col_mask=jnp.asarray(0.0, jnp.float64),
                            lower=lower, upper=upper))
    batch = jax.tree.map(lambda *xs: jnp.stack(xs), *datas)
    x0 = jnp.zeros((B, N, K, 2), dtype=jnp.float64)

    vsolve = jax.vmap(lambda d, x: solve_qp(d, pairs.E, Minv, x, h=h, cfg=cfg))
    out = vsolve(batch, x0)
    for b in range(B):
        single = solve_qp(datas[b], pairs.E, Minv, x0[b], h=h, cfg=cfg)
        np.testing.assert_allclose(np.asarray(out.x[b]), np.asarray(single.x),
                                   atol=1e-6)
