"""Differential test: native C++ ADMM QP vs the JAX solver and scipy oracle."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ba_path_planning_tpu.ops import (make_pair_index, static_bounds,
                                      linearize, collision_lower_bounds)
from ba_path_planning_tpu.ops.constraints import ConstraintBlocks
from ba_path_planning_tpu.solvers.admm import (QPData, solve_qp,
                                               build_static_normal_inverse,
                                               build_row_scaling)
from ba_path_planning_tpu.utils import Limits, SolverConfig

try:
    from ba_path_planning_tpu.native import NativeQP, load_library
    load_library()
    HAVE_NATIVE = True
except Exception as e:  # pragma: no cover - toolchain missing
    HAVE_NATIVE = False
    NATIVE_ERR = str(e)

pytestmark = pytest.mark.skipif(not HAVE_NATIVE,
                                reason="native toolchain unavailable")


def _flatten_blocks(blocks: ConstraintBlocks) -> np.ndarray:
    return np.concatenate([np.asarray(b).reshape(-1) for b in blocks])


def _expand_scaling(scaling, N, K, P):
    """Per-k (K,1) scale arrays -> full per-row buffers in block shapes."""
    return ConstraintBlocks(
        jerk=np.broadcast_to(np.asarray(scaling.jerk), (N, K - 1, 2)),
        acc=np.broadcast_to(np.asarray(scaling.acc), (N, K, 2)),
        vel=np.broadcast_to(np.asarray(scaling.vel), (N, K, 2)),
        pos=np.broadcast_to(np.asarray(scaling.pos), (N, K, 2)),
        col=np.broadcast_to(np.asarray(scaling.col), (K, P)),
    )


def test_native_matches_jax_solver():
    N, K, h, R = 3, 10, 0.2, 1.0
    P = N * (N - 1) // 2
    rng = np.random.default_rng(0)
    p0 = rng.uniform(4, 16, (N, 2))
    pf = p0 + rng.uniform(-1, 1, (N, 2))
    v0 = np.zeros((N, 2))
    vf = np.zeros((N, 2))
    lim = Limits()
    pairs = make_pair_index(N, dtype=jnp.float64)

    lo, up = static_bounds(jnp.asarray(p0), jnp.asarray(v0), jnp.asarray(pf),
                           jnp.asarray(vf), n_vehicles=N, n_steps=K, h=h,
                           limits=lim)
    # crossing previous iterate -> active-ish collision rows
    prev = np.zeros((N, K, 2))
    for i in range(N):
        for k in range(K):
            t = k / (K - 1)
            prev[i, k] = p0[i] * (1 - t) + pf[i] * t
    eta, dist = linearize(jnp.asarray(prev), pairs, jax.random.key(0))
    col_lo = collision_lower_bounds(eta, dist, jnp.asarray(prev),
                                    jnp.asarray(p0), jnp.asarray(v0), pairs,
                                    h=h, min_distance=R)
    lower = ConstraintBlocks(col=col_lo, **lo)
    upper = ConstraintBlocks(col=jnp.full((K, P), jnp.inf, dtype=jnp.float64),
                             **up)

    cfg = SolverConfig(eps_abs=1e-6, eps_rel=1e-6, max_iter=8000,
                       cg_iters=20, adaptive_rho=False, polish=False)
    pc = build_static_normal_inverse(K, h, cfg, dtype=jnp.float64)
    data = QPData(eta=eta, col_mask=jnp.asarray(1.0, jnp.float64),
                  lower=lower, upper=upper)
    x0 = jnp.zeros((N, K, 2), dtype=jnp.float64)
    jax_out = solve_qp(data, pairs.E, pc, x0, h=h, cfg=cfg)

    # native solve on the identical problem
    nqp = NativeQP(N, K, h)
    nqp.set_settings(rho=cfg.rho, sigma=cfg.sigma, alpha=cfg.alpha,
                     eps_abs=cfg.eps_abs, eps_rel=cfg.eps_rel,
                     max_iter=cfg.max_iter, check_interval=cfg.check_interval,
                     cg_iters=cfg.cg_iters)
    nqp.set_precond(np.asarray(pc.Q), np.asarray(pc.lam))
    nqp.set_bounds(_flatten_blocks(lower), _flatten_blocks(upper))

    scaling = build_row_scaling(K, h, dtype=jnp.float64)
    d_full = _expand_scaling(scaling, N, K, P)
    rho_full = ConstraintBlocks(*[cfg.rho * np.asarray(d)**2 for d in d_full])
    # equality rows: terminal vel/pos rows get the rho_eq boost
    rho_vel = np.array(rho_full.vel)
    rho_pos = np.array(rho_full.pos)
    rho_vel[:, K - 1, :] *= cfg.rho_eq_scale
    rho_pos[:, K - 1, :] *= cfg.rho_eq_scale
    rho_full = rho_full._replace(vel=rho_vel, pos=rho_pos)
    nqp.set_scaling(_flatten_blocks(d_full), _flatten_blocks(rho_full))
    nqp.set_collision(np.asarray(eta), 1.0)

    x_native, info = nqp.solve(np.zeros((N, K, 2)))
    assert info["converged"], info

    np.testing.assert_allclose(x_native, np.asarray(jax_out.x), atol=5e-4,
                               rtol=5e-3)


def test_native_static_only_matches_oracle():
    from oracles import reference_math as oracle
    N, K, h = 2, 8, 0.25
    P = 1
    rng = np.random.default_rng(1)
    p0 = rng.uniform(4, 16, (N, 2))
    pf = p0 + rng.uniform(-1, 1, (N, 2))
    v0 = np.zeros((N, 2))
    vf = np.zeros((N, 2))
    lim = Limits()
    lo, up = static_bounds(jnp.asarray(p0), jnp.asarray(v0), jnp.asarray(pf),
                           jnp.asarray(vf), n_vehicles=N, n_steps=K, h=h,
                           limits=lim)
    lower = ConstraintBlocks(col=jnp.full((K, P), -jnp.inf, dtype=jnp.float64), **lo)
    upper = ConstraintBlocks(col=jnp.full((K, P), jnp.inf, dtype=jnp.float64), **up)

    cfg = SolverConfig(eps_abs=1e-7, eps_rel=1e-7, max_iter=8000, cg_iters=20,
                       adaptive_rho=False)
    pc = build_static_normal_inverse(K, h, cfg, dtype=jnp.float64)
    nqp = NativeQP(N, K, h)
    nqp.set_settings(rho=cfg.rho, sigma=cfg.sigma, alpha=cfg.alpha,
                     eps_abs=cfg.eps_abs, eps_rel=cfg.eps_rel,
                     max_iter=cfg.max_iter, cg_iters=cfg.cg_iters)
    nqp.set_precond(np.asarray(pc.Q), np.asarray(pc.lam))
    nqp.set_bounds(_flatten_blocks(lower), _flatten_blocks(upper))
    scaling = build_row_scaling(K, h, dtype=jnp.float64)
    d_full = _expand_scaling(scaling, N, K, P)
    rho_full = ConstraintBlocks(*[cfg.rho * np.asarray(d)**2 for d in d_full])
    rho_vel = np.array(rho_full.vel); rho_vel[:, K - 1, :] *= cfg.rho_eq_scale
    rho_pos = np.array(rho_full.pos); rho_pos[:, K - 1, :] *= cfg.rho_eq_scale
    rho_col = np.full((K, P), 1e-6)           # disabled rows
    rho_full = rho_full._replace(vel=rho_vel, pos=rho_pos, col=rho_col)
    nqp.set_scaling(_flatten_blocks(d_full), _flatten_blocks(rho_full))
    nqp.set_collision(np.zeros((K, P, 2)), 0.0)

    x_native, info = nqp.solve(np.zeros((N, K, 2)))
    assert info["converged"], info

    lo_o, up_o = oracle.static_bounds(
        p0, v0, pf, vf, K=K, h=h, vel_min=lim.vel_min, vel_max=lim.vel_max,
        acc_min=lim.acc_min, acc_max=lim.acc_max, jerk_min=lim.jerk_min,
        jerk_max=lim.jerk_max, pos_min=lim.pos_min, pos_max=lim.pos_max)
    mats = oracle.static_dense_matrices(N, K, h)
    A = np.vstack([mats["jerk"], mats["acc"], mats["vel"], mats["pos"]])
    l = np.concatenate([lo_o[k].reshape(-1) for k in ("jerk", "acc", "vel", "pos")])
    u = np.concatenate([up_o[k].reshape(-1) for k in ("jerk", "acc", "vel", "pos")])
    x_star = oracle.solve_qp(A, l, u)
    np.testing.assert_allclose(x_native.reshape(-1), x_star, atol=5e-4,
                               rtol=5e-3)
