"""Direct-path active-set polish + rowwise assembly unit tests (ADVICE r3).

``polish_qp_state`` and ``assemble_blocks_rowwise`` previously ran only
inside the multi-hour parity script; these fast float64 tests pin them
against the certified oracle QP and the uniform-rho assembly.
"""

import numpy as np
import jax
import jax.numpy as jnp

from ba_path_planning_tpu.ops import make_pair_index
from ba_path_planning_tpu.ops.collisions import linearize
from ba_path_planning_tpu.ops.rollout import rollout
from ba_path_planning_tpu.solvers import banded
from ba_path_planning_tpu.solvers.admm import make_solver_params
from ba_path_planning_tpu.solvers.banded import (RowVals, StateVars,
                                                 build_bounds,
                                                 collision_lower_bounds_state,
                                                 rho_pattern_masks,
                                                 row_scaling_state,
                                                 solve_qp_state)
from ba_path_planning_tpu.utils import Limits, SolverConfig
from oracles import reference_math as om

N, K, h, R = 2, 20, 0.2, 0.6
LIM = Limits()


def _problem_inputs():
    # approach-to-contact pair: the goals sit exactly R apart, so the
    # terminal equalities AND the k = K collision half-space are active at
    # the optimum (a head-on swap would make the straight-line
    # linearization infeasible — p2x - p1x >= R conflicts with the swapped
    # terminal equality)
    p0 = jnp.asarray([[8.0, 10.0], [12.0, 10.0]], jnp.float64)
    pf = jnp.asarray([[9.7, 10.0], [10.3, 10.0]], jnp.float64)
    v0 = jnp.zeros((N, 2), jnp.float64)
    pairs = make_pair_index(N, dtype=jnp.float64)
    a0 = jnp.zeros((N, K, 2), jnp.float64)
    prev, _ = rollout(a0, p0, v0, h)
    eta, dist = linearize(prev, pairs, jax.random.key(0))
    return p0, v0, pf, pairs, prev, eta, dist


def _engine_qp(polish: bool):
    p0, v0, pf, pairs, prev, eta, dist = _problem_inputs()
    P = pairs.E.shape[1]
    cfg = SolverConfig(method="direct", adaptive_rho=False, polish=False,
                       eps_abs=1e-6, eps_rel=1e-6, max_iter=4000,
                       check_interval=50, rho=1.6)
    params = make_solver_params(cfg, jnp.float64)
    lower, upper = build_bounds(p0, v0, pf, v0, n_vehicles=N, n_steps=K,
                                h=h, limits=LIM, n_pairs=P)
    col_lo = collision_lower_bounds_state(eta, dist, prev, pairs,
                                          min_distance=R)
    lower = lower._replace(col=col_lo)
    x0 = StateVars(a=jnp.zeros((N, K, 2), jnp.float64),
                   p=jnp.zeros((N, K, 2), jnp.float64),
                   v=jnp.zeros((N, K, 2), jnp.float64))
    qp = solve_qp_state(lower, upper, eta, x0, params, pairs.E, h=h,
                        static=cfg.static_part(), n_vehicles=N)
    assert bool(qp.converged)
    x = qp.x
    if polish:
        x = banded.polish_qp_state(lower, upper, eta, qp.x, qp.y, pairs.E,
                                   h=h, n_vehicles=N)
    return np.asarray(x.a), (p0, v0, pf, prev)


def _oracle_optimum(p0, v0, pf, prev):
    mats = om.static_dense_matrices(N, K, h)
    lo, up = om.static_bounds(np.asarray(p0), np.asarray(v0), np.asarray(pf),
                              np.asarray(v0), K=K, h=h,
                              vel_min=LIM.vel_min, vel_max=LIM.vel_max,
                              acc_min=LIM.acc_min, acc_max=LIM.acc_max,
                              jerk_min=LIM.jerk_min, jerk_max=LIM.jerk_max,
                              pos_min=LIM.pos_min, pos_max=LIM.pos_max)
    A_s = np.vstack([mats["jerk"], mats["acc"], mats["vel"], mats["pos"]])
    l_s = np.concatenate([lo[k].reshape(-1)
                          for k in ("jerk", "acc", "vel", "pos")])
    u_s = np.concatenate([up[k].reshape(-1)
                          for k in ("jerk", "acc", "vel", "pos")])
    A_c, l_c, _ = om.collision_rows(np.asarray(prev), np.asarray(p0),
                                    np.asarray(v0), R, h)
    A = np.vstack([A_s, A_c])
    l = np.concatenate([l_s, l_c])
    u = np.concatenate([u_s, np.full(len(l_c), np.inf)])
    x = om.solve_qp_admm(A, l, u)
    return om.unflatten(x, N, K)


def test_polish_reaches_certified_oracle_optimum():
    """ADMM stops at eps 1e-6 (~1e-5 error); the multiplier polish must
    close the remaining gap to the certified optimum (~1e-9)."""
    a_raw, prob = _engine_qp(polish=False)
    a_pol, _ = _engine_qp(polish=True)
    a_ref = _oracle_optimum(*prob)

    raw_err = np.max(np.abs(a_raw - a_ref))
    pol_err = np.max(np.abs(a_pol - a_ref))
    assert pol_err < 1e-8, (pol_err, raw_err)
    assert pol_err < raw_err / 10, (pol_err, raw_err)


def test_rowwise_assembly_matches_uniform_assembly():
    """assemble_blocks_rowwise with per-k-uniform rho (broadcast to full
    channel leaves) must equal assemble_blocks to machine precision."""
    _, _, _, pairs, _, eta, _ = _problem_inputs()
    P = pairs.E.shape[1]
    cfg = SolverConfig(method="direct")
    scaling = row_scaling_state(K, h, dtype=jnp.float64)
    rho_b = rho_pattern_masks(scaling, cfg.static_part(), 1.7, 2.5,
                              n_steps=K, n_pairs=P, col_enabled=True,
                              dtype=jnp.float64)

    D_u, B_u = banded.assemble_blocks(rho_b, eta, pairs.E, h=h, sigma=1e-6,
                                      n_vehicles=N)

    def expand(leaf, K_):
        # (K', 1) broadcastable column -> full (N, K', 2) channel leaf
        return jnp.broadcast_to(leaf.reshape(1, K_, 1), (N, K_, 2))

    rho_full = RowVals(dyn_p=rho_b.dyn_p, dyn_v=rho_b.dyn_v,
                       jerk=expand(rho_b.jerk, K - 1),
                       acc=expand(rho_b.acc, K),
                       vbox=expand(rho_b.vbox, K),
                       pbox=expand(rho_b.pbox, K), col=rho_b.col)
    D_r, B_r = banded.assemble_blocks_rowwise(rho_full, eta, pairs.E, h=h,
                                              sigma=1e-6, n_vehicles=N)
    # identical algebra, different summation order: machine-eps agreement
    np.testing.assert_allclose(np.asarray(D_u), np.asarray(D_r),
                               rtol=1e-12, atol=1e-10)
    np.testing.assert_allclose(np.asarray(B_u), np.asarray(B_r),
                               rtol=1e-12, atol=1e-10)
