"""Differential parity tests at the reference benchmark configuration.

The north-star contract (BASELINE.md, SURVEY section 3) is trajectories
matching the reference SCP within 1e-3 at the same horizon and convergence
criteria.  ``test_scp_e2e.py`` proves this at N=2/K=14 against the scipy
trust-constr oracle; here the scale moves to the reference's *benchmark*
shapes (K=50 at h=0.2, T=10 — compute_trajectories_batch.py:14-24) using the
fast dense-ADMM oracle (``solve_qp_admm``), which is itself cross-validated
against trust-constr below and in the N=2 full-loop comparison.

The full N=18/N=20 parity run takes ~0.5-1 h on this 2-core host, so it is
gated behind PARITY_FULL=1 (run via scripts/parity_full.py, results recorded
in docs/PARITY.md); the default suite runs the N=5 benchmark-horizon case.
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ba_path_planning_tpu.scenarios import generate_scenario_batch
from ba_path_planning_tpu.solvers.scp import SCPEngine
from ba_path_planning_tpu.utils import ProblemConfig, SolverConfig
from oracles import reference_math as oracle

pytestmark = pytest.mark.slow


def _tight_engine(N, K, h, R, max_iterations=15):
    problem = ProblemConfig(n_vehicles=N, time_horizon=K * h, time_step=h,
                            min_distance=R, max_iterations=max_iterations)
    cfg = SolverConfig(method="direct", eps_abs=1e-6, eps_rel=1e-6,
                       max_iter=20000, check_interval=50)
    return SCPEngine(problem, cfg, dtype=jnp.float64)


def _run_parity(N, seed, *, K=50, h=0.2, R=0.8, atol=1e-3):
    sc = generate_scenario_batch(jax.random.key(seed), 1, n_vehicles=N,
                                 min_distance=R, dtype=jnp.float64)
    p0 = np.asarray(sc.initial[0], float)
    pf = np.asarray(sc.final[0], float)
    v0 = np.zeros((N, 2))

    ref = oracle.scp_solve(p0, v0, pf, v0, R=R, h=h, K=K, max_iterations=15,
                           qp_solver="admm")
    eng = _tight_engine(N, K, h, R)
    res = eng.solve(p0, v0, pf, v0, key=jax.random.key(seed + 1))

    assert int(res.iterations) == ref["iterations"], (
        int(res.iterations), ref["iterations"])
    assert bool(res.converged) == ref["converged"]
    assert bool(res.feasible_initial) == ref["feasible_initial"]
    np.testing.assert_allclose(np.asarray(res.positions), ref["positions"],
                               atol=atol)
    np.testing.assert_allclose(np.asarray(res.velocities), ref["velocities"],
                               atol=atol)
    return ref, res


def test_admm_oracle_matches_trust_constr_static_qp():
    """The fast oracle agrees with scipy trust-constr to 1e-8 on the static
    (collision-free) QP at benchmark horizon."""
    N, K, h = 2, 20, 0.2
    p0 = np.array([[6.0, 10.0], [14.0, 10.0]])
    pf = np.array([[10.0, 13.0], [10.0, 7.0]])
    v0 = np.zeros((2, 2))
    mats = oracle.static_dense_matrices(N, K, h)
    lo, up = oracle.static_bounds(p0, v0, pf, v0, K=K, h=h, vel_min=-2,
                                  vel_max=2, acc_min=-15, acc_max=15,
                                  jerk_min=-20, jerk_max=20, pos_min=(0, 0),
                                  pos_max=(20, 20))
    order = ("jerk", "acc", "vel", "pos")
    A = np.vstack([mats[k] for k in order])
    l = np.concatenate([lo[k].reshape(-1) for k in order])
    u = np.concatenate([up[k].reshape(-1) for k in order])
    x_tc = oracle.solve_qp(A, l, u)
    x_ad = oracle.solve_qp_admm(A, l, u)
    np.testing.assert_allclose(x_ad, x_tc, atol=1e-7)


def test_admm_oracle_polish_is_certified_exact():
    """The oracle's active-set refinement reaches the certified KKT optimum:
    two ADMM runs from different starts / penalties agree EXACTLY after
    polish, and the KKT conditions hold to machine precision on a feasible
    collision QP — the per-QP exactness the benchmark-scale parity rests on."""
    N, K, h, R = 2, 14, 0.2, 0.8
    p0 = np.array([[6.0, 10.0], [14.0, 10.0]])
    pf = np.array([[10.0, 13.0], [10.0, 7.0]])
    v0 = np.zeros((N, 2))
    mats = oracle.static_dense_matrices(N, K, h)
    lo, up = oracle.static_bounds(p0, v0, pf, v0, K=K, h=h, vel_min=-2,
                                  vel_max=2, acc_min=-15, acc_max=15,
                                  jerk_min=-20, jerk_max=20, pos_min=(0, 0),
                                  pos_max=(20, 20))
    order = ("jerk", "acc", "vel", "pos")
    A_s = np.vstack([mats[k] for k in order])
    l_s = np.concatenate([lo[k].reshape(-1) for k in order])
    u_s = np.concatenate([up[k].reshape(-1) for k in order])
    x0 = oracle.solve_qp_admm(A_s, l_s, u_s)
    prev_pos, _ = oracle.rollout(oracle.unflatten(x0, N, K), p0, v0, h)
    A_c, l_c, _ = oracle.collision_rows(prev_pos, p0, v0, R, h)
    A = np.vstack([A_s, A_c])
    l = np.concatenate([l_s, l_c])
    u = np.concatenate([u_s, np.full(len(l_c), np.inf)])

    xa = oracle.solve_qp_admm(A, l, u, x0=x0)
    xb = oracle.solve_qp_admm(A, l, u, x0=None, rho=0.7, alpha=1.5)
    np.testing.assert_array_equal(xa, xb)      # same certified optimum

    viol = max(np.max(l - A @ xa, initial=0.0),
               np.max(A @ xa - u, initial=0.0))
    assert viol <= 1e-9
    r = A @ xa
    act = (r - l <= 1e-7) | (u - r <= 1e-7)
    lam, *_ = np.linalg.lstsq(A[act].T, 2 * xa, rcond=None)
    assert np.max(np.abs(2 * xa - A[act].T @ lam)) <= 1e-8


def test_parity_n5_benchmark_horizon():
    """Full SCP differential at N=5 on the benchmark horizon (K=50, h=0.2,
    R=0.8): engine trajectories match the independent dense oracle within
    1e-3, with identical iteration counts and convergence flags."""
    # seed chosen so the scenario requires collision iterations (the
    # interesting path) and converges away from the 1.5e-2 threshold
    ref, _ = _run_parity(5, seed=11)
    assert ref["iterations"] >= 1 and ref["converged"]


@pytest.mark.skipif(not os.environ.get("PARITY_FULL"),
                    reason="~0.5-1h on the 2-core host; run scripts/parity_full.py")
@pytest.mark.parametrize("N,seed", [(18, 42), (20, 7)])
def test_parity_benchmark_scale_full(N, seed):
    """Reference benchmark config: N=18/20, K=50 (2NK up to 2000 variables,
    ~17k constraint rows) — trajectories within 1e-3 of the oracle."""
    _run_parity(N, seed=seed)
