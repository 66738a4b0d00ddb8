"""Oracle KKT-certificate regression tests (fast tier).

Round-5 fix: ``reference_math.refine``'s multiplier-sign drop rule was
inverted — for min x'x s.t. l <= Ax <= u with x = A_act' lam, OSQP's
stationarity 2x + A'y = 0 gives y = -2 lam, so lower-active rows need
lam > 0 and upper-active rows lam < 0.  The inverted rule dropped exactly
the correctly-signed rows, so no QP with an active inequality row ever
fired the certificate (solve_qp_admm silently returned the exact round-0
min-norm point via the best-verified fallback instead).  These tests pin
the corrected convention on cases small enough to reason about by hand,
plus the candidate fast path used by the parity oracle regeneration
(scripts/oracle_cache.py).
"""

import numpy as np
import pytest

from oracles import reference_math as om


def _reset_stats():
    om.solve_qp_admm.stats = {"candidate_certified": 0, "candidate_failed": 0}


def test_lower_bound_active_certifies():
    # min x'x s.t. x0 >= 1: optimum (1, 0), lam = 1 > 0 must NOT be dropped
    A = np.array([[1.0, 0.0]])
    _reset_stats()
    x = om.solve_qp_admm(A, np.array([1.0]), np.array([np.inf]),
                         candidate=np.array([1.0, 0.0]))
    np.testing.assert_allclose(x, [1.0, 0.0], atol=1e-12)
    assert om.solve_qp_admm.stats == {"candidate_certified": 1,
                                      "candidate_failed": 0}


def test_upper_bound_active_certifies():
    # min x'x s.t. x0 <= -1: optimum (-1, 0), lam = -1 < 0 must NOT be dropped
    A = np.array([[1.0, 0.0]])
    _reset_stats()
    x = om.solve_qp_admm(A, np.array([-np.inf]), np.array([-1.0]),
                         candidate=np.array([-1.0, 0.0]))
    np.testing.assert_allclose(x, [-1.0, 0.0], atol=1e-12)
    assert om.solve_qp_admm.stats == {"candidate_certified": 1,
                                      "candidate_failed": 0}


def test_feasible_qp_with_active_rows_certifies_and_matches_scratch():
    rng = np.random.default_rng(2)
    m, n = 160, 40
    A = rng.normal(size=(m, n))
    l = np.full(m, -5.0)
    u = np.full(m, 5.0)
    l[:15] = 0.3                 # forcing rows: active at the optimum
    l[150] = u[150] = 0.7        # equality rows
    l[151] = u[151] = -0.2

    x_star = om.solve_qp_admm(A, l, u)

    # certificate sanity: the from-scratch solution satisfies KKT
    Ax = A @ x_star
    assert np.all(Ax >= l - 1e-9) and np.all(Ax <= u + 1e-9)

    # exact candidate certifies bit-identically; perturbed candidate
    # certifies to the same optimum; garbage falls back and still agrees
    _reset_stats()
    x_c = om.solve_qp_admm(A, l, u, candidate=x_star)
    assert om.solve_qp_admm.stats["candidate_certified"] == 1
    np.testing.assert_array_equal(x_c, x_star)

    x_p = om.solve_qp_admm(A, l, u,
                           candidate=x_star + rng.normal(size=n) * 1e-6)
    assert om.solve_qp_admm.stats["candidate_certified"] == 2
    np.testing.assert_allclose(x_p, x_star, atol=1e-9)

    # garbage candidate: either the drop/add repair loop converges and
    # certifies anyway, or it falls back to ADMM — both must land on the
    # same unique optimum
    x_g = om.solve_qp_admm(A, l, u, candidate=rng.normal(size=n))
    np.testing.assert_allclose(x_g, x_star, atol=1e-7)


def test_structurally_zero_rows_excluded_from_candidate_seed():
    # a zero row with a near-binding bound must not poison the active set
    rng = np.random.default_rng(3)
    m, n = 40, 10
    A = rng.normal(size=(m, n))
    l = np.full(m, -5.0)
    u = np.full(m, 5.0)
    l[:4] = 0.2
    A[7] = 0.0
    l[7], u[7] = -1e-9, 1.0      # zero row, lower bound ~at zero
    x_star = om.solve_qp_admm(A, l, u)
    _reset_stats()
    x_c = om.solve_qp_admm(A, l, u, candidate=x_star)
    assert om.solve_qp_admm.stats["candidate_certified"] == 1
    np.testing.assert_array_equal(x_c, x_star)
