"""Independent numpy oracle implementing the reference math spec (SURVEY.md section 3).

Written straight from the mathematical contract — naive loops and dense
matrices, float64 — deliberately structured differently from both the
reference code and the TPU framework, so agreement between the three is
meaningful evidence of correctness.

Layout note: the reference flattens decision variables vehicle-major as
x[2*i*K + 2*k + axis] (scp.py:16-24).  The oracle works in (N, K, 2) block
form and provides ``flatten``/``unflatten`` to produce the reference layout.
"""

from __future__ import annotations

import numpy as np


def flatten(a_nk2: np.ndarray) -> np.ndarray:
    """(N, K, 2) -> flat R^{2NK} in reference layout."""
    return np.ascontiguousarray(a_nk2, dtype=np.float64).reshape(-1)


def unflatten(x: np.ndarray, N: int, K: int) -> np.ndarray:
    return np.asarray(x, dtype=np.float64).reshape(N, K, 2)


# ---------------------------------------------------------------------------
# Dynamics rollout (SURVEY 3.2)
# ---------------------------------------------------------------------------

def rollout(a: np.ndarray, p0: np.ndarray, v0: np.ndarray, h: float):
    """a: (N,K,2), p0/v0: (N,2).  Returns (positions, velocities), each (N,K,2)."""
    N, K, _ = a.shape
    pos = np.zeros((N, K, 2))
    vel = np.zeros((N, K, 2))
    for i in range(N):
        for k in range(K):
            vel[i, k] = v0[i] + h * sum(a[i, j] for j in range(k))
            pos[i, k] = p0[i] + k * h * v0[i] + sum(
                h * h * (k - j - 0.5) * a[i, j] for j in range(k))
    return pos, vel


# ---------------------------------------------------------------------------
# Static constraint rows (SURVEY 3.3), block form
# ---------------------------------------------------------------------------

def static_rows(a: np.ndarray, h: float):
    """Returns (jerk (N,K-1,2), acc (N,K,2), vel (N,K,2), pos (N,K,2)) row values."""
    N, K, _ = a.shape
    jerk = np.zeros((N, K - 1, 2))
    vel = np.zeros((N, K, 2))
    pos = np.zeros((N, K, 2))
    for i in range(N):
        for k in range(K - 1):
            jerk[i, k] = (a[i, k + 1] - a[i, k]) / h
        for k in range(K):
            vel[i, k] = h * sum(a[i, j] for j in range(k + 1))
            pos[i, k] = sum(h * h * (k - j + 0.5) * a[i, j] for j in range(k + 1))
    return jerk, a.copy(), vel, pos


def static_dense_matrices(N: int, K: int, h: float):
    """Dense versions of the four static blocks acting on the flat layout.

    Returns dict of (rows, 2NK) arrays keyed jerk/acc/vel/pos, with block-row
    ordering (i, k, axis) matching the reference row order.
    """
    n = 2 * N * K

    def col(i, k, c):
        return 2 * i * K + 2 * k + c

    jerk = np.zeros((2 * N * (K - 1), n))
    r = 0
    for i in range(N):
        for k in range(K - 1):
            for c in range(2):
                jerk[r, col(i, k, c)] = -1.0 / h
                jerk[r, col(i, k + 1, c)] = 1.0 / h
                r += 1

    acc = np.eye(n)

    vel = np.zeros((n, n))
    pos = np.zeros((n, n))
    r = 0
    for i in range(N):
        for k in range(K):
            for c in range(2):
                for j in range(k + 1):
                    vel[r, col(i, j, c)] = h
                    pos[r, col(i, j, c)] = h * h * (k - j + 0.5)
                r += 1
    return dict(jerk=jerk, acc=acc, vel=vel, pos=pos)


def static_bounds(p0, v0, pf, vf, *, K, h, vel_min, vel_max, acc_min, acc_max,
                  jerk_min, jerk_max, pos_min, pos_max):
    """Bounds in block form: dicts keyed jerk/acc/vel/pos (SURVEY 3.3)."""
    N = p0.shape[0]
    l_jerk = np.full((N, K - 1, 2), jerk_min)
    u_jerk = np.full((N, K - 1, 2), jerk_max)
    l_acc = np.full((N, K, 2), acc_min)
    u_acc = np.full((N, K, 2), acc_max)
    l_vel = np.zeros((N, K, 2))
    u_vel = np.zeros((N, K, 2))
    l_pos = np.zeros((N, K, 2))
    u_pos = np.zeros((N, K, 2))
    pmin = np.asarray(pos_min)
    pmax = np.asarray(pos_max)
    for i in range(N):
        for k in range(K):
            if k < K - 1:
                l_vel[i, k] = vel_min - v0[i]
                u_vel[i, k] = vel_max - v0[i]
            else:
                l_vel[i, k] = u_vel[i, k] = vf[i] - v0[i]
            off = p0[i] + h * (k + 1) * v0[i]
            if k < K - 1:
                l_pos[i, k] = pmin - off
                u_pos[i, k] = pmax - off
            else:
                l_pos[i, k] = u_pos[i, k] = pf[i] - off
    return (dict(jerk=l_jerk, acc=l_acc, vel=l_vel, pos=l_pos),
            dict(jerk=u_jerk, acc=u_acc, vel=u_vel, pos=u_pos))


# ---------------------------------------------------------------------------
# Collision rows (SURVEY 3.4)
# ---------------------------------------------------------------------------

def pair_list(N: int):
    return [(i, j) for i in range(N) for j in range(i + 1, N)]


def collision_rows(prev_pos: np.ndarray, p0: np.ndarray, v0: np.ndarray,
                   R: float, h: float, eta_override=None):
    """Dense collision block + lower bounds.

    prev_pos: (N,K,2) previous-iterate rollout.  Returns (A (K*P, 2NK),
    l (K*P,), eta (K,P,2)).  Row order: k-major, then pair (i<j).
    ``eta_override`` (K,P,2) replaces the computed directions (for testing the
    degenerate branch deterministically).
    """
    N, K, _ = prev_pos.shape
    pairs = pair_list(N)
    P = len(pairs)
    n = 2 * N * K
    A = np.zeros((K * P, n))
    l = np.zeros(K * P)
    etas = np.zeros((K, P, 2))

    def col(i, k, c):
        return 2 * i * K + 2 * k + c

    r = 0
    for k in range(K):
        for p, (i, j) in enumerate(pairs):
            diff = prev_pos[i, k] - prev_pos[j, k]
            dist = float(np.hypot(diff[0], diff[1]))
            if eta_override is not None:
                eta = np.asarray(eta_override[k, p], dtype=np.float64)
                if dist < 1e-6:
                    dist = 1.0
            elif dist < 1e-6:
                eta = np.array([1.0, 0.0])   # deterministic stand-in
                dist = 1.0
            else:
                eta = diff / dist
            etas[k, p] = eta
            for m in range(k):
                w = h * h * (k - m - 0.5)
                for c in range(2):
                    A[r, col(i, m, c)] += eta[c] * w
                    A[r, col(j, m, c)] -= eta[c] * w
            lin = float(eta @ diff) - dist
            rhs = R + lin - float(eta @ (p0[i] - p0[j])) - k * h * float(eta @ (v0[i] - v0[j]))
            l[r] = rhs
            r += 1
    return A, l, etas


def check_feasible(positions: np.ndarray, R: float) -> bool:
    N, K, _ = positions.shape
    for k in range(K):
        for i in range(N):
            for j in range(i + 1, N):
                if np.linalg.norm(positions[i, k] - positions[j, k]) < R - 0.01:
                    return False
    return True


# ---------------------------------------------------------------------------
# Full SCP loop oracle (control flow per SURVEY 3.5)
# ---------------------------------------------------------------------------

def scp_solve(p0, v0, pf, vf, *, R, h, K, max_iterations=15, tol=1.5e-2,
              vel_min=-2.0, vel_max=2.0, acc_min=-15.0, acc_max=15.0,
              jerk_min=-20.0, jerk_max=20.0, pos_min=(0.0, 0.0),
              pos_max=(20.0, 20.0), qp_tol=1e-10):
    """Oracle SCP: dense matrices + scipy QP, reference control flow.

    Returns dict with positions/velocities/accelerations (N,K,2), iterations,
    converged, feasible_initial.
    """
    N = p0.shape[0]
    mats = static_dense_matrices(N, K, h)
    lo, up = static_bounds(p0, v0, pf, vf, K=K, h=h, vel_min=vel_min,
                           vel_max=vel_max, acc_min=acc_min, acc_max=acc_max,
                           jerk_min=jerk_min, jerk_max=jerk_max,
                           pos_min=pos_min, pos_max=pos_max)
    A_s = np.vstack([mats["jerk"], mats["acc"], mats["vel"], mats["pos"]])
    l_s = np.concatenate([lo[k].reshape(-1) for k in ("jerk", "acc", "vel", "pos")])
    u_s = np.concatenate([up[k].reshape(-1) for k in ("jerk", "acc", "vel", "pos")])

    x = solve_qp(A_s, l_s, u_s, tol=qp_tol)
    a = unflatten(x, N, K)
    positions, _ = rollout(a, p0, v0, h)
    feasible_initial = check_feasible(positions, R)

    iteration = 0
    converged = False
    while iteration < max_iterations and not converged and not feasible_initial:
        prev_pos, _ = rollout(unflatten(x, N, K), p0, v0, h)
        A_c, l_c, _ = collision_rows(prev_pos, p0, v0, R, h)
        A = np.vstack([A_s, A_c])
        l = np.concatenate([l_s, l_c])
        u = np.concatenate([u_s, np.full(len(l_c), np.inf)])
        x_new = solve_qp(A, l, u, x0=x, tol=qp_tol)
        rel = np.linalg.norm(x_new - x) / np.linalg.norm(x)
        if rel <= tol:
            converged = True
        x = x_new
        iteration += 1

    a = unflatten(x, N, K)
    positions, velocities = rollout(a, p0, v0, h)
    return dict(positions=positions, velocities=velocities, accelerations=a,
                iterations=iteration, converged=converged,
                feasible_initial=feasible_initial)


# ---------------------------------------------------------------------------
# QP oracle:  min ||x||^2  s.t.  l <= Ax <= u   (scipy, dense, float64)
# ---------------------------------------------------------------------------

def solve_qp(A: np.ndarray, l: np.ndarray, u: np.ndarray,
             x0: np.ndarray | None = None, tol: float = 1e-10) -> np.ndarray:
    """High-accuracy oracle via scipy trust-constr (unique optimum: P = 2I)."""
    from scipy.optimize import LinearConstraint, minimize
    n = A.shape[1]
    if x0 is None:
        x0 = np.zeros(n)
    con = LinearConstraint(A, l, u)
    res = minimize(lambda x: x @ x, x0, jac=lambda x: 2 * x,
                   hess=lambda x: 2 * np.eye(n),
                   method="trust-constr", constraints=[con],
                   options={"gtol": tol, "xtol": tol, "maxiter": 3000})
    return res.x
