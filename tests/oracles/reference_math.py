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
              pos_max=(20.0, 20.0), qp_tol=1e-10, qp_solver="trust-constr",
              candidates=None):
    """Oracle SCP: dense matrices + scipy QP, reference control flow.

    ``qp_solver``: "trust-constr" (slow, small problems) or "admm" (dense
    float64 OSQP-semantics ADMM + polish; benchmark-scale problems).
    Returns dict with positions/velocities/accelerations (N,K,2), iterations,
    converged, feasible_initial.

    ``candidates``: optional list of flat R^{2NK} warm candidates, indexed by
    QP number (0 = static QP, k = the k-th collision iteration's QP).  Each
    is handed to :func:`solve_qp_admm` as an optimality *candidate*: the
    oracle's own active-set refinement either CERTIFIES it as the unique QP
    optimum (primal feasibility <= 1e-9 + multiplier signs, computed
    entirely by this module's numpy code) or discards it and solves from
    scratch.  Correctness is independent of where a candidate came from —
    the certificate is candidate-agnostic — but a near-optimal candidate
    (e.g. the engine's own polished iterate) turns a multi-hour ADMM run
    into minutes.  The oracle still builds each linearization from ITS OWN
    previous certified solution, so the SCP path being compared remains the
    oracle's.
    """
    if qp_solver == "admm":
        # the active-set polish supplies machine precision; ADMM only needs
        # to identify the active set, so 1e-6 residuals suffice
        def solve(A, l, u, x0=None, tol=qp_tol, candidate=None):
            return solve_qp_admm(A, l, u, x0, eps=max(tol, 1e-6),
                                 candidate=candidate)
    else:
        def solve(A, l, u, x0=None, tol=qp_tol, candidate=None):
            return solve_qp(A, l, u, x0, tol=tol)
    N = p0.shape[0]
    mats = static_dense_matrices(N, K, h)
    lo, up = static_bounds(p0, v0, pf, vf, K=K, h=h, vel_min=vel_min,
                           vel_max=vel_max, acc_min=acc_min, acc_max=acc_max,
                           jerk_min=jerk_min, jerk_max=jerk_max,
                           pos_min=pos_min, pos_max=pos_max)
    A_s = np.vstack([mats["jerk"], mats["acc"], mats["vel"], mats["pos"]])
    l_s = np.concatenate([lo[k].reshape(-1) for k in ("jerk", "acc", "vel", "pos")])
    u_s = np.concatenate([up[k].reshape(-1) for k in ("jerk", "acc", "vel", "pos")])

    def cand(i):
        if candidates is None or i >= len(candidates):
            return None
        return candidates[i]

    x = solve(A_s, l_s, u_s, tol=qp_tol, candidate=cand(0))
    a = unflatten(x, N, K)
    positions, _ = rollout(a, p0, v0, h)
    feasible_initial = check_feasible(positions, R)

    # per-iteration trace (iterates + relative step norms): lets a parity
    # harness localize WHERE a divergence starts and how close each step
    # lands to the 1.5e-2 stopping threshold (step-norm boundary cases)
    x_history = [x.copy()]
    rel_history = []

    iteration = 0
    converged = False
    while iteration < max_iterations and not converged and not feasible_initial:
        prev_pos, _ = rollout(unflatten(x, N, K), p0, v0, h)
        A_c, l_c, _ = collision_rows(prev_pos, p0, v0, R, h)
        A = np.vstack([A_s, A_c])
        l = np.concatenate([l_s, l_c])
        u = np.concatenate([u_s, np.full(len(l_c), np.inf)])
        x_new = solve(A, l, u, x0=x, tol=qp_tol,
                      candidate=cand(iteration + 1))
        rel = np.linalg.norm(x_new - x) / np.linalg.norm(x)
        if rel <= tol:
            converged = True
        x = x_new
        iteration += 1
        x_history.append(x.copy())
        rel_history.append(rel)

    a = unflatten(x, N, K)
    positions, velocities = rollout(a, p0, v0, h)
    return dict(positions=positions, velocities=velocities, accelerations=a,
                iterations=iteration, converged=converged,
                feasible_initial=feasible_initial,
                x_history=np.asarray(x_history),
                rel_history=np.asarray(rel_history))


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


# ---------------------------------------------------------------------------
# Fast QP oracle for benchmark-scale parity tests: dense float64 ADMM with
# OSQP update semantics (per-row rho, over-relaxation) + active-set polish
# to machine precision.  Independent of both the JAX engine (numpy/LAPACK,
# dense factors, no operator structure) and scipy's trust-constr path; the
# two oracles are cross-checked against each other in the test suite.
# ---------------------------------------------------------------------------

def solve_qp_admm(A: np.ndarray, l: np.ndarray, u: np.ndarray,
                  x0: np.ndarray | None = None, *, rho: float = 0.1,
                  sigma: float = 1e-6, alpha: float = 1.6,
                  eps: float = 1e-6, max_iter: int = 50000,
                  polish: bool = True,
                  candidate: np.ndarray | None = None) -> np.ndarray:
    """min x'x s.t. l <= Ax <= u, unique optimum (P = 2I, scp.py:329/407).

    ADMM exactly in OSQP's form (the reference's backend, scp.py:326-365):
    per-row rho with the 1e3 boost on equality rows, over-relaxed updates,
    termination on primal/dual residuals — followed by **staged active-set
    refinement to a certified optimum**: refinement (exact min-norm solve on
    the current active set + textbook drop/add repairs) either terminates
    with a KKT certificate (primal feasibility <= 1e-9 and multiplier
    signs), or ADMM is CONTINUED from its current state at 10x tighter eps
    and refinement retried.  A silent uncertified fallback is exactly the
    failure mode that broke benchmark-scale SCP parity (a single ~1e-6
    uncertified QP amplifies ~1000x across re-linearizations, docs/PARITY.md),
    so stages tighten down to 1e-10 before giving up loudly.
    """
    A = np.asarray(A, dtype=np.float64)
    l = np.asarray(l, dtype=np.float64)
    u = np.asarray(u, dtype=np.float64)
    m, n = A.shape
    eq = np.isclose(l, u)
    x = np.zeros(n) if x0 is None else np.asarray(x0, dtype=np.float64).copy()
    z = np.clip(A @ x, l, u)
    y = np.zeros(m)

    import scipy.linalg as sla

    # M(rho) = (2+sigma) I + rho * G with G = A' diag(1 or 1e3) A computed
    # once, so rho adaptation refactorizes in O(n^3) instead of O(m n^2)
    G = (A.T * np.where(eq, 1e3, 1.0)) @ A

    def factor(rho_val):
        rv = np.full(m, rho_val)
        rv[eq] = rho_val * 1e3
        M = (2.0 + sigma) * np.eye(n) + rho_val * G
        return rv, sla.cho_factor(M)

    rho_vec, cf = factor(rho)

    def admm_continue(x, z, y, eps_stage, iters):
        nonlocal rho, rho_vec, cf
        for it in range(iters):
            rhs = sigma * x + A.T @ (rho_vec * z - y)
            x_t = sla.cho_solve(cf, rhs)
            z_t = A @ x_t
            x_new = alpha * x_t + (1 - alpha) * x
            z_mix = alpha * z_t + (1 - alpha) * z
            z_new = np.clip(z_mix + y / rho_vec, l, u)
            y = y + rho_vec * (z_mix - z_new)
            x, z = x_new, z_new
            if it % 25 == 24:
                Ax = A @ x
                Aty = A.T @ y
                r_prim = np.max(np.abs(Ax - z))
                r_dual = np.max(np.abs(2 * x + Aty))
                scale_p = max(np.max(np.abs(Ax)), np.max(np.abs(z)), 1.0)
                scale_d = max(np.max(np.abs(2 * x)), np.max(np.abs(Aty)), 1.0)
                if r_prim <= eps_stage * scale_p and r_dual <= eps_stage * scale_d:
                    break
                # OSQP-style residual-balancing rho adaptation (refactorize
                # only on a > 5x change, every 100 iterations at most)
                if it % 100 == 99:
                    ratio = (r_prim / scale_p) / max(r_dual / scale_d, 1e-16)
                    rho_new = float(np.clip(rho * np.sqrt(ratio), 1e-6, 1e6))
                    if rho_new > 5 * rho or rho_new < rho / 5:
                        rho = rho_new
                        rho_vec, cf = factor(rho)
        return x, z, y

    def solve_minnorm(act, on_upper):
        A_act = A[act]
        b_act = np.where(on_upper[act], u[act], l[act])
        Gm = A_act @ A_act.T
        Gm[np.diag_indices_from(Gm)] += 1e-13 * max(1.0, np.trace(Gm) / len(Gm))
        try:
            cf_g = sla.cho_factor(Gm)
            lam = sla.cho_solve(cf_g, b_act)
            x_p = A_act.T @ lam
            lam += sla.cho_solve(cf_g, b_act - A_act @ x_p)
        except np.linalg.LinAlgError:
            lam = np.linalg.lstsq(Gm, b_act, rcond=None)[0]
        x_p = A_act.T @ lam
        return x_p, lam

    def refine(x, z, y, rounds=20, init_sets=None):
        """Active-set refinement: returns (x_certified_or_best, certified).

        ``init_sets``: optional (low_act, upp_act) seed masks — used by the
        candidate fast path, whose active-set guess comes from primal
        proximity instead of ADMM dual signs.  The drop/add repair loop is
        identical either way, as is the certificate.
        """
        sign_tol = 1e-9
        if init_sets is not None:
            low_act, upp_act = init_sets
            low_act = low_act & ~eq
            upp_act = upp_act & ~eq
        else:
            tol_act = 1e-7 * max(1.0, np.max(np.abs(z)))
            low_act = (z - l <= tol_act) & (y < -1e-10) & ~eq
            upp_act = (u - z <= tol_act) & (y > 1e-10) & ~eq
        if not np.any(low_act | upp_act | eq):
            # empty active set: the optimum of min x'x is interior, i.e.
            # x* = 0 — certifiable directly by the unconstrained KKT check
            # (dual residual 2x ~ 0) plus strict feasibility (ADVICE r3)
            dual_ok = np.max(np.abs(2 * x)) <= 1e-9
            Ax = A @ x
            feas_ok = bool(np.all(Ax >= l - 1e-9) and np.all(Ax <= u + 1e-9))
            return x, bool(dual_ok and feas_ok)
        best, best_viol = x, np.inf
        for _ in range(rounds):
            act = low_act | upp_act | eq
            if not np.any(act):
                break
            x_pol, lam = solve_minnorm(act, upp_act)
            # multipliers of min x'x s.t. A_act x = b: x = A_act' lam, so
            # OSQP's stationarity 2x + A'y = 0 gives y_act = -2 lam.  OSQP's
            # cone is y <= 0 on lower-active rows and y >= 0 on upper-active
            # rows, hence a lower-bound row needs lam > 0 and an upper-bound
            # row lam < 0 (1-D check: min x^2 s.t. x >= 1 has x = A'lam with
            # lam = 1 > 0).  r5 fix: these drop rules were inverted, so any
            # QP with an active inequality row failed certification and fell
            # through to the best-verified-candidate path — the returned
            # point was still the round-0 exact min-norm solve on the
            # correct active set, but the KKT certificate never fired.
            lam_full = np.zeros(m)
            lam_full[act] = lam
            drop_low = low_act & (lam_full < -sign_tol)
            drop_upp = upp_act & (lam_full > sign_tol)
            r_low = l - A @ x_pol
            r_upp = A @ x_pol - u
            viol = max(np.max(r_low, initial=0.0), np.max(r_upp, initial=0.0))
            if viol < best_viol and x_pol @ x_pol <= x @ x + 1e-7 * max(
                    1.0, x @ x):
                best, best_viol = x_pol, viol
            add_low = (r_low > 1e-10) & ~low_act & ~eq
            add_upp = (r_upp > 1e-10) & ~upp_act & ~eq
            if (not np.any(drop_low | drop_upp | add_low | add_upp)
                    and viol <= 1e-9):
                return x_pol, True              # certified optimal
            low_act = (low_act & ~drop_low) | add_low
            upp_act = (upp_act & ~drop_upp) | add_upp
        return (best if best_viol <= 1e-6 else x), False

    if candidate is not None and polish:
        # Candidate fast path: certify-or-discard.  The active set is seeded
        # from primal proximity of the candidate (each near-boundary row is
        # assigned to its NEARER bound; structurally-zero rows, which cannot
        # constrain x, are excluded), then the standard drop/add refinement
        # runs to the same KKT certificate as the ADMM path.  A wrong
        # candidate simply fails to certify and costs a few dense solves.
        x_c = np.asarray(candidate, dtype=np.float64)
        Ax_c = A @ x_c
        nz_row = np.max(np.abs(A), axis=1) > 1e-12
        tol_c = 1e-6 * max(1.0, np.max(np.abs(Ax_c)))
        d_lo = Ax_c - l
        d_up = u - Ax_c
        low_c = (d_lo <= tol_c) & (d_lo <= d_up) & nz_row
        upp_c = (d_up <= tol_c) & (d_up < d_lo) & nz_row
        z_c = np.clip(Ax_c, l, u)
        x_ref, certified = refine(x_c, z_c, None, rounds=60,
                                  init_sets=(low_c, upp_c))
        if certified:
            solve_qp_admm.stats["candidate_certified"] += 1
            return x_ref
        solve_qp_admm.stats["candidate_failed"] += 1
        import sys as _sys
        print("solve_qp_admm: candidate failed certification; "
              "falling back to ADMM", file=_sys.stderr, flush=True)
        if x0 is None:
            x = x_c.copy()
            z = np.clip(A @ x, l, u)

    budget = max_iter
    x, z, y = admm_continue(x, z, y, eps, budget)
    if not polish:
        return x

    eps_stage = eps
    for _ in range(5):
        x_ref, certified = refine(x, z, y)
        if certified:
            return x_ref
        if eps_stage <= 1e-10:
            break
        eps_stage = eps_stage * 0.1
        x, z, y = admm_continue(x, z, y, eps_stage, budget)
    import sys as _sys
    print("WARNING: solve_qp_admm refinement uncertified at eps "
          f"{eps_stage:g}; returning best verified candidate",
          file=_sys.stderr)
    return x_ref


solve_qp_admm.stats = {"candidate_certified": 0, "candidate_failed": 0}
