"""Batched, matrix-free ADMM QP solver (OSQP-compatible semantics).

Solves, entirely on-device and vmappable over scenarios,

    min  ||x||^2   s.t.   l <= A x <= u

where A is the stacked constraint operator of ``ops.constraints`` (never
materialized).  This replaces the reference's per-iteration
``osqp.OSQP().setup(...).solve()`` calls
(``/root/reference/src/path_planning/solvers/scp.py:326-369, 441-447``) with a
first-party solver whose fixed-point matches OSQP's ADMM iteration:

    x~ = argmin ||x||^2 + sigma/2 ||x - x_k||^2 + rho/2 ||A x - z_k + y_k/rho||^2
    x_{k+1} = alpha x~ + (1-alpha) x_k
    z_{k+1} = Pi_[l,u]( alpha A x~ + (1-alpha) z_k + y_k / rho )
    y_{k+1} = y_k + rho (alpha A x~ + (1-alpha) z_k - z_{k+1})

The x-update linear system  (2 + sigma) x + A^T diag(rho) A x = b  is solved
by preconditioned CG.  The preconditioner exploits problem structure: the
static blocks (jerk/acc/vel/pos) act independently per (vehicle, axis) with an
identical K x K normal matrix, so its dense inverse — computed once per
(K, h, rho) in float64 on the host — is an *exact* inverse of the
collision-free system.  CG then only has to correct for the collision rows.
A single batched (…, K) x (K, K) matmul applies it (MXU work).

Termination follows OSQP: eps_abs/eps_rel on primal residual ||Ax - z||_inf
and dual residual ||P x + q + A^T y||_inf, checked every ``check_interval``
iterations inside a ``lax.while_loop``.  Per-row rho: equality rows
(l == u) get ``rho_eq_scale * rho``; disabled collision rows (mask 0) get a
negligible rho so they cannot perturb the solve.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.constraints import (ConstraintBlocks, apply_static,
                               apply_static_adjoint, apply_collision,
                               apply_collision_adjoint)
from ..ops.matmul_ops import (apply_static_matmul,
                              apply_static_adjoint_matmul,
                              apply_collision_matmul,
                              apply_collision_adjoint_matmul)
from ..utils.config import SolverConfig, SolverStatic

_LOOSE_RHO = 1e-6   # rho on disabled (±inf) rows; OSQP's RHO_MIN


class QPData(NamedTuple):
    """Per-scenario problem data for one QP solve (shapes per scenario)."""
    eta: jnp.ndarray           # (K, P, 2) collision directions
    col_mask: jnp.ndarray      # () or broadcastable — 1.0 enables collision rows
    lower: ConstraintBlocks
    upper: ConstraintBlocks


class SolverParams(NamedTuple):
    """Traced numeric solver settings — swept without recompilation."""
    rho: jnp.ndarray
    sigma: jnp.ndarray
    alpha: jnp.ndarray
    eps_abs: jnp.ndarray
    eps_rel: jnp.ndarray
    cg_tol: jnp.ndarray
    col_penalty: jnp.ndarray       # exact-penalty weight on collision rows
    col_rho_boost: jnp.ndarray     # extra rho factor on collision rows
    col_margin: jnp.ndarray        # constraint tightening added to R
    max_iter: jnp.ndarray          # int32
    check_interval: jnp.ndarray    # int32
    cg_iters: jnp.ndarray          # int32
    polish_cg_iters: jnp.ndarray   # int32


def make_solver_params(cfg: SolverConfig, dtype=jnp.float32) -> SolverParams:
    f = lambda v: jnp.asarray(v, dtype)
    i = lambda v: jnp.asarray(v, jnp.int32)
    return SolverParams(rho=f(cfg.rho), sigma=f(cfg.sigma), alpha=f(cfg.alpha),
                        eps_abs=f(cfg.eps_abs), eps_rel=f(cfg.eps_rel),
                        cg_tol=f(cfg.cg_tol), col_penalty=f(cfg.col_penalty),
                        col_rho_boost=f(cfg.col_rho_boost),
                        col_margin=f(cfg.collision_margin),
                        max_iter=i(cfg.max_iter),
                        check_interval=i(cfg.check_interval),
                        cg_iters=i(cfg.cg_iters),
                        polish_cg_iters=i(cfg.polish_cg_iters))


class QPState(NamedTuple):
    x: jnp.ndarray             # (N, K, 2) accelerations
    z: ConstraintBlocks
    y: ConstraintBlocks
    iters: jnp.ndarray         # () int32 — iterations actually run
    prim_res: jnp.ndarray      # () residual at last check
    dual_res: jnp.ndarray
    converged: jnp.ndarray     # () bool


# ---------------------------------------------------------------------------
# Row equilibration: closed-form row norms -> per-row rho pattern
# ---------------------------------------------------------------------------
#
# OSQP's Ruiz scaling is essential for ADMM iteration counts, and with
# per-row penalty rho_i it is algebraically equivalent to row-only scaling:
# scaling row i by d_i = 1/||A_i|| equals running unscaled ADMM with
# rho_i = rho * d_i^2.  Every row norm here has a closed form independent of
# problem data (collision rows too, since |eta| = 1), so equilibration costs
# nothing at runtime:
#   jerk row:       sqrt(2)/h
#   acc row:        1
#   vel row k:      h * sqrt(k+1)
#   pos row k:      h^2 * sqrt(sum_{m<=k} (m+0.5)^2)
#   collision row k: sqrt(2) * h^2 * sqrt(sum_{m<k} (m+0.5)^2)   (0 at k=0)

# Row scales d = 1/row_norm are carried as a ConstraintBlocks pytree of
# per-k (broadcastable) arrays so they tree_map against row-space values.
RowScaling = ConstraintBlocks


def _row_norms_np(K: int, h: float):
    m = np.arange(K) + 0.5
    cum = np.cumsum(m * m)                       # sum_{m<=k} (m+0.5)^2
    jerk = np.full(K - 1, np.sqrt(2.0) / h)
    acc = np.ones(K)
    vel = h * np.sqrt(np.arange(1, K + 1, dtype=np.float64))
    pos = h * h * np.sqrt(cum)
    col = np.zeros(K)
    col[1:] = np.sqrt(2.0) * h * h * np.sqrt(cum[:-1])
    col[0] = 1.0                                 # vacuous all-zero row
    return jerk, acc, vel, pos, col


def build_row_scaling(n_steps: int, h: float, dtype=jnp.float32) -> RowScaling:
    jerk, acc, vel, pos, col = _row_norms_np(n_steps, h)

    def d(v):
        return jnp.asarray((1.0 / v)[:, None], dtype=dtype)

    return RowScaling(jerk=d(jerk), acc=d(acc), vel=d(vel), pos=d(pos),
                      col=d(col))


# ---------------------------------------------------------------------------
# Preconditioner: exact inverse of the static-block normal matrix
# ---------------------------------------------------------------------------

class Preconditioner(NamedTuple):
    """Eigendecomposition B = Q diag(lam) Q^T of the equilibrated static
    normal matrix, so  M(rho)^{-1} = Q diag(1/(2+sigma+rho*lam)) Q^T  is an
    EXACT inverse of the collision-free x-update system for ANY rho —
    adaptive rho never degrades the preconditioner."""
    Q: jnp.ndarray      # (K, K)
    lam: jnp.ndarray    # (K,)


def build_static_normal_inverse(n_steps: int, h: float, cfg: SolverConfig,
                                dtype=jnp.float32) -> Preconditioner:
    """Eigendecomposition of  B = sum_b C_b^T diag(pattern_b) C_b  where the
    per-row pattern is the equilibration rho_i/rho = 1/||A_i||^2 with the
    rho_eq_scale boost on terminal equality rows.  Identical for every
    vehicle, axis, and scenario.  Computed in float64 numpy once per
    (K, h, solver-config); cast to ``dtype``.
    """
    K = n_steps

    from ..models.double_integrator import DoubleIntegrator2D
    model = DoubleIntegrator2D(n_steps=K, time_step=h)
    J = model.jerk_matrix()
    T = model.velocity_matrix()
    S = model.position_matrix()

    n_jerk, n_acc, n_vel, n_pos, _ = _row_norms_np(K, h)
    w_jerk = 1.0 / n_jerk**2
    w_acc = 1.0 / n_acc**2
    w_vel = 1.0 / n_vel**2
    w_pos = 1.0 / n_pos**2
    w_vel[K - 1] *= cfg.rho_eq_scale    # terminal equality rows
    w_pos[K - 1] *= cfg.rho_eq_scale

    B = J.T @ np.diag(w_jerk) @ J
    B += np.diag(w_acc)
    B += T.T @ np.diag(w_vel) @ T
    B += S.T @ np.diag(w_pos) @ S
    lam, Q = np.linalg.eigh(B)
    return Preconditioner(Q=jnp.asarray(Q, dtype=dtype),
                          lam=jnp.asarray(lam, dtype=dtype))


# ---------------------------------------------------------------------------
# Operator plumbing
# ---------------------------------------------------------------------------

def _apply_A(x, eta, E, h, col_mask, impl: str = "scan") -> ConstraintBlocks:
    if impl == "matmul":
        jerk, acc, vel, pos = apply_static_matmul(x, h)
        col = apply_collision_matmul(x, eta, E, h) * col_mask
    else:
        jerk, acc, vel, pos = apply_static(x, h)
        col = apply_collision(x, eta, E, h) * col_mask
    return ConstraintBlocks(jerk=jerk, acc=acc, vel=vel, pos=pos, col=col)


def _apply_AT(y: ConstraintBlocks, eta, E, h, col_mask, impl: str = "scan"):
    if impl == "matmul":
        out = apply_static_adjoint_matmul(y.jerk, y.acc, y.vel, y.pos, h)
        return out + apply_collision_adjoint_matmul(y.col * col_mask, eta, E, h)
    out = apply_static_adjoint(y.jerk, y.acc, y.vel, y.pos, h)
    return out + apply_collision_adjoint(y.col * col_mask, eta, E, h)


def _rho_blocks(data: QPData, static: SolverStatic, rho: jnp.ndarray,
                scaling: RowScaling,
                col_boost: jnp.ndarray = 1.0) -> ConstraintBlocks:
    """Per-row rho = rho * d_i^2 (equilibration), equality rows boosted by
    rho_eq_scale, disabled collision rows ~ zeroed.

    ``rho`` is a traced scalar (adaptive); the pattern is static.
    """
    def block_rho(lo, up, d):
        base = rho * d * d
        eq = (lo == up)
        return jnp.where(eq, static.rho_eq_scale * base, base)

    dd = data
    col_base = col_boost * rho * scaling.col * scaling.col      # (K, 1)
    col_rho = jnp.where(dd.col_mask > 0, col_base, _LOOSE_RHO)
    col_rho = jnp.broadcast_to(col_rho, dd.lower.col.shape)
    return ConstraintBlocks(
        jerk=block_rho(dd.lower.jerk, dd.upper.jerk, scaling.jerk),
        acc=block_rho(dd.lower.acc, dd.upper.acc, scaling.acc),
        vel=block_rho(dd.lower.vel, dd.upper.vel, scaling.vel),
        pos=block_rho(dd.lower.pos, dd.upper.pos, scaling.pos),
        col=col_rho,
    )


def _tmap(f, *ts):
    return jax.tree.map(f, *ts)


def _inf_norm(t) -> jnp.ndarray:
    # zero-size leaves (e.g. the collision block when N=1 -> P=0) contribute 0
    leaves = [jnp.max(jnp.abs(v)) for v in jax.tree.leaves(t) if v.size > 0]
    return jnp.max(jnp.stack(leaves))


def _precond_apply(pc: Preconditioner, rho, sigma, r: jnp.ndarray) -> jnp.ndarray:
    """M(rho)^{-1} r along the K axis:  Q diag(1/(2+sigma+rho*lam)) Q^T r."""
    hp = jax.lax.Precision.HIGHEST
    qt_r = jnp.einsum('lk,...nlc->...nkc', pc.Q, r, precision=hp)
    qt_r = qt_r / (2.0 + sigma + rho * pc.lam)[:, None]
    return jnp.einsum('kl,...nlc->...nkc', pc.Q, qt_r, precision=hp)


# ---------------------------------------------------------------------------
# PCG x-update
# ---------------------------------------------------------------------------

def _solve_xupdate(b, x0, eta, E, h, rho: ConstraintBlocks, rho_scalar,
                   sigma, pc: Preconditioner, static: SolverStatic,
                   params: SolverParams):
    """Solve  (2 + sigma) x + A^T diag(rho) A x = b  by PCG from x0."""

    impl = static.operator_impl

    def matvec(v):
        Av = _apply_A(v, eta, E, h, 1.0, impl)   # masking folded into rho
        rAv = _tmap(lambda a, r: a * r, Av, rho)
        return (2.0 + sigma) * v + _apply_AT(rAv, eta, E, h, 1.0, impl)

    r0 = b - matvec(x0)
    z0 = _precond_apply(pc, rho_scalar, sigma, r0)
    p0 = z0
    rz0 = jnp.vdot(r0, z0).real.astype(b.dtype)
    b_norm2 = jnp.vdot(b, b).real.astype(b.dtype)
    tol2 = (params.cg_tol ** 2) * jnp.maximum(b_norm2, 1e-30)

    def body(carry):
        x, r, p, rz, it = carry
        Ap = matvec(p)
        denom = jnp.vdot(p, Ap).real.astype(b.dtype)
        alpha = rz / jnp.maximum(denom, 1e-30)
        x = x + alpha * p
        r = r - alpha * Ap
        z = _precond_apply(pc, rho_scalar, sigma, r)
        rz_new = jnp.vdot(r, z).real.astype(b.dtype)
        beta = rz_new / jnp.maximum(rz, 1e-30)
        p = z + beta * p
        return x, r, p, rz_new, it + 1

    def cond(carry):
        x, r, p, rz, it = carry
        r2 = jnp.vdot(r, r).real.astype(b.dtype)
        return jnp.logical_and(it < params.cg_iters, r2 > tol2)

    x, r, _, _, it = jax.lax.while_loop(cond, body, (x0, r0, p0, rz0,
                                                     jnp.int32(0)))
    return x, it


# ---------------------------------------------------------------------------
# Main solve
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("h", "cfg"))
def solve_qp(data: QPData, E: jnp.ndarray, Minv: Preconditioner, x_init,
             *, h: float, cfg: SolverConfig,
             params: SolverParams | None = None) -> QPState:
    """One full ADMM solve for a single scenario (vmap over scenarios outside).

    x_init: (N, K, 2) warm-start accelerations (reference warm-starts the
    primal only, scp.py:443; we also seed z = A x_init which only helps).

    Convenience wrapper: numeric settings come from ``cfg`` (static).  For
    recompile-free sweeps call :func:`solve_qp_impl` with traced ``params``.
    """
    if params is None:
        params = make_solver_params(cfg, x_init.dtype)
    return solve_qp_impl(data, E, Minv, x_init, params, None, h=h,
                         static=cfg.static_part())


@partial(jax.jit, static_argnames=("h", "static"))
def solve_qp_impl(data: QPData, E: jnp.ndarray, Minv: Preconditioner, x_init,
                  params: SolverParams,
                  y_init: ConstraintBlocks | None = None, *, h: float,
                  static: SolverStatic) -> QPState:
    dtype = x_init.dtype
    eta = data.eta
    sigma = params.sigma
    alpha = params.alpha
    rho0 = params.rho
    K = x_init.shape[-2]
    scaling = build_row_scaling(K, h, dtype=dtype)   # trace-time constants
    impl = static.operator_impl

    Ax0 = _apply_A(x_init, eta, E, h, data.col_mask, impl)
    z0 = _tmap(jnp.clip, Ax0, data.lower, data.upper)
    # dual warm start: across SCP iterations the constraint rows barely move,
    # so the previous solve's duals are excellent initializers (the reference
    # re-setups OSQP fresh each iteration and warm-starts the primal only,
    # scp.py:441-443 — this is strictly better, same fixed point)
    y0 = (_tmap(jnp.zeros_like, z0) if y_init is None else y_init)

    def admm_iter(x, z, y, rho_blocks, rho_s):
        # x-update rhs: sigma x - q + A^T (rho z - y)
        rzy = _tmap(lambda zz, yy, rr: rr * zz - yy, z, y, rho_blocks)
        b = sigma * x + _apply_AT(rzy, eta, E, h, 1.0, impl)
        x_tilde, _ = _solve_xupdate(b, x, eta, E, h, rho_blocks, rho_s,
                                    sigma, Minv, static, params)
        x_new = alpha * x_tilde + (1.0 - alpha) * x
        Ax_tilde = _apply_A(x_tilde, eta, E, h, data.col_mask, impl)
        z_relaxed = _tmap(lambda azt, zz: alpha * azt + (1.0 - alpha) * zz,
                          Ax_tilde, z)
        z_new = _tmap(lambda zr, yy, rr, lo, up:
                      jnp.clip(zr + yy / rr, lo, up),
                      z_relaxed, y, rho_blocks, data.lower, data.upper)
        # Collision rows support an exact-penalty soft mode: the hard
        # one-sided constraint  A_col x >= l  becomes the penalty
        # lambda * (l - z)_+, whose prox replaces the projection.  With
        # lambda = inf this reduces to the hard clip (reference semantics);
        # finite lambda keeps the subproblem well-posed when the SCP
        # linearization is infeasible (the reference's OSQP just returns a
        # garbage iterate with a warning there, scp.py:446-449).
        w_col = z_relaxed.col + y.col / rho_blocks.col
        lam = params.col_penalty
        z_col = jnp.where(
            w_col >= data.lower.col, w_col,
            jnp.minimum(w_col + lam / rho_blocks.col, data.lower.col))
        z_new = z_new._replace(col=z_col)
        y_new = _tmap(lambda yy, zr, zn, rr: yy + rr * (zr - zn),
                      y, z_relaxed, z_new, rho_blocks)
        return x_new, z_new, y_new

    def residuals(x, z, y):
        # primal residual measured on the equilibrated rows (OSQP checks the
        # scaled problem): ||d * (Ax - z)||_inf
        Ax = _apply_A(x, eta, E, h, data.col_mask, impl)
        dAx = _tmap(lambda a, d_: a * d_, Ax, scaling)
        dz = _tmap(lambda a, d_: a * d_, z, scaling)
        prim = _inf_norm(_tmap(lambda a, b_: a - b_, dAx, dz))
        ATy = _apply_AT(y, eta, E, h, data.col_mask, impl)
        dual = jnp.max(jnp.abs(2.0 * x + ATy))
        prim_scale = jnp.maximum(_inf_norm(dAx), _inf_norm(dz))
        dual_scale = jnp.maximum(jnp.max(jnp.abs(2.0 * x)),
                                 jnp.max(jnp.abs(ATy)))
        eps_prim = params.eps_abs + params.eps_rel * prim_scale
        eps_dual = params.eps_abs + params.eps_rel * dual_scale
        done = jnp.logical_and(prim <= eps_prim, dual <= eps_dual)
        return prim, dual, done, prim / jnp.maximum(prim_scale, 1e-10), \
            dual / jnp.maximum(dual_scale, 1e-10)

    def outer_body(carry):
        x, z, y, rho, it, prim, dual, done = carry
        rho_b = _rho_blocks(data, static, rho, scaling,
                            params.col_rho_boost)

        def inner(i, xzys):
            x_, z_, y_ = xzys
            return admm_iter(x_, z_, y_, rho_b, rho)

        x, z, y = jax.lax.fori_loop(0, params.check_interval, inner,
                                    (x, z, y))
        prim, dual, done, pr, dr = residuals(x, z, y)

        # OSQP-style adaptive rho: rescale by sqrt of relative residual ratio.
        if static.adaptive_rho:
            ratio = jnp.sqrt(pr / jnp.maximum(dr, 1e-12))
            new_rho = jnp.clip(rho * ratio, 1e-6, 1e6)
            # only adapt on large imbalance (OSQP: factor 5); y is NOT
            # rescaled (OSQP semantics — see the banded solver's note).
            adapt = jnp.logical_or(ratio > 5.0, ratio < 0.2)
            new_rho = jnp.where(adapt, new_rho, rho)
            rho = new_rho

        return x, z, y, rho, it + params.check_interval, prim, dual, done

    def outer_cond(carry):
        *_, it, prim, dual, done = carry
        return jnp.logical_and(it < params.max_iter, jnp.logical_not(done))

    init = (x_init, z0, y0, rho0, jnp.int32(0),
            jnp.asarray(jnp.inf, dtype), jnp.asarray(jnp.inf, dtype),
            jnp.asarray(False))
    x, z, y, rho, it, prim, dual, done = jax.lax.while_loop(
        outer_cond, outer_body, init)

    if static.polish:
        x, prim, dual = _polish(x, y, data, E, Minv, h=h, static=static,
                                params=params, prim0=prim, dual0=dual)

    return QPState(x=x, z=z, y=y, iters=it, prim_res=prim, dual_res=dual,
                   converged=done)


# ---------------------------------------------------------------------------
# Polishing: exact solve on the detected active set (OSQP 'polish' analogue)
# ---------------------------------------------------------------------------

def _polish(x, y: ConstraintBlocks, data: QPData, E, Minv, *, h,
            static: SolverStatic, params: SolverParams, prim0, dual0):
    """Refine x by solving  min ||x||^2  s.t.  A_act x = b_act  on the active set.

    Active rows are detected from dual signs (y < 0 -> lower bound active,
    y > 0 -> upper), as OSQP does.  The solution is
    x* = A_act^T (A_act A_act^T)^(-1) b_act, computed matrix-free with CG on
    the row space (delta-regularized).  The polished x is accepted only if it
    improves the measured KKT residuals — otherwise the ADMM iterate stands.
    """
    dtype = x.dtype
    eps_act = jnp.asarray(1e-10, dtype)

    def act_mask(yv):
        return (jnp.abs(yv) > eps_act).astype(dtype)

    def act_bound(yv, lo, up):
        b = jnp.where(yv < 0, lo, up)
        return jnp.where(jnp.isfinite(b), b, 0.0)

    mask = _tmap(act_mask, y)
    # never activate disabled collision rows; in soft (penalty) mode also
    # skip rows whose dual sits at the penalty bound — they are genuinely
    # violated, and pinning them to the bound would poison the KKT solve
    soft_ok = (jnp.abs(y.col) < 0.999 * params.col_penalty).astype(dtype)
    mask = mask._replace(col=mask.col * soft_ok * jnp.broadcast_to(
        data.col_mask, mask.col.shape).astype(dtype))
    b_act = _tmap(act_bound, y, data.lower, data.upper)

    # Equilibrate the active-set Gram system: raw row norms span ~1e-2..1e1,
    # so CG on A_act A_act^T stalls; solving (D G D + delta) nu = D b with
    # D = 1/row-norm conditions it (x = A_act^T D nu is unchanged algebra).
    K = x.shape[-2]
    dscale = build_row_scaling(K, h, dtype=dtype)
    md = _tmap(lambda m, d_: m * d_, mask, dscale)     # mask * D fused
    b_act = _tmap(lambda b_, m: b_ * m, b_act, md)

    delta = jnp.asarray(1e-9, dtype)

    impl = static.operator_impl

    def G(mu: ConstraintBlocks) -> ConstraintBlocks:
        mu_m = _tmap(lambda v, m: v * m, mu, md)
        v = _apply_AT(mu_m, data.eta, E, h, 1.0, impl)
        Av = _apply_A(v, data.eta, E, h, 1.0, impl)
        return _tmap(lambda a, m, u_: a * m + delta * u_, Av, md, mu)

    def tdot(a, b_):
        return jnp.sum(jnp.stack(jax.tree.leaves(
            _tmap(lambda u_, v: jnp.vdot(u_, v).real.astype(dtype), a, b_))))

    def cg(rhs, n_iters):
        mu0 = _tmap(jnp.zeros_like, rhs)
        r0 = rhs
        p0 = r0
        rr0 = tdot(r0, r0)

        def body(_, carry):
            mu, r, p, rr = carry
            Gp = G(p)
            al = rr / jnp.maximum(tdot(p, Gp), 1e-30)
            mu = _tmap(lambda m_, p_: m_ + al * p_, mu, p)
            r = _tmap(lambda r_, g_: r_ - al * g_, r, Gp)
            rr_new = tdot(r, r)
            beta = rr_new / jnp.maximum(rr, 1e-30)
            p = _tmap(lambda z_, p_: z_ + beta * p_, r, p)
            return mu, r, p, rr_new

        mu, *_ = jax.lax.fori_loop(0, n_iters, body, (mu0, r0, p0, rr0))
        return mu

    mu = cg(b_act, params.polish_cg_iters)
    # one step of iterative refinement against the unregularized system
    resid = _tmap(lambda b_, g_: b_ - g_, b_act, G(mu))
    mu = _tmap(lambda m_, d_: m_ + d_, mu,
               cg(resid, params.polish_cg_iters))

    mu_m = _tmap(lambda v, m: v * m, mu, md)
    x_pol = _apply_AT(mu_m, data.eta, E, h, 1.0, impl)

    def kkt_residuals(xv, yv):
        Ax = _apply_A(xv, data.eta, E, h, data.col_mask, impl)
        viol = _tmap(lambda a, lo, up: jnp.maximum(
            jnp.maximum(jnp.where(jnp.isfinite(lo), lo - a, 0.0),
                        jnp.where(jnp.isfinite(up), a - up, 0.0)), 0.0),
            Ax, data.lower, data.upper)
        prim = _inf_norm(viol)
        dual = jnp.max(jnp.abs(2.0 * xv + _apply_AT(yv, data.eta, E, h,
                                                    data.col_mask, impl)))
        return prim, dual

    y_pol = _tmap(lambda m_: -2.0 * m_, mu_m)
    prim_p, dual_p = kkt_residuals(x_pol, y_pol)
    prim_u, dual_u = kkt_residuals(x, y)

    better = jnp.logical_and(prim_p <= prim_u + 1e-12,
                             dual_p <= dual_u + 1e-12)
    x_out = jnp.where(better, x_pol, x)
    return (x_out, jnp.where(better, prim_p, prim0),
            jnp.where(better, dual_p, dual0))
