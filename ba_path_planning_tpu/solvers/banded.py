"""State-space ADMM QP solver with exact block-tridiagonal x-updates.

The acceleration-space solver (``admm.py``) applies constraints matrix-free
but pays for it in the x-update: collision rows couple all timesteps through
the dense Toeplitz rollout operator, so PCG with a collision-blind
preconditioner needs thousands of ADMM iterations to high accuracy.

This solver reformulates the same QP over the full state trajectory —
variables a[0..K-1], p[1..K], v[1..K] per vehicle/axis — with the exact
discrete dynamics (SURVEY 3.2, ``/root/reference/.../scp.py:371-397``)

    v[k+1] = v[k] + h a[k]
    p[k+1] = p[k] + h v[k] + (h^2/2) a[k]

as banded equality rows.  Now EVERY constraint is time-local:

  * dynamics rows couple only adjacent super-blocks u_k = (a_k, p_{k+1}, v_{k+1})
  * jerk rows couple a_k, a_{k+1} (adjacent)
  * velocity/position boxes and terminal equalities are IDENTITY rows
  * collision rows touch only p_k — one timestep each, and their RHS no
    longer folds in any rollout constants (scp.py:536-550 becomes just
    R + linearization term)

so the ADMM x-update normal matrix  M = P + sigma I + A^T rho A  is
block-tridiagonal with K blocks of size 6N.  A batched block-Cholesky scan
(dense 6N x 6N Cholesky / triangular-solve / matmul per step — MXU work)
factorizes it EXACTLY once per QP, every x-update is two banded substitution
sweeps, and ADMM converges in OSQP-like iteration counts at any accuracy.
Row norms are all O(1) here, so conditioning is mild and float32 suffices.

The QP solved is algebraically the SAME problem as admm.py's (dynamics
eliminated vs. enforced); solutions agree to solver tolerance, which the
tests check against both the dense scipy oracle and the v1 solver.

Final trajectories are still produced by rolling out the accelerations with
the exact prefix-sum dynamics, so reported trajectories satisfy the dynamics
exactly regardless of ADMM tolerance (matching reference semantics).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.collisions import PairIndex
from ..utils.config import SolverStatic
from .admm import SolverParams, _LOOSE_RHO

_HP = jax.lax.Precision.HIGHEST


# ---------------------------------------------------------------------------
# Variable / row containers
# ---------------------------------------------------------------------------

class StateVars(NamedTuple):
    """Decision variables: (..., N, K, 2) each.

    a[k] for k=0..K-1;  p[k], v[k] for k=1..K stored at index k-1.
    """
    a: jnp.ndarray
    p: jnp.ndarray
    v: jnp.ndarray


class RowVals(NamedTuple):
    """Constraint row values (one leaf per block).

    dyn_p, dyn_v: (..., N, K, 2) dynamics equalities for k=0..K-1
    jerk:         (..., N, K-1, 2)
    acc:          (..., N, K, 2)   box on a
    vbox:         (..., N, K, 2)   box on v[1..K] (terminal equality at K)
    pbox:         (..., N, K, 2)   box on p[1..K] (terminal equality at K)
    col:          (..., K, P)      eta . (p_i[k] - p_j[k]), k=0 row vacuous
    """
    dyn_p: jnp.ndarray
    dyn_v: jnp.ndarray
    jerk: jnp.ndarray
    acc: jnp.ndarray
    vbox: jnp.ndarray
    pbox: jnp.ndarray
    col: jnp.ndarray


def _tmap(f, *ts):
    return jax.tree.map(f, *ts)


def _inf_norm(t, axis_name: str | None = None) -> jnp.ndarray:
    leaves = [jnp.max(jnp.abs(v)) for v in jax.tree.leaves(t) if v.size > 0]
    out = jnp.max(jnp.stack(leaves))
    if axis_name is not None:
        out = jax.lax.pmax(out, axis_name)
    return out


# ---------------------------------------------------------------------------
# Constraint operator (all local; no prefix sums anywhere)
# ---------------------------------------------------------------------------

def apply_A(xv: StateVars, eta, E, h: float) -> RowVals:
    a, p, v = xv.a, xv.p, xv.v
    K = a.shape[-2]
    # dynamics rows k: p-row_k = p[k+1] - p[k] - h v[k] - h^2/2 a[k]
    #                  v-row_k = v[k+1] - v[k] - h a[k]
    # with p[0], v[0] constants (k=0 rows: variable part only).
    p_prev = p[..., :-1, :]                     # p[1..K-1]
    v_prev = v[..., :-1, :]
    dyn_p0 = p[..., 0:1, :] - 0.5 * h * h * a[..., 0:1, :]
    dyn_pk = (p[..., 1:, :] - p_prev - h * v_prev
              - 0.5 * h * h * a[..., 1:, :])
    dyn_p = jnp.concatenate([dyn_p0, dyn_pk], axis=-2)
    dyn_v0 = v[..., 0:1, :] - h * a[..., 0:1, :]
    dyn_vk = v[..., 1:, :] - v_prev - h * a[..., 1:, :]
    dyn_v = jnp.concatenate([dyn_v0, dyn_vk], axis=-2)

    jerk = (a[..., 1:, :] - a[..., :-1, :]) / h

    # collision rows: k=0 vacuous (p[0] const), k>=1 uses p[k] (index k-1)
    dp = jnp.einsum('np,...nkc->...kpc', E, p, precision=_HP)  # (...,K,P,2)
    col_k = jnp.sum(eta[..., 1:, :, :] * dp[..., :-1, :, :], axis=-1)
    col0 = jnp.zeros_like(col_k[..., 0:1, :])
    col = jnp.concatenate([col0, col_k], axis=-2)

    return RowVals(dyn_p=dyn_p, dyn_v=dyn_v, jerk=jerk, acc=a, vbox=v,
                   pbox=p, col=col)


def apply_AT(y: RowVals, eta, E, h: float,
             axis_name: str | None = None) -> StateVars:
    K = y.acc.shape[-2]
    pad = [(0, 0)] * (y.jerk.ndim - 2) + [(1, 1), (0, 0)]
    yj = jnp.pad(y.jerk, pad)
    # a_k receives: -h^2/2 dyn_p[k], -h dyn_v[k], jerk adjoint, acc box
    a = (-0.5 * h * h * y.dyn_p - h * y.dyn_v
         + (yj[..., :-1, :] - yj[..., 1:, :]) / h + y.acc)

    # p[k] (index k-1) receives: +dyn_p[k-1], -dyn_p[k] (k<=K-1), pbox,
    # and collision row k (k=1..K-1)
    dyn_p_next = jnp.concatenate(
        [y.dyn_p[..., 1:, :], jnp.zeros_like(y.dyn_p[..., 0:1, :])], axis=-2)
    p = y.dyn_p - dyn_p_next + y.pbox

    w = y.col[..., None] * eta                                # (..., K, P, 2)
    w_shift = jnp.concatenate(
        [w[..., 1:, :, :], jnp.zeros_like(w[..., 0:1, :, :])], axis=-3)
    p_col = jnp.einsum('np,...kpc->...nkc', E, w_shift, precision=_HP)
    if axis_name is not None:      # pair-sharded: sum shard contributions
        p_col = jax.lax.psum(p_col, axis_name)
    p = p + p_col

    # v[k] receives: -h dyn_p[k] (k<=K-1), +dyn_v[k-1], -dyn_v[k], vbox
    dyn_v_next = jnp.concatenate(
        [y.dyn_v[..., 1:, :], jnp.zeros_like(y.dyn_v[..., 0:1, :])], axis=-2)
    v = -h * dyn_p_next + y.dyn_v - dyn_v_next + y.vbox
    return StateVars(a=a, p=p, v=v)


# ---------------------------------------------------------------------------
# Bounds (much simpler than acceleration space: no offset folding)
# ---------------------------------------------------------------------------

def build_bounds(p0, v0, pf, vf, *, n_vehicles: int, n_steps: int, h: float,
                 limits, n_pairs: int) -> tuple[RowVals, RowVals]:
    """Lower/upper bounds for every row block.  p0/v0/pf/vf: (..., N, 2).

    Collision bounds default to disabled (-inf / +inf); the SCP loop
    replaces ``lower.col`` per iteration.
    """
    N, K = n_vehicles, n_steps
    dtype = p0.dtype
    batch = p0.shape[:-2]
    inf = jnp.asarray(jnp.inf, dtype)

    def full(shape, val):
        return jnp.full(batch + shape, val, dtype=dtype)

    # dynamics equalities: k=0 rows have the initial-state constants on the
    # RHS (p0 + h v0, v0); k>=1 rows are homogeneous.
    zero = jnp.zeros(batch + (N, K - 1, 2), dtype=dtype)
    dyn_p_rhs = jnp.concatenate(
        [(p0 + h * v0)[..., :, None, :], zero], axis=-2)
    dyn_v_rhs = jnp.concatenate([v0[..., :, None, :], zero], axis=-2)

    l_jerk = full((N, K - 1, 2), limits.jerk_min)
    u_jerk = full((N, K - 1, 2), limits.jerk_max)
    l_acc = full((N, K, 2), limits.acc_min)
    u_acc = full((N, K, 2), limits.acc_max)

    is_term = (jnp.arange(K) == K - 1).reshape((K, 1))
    l_v = full((N, K, 2), limits.vel_min)
    u_v = full((N, K, 2), limits.vel_max)
    vf_b = jnp.broadcast_to(vf[..., :, None, :], batch + (N, K, 2))
    l_v = jnp.where(is_term, vf_b, l_v)
    u_v = jnp.where(is_term, vf_b, u_v)

    pos_min = jnp.asarray(limits.pos_min, dtype=dtype)
    pos_max = jnp.asarray(limits.pos_max, dtype=dtype)
    l_p = jnp.broadcast_to(pos_min, batch + (N, K, 2))
    u_p = jnp.broadcast_to(pos_max, batch + (N, K, 2))
    pf_b = jnp.broadcast_to(pf[..., :, None, :], batch + (N, K, 2))
    l_p = jnp.where(is_term, pf_b, l_p)
    u_p = jnp.where(is_term, pf_b, u_p)

    lower = RowVals(dyn_p=dyn_p_rhs, dyn_v=dyn_v_rhs, jerk=l_jerk, acc=l_acc,
                    vbox=l_v, pbox=l_p, col=full((K, n_pairs), -jnp.inf))
    upper = RowVals(dyn_p=dyn_p_rhs, dyn_v=dyn_v_rhs, jerk=u_jerk, acc=u_acc,
                    vbox=u_v, pbox=u_p, col=full((K, n_pairs), jnp.inf))
    return lower, upper


def collision_lower_bounds_state(eta, dist, prev_positions, pairs: PairIndex,
                                 *, min_distance) -> jnp.ndarray:
    """RHS of collision rows in state space: R + (eta . dprev - dist).

    The linearization term is 0 for non-degenerate pairs, ~ -1 degenerate
    (same algebra as scp.py:547-549 — the initial-state contributions vanish
    because positions are now variables).  Row k=0 is vacuous -> -inf.
    """
    from ..ops.collisions import pairwise_diffs
    dprev = pairwise_diffs(prev_positions, pairs)
    lin = jnp.sum(eta * dprev, axis=-1) - dist
    l = min_distance + lin
    if pairs.valid is not None:                  # pad pairs -> inert rows
        l = jnp.where(pairs.valid, l, -jnp.inf)
    neg_inf = jnp.full_like(l[..., 0:1, :], -jnp.inf)
    return jnp.concatenate([neg_inf, l[..., 1:, :]], axis=-2)


# ---------------------------------------------------------------------------
# Row scaling / rho pattern (all O(1) row norms)
# ---------------------------------------------------------------------------

def row_scaling_state(n_steps: int, h: float, dtype=jnp.float32) -> RowVals:
    K = n_steps
    one = np.ones(K)

    def d(v):
        return jnp.asarray((1.0 / v)[:, None], dtype=dtype)

    dyn_p = np.full(K, np.sqrt(2.0 + h * h + 0.25 * h ** 4))
    dyn_p[0] = np.sqrt(1.0 + 0.25 * h ** 4)
    dyn_v = np.full(K, np.sqrt(2.0 + h * h))
    dyn_v[0] = np.sqrt(1.0 + h * h)
    jerk = np.full(K - 1, np.sqrt(2.0) / h)
    col = np.full(K, np.sqrt(2.0))
    return RowVals(dyn_p=d(dyn_p), dyn_v=d(dyn_v), jerk=d(jerk), acc=d(one),
                   vbox=d(one), pbox=d(one), col=d(col))


def rho_pattern_masks(scaling: RowVals, static: SolverStatic, rho, col_boost,
                      *, n_steps: int, n_pairs: int, col_enabled: bool,
                      dtype=jnp.float32) -> RowVals:
    """Per-row rho built from the STRUCTURAL equality pattern instead of the
    bound values: dynamics rows are always equalities, vbox/pbox rows are
    equalities exactly at the terminal step k = K-1, jerk/acc never
    (``build_bounds`` above; reference bound layout at scp.py:206-257).

    Unlike :func:`rho_pattern` this never reads per-scenario bounds, so the
    result is batch-independent: under ``vmap`` the rho pattern — and with it
    the entire static part of the normal matrix — is computed once for the
    whole scenario batch instead of per scenario.  Leaves are broadcastable
    (K, 1) columns ((K, P) for collision rows).
    """
    K = n_steps
    eq = jnp.asarray(static.rho_eq_scale * rho, dtype)
    box_r = jnp.asarray(rho, dtype)

    def bcast(s, val):
        return jnp.broadcast_to(jnp.asarray(val, dtype), s.shape)

    is_term = (jnp.arange(K) == K - 1).reshape(K, 1)
    vbox = jnp.where(is_term, eq, box_r) * scaling.vbox * scaling.vbox
    pbox = jnp.where(is_term, eq, box_r) * scaling.pbox * scaling.pbox
    if col_enabled:
        col = col_boost * box_r * scaling.col * scaling.col
        col = jnp.where((jnp.arange(K) == 0).reshape(K, 1), _LOOSE_RHO, col)
    else:
        col = jnp.full((K, 1), _LOOSE_RHO, dtype)
    return RowVals(
        dyn_p=eq * scaling.dyn_p * scaling.dyn_p,
        dyn_v=eq * scaling.dyn_v * scaling.dyn_v,
        jerk=bcast(scaling.jerk, box_r) * scaling.jerk * scaling.jerk,
        acc=bcast(scaling.acc, box_r) * scaling.acc * scaling.acc,
        vbox=vbox, pbox=pbox,
        col=jnp.broadcast_to(col, (K, n_pairs)))


def rho_pattern(lower: RowVals, upper: RowVals, scaling: RowVals,
                static: SolverStatic, rho, col_boost,
                col_shape) -> RowVals:
    """Per-row rho = rho / norm^2, equality rows boosted; collision rows get
    the boost factor; vacuous k=0 collision row gets the loose rho."""
    def box(lo, up, d):
        base = rho * d * d
        return jnp.where(lo == up, static.rho_eq_scale * base, base)

    eq = static.rho_eq_scale * rho
    K = col_shape[-2]
    col_rho = col_boost * rho * scaling.col * scaling.col
    col_rho = jnp.where((jnp.arange(K) == 0).reshape(K, 1),
                        _LOOSE_RHO, col_rho)
    col_rho = jnp.broadcast_to(col_rho, col_shape)
    return RowVals(
        dyn_p=eq * scaling.dyn_p * scaling.dyn_p * jnp.ones_like(lower.dyn_p),
        dyn_v=eq * scaling.dyn_v * scaling.dyn_v * jnp.ones_like(lower.dyn_v),
        jerk=box(lower.jerk, upper.jerk, scaling.jerk),
        acc=box(lower.acc, upper.acc, scaling.acc),
        vbox=box(lower.vbox, upper.vbox, scaling.vbox),
        pbox=box(lower.pbox, upper.pbox, scaling.pbox),
        col=col_rho,
    )


# ---------------------------------------------------------------------------
# Block-tridiagonal normal-matrix assembly
# ---------------------------------------------------------------------------
#
# Super-block u_k = (a_k, p_{k+1}, v_{k+1}), each (N, 2) -> size 6N, with
# flat layout  idx = slot * 2N + n * 2 + c,  slot in {0:a, 1:p, 2:v}.
# M = P + sigma I + A^T diag(rho) A is block-tridiagonal: diagonal blocks
# D_k and sub-diagonal blocks B_k (rows u_k, cols u_{k-1}).  All static
# contributions are scalar per (vehicle, axis); collisions add a dense
# outer-product term to the p-part of D.

def _slot_diag(n6, n2, sr, sc, vals_k):
    """(K,) scalars -> (K, n6, n6) with vals on the (sr, sc) slot diagonal."""
    K = vals_k.shape[0]
    out = jnp.zeros((K, n6, n6), dtype=vals_k.dtype)
    idx = jnp.arange(n2)
    return out.at[:, sr * n2 + idx, sc * n2 + idx].set(vals_k[:, None])


def _per_k(leaf) -> jnp.ndarray:
    """Per-k scalar rho from a broadcastable (K', 1) or full (N, K', 2) leaf."""
    if leaf.ndim == 2:
        return leaf[:, 0]
    return leaf[..., 0, :, 0]


def _tridiag_scalars(rho: RowVals, *, h: float, sigma) -> dict:
    """The per-k scalar entries of the (a, p, v)-slot 3x3 coupling pattern.

    Every static constraint row acts identically on all 2N (vehicle, axis)
    channels, so M's static part is fully described by these per-k scalars;
    only collision rows add channel coupling (p-p slot of D).
    """
    dtype = rho.acc.dtype
    h2 = h * h
    rdp = _per_k(rho.dyn_p)                  # (K,)
    rdv = _per_k(rho.dyn_v)
    rj = _per_k(rho.jerk)                    # (K-1,)
    ra = _per_k(rho.acc)
    rv = _per_k(rho.vbox)
    rp = _per_k(rho.pbox)

    zero = jnp.zeros((), dtype)
    rdp_next = jnp.concatenate([rdp[1:], zero[None]])    # rho_dp_{k+1}, 0 at K-1
    rdv_next = jnp.concatenate([rdv[1:], zero[None]])
    rj_prev = jnp.concatenate([zero[None], rj])          # jerk row k-1
    rj_here = jnp.concatenate([rj, zero[None]])          # jerk row k

    return dict(
        aa=2.0 + sigma + rdp * (0.25 * h2 * h2) + rdv * h2 + ra
           + (rj_here + rj_prev) / h2,
        pp=sigma + rdp + rdp_next + rp,
        vv=sigma + rdv + rdv_next + rdp_next * h2 + rv,
        ap=-0.5 * h2 * rdp,
        av=-h * rdv,
        pv=h * rdp_next,
        # B_k entries (rows u_k, cols u_{k-1}), k = 1..K-1
        aa_b=-rj / h2,
        ap_pk=0.5 * h2 * rdp[1:],
        av_bk=0.5 * h2 * h * rdp[1:] + h * rdv[1:],
        pp_b=-rdp[1:],
        pv_b=-h * rdp[1:],
        vv_b=-rdv[1:],
    )


def assemble_channel(rho: RowVals, *, h: float, sigma):
    """Collision-free normal blocks in per-channel form: D (K, 3, 3) and
    B (K-1, 3, 3), slot order (a, p, v).

    Without collision rows M decouples over the 2N (vehicle, axis) channels
    with an IDENTICAL 3x3-block tridiagonal system per channel — the full
    (6N)^2 factorization of the initial QP (scp.py:323-369 has no collision
    rows) is redundant across channels AND scenarios.  Combined with the
    batch-independent :func:`rho_pattern_masks` this makes the phase-1
    factorization a single tiny shared computation for the whole batch.
    """
    s = _tridiag_scalars(rho, h=h, sigma=sigma)
    zero = jnp.zeros_like(s["aa_b"])
    D = jnp.stack([
        jnp.stack([s["aa"], s["ap"], s["av"]], axis=-1),
        jnp.stack([s["ap"], s["pp"], s["pv"]], axis=-1),
        jnp.stack([s["av"], s["pv"], s["vv"]], axis=-1),
    ], axis=-2)
    B = jnp.stack([
        jnp.stack([s["aa_b"], s["ap_pk"], s["av_bk"]], axis=-1),
        jnp.stack([zero, s["pp_b"], s["pv_b"]], axis=-1),
        jnp.stack([zero, zero, s["vv_b"]], axis=-1),
    ], axis=-2)
    return D, B


def b_scalar_stack(s: dict) -> jnp.ndarray:
    """Stack the six B_k slot scalars as (K-1, 6) in the fixed order
    (aa_b, ap_pk, av_bk, pp_b, pv_b, vv_b) used by the B-apply helpers."""
    return jnp.stack([s["aa_b"], s["ap_pk"], s["av_bk"], s["pp_b"],
                      s["pv_b"], s["vv_b"]], axis=-1)


def assemble_skeleton(rho: RowVals, *, h: float, sigma, n_vehicles: int):
    """Dense collision-free diagonal blocks D (K, 6N, 6N) — the slot-diagonal
    skeleton shared by every scenario (batch-independent under mask-based
    rho patterns)."""
    N = n_vehicles
    n2 = 2 * N
    n6 = 6 * N

    s = _tridiag_scalars(rho, h=h, sigma=sigma)
    aa, pp, vv, ap, av, pv = (s["aa"], s["pp"], s["vv"], s["ap"], s["av"],
                              s["pv"])

    D = (_slot_diag(n6, n2, 0, 0, aa) + _slot_diag(n6, n2, 1, 1, pp)
         + _slot_diag(n6, n2, 2, 2, vv)
         + _slot_diag(n6, n2, 0, 1, ap) + _slot_diag(n6, n2, 1, 0, ap)
         + _slot_diag(n6, n2, 0, 2, av) + _slot_diag(n6, n2, 2, 0, av)
         + _slot_diag(n6, n2, 1, 2, pv) + _slot_diag(n6, n2, 2, 1, pv))
    return D, s


def collision_blocks(rho_col, eta, E, axis_name: str | None = None,
                     precision=None) -> jnp.ndarray:
    """Per-scenario collision contributions to the p-p slot of D.

    Collision rows at time k touch p_k, which lives on the p-slot of
    super-block u_{k-1}; returns (K, 2N, 2N) already shifted so entry k adds
    onto D_k (last entry zero).  G_k = E x eta_k per (scp.py:489-534 algebra).
    ``axis_name``: psum partial normal-equation blocks over a pair-sharded
    mesh axis (SURVEY 2.3, agent-pair parallelism).

    ``precision``: the K x (2N)^2 x P contraction is the single largest
    MXU cost of QP setup at large N (~2.5 of the 3.85 ms/scn factorization
    phase at N=40); the result only seeds a factorization whose NS residual
    is ~1.6e-2, so bf16-input passes (DEFAULT, f32 accumulation) are ample.
    None = HIGHEST (exact reproduction path).
    """
    prec = _HP if precision is None else precision
    K = eta.shape[-3]
    G = jnp.einsum('np,kpc->kncp', E, eta).reshape(K, -1, E.shape[1])
    colM = jnp.einsum('kip,kp,kjp->kij', G, rho_col, G, precision=prec)
    if axis_name is not None:
        colM = jax.lax.psum(colM, axis_name)
    return jnp.concatenate([colM[1:], jnp.zeros_like(colM[:1])], axis=0)


def assemble_D(rho: RowVals, eta, E, *, h: float, sigma, n_vehicles: int,
               axis_name: str | None = None, precision=None):
    """Diagonal blocks D (K, 6N, 6N) + slot-scalar off-diagonals
    C (K-1, 3, 3) — the dense-B-free form for :func:`factorize_L`."""
    N = n_vehicles
    n2 = 2 * N
    D, s = assemble_skeleton(rho, h=h, sigma=sigma, n_vehicles=N)
    D = D + 0.0
    colM_pad = collision_blocks(rho.col, eta, E, axis_name, precision)
    D = D.at[:, n2:2 * n2, n2:2 * n2].add(colM_pad)
    return D, b_slot_mats(s)


def assemble_blocks(rho: RowVals, eta, E, *, h: float, sigma,
                    n_vehicles: int, axis_name: str | None = None):
    """Build D (K, 6N, 6N) and B (K-1, 6N, 6N) for one scenario.

    ``rho`` leaves carry per-row rho; static rows are per-(k) scalars
    uniform over vehicles/axes, collision rho is (K, P).
    """
    N = n_vehicles
    n2 = 2 * N
    n6 = 6 * N

    D, s = assemble_skeleton(rho, h=h, sigma=sigma, n_vehicles=N)
    D = D + 0.0  # ensure own buffer before the in-place add
    colM_pad = collision_blocks(rho.col, eta, E, axis_name)
    D = D.at[:, n2:2 * n2, n2:2 * n2].add(colM_pad)

    # B_k: rows u_k, cols u_{k-1}, k = 1..K-1
    B = (_slot_diag(n6, n2, 0, 0, s["aa_b"])         # (a_k, a_{k-1}) jerk
         + _slot_diag(n6, n2, 0, 1, s["ap_pk"])      # (a_k, p_k)
         + _slot_diag(n6, n2, 0, 2, s["av_bk"])      # (a_k, v_k) dyn_p+dyn_v
         + _slot_diag(n6, n2, 1, 1, s["pp_b"])       # (p_{k+1}, p_k)
         + _slot_diag(n6, n2, 1, 2, s["pv_b"])       # (p_{k+1}, v_k)
         + _slot_diag(n6, n2, 2, 2, s["vv_b"]))      # (v_{k+1}, v_k)
    return D, B


# ---------------------------------------------------------------------------
# Block-tridiagonal Cholesky (scan) and solve
# ---------------------------------------------------------------------------

def factorize_xla(D, B):
    """Block Cholesky of the SPD block-tridiagonal [D_k; B_k] using XLA's
    cholesky/triangular_solve primitives (fast on CPU via LAPACK; kept as
    the reference implementation and the small-block / CPU path).

    Returns (Linv (K, n, n) INVERTED lower factors, Eb (K-1, n, n)) with
        L_0 L_0^T = D_0
        E_k = B_k L_{k-1}^{-T}
        L_k L_k^T = D_k - E_k E_k^T

    The factors are stored inverted so every subsequent substitution sweep
    in the ADMM hot path is a pure matmul — TPU trsm is far slower than MXU
    matmuls, and the solve runs hundreds of times per factorization.
    """
    chol = jax.lax.linalg.cholesky
    tri = partial(jax.lax.linalg.triangular_solve, lower=True,
                  transpose_a=True, left_side=False)
    L0 = chol(D[0])

    def step(Lprev, DB):
        Dk, Bk = DB
        # E_k = B_k L_{k-1}^{-T}: solve X L^T = B  (right-side, lower, T)
        Ek = tri(Lprev, Bk)
        Lk = chol(Dk - jnp.einsum('ij,kj->ik', Ek, Ek, precision=_HP))
        return Lk, (Lk, Ek)

    _, (Ls, Es) = jax.lax.scan(step, L0, (D[1:], B))
    L = jnp.concatenate([L0[None], Ls], axis=0)
    eye = jnp.eye(L.shape[-1], dtype=L.dtype)
    Linv = jax.lax.linalg.triangular_solve(
        L, jnp.broadcast_to(eye, L.shape), lower=True, left_side=True)
    return Linv, Es


def factorize_matmul(D, B):
    """Same factorization as :func:`factorize_xla`, but in pure matmul form.

    XLA's batched cholesky/trsm on TPU run ~25-50x below the equivalent
    matmul throughput at these block sizes (see ``ops/blocked_chol.py``).
    Carrying the INVERTED factor through the scan turns every step into
    matmuls only:

        E_k   = B_k Linv_{k-1}^T          (matmul, replaces the trsm)
        S_k   = D_k - E_k E_k^T           (matmul)
        Linv_k = chol_inv(S_k)[1]          (blocked matmul-form Cholesky)

    and no post-scan inversion pass is needed.
    """
    from ..ops.blocked_chol import chol_inv

    Linv0 = chol_inv(D[0])[1]

    def step(Linv_prev, DB):
        Dk, Bk = DB
        Ek = jnp.einsum('ij,kj->ik', Bk, Linv_prev, precision=_HP)
        Sk = Dk - jnp.einsum('ij,kj->ik', Ek, Ek, precision=_HP)
        Linv_k = chol_inv(Sk)[1]
        return Linv_k, (Linv_k, Ek)

    _, (Linvs, Es) = jax.lax.scan(step, Linv0, (D[1:], B))
    Linv = jnp.concatenate([Linv0[None], Linvs], axis=0)
    return Linv, Es


def b_slot_mats(s: dict) -> jnp.ndarray:
    """The off-diagonal blocks B_k as (K-1, 3, 3) SLOT-scalar matrices.

    Every B_k is block-structured over the (a, p, v) slots with each slot
    pair a scalar multiple of I_2N (collision rows touch only D), so the
    whole off-diagonal is 6 scalars per step:

        B_k = C_k (x)_slot I_2N,   C_k upper-triangular 3x3.

    This makes the dense E_k = B_k L_{k-1}^{-T} factor redundant — see
    :func:`factorize_L` / :func:`solve_factorized_L`.
    """
    z = jnp.zeros_like(s["aa_b"])
    return jnp.stack([
        jnp.stack([s["aa_b"], s["ap_pk"], s["av_bk"]], axis=-1),
        jnp.stack([z, s["pp_b"], s["pv_b"]], axis=-1),
        jnp.stack([z, z, s["vv_b"]], axis=-1),
    ], axis=-2)


def slot_apply(C3, M):
    """B-apply via slot recombination:  (C (x) I) @ M  for M (..., n, cols).

    Rows of the result in slot s are sum_t C[s, t] * (rows of M in slot t) —
    no n^2 work, just scaled adds of row blocks.
    """
    n = M.shape[-2]
    n2 = n // 3
    M3 = M.reshape(M.shape[:-2] + (3, n2) + M.shape[-1:])
    out = jnp.einsum('...st,...tcj->...scj', C3, M3, precision=_HP)
    return out.reshape(M.shape)


def slot_apply_vec(C3, w):
    """(C (x) I) w for a stacked vector w (..., n)."""
    n = w.shape[-1]
    w3 = w.reshape(w.shape[:-1] + (3, n // 3))
    out = jnp.einsum('...st,...tc->...sc', C3, w3, precision=_HP)
    return out.reshape(w.shape)


def factorize_L(D, C):
    """Block Cholesky of [D_k; B_k = C_k (x) I] storing ONLY the inverted
    diagonal factors Linv (K, n, n) — the dense E_k are never materialized.

    The substitution sweeps are algebraically identical to the (Linv, Eb)
    form (:func:`solve_factorized_L`), with E-applies replaced by
    L-applies + slot recombinations: same flop count, but HALF the factor
    bytes to store and (critically) to stream from HBM per ADMM iteration —
    the grouped streaming solve is DMA-bound.
    """
    from ..ops.blocked_chol import chol_inv

    if D.shape[-1] < 32 or jax.default_backend() in ("cpu",):
        chol = jax.lax.linalg.cholesky
        L0 = chol(D[0])

        def step_x(Lprev, DC):
            Dk, Ck = DC
            # E_k = B_k L^{-T} = slot_apply(Ck, Linv_prev^T transposed back)
            Ek = jax.lax.linalg.triangular_solve(
                Lprev, slot_apply(Ck, jnp.eye(Dk.shape[-1], dtype=Dk.dtype)),
                lower=True, transpose_a=True, left_side=False)
            Lk = chol(Dk - jnp.einsum('ij,kj->ik', Ek, Ek, precision=_HP))
            return Lk, Lk

        _, Ls = jax.lax.scan(step_x, L0, (D[1:], C))
        L = jnp.concatenate([L0[None], Ls], axis=0)
        eye = jnp.eye(L.shape[-1], dtype=L.dtype)
        return jax.lax.linalg.triangular_solve(
            L, jnp.broadcast_to(eye, L.shape), lower=True, left_side=True)

    Linv0 = chol_inv(D[0])[1]

    def step(Linv_prev, DC):
        Dk, Ck = DC
        # E_k = B_k Linv_prev^T: rows slot-recombined from Linv_prev^T
        Ek = slot_apply(Ck, jnp.swapaxes(Linv_prev, -1, -2))
        Sk = Dk - jnp.einsum('ij,kj->ik', Ek, Ek, precision=_HP)
        Linv_k = chol_inv(Sk)[1]
        return Linv_k, Linv_k

    _, Linvs = jax.lax.scan(step, Linv0, (D[1:], C))
    return jnp.concatenate([Linv0[None], Linvs], axis=0)


def solve_factorized_L(Linv, C, b):
    """Solve M x = b from the L-only factorization (Linv (K, n, n),
    C (K-1, 3, 3) slot scalars).  b: (K, n).

    Forward keeps the doubly-transformed iterate w_k = Linv_k^T y_k so the
    E-apply becomes the free slot recombination B_k w_{k-1}:

        y_k = Linv_k (b_k - B_k w_{k-1}),   w_k = Linv_k^T y_k
        x_{K-1} = w_{K-1}
        x_k = w_k - Linv_k^T (Linv_k (B_{k+1}^T x_{k+1}))

    Two L-applies per step per sweep — the same count as the (Linv, Eb)
    sweeps, with only Linv streamed.
    """
    def mv(M, t):
        return jnp.sum(M * t[..., None, :], axis=-1)

    def mv_t(M, t):
        return jnp.sum(M * t[..., :, None], axis=-2)

    w0 = mv_t(Linv[0], mv(Linv[0], b[0]))

    def fwd(wprev, inp):
        Lk, Ck, bk = inp
        yk = mv(Lk, bk - slot_apply_vec(Ck, wprev))
        wk = mv_t(Lk, yk)
        return wk, wk

    _, ws = jax.lax.scan(fwd, w0, (Linv[1:], C, b[1:]))
    w = jnp.concatenate([w0[None], ws], axis=0)

    xK = w[-1]

    def bwd(xnext, inp):
        Lk, Ck1, wk = inp
        u = mv(Lk, slot_apply_vec(jnp.swapaxes(Ck1, -1, -2), xnext))
        xk = wk - mv_t(Lk, u)
        return xk, xk

    _, xs = jax.lax.scan(bwd, xK, (Linv[:-1], C, w[:-1]), reverse=True)
    return jnp.concatenate([xs, xK[None]], axis=0)


# ---------------------------------------------------------------------------
# X-form (symmetric block-inverse) factorization
# ---------------------------------------------------------------------------
#
# The substitution sweeps only ever apply Linv_k and Linv_k^T in PAIRS
# (see solve_factorized_L: w_k = Linv_k^T Linv_k (...) = S_k^{-1} (...)),
# so the factorization can store the symmetric inverses X_k = S_k^{-1}
# directly: one dense matvec per recurrence step instead of two.  The real
# payoff is the factorization itself: the Schur recursion becomes
#
#     S_k = D_k - B_k X_{k-1} B_k^T      (slot recombinations — no matmul)
#     X_k = S_k^{-1}
#
# and since consecutive S_k differ only by the smoothly-varying collision
# blocks (the static rho pattern is k-uniform in the interior — the jumps
# are at k=0 and the terminal-equality step k=K-1), X_{k-1} is an excellent
# warm start for Newton-Schulz inversion: a few batched MXU matmuls replace
# the latency-bound blocked-Cholesky recursion (~160 small sequential ops
# per step).  Exact inverses anchor the ends (and optionally every
# ``ns_anchor``-th step) to stop error accumulation along the chain.

def bxbt(C3, X):
    """(C (x) I) X (C (x) I)^T for symmetric X via two slot recombinations."""
    Y = slot_apply(C3, X)
    return slot_apply(C3, jnp.swapaxes(Y, -1, -2))


def _spd_inv(S):
    """Symmetric inverse of SPD S via the fused Cholesky+inverse."""
    if S.shape[-1] < 32 or jax.default_backend() in ("cpu",):
        eye = jnp.eye(S.shape[-1], dtype=S.dtype)
        L = jax.lax.linalg.cholesky(S)
        Linv = jax.lax.linalg.triangular_solve(
            L, jnp.broadcast_to(eye, S.shape), lower=True, left_side=True)
    else:
        from ..ops.blocked_chol import chol_inv
        Linv = chol_inv(S)[1]
    return jnp.einsum('...ji,...jk->...ik', Linv, Linv, precision=_HP)


def factorize_X(D, C, *, ns_iters: int = 0, ns_anchor: int = 0,
                ns_precision=None):
    """Block factorization storing symmetric inverses X (K, n, n).

    ``ns_iters = 0``: exact inverse at every step (same cost profile as
    :func:`factorize_L`).  ``ns_iters > 0``: interior steps run that many
    Newton-Schulz iterations warm-started from X_{k-1}; exact anchors at
    k = 0..2 and k = K-1 always (the Schur chain needs ~2 steps to reach
    its steady state — measured one-step-lag residuals ||I - S_k X_{k-1}||
    are ~4 at k=1, ~0.9 at k=2, and <= 0.25 from k=3 on; the terminal step
    carries the equality-rho jump), plus every ``ns_anchor``-th step if > 0.

    ``ns_precision``: matmul precision for the NS iteration itself (the
    dominant MXU cost at large N).  ``Precision.HIGH`` (bf16x3) measures
    IDENTICAL mid-chain residual to HIGHEST (1.60e-2 vs 1.57e-2 at
    N=40/K=50) at 2.55x the factorization speed — NS is self-correcting, so
    pass-count precision only moves the iteration's contraction slightly.
    DEFAULT (single bf16 pass) floors at ~0.13 residual regardless of
    iteration count (the rounding of S itself) — too loose.  None = HIGHEST.
    """
    K = D.shape[0]
    ns_prec = _HP if ns_precision is None else ns_precision

    def exact_step(Xprev, Dk, Ck):
        return _spd_inv(Dk - bxbt(Ck, Xprev))

    X0 = _spd_inv(D[0])
    if ns_iters <= 0:
        def step(Xprev, DC):
            Xk = exact_step(Xprev, *DC)
            return Xk, Xk

        _, Xs = jax.lax.scan(step, X0, (D[1:], C))
        return jnp.concatenate([X0[None], Xs], axis=0)

    def ns_step(Xprev, DC):
        Dk, Ck = DC
        Sk = Dk - bxbt(Ck, Xprev)
        X = Xprev
        for _ in range(ns_iters):
            T = jnp.einsum('...ij,...jk->...ik', Sk, X, precision=ns_prec)
            X = 2.0 * X - jnp.einsum('...ij,...jk->...ik', X, T,
                                     precision=ns_prec)
        X = 0.5 * (X + jnp.swapaxes(X, -1, -2))
        return X, X

    anchors = sorted({a for a in range(1, K - 1)
                      if ns_anchor > 0 and a % ns_anchor == 0}
                     | ({1, 2} & set(range(1, K))) | {K - 1})
    parts = [X0[None]]
    Xprev, prev_k = X0, 0
    for a in anchors:
        if a > prev_k + 1:                      # NS run over (prev_k+1 .. a-1)
            Xprev, Xseg = jax.lax.scan(
                ns_step, Xprev, (D[prev_k + 1:a], C[prev_k:a - 1]))
            parts.append(Xseg)
        Xa = exact_step(Xprev, D[a], C[a - 1])
        parts.append(Xa[None])
        Xprev, prev_k = Xa, a
    return jnp.concatenate(parts, axis=0)


def solve_factorized_X(X, C, b):
    """Solve M x = b from the X-form factorization (X (K, n, n) symmetric
    inverses, C (K-1, 3, 3) slot scalars).  b: (K, n).

        w_k = X_k (b_k - B_k w_{k-1})
        x_{K-1} = w_{K-1};   x_k = w_k - X_k (B_{k+1}^T x_{k+1})

    One dense matvec per step per sweep (the L-form needs two).
    """
    def mv(M, t):
        return jnp.sum(M * t[..., None, :], axis=-1)

    w0 = mv(X[0], b[0])

    def fwd(wprev, inp):
        Xk, Ck, bk = inp
        wk = mv(Xk, bk - slot_apply_vec(Ck, wprev))
        return wk, wk

    _, ws = jax.lax.scan(fwd, w0, (X[1:], C, b[1:]))
    w = jnp.concatenate([w0[None], ws], axis=0)

    xK = w[-1]

    def bwd(xnext, inp):
        Xk, Ck1, wk = inp
        xk = wk - mv(Xk, slot_apply_vec(jnp.swapaxes(Ck1, -1, -2), xnext))
        return xk, xk

    _, xs = jax.lax.scan(bwd, xK, (X[:-1], C, w[:-1]), reverse=True)
    return jnp.concatenate([xs, xK[None]], axis=0)


def factorize(D, B):
    """Block Cholesky of the SPD block-tridiagonal [D_k; B_k]; returns
    (Linv, Eb) inverted-factor form (see :func:`factorize_xla`).

    Routes by platform and block size: the matmul-form factorization wins
    on TPU for blocks past the MXU's pay-off point; LAPACK-backed XLA
    primitives win on CPU and for tiny (e.g. per-channel 3x3) blocks.
    """
    n = D.shape[-1]
    if n >= 32 and jax.default_backend() not in ("cpu",):
        return factorize_matmul(D, B)
    return factorize_xla(D, B)


def compress_factors(Linv, Eb, dtype):
    """Optionally store factors at reduced precision (e.g. bfloat16): the
    substitution sweeps are HBM-bandwidth-bound streaming the factors every
    ADMM iteration, and ADMM tolerances (~1e-3) plus the collision margin
    absorb the extra rounding.  No-op when dtype matches."""
    if Linv.dtype == dtype:
        return Linv, Eb
    return Linv.astype(dtype), Eb.astype(dtype)


def solve_factorized(Linv, Eb, b):
    """Solve M x = b given the (inverted) block factorization.  b: (K, n).

    Matmul-only substitution sweeps:
        y_k = Linv_k (b_k - E_k y_{k-1})
        x_k = Linv_k^T (y_k - E_{k+1}^T x_{k+1})

    Matvecs are written as broadcast-multiply + reduce so they lower to VPU
    elementwise work: under an outer vmap the naive form becomes a batched
    (B, n, n) x (B, n) dot_general, which the TPU backend executes as B
    serialized single-column MXU matmuls — two orders of magnitude slower.
    """
    def mv(M, t):
        return jnp.sum(M * t[..., None, :], axis=-1)

    def mv_t(M, t):
        return jnp.sum(M * t[..., :, None], axis=-2)

    y0 = mv(Linv[0], b[0])

    def fwd(yprev, inp):
        Lk, Ek, bk = inp
        yk = mv(Lk, bk - mv(Ek, yprev))
        return yk, yk

    _, ys = jax.lax.scan(fwd, y0, (Linv[1:], Eb, b[1:]))
    y = jnp.concatenate([y0[None], ys], axis=0)

    xK = mv_t(Linv[-1], y[-1])

    def bwd(xnext, inp):
        Lk, Ek1, yk = inp
        xk = mv_t(Lk, yk - mv_t(Ek1, xnext))
        return xk, xk

    _, xs = jax.lax.scan(bwd, xK, (Linv[:-1], Eb, y[:-1]), reverse=True)
    x = jnp.concatenate([xs, xK[None]], axis=0)
    return x


def solve_factorized_channel(Linv, Eb, b):
    """Channel-shared banded solve for the collision-free system.

    Linv (K, 3, 3) / Eb (K-1, 3, 3): UNBATCHED factors from
    ``factorize(*assemble_channel(...))`` — shared by every (vehicle, axis)
    channel and every scenario.  b: (K, 3, C) stacked right-hand side with C
    channel columns (C = 2N per scenario; under vmap the batch dim folds into
    the einsum so each step is one small (3, 3) x (3, B*2N) MXU matmul).
    Returns x (K, 3, C).
    """
    def mv(M, t):
        return jnp.einsum('ij,...jc->...ic', M, t, precision=_HP)

    def mv_t(M, t):
        return jnp.einsum('ji,...jc->...ic', M, t, precision=_HP)

    y0 = mv(Linv[0], b[0])

    def fwd(yprev, inp):
        Lk, Ek, bk = inp
        yk = mv(Lk, bk - mv(Ek, yprev))
        return yk, yk

    _, ys = jax.lax.scan(fwd, y0, (Linv[1:], Eb, b[1:]))
    y = jnp.concatenate([y0[None], ys], axis=0)

    xK = mv_t(Linv[-1], y[-1])

    def bwd(xnext, inp):
        Lk, Ek1, yk = inp
        xk = mv_t(Lk, yk - mv_t(Ek1, xnext))
        return xk, xk

    _, xs = jax.lax.scan(bwd, xK, (Linv[:-1], Eb, y[:-1]), reverse=True)
    return jnp.concatenate([xs, xK[None]], axis=0)


# ---------------------------------------------------------------------------
# StateVars <-> stacked (K, 6N) layout
# ---------------------------------------------------------------------------

def to_stacked(xv: StateVars) -> jnp.ndarray:
    """(N, K, 2) leaves -> (K, 6N) with slot layout (a, p, v)."""
    def flat(arr):
        return jnp.swapaxes(arr, -3, -2).reshape(arr.shape[-2], -1)
    return jnp.concatenate([flat(xv.a), flat(xv.p), flat(xv.v)], axis=-1)


def from_stacked(x: jnp.ndarray, n_vehicles: int) -> StateVars:
    K = x.shape[0]
    n2 = 2 * n_vehicles

    def unflat(sl):
        return jnp.swapaxes(sl.reshape(K, n_vehicles, 2), 0, 1)
    return StateVars(a=unflat(x[:, :n2]), p=unflat(x[:, n2:2 * n2]),
                     v=unflat(x[:, 2 * n2:]))


def apply_M(xv: StateVars, rho: RowVals, eta, E, *, h: float, sigma):
    """Reference application of M = P + sigma I + A^T rho A (for tests)."""
    Ax = apply_A(xv, eta, E, h)
    rAx = _tmap(lambda a, r: a * r, Ax, rho)
    ATrAx = apply_AT(rAx, eta, E, h)
    Px = StateVars(a=2.0 * xv.a, p=jnp.zeros_like(xv.p),
                   v=jnp.zeros_like(xv.v))
    return _tmap(lambda p_, s_, at: p_ + sigma * s_ + at, Px, xv, ATrAx)


# ---------------------------------------------------------------------------
# Per-channel (row-wise) block assembly — for the active-set polish, where
# the rho pattern varies per (vehicle, axis) row, not just per k
# ---------------------------------------------------------------------------

def _slot_diag_chan(n6, n2, sr, sc, vals):
    """vals (K, n2) -> (K, n6, n6) with per-channel values on the (sr, sc)
    slot diagonal (channel order matches ``to_stacked``: n-major, then axis).
    """
    K = vals.shape[0]
    out = jnp.zeros((K, n6, n6), dtype=vals.dtype)
    idx = jnp.arange(n2)
    return out.at[:, sr * n2 + idx, sc * n2 + idx].set(vals)


def _chan(leaf, n_vehicles):
    """(N, K', 2) full rho leaf -> (K', 2N) in stacked channel order."""
    Kp = leaf.shape[-2]
    return jnp.swapaxes(leaf, -3, -2).reshape(Kp, 2 * n_vehicles)


def assemble_blocks_rowwise(rho: RowVals, eta, E, *, h: float, sigma,
                            n_vehicles: int, axis_name: str | None = None):
    """Like :func:`assemble_blocks`, but jerk/acc/vbox/pbox rho may vary per
    (vehicle, axis) channel — full (N, K', 2) leaves.  Dynamics rho must
    still be per-k ((K, 1) broadcastable leaves), which holds for the polish
    (dynamics rows are always active with per-k scaling)."""
    N = n_vehicles
    n2 = 2 * N
    n6 = 6 * N
    h2 = h * h
    dtype = rho.acc.dtype

    rdp = _per_k(rho.dyn_p)                  # (K,) dyn rho, per-k
    rdv = _per_k(rho.dyn_v)
    rj = _chan(rho.jerk, N)                  # (K-1, 2N)
    ra = _chan(rho.acc, N)
    rv = _chan(rho.vbox, N)
    rp = _chan(rho.pbox, N)

    zero_k = jnp.zeros((), dtype)
    rdp_next = jnp.concatenate([rdp[1:], zero_k[None]])
    rdv_next = jnp.concatenate([rdv[1:], zero_k[None]])
    zrow = jnp.zeros((1, n2), dtype)
    rj_prev = jnp.concatenate([zrow, rj], axis=0)          # jerk row k-1
    rj_here = jnp.concatenate([rj, zrow], axis=0)          # jerk row k

    aa = (2.0 + sigma + (rdp * (0.25 * h2 * h2) + rdv * h2)[:, None]
          + ra + (rj_here + rj_prev) / h2)
    pp = (sigma + rdp + rdp_next)[:, None] + rp
    vv = (sigma + rdv + rdv_next + rdp_next * h2)[:, None] + rv
    ap = -0.5 * h2 * rdp
    av = -h * rdv
    pv = h * rdp_next

    D = (_slot_diag_chan(n6, n2, 0, 0, aa)
         + _slot_diag_chan(n6, n2, 1, 1, pp)
         + _slot_diag_chan(n6, n2, 2, 2, vv)
         + _slot_diag(n6, n2, 0, 1, ap) + _slot_diag(n6, n2, 1, 0, ap)
         + _slot_diag(n6, n2, 0, 2, av) + _slot_diag(n6, n2, 2, 0, av)
         + _slot_diag(n6, n2, 1, 2, pv) + _slot_diag(n6, n2, 2, 1, pv))
    colM_pad = collision_blocks(rho.col, eta, E, axis_name)
    D = D.at[:, n2:2 * n2, n2:2 * n2].add(colM_pad)

    # B_k: rows u_k, cols u_{k-1}; only the jerk (a, a) slot is per-channel
    B = (_slot_diag_chan(n6, n2, 0, 0, -rj / h2)
         + _slot_diag(n6, n2, 0, 1, 0.5 * h2 * rdp[1:])
         + _slot_diag(n6, n2, 0, 2, 0.5 * h2 * h * rdp[1:] + h * rdv[1:])
         + _slot_diag(n6, n2, 1, 1, -rdp[1:])
         + _slot_diag(n6, n2, 1, 2, -h * rdp[1:])
         + _slot_diag(n6, n2, 2, 2, -rdv[1:]))
    return D, B


# ---------------------------------------------------------------------------
# Exact active-set polish (augmented Lagrangian on the banded factorization)
# ---------------------------------------------------------------------------

def polish_qp_state(lower: RowVals, upper: RowVals, eta, x: StateVars,
                    y: RowVals, E, *, h: float, n_vehicles: int,
                    rho_polish: float = 1e5, iters: int = 6,
                    eps_act: float = 1e-10,
                    axis_name: str | None = None) -> StateVars:
    """Refine an ADMM iterate to the exact KKT point of the QP restricted to
    the active set the duals identify (the direct-path analogue of OSQP
    polish; the parity contract needs per-QP exactness, docs/PARITY.md).

    Unlike a CG polish on the active-set Gram system — whose iterate quality
    is erratic on the near-singular Gram (measured: 400 vs 1600 CG
    iterations flipped which benchmark case passed) — this runs the
    **method of multipliers** on  min x'Px  s.t.  A_act x = b_act  with the
    x-step solved EXACTLY by the block-tridiagonal Cholesky:

        x  <-  argmin x'Px + sum_act rho/2 (A_i x - b_i + y_i/rho)^2
        y  <-  y + rho (A_act x - b_act)

    One factorization (active rows at rho_polish, inactive at _LOOSE_RHO)
    serves every iteration; each multiplier step contracts the constraint
    residual by ~||P|| / rho, so ``iters`` of them reach float64 machine
    precision deterministically.  The polished point is accepted only if it
    does not violate the INACTIVE rows (wrong active-set guard, same
    verification OSQP applies); otherwise ``x`` is returned unchanged.
    """
    dtype = x.a.dtype
    N = n_vehicles
    K = x.a.shape[-2]
    sigma = jnp.asarray(1e-12, dtype)
    scaling = row_scaling_state(K, h, dtype=dtype)

    def box_mask(yv, lo, up):
        lo_act = jnp.logical_and(yv < -eps_act, jnp.isfinite(lo))
        up_act = jnp.logical_and(yv > eps_act, jnp.isfinite(up))
        b = jnp.where(yv < 0, lo, up)
        m = jnp.logical_or(lo_act, up_act)
        # equality rows (terminal vbox/pbox) are always active
        eq = lo == up
        return jnp.logical_or(m, eq).astype(dtype), jnp.where(
            jnp.isfinite(b), b, 0.0)

    ones = jnp.ones_like
    mask = RowVals(dyn_p=ones(y.dyn_p), dyn_v=ones(y.dyn_v),
                   jerk=box_mask(y.jerk, lower.jerk, upper.jerk)[0],
                   acc=box_mask(y.acc, lower.acc, upper.acc)[0],
                   vbox=box_mask(y.vbox, lower.vbox, upper.vbox)[0],
                   pbox=box_mask(y.pbox, lower.pbox, upper.pbox)[0],
                   col=box_mask(y.col, lower.col, upper.col)[0])
    b_act = RowVals(dyn_p=lower.dyn_p, dyn_v=lower.dyn_v,
                    jerk=box_mask(y.jerk, lower.jerk, upper.jerk)[1],
                    acc=box_mask(y.acc, lower.acc, upper.acc)[1],
                    vbox=box_mask(y.vbox, lower.vbox, upper.vbox)[1],
                    pbox=box_mask(y.pbox, lower.pbox, upper.pbox)[1],
                    col=box_mask(y.col, lower.col, upper.col)[1])

    rho_p = jnp.asarray(rho_polish, dtype)

    def box_rho(m, d):
        # inactive rows drop out ENTIRELY (rho 0, not the loose ADMM rho —
        # even 1e-6-level leakage biases the polished point by ~1e-5)
        return jnp.where(m > 0, rho_p * d * d, 0.0) * jnp.ones_like(m)

    # dynamics rows are always active (per-k scaling); box/col rows follow
    # the per-row mask — the row-wise assembly supports exactly this split
    rho_row = RowVals(
        dyn_p=rho_p * scaling.dyn_p * scaling.dyn_p,
        dyn_v=rho_p * scaling.dyn_v * scaling.dyn_v,
        jerk=box_rho(mask.jerk, scaling.jerk),
        acc=box_rho(mask.acc, scaling.acc),
        vbox=box_rho(mask.vbox, scaling.vbox),
        pbox=box_rho(mask.pbox, scaling.pbox),
        col=box_rho(mask.col, jnp.broadcast_to(scaling.col, mask.col.shape)))

    # under a pair-sharded mesh axis, eta / col rows are shard-local; the
    # normal-equation collision blocks and A^T reductions psum over the
    # axis, so the polished x is replicated and bitwise-consistent across
    # shards (accuracy parity with the unsharded polish, VERDICT r4 weak #6)
    D, B = assemble_blocks_rowwise(rho_row, eta, E, h=h, sigma=sigma,
                                   n_vehicles=N, axis_name=axis_name)
    L, Eb = factorize_xla(D, B)

    yal = _tmap(jnp.zeros_like, mask)

    def solve_x(yal):
        rzy = _tmap(lambda r, b, ya, m: (r * b - ya) * m, rho_row, b_act,
                    yal, mask)
        rhs = apply_AT(rzy, eta, E, h, axis_name)
        xs = solve_factorized(L, Eb, to_stacked(rhs))
        return from_stacked(xs.astype(dtype), N)

    x_pol = x
    for _ in range(iters):
        x_pol = solve_x(yal)
        Ax = apply_A(x_pol, eta, E, h)
        yal = _tmap(lambda ya, r, a, b, m: (ya + r * (a - b)) * m,
                    yal, rho_row, Ax, b_act, mask)

    # verification: the polished point must satisfy ALL original bounds to a
    # small slack (a wrongly-guessed active set shows up as a violation of a
    # row the polish ignored), and improve the worst bound violation
    def viol(xv):
        Ax = apply_A(xv, eta, E, h)
        v = _tmap(lambda a, lo, up, d: jnp.maximum(
            jnp.maximum(jnp.where(jnp.isfinite(lo), (lo - a) * d, 0.0),
                        jnp.where(jnp.isfinite(up), (a - up) * d, 0.0)), 0.0),
            Ax, lower, upper, scaling)
        return _inf_norm(v, axis_name)

    ok = viol(x_pol) <= jnp.maximum(viol(x), jnp.asarray(1e-9, dtype))
    return _tmap(lambda a, b: jnp.where(ok, a, b), x_pol, x)


# ---------------------------------------------------------------------------
# ADMM loop with exact x-updates
# ---------------------------------------------------------------------------

class StateQPResult(NamedTuple):
    x: StateVars
    y: RowVals
    iters: jnp.ndarray
    prim_res: jnp.ndarray
    dual_res: jnp.ndarray
    converged: jnp.ndarray


def _factorize_X_routed(D, C, static: "SolverStatic"):
    """X-form factorization with kernel routing: the fused Pallas NS-chain
    (ops/pallas/ns_chain.py — carries VMEM-resident, G chains interleaved
    per grid step) where it applies, else the XLA scan.  The chain kernel's
    custom_vmap fallback keeps unbatched/CPU semantics identical."""
    ns_prec = {"highest": None,
               "high": jax.lax.Precision.HIGH,
               "default": jax.lax.Precision.DEFAULT}[static.ns_precision]
    K = D.shape[-3]
    if (static.pallas and static.ns_iters > 0 and static.ns_anchor == 0
            and K >= 6):
        from ..ops.pallas.ns_chain import chain_factorizer
        return chain_factorizer(static.ns_iters, static.ns_precision)(D, C)
    return factorize_X(D, C, ns_iters=static.ns_iters,
                       ns_anchor=static.ns_anchor, ns_precision=ns_prec)


def solve_qp_state(lower: RowVals, upper: RowVals, eta, x_init: StateVars,
                   params: SolverParams, E, *, h: float,
                   static: SolverStatic, n_vehicles: int,
                   y_init: RowVals | None = None,
                   col_enabled: bool = True,
                   axis_name: str | None = None) -> StateQPResult:
    """One ADMM solve in state space for a single scenario.

    Collision rows are controlled entirely through ``lower.col`` (-inf rows
    are disabled and carry the loose rho via the k=0 pattern plus eta=0).

    ``col_enabled=False`` marks the collision-free initial QP
    (scp.py:323-369): the normal matrix then decouples over (vehicle, axis)
    channels, so the x-update runs on a tiny shared (K, 3, 3) factorization
    (see :func:`assemble_channel`) computed once per batch instead of a
    per-scenario (6N)^2 block factorization.
    """
    dtype = x_init.a.dtype
    N = n_vehicles
    K = x_init.a.shape[-2]
    P = lower.col.shape[-1]
    sigma = params.sigma
    alpha = params.alpha
    scaling = row_scaling_state(K, h, dtype=dtype)
    use_channel = not col_enabled
    # Pallas solve routing.  group > 0: scenario-grouped streaming kernel
    # with that group size; group == 0 (default) + pallas: grouped kernel
    # with a VMEM-budgeted auto group size (measured fastest at N=20:
    # 362-369 solves/s vs 310 for the resident kernel); group == -1 +
    # pallas: legacy per-scenario VMEM-resident kernel (A/B path).
    factor_bytes = 2 * K * (6 * N) ** 2 * jnp.dtype(dtype).itemsize
    isz = jnp.dtype(dtype).itemsize
    np_ = -(-6 * N // 128) * 128
    # NOTE: the X-form solve only holds ONE double-buffered factor slot, so
    # its VMEM budget would admit a ~2x larger group — measured SLOWER
    # (G=18: 154 vs G=9: 163 solves/s at N=30): the bigger per-step DMA
    # lengthens the critical-path wait more than the extra lanes amortize.
    per_g = 4 * np_ * np_ * isz + 5 * K * np_ * isz
    auto_g = max(1, min(32, (12 * 1024 * 1024) // per_g))
    if static.group > 0:
        group_n = static.group
    elif static.group == 0 and static.pallas:
        group_n = auto_g
    else:
        group_n = 0
    pallas_resident = (static.pallas and group_n == 0
                       and 2 * factor_bytes <= 12 * 1024 * 1024)
    # whole-interval fused kernel: factors resident across ALL iterations of
    # a check interval (ops/pallas/admm_fused.py); requires the standard
    # bound layout (row 0 vacuous, rows >= 1 finite) so the mask-based rho
    # pattern IS the effective rho (no per-scenario isinf fixup).
    # X-form residency = ONE (K, nr, npk)-padded factor array (the channel-
    # block pair maps replace Sx/SxT with concat/split) + ~3 MB of row
    # planes and double-buffered blocks; L-form = two (K, n, n) arrays.
    if static.factor_form == "X":
        # v5e's PHYSICAL VMEM is 128 MB — the old 10.5 MB gate encoded
        # Mosaic's default 16 MB scoped limit, not the hardware (probed
        # r5: 120 MB scratch allocates fine).  The fused kernel now passes
        # an explicit vmem_limit_bytes, so residency is gated at 96 MB of
        # factors: N=40/K=50 (12.3 MB factors, previously forced onto the
        # grouped streaming route) now routes fused.
        nr8 = -(-6 * N // 8) * 8
        fused_ok = K * nr8 * np_ * isz <= int(96 * 1024 * 1024)
        # the grouped streaming kernel amortizes its per-step issue cost
        # over the auto group size; with a large group (small N) it beats
        # the one-scenario-serial fused kernel (measured N=20: 1039 vs 614
        # solves/s), while a starved group (N=30: G=9) loses to residency
        # (163 vs 316).  Prefer fused only when the group is starved.
        use_fused = (static.fused and not use_channel and fused_ok
                     and (group_n == 0 or group_n < 16))
    else:
        fused_ok = factor_bytes <= 12 * 1024 * 1024
        use_fused = (static.fused and not use_channel and group_n == 0
                     and fused_ok)

    Ax0 = apply_A(x_init, eta, E, h)
    z0 = _tmap(jnp.clip, Ax0, lower, upper)
    y0 = _tmap(jnp.zeros_like, z0) if y_init is None else y_init

    def make_solver(rho_scalar):
        rho_b = rho_pattern_masks(scaling, static, rho_scalar,
                                  params.col_rho_boost, n_steps=K, n_pairs=P,
                                  col_enabled=col_enabled, dtype=dtype)
        if col_enabled and not use_fused:
            # disabled rows (lower = -inf beyond row 0) -> loose rho; the
            # structural pattern already covers build_bounds-generated bounds,
            # this keeps exact semantics for hand-built ones.  (The fused
            # kernel keeps the batch-independent mask pattern so the rho
            # planes stay shared across the scenario batch.)
            col_off = jnp.isinf(lower.col)
            rho_b = rho_b._replace(
                col=jnp.where(col_off, _LOOSE_RHO, rho_b.col))
        if use_channel:
            Dc, Bc = assemble_channel(rho_b, h=h, sigma=sigma)
            return rho_b, *factorize(Dc, Bc)
        if use_fused and static.factor_form == "X":
            # X-form fused interval: symmetric inverses + slot scalars
            asm_prec = {"highest": None,
                        "high": jax.lax.Precision.HIGH,
                        "default": jax.lax.Precision.DEFAULT}[
                static.assemble_precision]
            D, C = assemble_D(rho_b, eta, E, h=h, sigma=sigma,
                              n_vehicles=N, axis_name=axis_name,
                              precision=asm_prec)
            F = _factorize_X_routed(D, C, static)
            return rho_b, F, C
        if group_n:
            # L-only form: the dense E factors are redundant (off-diagonals
            # are slot scalars) — half the factor bytes stored AND streamed
            # per ADMM iteration.  Lane-padded once for the DMA alignment
            # rule (group_solve.pad_factors).
            from ..ops.pallas.group_solve import pad_factors
            asm_prec = {"highest": None,
                        "high": jax.lax.Precision.HIGH,
                        "default": jax.lax.Precision.DEFAULT}[
                static.assemble_precision]
            D, C = assemble_D(rho_b, eta, E, h=h, sigma=sigma,
                              n_vehicles=N, axis_name=axis_name,
                              precision=asm_prec)
            if static.factor_form == "X":
                F = _factorize_X_routed(D, C, static)
            else:
                F = factorize_L(D, C)
            if static.factor_dtype == "bf16":
                F = F.astype(jnp.bfloat16)
            return rho_b, pad_factors(F), C
        D, B = assemble_blocks(rho_b, eta, E, h=h, sigma=sigma,
                               n_vehicles=N, axis_name=axis_name)
        L, Eb = factorize(D, B)
        if static.factor_dtype == "bf16":
            L, Eb = compress_factors(L, Eb, jnp.bfloat16)
        return rho_b, L, Eb

    def admm_iter(x, z, y, rho_b, L, Eb):
        rzy = _tmap(lambda zz, yy, rr: rr * zz - yy, z, y, rho_b)
        b_sv = apply_AT(rzy, eta, E, h, axis_name)
        b_sv = _tmap(lambda bb, xx: bb + sigma * xx, b_sv, x)
        if use_channel:
            sb = to_stacked(b_sv)
            xs3 = solve_factorized_channel(
                L, Eb, sb.reshape(sb.shape[:-1] + (3, 2 * N)))
            xs = xs3.reshape(sb.shape)
        elif group_n:
            if static.factor_form == "X":
                from ..ops.pallas.group_solve import grouped_solver_X
                xs = grouped_solver_X(group_n)(L, Eb, to_stacked(b_sv))
            else:
                from ..ops.pallas.group_solve import grouped_solver_L
                xs = grouped_solver_L(group_n)(L, Eb, to_stacked(b_sv))
        elif pallas_resident:
            from ..ops.pallas.banded_solve import solve_factorized_single
            xs = solve_factorized_single(L, Eb, to_stacked(b_sv))
        else:
            xs = solve_factorized(L, Eb, to_stacked(b_sv))
        x_t = from_stacked(xs.astype(dtype), N)
        x_new = _tmap(lambda xt, xx: alpha * xt + (1 - alpha) * xx, x_t, x)
        Ax_t = apply_A(x_t, eta, E, h)
        z_rel = _tmap(lambda az, zz: alpha * az + (1 - alpha) * zz, Ax_t, z)
        z_new = _tmap(lambda zr, yy, rr, lo, up: jnp.clip(zr + yy / rr, lo, up),
                      z_rel, y, rho_b, lower, upper)
        # exact-penalty soft prox on collision rows (same as admm.py)
        w_col = z_rel.col + y.col / rho_b.col
        lam = params.col_penalty
        z_col = jnp.where(w_col >= lower.col, w_col,
                          jnp.minimum(w_col + lam / rho_b.col, lower.col))
        z_new = z_new._replace(col=z_col)
        y_new = _tmap(lambda yy, zr, zn, rr: yy + rr * (zr - zn),
                      y, z_rel, z_new, rho_b)
        return x_new, z_new, y_new

    def residuals(x, z, y):
        Ax = apply_A(x, eta, E, h)
        dAx = _tmap(lambda a, d_: a * d_, Ax, scaling)
        dz = _tmap(lambda a, d_: a * d_, z, scaling)
        prim = _inf_norm(_tmap(lambda a, b_: a - b_, dAx, dz), axis_name)
        ATy = apply_AT(y, eta, E, h, axis_name)
        dual_vec = _tmap(lambda px, at: px + at,
                         StateVars(a=2.0 * x.a, p=jnp.zeros_like(x.p),
                                   v=jnp.zeros_like(x.v)), ATy)
        dual = _inf_norm(dual_vec)
        prim_scale = jnp.maximum(_inf_norm(dAx, axis_name),
                                 _inf_norm(dz, axis_name))
        dual_scale = jnp.maximum(2.0 * jnp.max(jnp.abs(x.a)), _inf_norm(ATy))
        eps_prim = params.eps_abs + params.eps_rel * prim_scale
        eps_dual = params.eps_abs + params.eps_rel * dual_scale
        done = jnp.logical_and(prim <= eps_prim, dual <= eps_dual)
        return prim, dual, done, prim / jnp.maximum(prim_scale, 1e-10), \
            dual / jnp.maximum(dual_scale, 1e-10)

    fact0 = make_solver(params.rho)

    if use_fused:
        from ..ops.pallas.admm_fused import (admm_interval_fused,
                                             admm_interval_fused_X,
                                             bound_planes, eta_to_block,
                                             pair_matrices,
                                             pair_matrices_block,
                                             planes_to_rowvals, rho_planes,
                                             rowvals_to_planes)
        ls_p, _ = bound_planes(lower, -jnp.inf)
        us_p, _ = bound_planes(upper, jnp.inf)
        fpar = jnp.stack([jnp.asarray(h, dtype), jnp.asarray(sigma, dtype),
                          jnp.asarray(alpha, dtype),
                          params.col_penalty.astype(dtype)])
        ipar = jnp.reshape(params.check_interval, (1,))
        if static.factor_form == "X":
            E2b, E2bT = pair_matrices_block(N, dtype)
            eta_b = eta_to_block(eta)
        else:
            E2, E2T, Sx, SxT = pair_matrices(N, dtype)
            eta2 = eta.reshape(K, 2 * P)

        def run_interval(x, z, y, rho_b, L, Eb):
            zs, zc = rowvals_to_planes(z)
            ys, yc = rowvals_to_planes(y)
            rho_sk, rho_c = rho_planes(rho_b, _LOOSE_RHO)
            if static.factor_form == "X":
                # L = X symmetric inverses, Eb = (K-1, 3, 3) slot scalars
                cflat = Eb.reshape(K - 1, 9).astype(dtype)
                xp, zsp, zcp, ysp, ycp = admm_interval_fused_X(
                    fpar, ipar, cflat, L, eta_b, ls_p, us_p, lower.col,
                    to_stacked(x), zs, zc, ys, yc, rho_sk, rho_c,
                    E2b, E2bT)
            else:
                xp, zsp, zcp, ysp, ycp = admm_interval_fused(
                    fpar, ipar, L, Eb, eta2, ls_p, us_p, lower.col,
                    to_stacked(x), zs, zc, ys, yc, rho_sk, rho_c,
                    E2, E2T, Sx, SxT)
            return (from_stacked(xp.astype(dtype), N),
                    planes_to_rowvals(zsp, zcp, N, RowVals),
                    planes_to_rowvals(ysp, ycp, N, RowVals))

    def outer_body(carry):
        x, z, y, rho, fact, it, prim, dual, done = carry
        rho_b, L, Eb = fact

        if use_fused:
            x, z, y = run_interval(x, z, y, rho_b, L, Eb)
        else:
            def inner(i, xzys):
                return admm_iter(*xzys, rho_b, L, Eb)

            x, z, y = jax.lax.fori_loop(0, params.check_interval, inner,
                                        (x, z, y))
        prim, dual, done, pr, dr = residuals(x, z, y)

        if static.adaptive_rho:
            ratio = jnp.sqrt(pr / jnp.maximum(dr, 1e-12))
            new_rho = jnp.clip(rho * ratio, 1e-6, 1e6)
            adapt = jnp.logical_or(ratio > 5.0, ratio < 0.2)
            new_rho = jnp.where(adapt, new_rho, rho)
            # OSQP semantics: the (unscaled) dual y is NOT rescaled on a
            # rho update.  The previous proportional rescale kept u = y/rho
            # fixed instead, which at rho far from optimal pinned the z/y
            # fixed point and STALLED benchmark-scale collision QPs
            # (N=18 QP-1: prim 5.7e-2 after 50k iters; converges in ~1e3
            # without the rescale — scripts/parity_diag_n18.py).
            # refactorize only when rho actually moved (lax.cond skips the
            # block-Cholesky scan otherwise — it dominates interval cost)
            fact = jax.lax.cond(adapt, lambda r: make_solver(r),
                                lambda r: fact, new_rho)
            rho = new_rho

        return (x, z, y, rho, fact, it + params.check_interval, prim, dual,
                done)

    def outer_cond(carry):
        *_, it, prim, dual, done = carry
        return jnp.logical_and(it < params.max_iter, jnp.logical_not(done))

    init = (x_init, z0, y0, params.rho, fact0, jnp.int32(0),
            jnp.asarray(jnp.inf, dtype), jnp.asarray(jnp.inf, dtype),
            jnp.asarray(False))
    x, z, y, rho, _fact, it, prim, dual, done = jax.lax.while_loop(
        outer_cond, outer_body, init)

    return StateQPResult(x=x, y=y, iters=it, prim_res=prim, dual_res=dual,
                         converged=done)
