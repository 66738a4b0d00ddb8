"""Matrix-free constraint operators and bounds for the SCP subproblem QP.

The reference assembles five scipy CSC blocks and stacks them for OSQP
(``/root/reference/src/path_planning/solvers/scp.py:182-321, 326-358``):

    1. jerk  (2N(K-1) x 2NK): first difference / h           (scp.py:10-28)
    2. acc   (2NK x 2NK):     identity                        (scp.py:193-195)
    3. vel   (2NK x 2NK):     h * inclusive-cumsum            (scp.py:198-203)
    4. pos   (2NK x 2NK):     lower-tri Toeplitz h^2(k-j+0.5) (scp.py:227-232)
    5. collision (K*P x 2NK): see collisions.py               (scp.py:453-557)

Every one of these has closed-form prefix-sum structure, so this module never
materializes a matrix: it provides ``apply`` (A @ x) and ``apply_adjoint``
(A^T @ y) on structured block pytrees, plus the bounds builders replicating
the reference's exact row semantics (box rows for k < K-1, terminal equality
rows at k = K-1; offsets folded into bounds, ``scp.py:205-257``).

Row-value layout (a ``ConstraintBlocks`` pytree), per scenario:
    jerk: (N, K-1, 2)   acc: (N, K, 2)   vel: (N, K, 2)   pos: (N, K, 2)
    col:  (K, P)        with P = N(N-1)/2 pairs

All functions broadcast over leading batch axes.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .rollout import rollout_positions_zero_ic, rollout_positions_zero_ic_adjoint


class ConstraintBlocks(NamedTuple):
    """Row-space vector of the stacked constraint operator, as blocks."""
    jerk: jnp.ndarray   # (..., N, K-1, 2)
    acc: jnp.ndarray    # (..., N, K, 2)
    vel: jnp.ndarray    # (..., N, K, 2)
    pos: jnp.ndarray    # (..., N, K, 2)
    col: jnp.ndarray    # (..., K, P)


class Bounds(NamedTuple):
    lower: ConstraintBlocks
    upper: ConstraintBlocks


def tree_map(f, *trees) -> ConstraintBlocks:
    return jax.tree.map(f, *trees)


# ---------------------------------------------------------------------------
# Forward operator  A @ x
# ---------------------------------------------------------------------------

def apply_static(a: jnp.ndarray, h: float) -> tuple[jnp.ndarray, ...]:
    """Apply the four static blocks to accelerations ``a`` of shape (..., N, K, 2).

    Returns (jerk, acc, vel, pos) row values.
      * jerk row (i,k):  (a[k+1] - a[k]) / h
      * acc  row (i,k):  a[k]
      * vel  row (i,k):  h * sum_{j<=k} a[j]          (= v[k+1] - v0)
      * pos  row (i,k):  sum_{j<=k} h^2 (k-j+0.5) a[j] (= p[k+1] - p0 - (k+1) h v0)
    """
    jerk = (a[..., 1:, :] - a[..., :-1, :]) / h
    cs = jnp.cumsum(a, axis=-2)
    vel = h * cs
    # pos row k = h^2 * (s2[k] + 0.5 * cs[k]) with s2[k] = sum_{j<k}(k-j) a[j]
    s1 = cs - a
    s2 = jnp.cumsum(s1, axis=-2)
    pos = (h * h) * (s2 + 0.5 * cs)
    return jerk, a, vel, pos


def apply_static_adjoint(jerk_y: jnp.ndarray, acc_y: jnp.ndarray,
                         vel_y: jnp.ndarray, pos_y: jnp.ndarray,
                         h: float) -> jnp.ndarray:
    """Adjoint of :func:`apply_static`: returns (..., N, K, 2) cotangent on a."""
    # jerk^T: out[k] = (y[k-1] - y[k]) / h with y[-1] = y[K-1] = 0
    pad = [(0, 0)] * (jerk_y.ndim - 2) + [(1, 1), (0, 0)]
    yp = jnp.pad(jerk_y, pad)
    out = (yp[..., :-1, :] - yp[..., 1:, :]) / h

    out = out + acc_y

    # vel^T: out[m] = h * sum_{k>=m} y[k]  (reverse inclusive cumsum)
    r1 = jnp.flip(jnp.cumsum(jnp.flip(vel_y, axis=-2), axis=-2), axis=-2)
    out = out + h * r1

    # pos^T: out[m] = sum_{k>=m} h^2 (k-m+0.5) y[k]
    #       = h^2 * (rev_exclusive_cumsum(p1)[m] + 0.5 * p1[m]),  p1 = rev-inc-cumsum(y)
    p1 = jnp.flip(jnp.cumsum(jnp.flip(pos_y, axis=-2), axis=-2), axis=-2)
    p2 = p1 - pos_y                      # sum_{k>m} y[k]
    rp = jnp.flip(jnp.cumsum(jnp.flip(p2, axis=-2), axis=-2), axis=-2)
    out = out + (h * h) * (rp + 0.5 * p1)
    return out


# ---------------------------------------------------------------------------
# Collision block (linearized, fixed eta): forward and adjoint
# ---------------------------------------------------------------------------

def pair_incidence(n_vehicles: int, dtype=jnp.float32) -> jnp.ndarray:
    """Signed incidence matrix E of shape (N, P): E[i,p]=+1, E[j,p]=-1 for pair p=(i<j).

    Pair ordering matches the reference's inner loop ``for i: for j>i``
    (``scp.py:495-496``): p enumerates (0,1), (0,2), ..., (N-2,N-1).
    """
    import numpy as np
    N = n_vehicles
    P = N * (N - 1) // 2
    E = np.zeros((N, P), dtype=np.float64)
    p = 0
    for i in range(N):
        for j in range(i + 1, N):
            E[i, p] = 1.0
            E[j, p] = -1.0
            p += 1
    return jnp.asarray(E, dtype=dtype)


def apply_collision(a: jnp.ndarray, eta: jnp.ndarray, E: jnp.ndarray,
                    h: float) -> jnp.ndarray:
    """Collision rows A_col @ a without materializing the matrix.

    a:   (..., N, K, 2) accelerations
    eta: (..., K, P, 2) linearization directions per (timestep, pair)
    E:   (N, P) signed incidence
    Returns (..., K, P): row (k,p) = eta[k,p] . (ptilde_i[k] - ptilde_j[k])
    where ptilde is the zero-IC position rollout (row k=0 is zero, matching
    ``scp.py:492-493``).
    """
    ptilde = rollout_positions_zero_ic(a, h)                     # (..., N, K, 2)
    dp = jnp.einsum('np,...nkc->...kpc', E, ptilde,
                    precision=jax.lax.Precision.HIGHEST)         # (..., K, P, 2)
    return jnp.sum(eta * dp, axis=-1)


def apply_collision_adjoint(y: jnp.ndarray, eta: jnp.ndarray, E: jnp.ndarray,
                            h: float) -> jnp.ndarray:
    """Adjoint of :func:`apply_collision`: (..., K, P) -> (..., N, K, 2)."""
    w = y[..., None] * eta                                       # (..., K, P, 2)
    g = jnp.einsum('np,...kpc->...nkc', E, w,
                   precision=jax.lax.Precision.HIGHEST)          # (..., N, K, 2)
    return rollout_positions_zero_ic_adjoint(g, h)


# ---------------------------------------------------------------------------
# Full operator
# ---------------------------------------------------------------------------

def apply_A(a: jnp.ndarray, eta: jnp.ndarray, E: jnp.ndarray,
            h: float) -> ConstraintBlocks:
    jerk, acc, vel, pos = apply_static(a, h)
    col = apply_collision(a, eta, E, h)
    return ConstraintBlocks(jerk=jerk, acc=acc, vel=vel, pos=pos, col=col)


def apply_AT(y: ConstraintBlocks, eta: jnp.ndarray, E: jnp.ndarray,
             h: float) -> jnp.ndarray:
    out = apply_static_adjoint(y.jerk, y.acc, y.vel, y.pos, h)
    return out + apply_collision_adjoint(y.col, eta, E, h)


# ---------------------------------------------------------------------------
# Bounds (offsets folded in, exactly as scp.py:205-257, 478-479, 536-550)
# ---------------------------------------------------------------------------

def static_bounds(p0: jnp.ndarray, v0: jnp.ndarray, pf: jnp.ndarray,
                  vf: jnp.ndarray, *, n_vehicles: int, n_steps: int, h: float,
                  limits) -> tuple[dict, dict]:
    """Lower/upper bounds for the four static blocks.

    p0, v0, pf, vf: (..., N, 2).  ``limits`` is a ``Limits`` config carrying
    vel/acc/jerk boxes and pos_min/pos_max (space_dims).
    Returns two dicts with keys jerk/acc/vel/pos of the block shapes.
    """
    N, K = n_vehicles, n_steps
    dtype = p0.dtype
    batch = p0.shape[:-2]

    def full(shape, val):
        return jnp.full(batch + shape, val, dtype=dtype)

    l_jerk = full((N, K - 1, 2), limits.jerk_min)
    u_jerk = full((N, K - 1, 2), limits.jerk_max)
    l_acc = full((N, K, 2), limits.acc_min)
    u_acc = full((N, K, 2), limits.acc_max)

    # Velocity rows: row k is v[k+1] - v0; box for k < K-1, equality at K-1.
    v0b = v0[..., :, None, :]                                    # (..., N, 1, 2)
    l_vel = jnp.broadcast_to(limits.vel_min - v0b, batch + (N, K, 2))
    u_vel = jnp.broadcast_to(limits.vel_max - v0b, batch + (N, K, 2))
    term_v = (vf - v0)[..., :, None, :]
    is_term = (jnp.arange(K) == K - 1).reshape((K, 1))
    l_vel = jnp.where(is_term, term_v, l_vel)
    u_vel = jnp.where(is_term, term_v, u_vel)

    # Position rows: row k is p[k+1] - off, off = p0 + (k+1) h v0.
    k1 = jnp.arange(1, K + 1, dtype=dtype).reshape((K, 1))
    off = p0[..., :, None, :] + h * k1 * v0[..., :, None, :]     # (..., N, K, 2)
    pos_min = jnp.asarray(limits.pos_min, dtype=dtype)
    pos_max = jnp.asarray(limits.pos_max, dtype=dtype)
    l_pos = pos_min - off
    u_pos = pos_max - off
    term_p = pf[..., :, None, :] - off
    l_pos = jnp.where(is_term, term_p, l_pos)
    u_pos = jnp.where(is_term, term_p, u_pos)

    lower = dict(jerk=l_jerk, acc=l_acc, vel=l_vel, pos=l_pos)
    upper = dict(jerk=u_jerk, acc=u_acc, vel=u_vel, pos=u_pos)
    return lower, upper
