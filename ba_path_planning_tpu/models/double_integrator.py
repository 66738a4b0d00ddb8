"""Double-integrator dynamics model — the planner's vehicle model family.

The reference hard-codes the discrete 2D double integrator implicitly in its
rollout loops and constraint weights (``scp.py:371-397, 392-395, 489-491``).
Here the model is an explicit object: it owns the integration weights, the
dense operator forms (for MXU-matmul execution paths and oracles), and
closed-form state queries, so the solver layers and any future model family
(e.g., a 3D double integrator) share one definition of the dynamics.

Discrete model (exact integration of piecewise-constant acceleration):
    v[k] = v0 + h * sum_{j<k} a[j]
    p[k] = p0 + k h v0 + sum_{j<k} h^2 (k - j - 0.5) a[j]
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import jax.numpy as jnp


@dataclass(frozen=True)
class DoubleIntegrator2D:
    """2-axis double integrator with timestep ``h`` over ``K`` steps."""
    n_steps: int
    time_step: float

    # ---- dense operator forms (K x K), useful for MXU paths and oracles ----

    def velocity_matrix(self) -> np.ndarray:
        """L with v-row k' = h * sum_{j<=k'} a[j]  (C_vel block of scp.py:198-203)."""
        K = self.n_steps
        return self.time_step * np.tril(np.ones((K, K)))

    def position_matrix(self) -> np.ndarray:
        """S with p-row k' = sum_{j<=k'} h^2 (k'-j+0.5) a[j] (scp.py:227-232)."""
        K, h = self.n_steps, self.time_step
        S = np.zeros((K, K))
        for k in range(K):
            for j in range(k + 1):
                S[k, j] = h * h * (k - j + 0.5)
        return S

    def rollout_position_matrix(self) -> np.ndarray:
        """W with p~[k] = sum_{j<k} h^2 (k-j-0.5) a[j]  (strict, zero row 0)."""
        K, h = self.n_steps, self.time_step
        W = np.zeros((K, K))
        for k in range(K):
            for j in range(k):
                W[k, j] = h * h * (k - j - 0.5)
        return W

    def jerk_matrix(self) -> np.ndarray:
        """First-difference operator scaled by 1/h ((K-1) x K)."""
        K, h = self.n_steps, self.time_step
        J = np.zeros((K - 1, K))
        for k in range(K - 1):
            J[k, k] = -1.0 / h
            J[k, k + 1] = 1.0 / h
        return J

    # ---- closed-form state queries ----

    def terminal_state(self, positions, velocities, accelerations):
        """(p[K], v[K]) one step past the last rollout index — the states the
        terminal equality rows constrain (scp.py:205-257).

        positions/velocities/accelerations: (..., K, 2) rollout arrays.
        """
        h = self.time_step
        pK = (positions[..., -1, :] + h * velocities[..., -1, :]
              + 0.5 * h * h * accelerations[..., -1, :])
        vK = velocities[..., -1, :] + h * accelerations[..., -1, :]
        return pK, vK

    def goal_projection(self, accelerations, p0, v0, pf, vf):
        """Minimal-norm acceleration correction enforcing the terminal
        equalities ``p[K] = pf``, ``v[K] = vf`` EXACTLY (closed form).

        The reference enforces the terminal rows as hard QP equalities
        (scp.py:242-257); a fixed-budget ADMM solve leaves them satisfied
        only to solver tolerance (cm-level).  Both terminal maps are linear
        in the accelerations — per (vehicle, axis) with c1[j] = h and
        c2[j] = h^2 (K - j - 0.5):

            v[K] = v0 + c1 . a        p[K] = p0 + K h v0 + c2 . a

        so the least-norm correction is da = G^T (G G^T)^{-1} r with
        G = [c1; c2] (2 x K) and r the terminal residual.  G G^T is a
        constant 2x2, inverted once at trace time in float64.  O(K) work
        per vehicle — vanishing next to one ADMM iteration.

        accelerations: (..., K, 2); p0/v0/pf/vf: (..., 2) broadcastable.
        Returns corrected accelerations of the same shape.
        """
        K, h = self.n_steps, self.time_step
        dtype = accelerations.dtype
        c2_np = (h * h) * (K - np.arange(K) - 0.5)          # (K,)
        g11 = K * h * h
        g12 = float(h * c2_np.sum())
        g22 = float((c2_np * c2_np).sum())
        det = g11 * g22 - g12 * g12
        i11, i12, i22 = g22 / det, -g12 / det, g11 / det
        c2 = jnp.asarray(c2_np, dtype)

        a = accelerations
        vK = v0 + h * jnp.sum(a, axis=-2)
        pK = p0 + (K * h) * v0 + jnp.sum(c2[:, None] * a, axis=-2)
        r_v = vf - vK                                        # (..., 2)
        r_p = pf - pK
        alpha = i11 * r_v + i12 * r_p
        beta = i12 * r_v + i22 * r_p
        return a + h * alpha[..., None, :] + c2[:, None] * beta[..., None, :]

    def max_displacement(self, vel_max: float, acc_max: float) -> float:
        """Upper bound on reachable PER-AXIS displacement from rest to rest
        over the horizon — a cheap scenario pre-feasibility screen.  The
        velocity/acceleration limits are per-axis boxes (scp.py:67-71), so
        the reachable set is a square of this half-width, not a disc."""
        K, h = self.n_steps, self.time_step
        T = K * h
        # accelerate/decelerate triangle capped by vel_max
        t_ramp = vel_max / acc_max
        if T <= 2 * t_ramp:
            return 0.25 * acc_max * T * T
        return vel_max * (T - t_ramp)

    def reachable(self, p0, pf, vel_max: float, acc_max: float) -> jnp.ndarray:
        """Boolean (per vehicle) screen: per-axis |pf - p0| within
        max_displacement (the box limits act independently per axis)."""
        d = jnp.max(jnp.abs(jnp.asarray(pf) - jnp.asarray(p0)), axis=-1)
        return d <= self.max_displacement(vel_max, acc_max)
