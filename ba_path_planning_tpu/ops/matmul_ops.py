"""MXU-form constraint operators: dense K x K Toeplitz matmuls.

The prefix-sum operators in ``constraints.py`` are exact but run on the VPU
as log-depth scans.  On TPU, the same operators expressed as dense (K, K)
matrix products map onto the MXU systolic array, which for the batched solver
(leading dims batch x N x 2) is usually faster despite the K^2 FLOPs.  The
matrices are tiny trace-time constants (K <= a few hundred), built once per
(K, h) in float64 and embedded in the executable.

Semantics are identical to ``apply_static`` / ``apply_collision`` and are
cross-checked in tests; which implementation runs is selected by
``SolverConfig.operator_impl``.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp

_HP = jax.lax.Precision.HIGHEST


@lru_cache(maxsize=32)
def _mats_np(K: int, h: float):
    """Dense operator matrices: L (cumsum), S (pos rows), W (zero-IC rollout).

    All three come from the single dynamics definition in
    :class:`~ba_path_planning_tpu.models.double_integrator.DoubleIntegrator2D`.
    """
    from ..models.double_integrator import DoubleIntegrator2D
    model = DoubleIntegrator2D(n_steps=K, time_step=h)
    L = model.velocity_matrix() / h
    S = model.position_matrix()
    W = model.rollout_position_matrix()
    return L, S, W


def _m(K, h, dtype):
    L, S, W = _mats_np(K, float(h))
    return (jnp.asarray(L, dtype), jnp.asarray(S, dtype), jnp.asarray(W, dtype))


def _k_apply(M, x):
    """(K, K) matrix applied along the K axis of (..., K, 2) arrays."""
    return jnp.einsum('kl,...lc->...kc', M, x, precision=_HP)


def _kt_apply(M, y):
    """Transpose application along the K axis."""
    return jnp.einsum('lk,...lc->...kc', M, y, precision=_HP)


def apply_static_matmul(a: jnp.ndarray, h: float):
    """Matmul-form of ``constraints.apply_static``: (jerk, acc, vel, pos)."""
    K = a.shape[-2]
    L, S, _ = _m(K, h, a.dtype)
    jerk = (a[..., 1:, :] - a[..., :-1, :]) / h
    vel = h * _k_apply(L, a)
    pos = _k_apply(S, a)
    return jerk, a, vel, pos


def apply_static_adjoint_matmul(jerk_y, acc_y, vel_y, pos_y, h: float):
    K = acc_y.shape[-2]
    L, S, _ = _m(K, h, acc_y.dtype)
    pad = [(0, 0)] * (jerk_y.ndim - 2) + [(1, 1), (0, 0)]
    yp = jnp.pad(jerk_y, pad)
    out = (yp[..., :-1, :] - yp[..., 1:, :]) / h
    out = out + acc_y
    out = out + h * _kt_apply(L, vel_y)
    out = out + _kt_apply(S, pos_y)
    return out


def apply_collision_matmul(a: jnp.ndarray, eta: jnp.ndarray, E: jnp.ndarray,
                           h: float) -> jnp.ndarray:
    """Matmul-form of ``constraints.apply_collision``."""
    K = a.shape[-2]
    _, _, W = _m(K, h, a.dtype)
    ptilde = _k_apply(W, a)                                  # (..., N, K, 2)
    dp = jnp.einsum('np,...nkc->...kpc', E, ptilde, precision=_HP)
    return jnp.sum(eta * dp, axis=-1)


def apply_collision_adjoint_matmul(y: jnp.ndarray, eta: jnp.ndarray,
                                   E: jnp.ndarray, h: float) -> jnp.ndarray:
    K = y.shape[-2]
    _, _, W = _m(K, h, y.dtype)
    w = y[..., None] * eta                                   # (..., K, P, 2)
    g = jnp.einsum('np,...kpc->...nkc', E, w, precision=_HP)
    return _kt_apply(W, g)
