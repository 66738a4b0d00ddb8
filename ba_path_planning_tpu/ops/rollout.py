"""Double-integrator dynamics rollout as prefix-sum operators.

The reference (``/root/reference/src/path_planning/solvers/scp.py:371-397, 559-595``)
computes, with O(N*K^2) Python loops, the exact discrete model

    v[k] = v0 + h * sum_{j<k} a[j]
    p[k] = p0 + k*h*v0 + sum_{j<k} h^2 * (k - j - 0.5) * a[j]

for each vehicle.  Here the same algebra is expressed with two cumulative sums
(O(K) work, log-depth on TPU) using the identity

    sum_{j<k} (k - j) a[j] = sum_{m=1..k} s1[m],   s1[m] = sum_{j<m} a[j]

so that  p[k] = p0 + k*h*v0 + h^2 * (s2[k] - 0.5 * s1[k])  with
s1 = exclusive-cumsum(a) and s2 = inclusive-cumsum(s1).

All functions operate on ``(..., K, 2)`` acceleration arrays and broadcast over
arbitrary leading axes (vehicles, scenario batches), making them `vmap`/`pjit`
clean by construction.
"""

from __future__ import annotations

import jax.numpy as jnp


def _exclusive_cumsum(a: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Exclusive prefix sum along ``axis``: out[k] = sum_{j<k} a[j]."""
    inc = jnp.cumsum(a, axis=axis)
    return inc - a


def rollout(accelerations: jnp.ndarray,
            initial_positions: jnp.ndarray,
            initial_velocities: jnp.ndarray,
            h: float) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Positions and velocities for accelerations of shape ``(..., K, 2)``.

    ``initial_positions`` / ``initial_velocities`` have shape ``(..., 2)``
    (broadcast against the leading axes of ``accelerations``).

    Returns ``(positions, velocities)`` each of shape ``(..., K, 2)`` with
    index k = 0..K-1; matches reference semantics where index 0 is the initial
    state itself (``scp.py:382-395``).
    """
    K = accelerations.shape[-2]
    dtype = accelerations.dtype
    s1 = _exclusive_cumsum(accelerations, axis=-2)      # sum_{j<k} a[j]
    s2 = jnp.cumsum(s1, axis=-2)                        # sum_{m<=k} s1[m]
    k_idx = jnp.arange(K, dtype=dtype).reshape((K, 1))

    p0 = initial_positions[..., None, :]
    v0 = initial_velocities[..., None, :]

    velocities = v0 + h * s1
    positions = p0 + h * k_idx * v0 + (h * h) * (s2 - 0.5 * s1)
    return positions, velocities


def rollout_positions_zero_ic(accelerations: jnp.ndarray, h: float) -> jnp.ndarray:
    """Dynamics-only part of positions (zero initial pos/vel): shape (..., K, 2).

    out[k] = sum_{j<k} h^2 (k - j - 0.5) a[j].  Row k=0 is identically zero.
    This is exactly the acceleration-dependent part of every linearized
    collision row (``scp.py:511-534``).
    """
    s1 = _exclusive_cumsum(accelerations, axis=-2)
    s2 = jnp.cumsum(s1, axis=-2)
    return (h * h) * (s2 - 0.5 * s1)


def rollout_positions_zero_ic_adjoint(g: jnp.ndarray, h: float) -> jnp.ndarray:
    """Adjoint of :func:`rollout_positions_zero_ic`.

    Given cotangent ``g`` of shape (..., K, 2), returns (..., K, 2) with
    out[m] = sum_{k>m} h^2 (k - m - 0.5) g[k].

    Derivation: with q1[m] = sum_{k>m} g[k] (reverse-exclusive cumsum),
    sum_{k>m} (k-m) g[k] = sum_{t>=m} q1[t] (reverse-inclusive cumsum of q1).
    """
    rev_inc = jnp.flip(jnp.cumsum(jnp.flip(g, axis=-2), axis=-2), axis=-2)
    q1 = rev_inc - g                                    # sum_{k>m} g[k]
    rq = jnp.flip(jnp.cumsum(jnp.flip(q1, axis=-2), axis=-2), axis=-2)
    return (h * h) * (rq - 0.5 * q1)
