"""Conversions between the framework's (N, K, 2) block layout and the
reference's flat vehicle-major layout x[2*i*K + 2*k + axis]
(``/root/reference/src/path_planning/solvers/scp.py:16-24``)."""

from __future__ import annotations

import jax.numpy as jnp


def to_flat(a: jnp.ndarray) -> jnp.ndarray:
    """(..., N, K, 2) -> (..., 2NK) in reference layout."""
    return a.reshape(a.shape[:-3] + (-1,))


def from_flat(x: jnp.ndarray, n_vehicles: int, n_steps: int) -> jnp.ndarray:
    """(..., 2NK) -> (..., N, K, 2)."""
    return x.reshape(x.shape[:-1] + (n_vehicles, n_steps, 2))
