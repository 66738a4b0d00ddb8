"""Collision linearization, bounds, and feasibility checking.

Replicates the algebra of ``/root/reference/src/path_planning/solvers/scp.py:453-557``
(one half-space row per (timestep k, pair i<j), k-major then pair-ordered)
and ``scp.py:597-615`` (the feasibility pre-check with R - 0.01 slack) —
but vectorized over all (k, pair) at once and over scenario batches.

The reference draws a *random* direction for degenerate pairs
(dist < 1e-6, ``scp.py:504-507``, unseeded ``np.random``).  Here the
direction comes from a deterministic fold of a JAX PRNG key with the SCP
iteration index, so runs are exactly reproducible (SURVEY.md section 8.1).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

DEGENERATE_EPS = 1e-6   # scp.py:503
FEAS_SLACK = 0.01       # scp.py:610


class PairIndex(NamedTuple):
    """Static pair bookkeeping for N vehicles.

    ``valid`` is None for the dense all-pair index; the pair-sharded path
    (``parallel.pair_sharded``) pads P up to the shard count and marks pad
    pairs invalid — their E columns are zero (no force contribution) and
    their collision bounds are forced to -inf (rows inert).
    """
    i_idx: jnp.ndarray  # (P,) int32, first vehicle of each pair
    j_idx: jnp.ndarray  # (P,) int32, second vehicle
    E: jnp.ndarray      # (N, P) signed incidence (float)
    valid: jnp.ndarray | None = None   # (P,) bool, None = all valid


def make_pair_index(n_vehicles: int, dtype=jnp.float32) -> PairIndex:
    import numpy as np
    N = n_vehicles
    ii, jj = np.triu_indices(N, k=1)
    P = len(ii)
    E = np.zeros((N, P))
    E[ii, np.arange(P)] = 1.0
    E[jj, np.arange(P)] = -1.0
    return PairIndex(i_idx=jnp.asarray(ii, dtype=jnp.int32),
                     j_idx=jnp.asarray(jj, dtype=jnp.int32),
                     E=jnp.asarray(E, dtype=dtype))


def pairwise_diffs(positions: jnp.ndarray, pairs: PairIndex) -> jnp.ndarray:
    """(..., N, K, 2) positions -> (..., K, P, 2) pairwise differences p_i - p_j."""
    pi = jnp.take(positions, pairs.i_idx, axis=-3)   # (..., P, K, 2)
    pj = jnp.take(positions, pairs.j_idx, axis=-3)
    diff = pi - pj
    return jnp.swapaxes(diff, -3, -2)                # (..., K, P, 2)


def linearize(prev_positions: jnp.ndarray, pairs: PairIndex,
              key: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Linearization directions eta and distances from previous-iterate positions.

    prev_positions: (..., N, K, 2).  Returns (eta, dist):
      eta:  (..., K, P, 2) unit direction (p_i - p_j)/dist, or a deterministic
            pseudo-random unit vector for degenerate pairs (dist < 1e-6)
      dist: (..., K, P) with degenerate entries replaced by 1.0 (scp.py:507)
    """
    diff = pairwise_diffs(prev_positions, pairs)          # (..., K, P, 2)
    dist = jnp.sqrt(jnp.sum(diff * diff, axis=-1))        # (..., K, P)
    degen = dist < DEGENERATE_EPS

    # Deterministic replacement for np.random.uniform(0, 2*pi) at scp.py:505.
    # The key is folded with the GLOBAL pair id (not drawn over the local
    # (K, P) shape) so the stream is invariant to pair layout — a
    # pair-sharded solve (parallel/pair_sharded.py) draws the same
    # degenerate directions as the unsharded engine.
    pair_id = (pairs.i_idx.astype(jnp.uint32) * jnp.uint32(65536)
               + pairs.j_idx.astype(jnp.uint32))
    pair_keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(pair_id)
    angle = jax.vmap(
        lambda k_: jax.random.uniform(k_, dist.shape[:-1], dtype=diff.dtype,
                                      maxval=2.0 * jnp.pi),
        out_axes=-1)(pair_keys)
    eta_rand = jnp.stack([jnp.cos(angle), jnp.sin(angle)], axis=-1)

    safe_dist = jnp.where(degen, 1.0, dist)
    eta = jnp.where(degen[..., None], eta_rand, diff / safe_dist[..., None])
    return eta, safe_dist


def collision_lower_bounds(eta: jnp.ndarray, dist: jnp.ndarray,
                           prev_positions: jnp.ndarray,
                           p0: jnp.ndarray, v0: jnp.ndarray,
                           pairs: PairIndex, *, h: float,
                           min_distance: float) -> jnp.ndarray:
    """RHS of each collision row, exactly as scp.py:536-550.

    l[k,p] = R + (eta . dprev - dist) - eta . (p0_i - p0_j) - k*h * eta . (v0_i - v0_j)

    (the linearization term ``eta . dprev - dist`` is 0 for non-degenerate
    pairs and approx. -1 for degenerate ones; reproduced, not "fixed").
    Upper bounds are +inf.
    Returns (..., K, P).
    """
    dtype = eta.dtype
    dprev = pairwise_diffs(prev_positions, pairs)
    lin_term = jnp.sum(eta * dprev, axis=-1) - dist

    dp0 = p0[..., pairs.i_idx, :] - p0[..., pairs.j_idx, :]      # (..., P, 2)
    dv0 = v0[..., pairs.i_idx, :] - v0[..., pairs.j_idx, :]
    pos_contrib = jnp.sum(eta * dp0[..., None, :, :], axis=-1)   # (..., K, P)
    vel_contrib = jnp.sum(eta * dv0[..., None, :, :], axis=-1)
    K = eta.shape[-3]
    k_idx = jnp.arange(K, dtype=dtype).reshape((K, 1))
    return (min_distance + lin_term - pos_contrib - h * k_idx * vel_contrib)


def check_feasible(positions: jnp.ndarray, pairs: PairIndex,
                   min_distance: float,
                   axis_name: str | None = None) -> jnp.ndarray:
    """True iff all pairwise distances >= R - 0.01 at every timestep (scp.py:597-615).

    positions: (..., N, K, 2) -> bool of shape (...).  ``axis_name``:
    all-reduce over a pair-sharded mesh axis (pad pairs are ignored via
    ``pairs.valid``).
    """
    diff = pairwise_diffs(positions, pairs)
    dist2 = jnp.sum(diff * diff, axis=-1)
    if pairs.valid is not None:
        dist2 = jnp.where(pairs.valid, dist2, jnp.inf)
    thresh = min_distance - FEAS_SLACK
    ok = jnp.all(dist2 >= thresh * thresh, axis=(-2, -1))
    if axis_name is not None:
        ok = jax.lax.pmin(ok.astype(jnp.int32), axis_name) > 0
    return ok


def min_pairwise_distance(positions: jnp.ndarray, pairs: PairIndex,
                          axis_name: str | None = None) -> jnp.ndarray:
    """Minimum pairwise distance over all timesteps: (..., N, K, 2) -> (...)."""
    diff = pairwise_diffs(positions, pairs)
    dist2 = jnp.sum(diff * diff, axis=-1)
    if pairs.valid is not None:
        dist2 = jnp.where(pairs.valid, dist2, jnp.inf)
    out = jnp.min(dist2, axis=(-2, -1))
    if axis_name is not None:
        out = jax.lax.pmin(out, axis_name)
    return jnp.sqrt(out)
