"""Horizon (K-axis) parallelism: shard the timestep axis across devices.

SURVEY section 5's "sequence parallel" analogue: the workload's sequence
axis is the horizon K.  Every K-indexed operator in the planner is either
(a) a prefix sum (the dynamics rollout, ``ops/rollout.py``) or (b)
k-local (collision linearization, feasibility, bounds) — so a horizon
shard only ever needs its own block plus O(1) per-shard summaries of the
blocks before it.  This module implements the distributed forms with
``shard_map``:

* :func:`rollout_ksharded` — the double-cumsum rollout as a BLOCK prefix
  sum: local exclusive cumsums plus two tiny ``all_gather`` collectives of
  per-shard totals ((..., 2)-sized — bytes, not buffers), the classic
  scan decomposition (local scan -> exchange block sums -> offset).
* :func:`check_feasible_ksharded` / :func:`linearize_ksharded` — k-local
  work with a single AND/identity reduction.

Design decision (SURVEY section 6, "long-context"): the QP x-update's
block-tridiagonal recurrence is NOT K-sharded.  The Schur/substitution
recurrences are sequentially dependent in k; a device-parallel variant
(block cyclic reduction) costs ~2x the flops for log(K) depth and only
pays off when one horizon's factors exceed a chip's memory — at the
reference's horizons (K <= 500: factor set <= ~130 MB at N=20) a single
chip holds the whole recurrence, so the solver keeps K local and spends
the mesh on the scenario and pair axes instead.  Trajectory-evaluation
workloads (rollout + feasibility over very long horizons, e.g. replaying
a plan at fine resolution) ARE pure prefix-sum work and use this module.

Reference context: the reference's O(N K^2) Python rollout loops
(``scp.py:371-397, 559-595``) and the k-major collision loops
(``scp.py:488-552``).
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from .pair_sharded import _NOCHECK

K_AXIS = "horizon"


def make_horizon_mesh(devices=None, axis_name: str = K_AXIS) -> Mesh:
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def _block_prefix(a_local, axis_name):
    """Distributed exclusive prefix sum along a sharded K axis.

    a_local: this shard's (..., K_loc, 2) block.  Returns (s1, s2, A, U)
    where s1/s2 are the GLOBAL exclusive cumsum and its inclusive cumsum
    restricted to this shard, using two all_gathers of per-shard totals.
    """
    idx = jax.lax.axis_index(axis_name)
    K_loc = a_local.shape[-2]

    inc = jnp.cumsum(a_local, axis=-2)
    C = inc - a_local                               # local exclusive cumsum
    S_blk = jnp.sum(a_local, axis=-2)               # block total

    # gather per-shard block totals: (n_shards, ..., 2)
    S_all = jax.lax.all_gather(S_blk, axis_name)
    n_sh = S_all.shape[0]
    before = (jnp.arange(n_sh) < idx).reshape((n_sh,) + (1,) *
                                              (S_all.ndim - 1))
    A = jnp.sum(jnp.where(before, S_all, 0.0), axis=0)   # sum of blocks < s

    s1 = C + A[..., None, :]

    # per-shard totals of s1 for the second cumsum
    Csum_all = jax.lax.all_gather(jnp.sum(C, axis=-2), axis_name)
    # A_b for every shard b: exclusive cumsum of S_all along shard dim
    A_all = jnp.cumsum(S_all, axis=0) - S_all
    T_all = Csum_all + K_loc * A_all                # sum of s1 over block b
    U = jnp.sum(jnp.where(before, T_all, 0.0), axis=0)   # sum over blocks < s

    D = jnp.cumsum(C, axis=-2)                      # inclusive cumsum of C
    t1 = jnp.arange(1, K_loc + 1, dtype=a_local.dtype).reshape(K_loc, 1)
    s2 = U[..., None, :] + D + t1 * A[..., None, :]
    return s1, s2, idx


# The jitted shard_map callables are built ONCE per (mesh, axis_name, rank)
# and cached: jax.jit caches by function identity, so wrapping a fresh
# closure on every call would re-trace per invocation (ADVICE r4).  All
# value-like inputs (h, pairs, min_distance, key) are traced arguments, so
# one cache entry serves every call with the same mesh and array ranks.

@lru_cache(maxsize=None)
def _rollout_jit(mesh: Mesh, axis_name: str, nd: int):
    kspec = P(*([None] * (nd - 2) + [axis_name, None]))
    rep = P()

    def fn(a_loc, p0_, v0_, h):
        K_loc = a_loc.shape[-2]
        s1, s2, idx = _block_prefix(a_loc, axis_name)
        t = jnp.arange(K_loc, dtype=a_loc.dtype).reshape(K_loc, 1)
        k_glob = idx.astype(a_loc.dtype) * K_loc + t
        p0b = p0_[..., None, :]
        v0b = v0_[..., None, :]
        vel = v0b + h * s1
        pos = p0b + h * k_glob * v0b + (h * h) * (s2 - 0.5 * s1)
        return pos, vel

    return jax.jit(shard_map(fn, mesh=mesh, in_specs=(kspec, rep, rep, rep),
                             out_specs=(kspec, kspec), **_NOCHECK))


def rollout_ksharded(accelerations, p0, v0, h, mesh: Mesh,
                     axis_name: str = K_AXIS):
    """Dynamics rollout with the K axis sharded over ``mesh``.

    accelerations: (..., K, 2) with K divisible by the mesh size; p0/v0:
    (..., 2) replicated.  Returns (positions, velocities) sharded like the
    input — identical values to :func:`ops.rollout.rollout`.
    """
    K = accelerations.shape[-2]
    n_sh = mesh.devices.size
    if K % n_sh != 0:
        raise ValueError(f"K={K} not divisible by {n_sh} horizon shards")
    fn = _rollout_jit(mesh, axis_name, accelerations.ndim)
    return fn(accelerations, p0, v0,
              jnp.asarray(h, dtype=accelerations.dtype))


@lru_cache(maxsize=None)
def _feasible_jit(mesh: Mesh, axis_name: str, nd: int):
    from ..ops.collisions import check_feasible
    kspec = P(*([None] * (nd - 2) + [axis_name, None]))

    def fn(pos_loc, pairs_, md):
        ok = check_feasible(pos_loc, pairs_, md)
        return jnp.all(jax.lax.all_gather(ok, axis_name))

    return jax.jit(shard_map(fn, mesh=mesh, in_specs=(kspec, P(), P()),
                             out_specs=P(), **_NOCHECK))


def check_feasible_ksharded(positions, pairs, min_distance, mesh: Mesh,
                            axis_name: str = K_AXIS):
    """Pairwise feasibility over a K-sharded trajectory: k-local distance
    checks + one boolean AND reduction (scp.py:597-615 semantics)."""
    fn = _feasible_jit(mesh, axis_name, positions.ndim)
    return fn(positions, pairs,
              jnp.asarray(min_distance, dtype=positions.dtype))


def linearize_ksharded(positions, pairs, key, mesh: Mesh,
                       axis_name: str = K_AXIS):
    """Collision linearization on a K-sharded trajectory: eta/dist per
    (k, pair) are k-local (scp.py:497-509); output stays K-sharded.

    Caveat: the DEGENERATE-pair replacement directions (dist < 1e-6,
    scp.py:504-507) are drawn over the local k index, so for a degenerate
    pair the pseudo-random direction differs from the unsharded engine's
    at global k >= K/n_shards.  Non-degenerate pairs (everything in
    practice) agree exactly."""
    fn = _linearize_jit(mesh, axis_name, positions.ndim)
    return fn(positions, pairs, key)


@lru_cache(maxsize=None)
def _linearize_jit(mesh: Mesh, axis_name: str, nd: int):
    from ..ops.collisions import linearize
    kspec = P(*([None] * (nd - 2) + [axis_name, None]))
    eta_spec = P(axis_name, None, None)
    dist_spec = P(axis_name, None)

    def fn(pos_loc, pairs_, key_):
        return linearize(pos_loc, pairs_, key_)

    return jax.jit(shard_map(fn, mesh=mesh, in_specs=(kspec, P(), P()),
                             out_specs=(eta_spec, dist_spec), **_NOCHECK))
