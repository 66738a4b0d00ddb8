"""Learned collision predictor — the reference's intended ML model family.

The reference declares a ``train-network = path_planning.viz.
train_collision_network:main`` console script and ``ml``/``torch`` extras
(``/root/reference/pyproject.toml:36-43, 57``) but the module was never
committed.  This is the TPU-native realization of that intent: a
permutation-invariant pair-set network that predicts, from a scenario's
boundary conditions alone, whether the collision-free initial QP trajectory
already satisfies the pairwise safety distance — the exact gate the solver
computes at ``scp.py:144`` (``_fast_check_avoidance_constraints``) to skip
SCP iterations.

Why it's useful here: the compacting batch driver pays one full phase-1
dispatch to discover which scenarios need collision iterations; a
well-calibrated predictor lets a scheduler pre-sort scenarios (routing
likely-hard ones into dedicated chunks) without running them first.

Architecture (flax): per-pair features of both vehicles' boundary states
(symmetrized so the network is invariant to vehicle order within a pair and
to pair order), a shared MLP encoder, smooth-min pooling over pairs —
collision risk is governed by the worst pair — and a logistic head.
Training runs entirely on device: scenario generation, labeling (the real
phase-1 solve), and optax updates inside one jitted step.
"""

from __future__ import annotations

from functools import partial
from typing import Sequence

import numpy as np
import jax
import jax.numpy as jnp

try:
    import flax.linen as nn
    import optax
    _HAVE_FLAX = True
except Exception:                                    # pragma: no cover
    _HAVE_FLAX = False

from ..ops.collisions import make_pair_index


def pair_features(p0, pf, pairs=None):
    """Per-pair symmetric features from boundary conditions.

    p0, pf: (N, 2) initial/final positions -> (P, F) with P = N(N-1)/2.
    Features are symmetric in the pair's vehicle order: sums/absolute
    differences of the endpoints plus the straight-line closest-approach
    distance (the geometric prior; the network learns the QP's deviation
    from it — boundary velocities are zero so paths bow toward rest).
    """
    N = p0.shape[0]
    if pairs is None:
        pairs = make_pair_index(N, dtype=p0.dtype)
    i, j = pairs.i_idx, pairs.j_idx
    a0, b0 = p0[i], p0[j]
    af, bf = pf[i], pf[j]

    d0 = a0 - b0                                   # (P, 2) relative start
    df = af - bf                                   # (P, 2) relative end
    # closest approach of the relative straight line d(t) = d0 + t (df - d0)
    dd = df - d0
    denom = jnp.sum(dd * dd, axis=-1)
    t = jnp.where(denom > 1e-12,
                  -jnp.sum(d0 * dd, axis=-1) / jnp.maximum(denom, 1e-12),
                  0.0)
    t = jnp.clip(t, 0.0, 1.0)
    dmin = jnp.linalg.norm(d0 + t[:, None] * dd, axis=-1)

    feats = jnp.concatenate([
        jnp.abs(d0), jnp.abs(df),
        jnp.linalg.norm(d0, axis=-1, keepdims=True),
        jnp.linalg.norm(df, axis=-1, keepdims=True),
        dmin[:, None], t[:, None],
        (a0 + b0) / 2.0, (af + bf) / 2.0,
    ], axis=-1)
    return feats


N_PAIR_FEATURES = 12


if _HAVE_FLAX:

    class CollisionNet(nn.Module):
        """Pair-set encoder + smooth-min pooling + logistic head.

        Predicts the log-odds that the scenario's initial QP trajectory is
        collision-FREE (label 1 = feasible, skip SCP iterations).
        """
        hidden: Sequence[int] = (64, 64)
        pool_temp: float = 4.0

        @nn.compact
        def __call__(self, feats):                 # feats: (..., P, F)
            x = feats
            for h in self.hidden:
                x = nn.silu(nn.Dense(h)(x))
            s = nn.Dense(1)(x)[..., 0]             # per-pair safety score
            # smooth-min over pairs: one risky pair makes the scenario risky
            pooled = -(1.0 / self.pool_temp) * jax.nn.logsumexp(
                -self.pool_temp * s, axis=-1)
            return nn.Dense(1)(pooled[..., None])[..., 0]


def make_train_state(key, n_vehicles: int, hidden=(64, 64),
                     learning_rate: float = 3e-3):
    """Initialize (params, opt_state, apply_fn, tx) for training."""
    if not _HAVE_FLAX:                              # pragma: no cover
        raise ImportError("flax/optax are required for CollisionNet")
    net = CollisionNet(hidden=tuple(hidden))
    P = n_vehicles * (n_vehicles - 1) // 2
    params = net.init(key, jnp.zeros((1, P, N_PAIR_FEATURES)))
    tx = optax.adamw(learning_rate)
    return params, tx.init(params), net.apply, tx


@partial(jax.jit, static_argnames=("apply_fn",))
def predict_logits(params, p0_batch, pf_batch, *, apply_fn):
    """(B, N, 2) boundary positions -> (B,) feasibility log-odds."""
    feats = jax.vmap(pair_features)(p0_batch, pf_batch)
    return apply_fn(params, feats)


def make_train_step(apply_fn, tx):
    """One jitted optimization step on a labeled scenario batch."""

    @jax.jit
    def train_step(params, opt_state, p0, pf, labels):
        feats = jax.vmap(pair_features)(p0, pf)

        def loss_fn(p):
            logits = apply_fn(p, feats)
            loss = optax.sigmoid_binary_cross_entropy(logits, labels)
            return jnp.mean(loss), logits

        (loss, logits), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        acc = jnp.mean((logits > 0) == (labels > 0.5))
        return params, opt_state, loss, acc

    return train_step


def save_params(path: str, params) -> None:
    """Persist flax params as a flat npz (no orbax dependency needed)."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    arrays = {jax.tree_util.keystr(k): np.asarray(v) for k, v in flat}
    np.savez(path, **arrays)


def load_params(path: str, template):
    """Load params saved by :func:`save_params` into ``template``'s tree."""
    data = np.load(path)
    flat, treedef = jax.tree_util.tree_flatten_with_path(template)
    leaves = [jnp.asarray(data[jax.tree_util.keystr(k)]) for k, _ in flat]
    return jax.tree_util.tree_unflatten(treedef, leaves)
