"""Horizon (K-axis) sharding: distributed prefix-sum rollout equivalence."""

import numpy as np
import jax
import jax.numpy as jnp

from ba_path_planning_tpu.ops import make_pair_index
from ba_path_planning_tpu.ops.rollout import rollout
from ba_path_planning_tpu.parallel.horizon_sharded import (
    check_feasible_ksharded, linearize_ksharded, make_horizon_mesh,
    rollout_ksharded)


def _mesh(n=8):
    return make_horizon_mesh(jax.devices()[:n])


def test_ksharded_rollout_matches_unsharded():
    rng = np.random.default_rng(0)
    N, K, h = 5, 64, 0.25
    a = jnp.asarray(rng.normal(size=(N, K, 2)), jnp.float64)
    p0 = jnp.asarray(rng.uniform(0, 20, (N, 2)), jnp.float64)
    v0 = jnp.asarray(rng.normal(size=(N, 2)), jnp.float64)

    pos_ref, vel_ref = rollout(a, p0, v0, h)
    pos_sh, vel_sh = rollout_ksharded(a, p0, v0, h, _mesh())
    np.testing.assert_allclose(np.asarray(pos_sh), np.asarray(pos_ref),
                               atol=1e-10)
    np.testing.assert_allclose(np.asarray(vel_sh), np.asarray(vel_ref),
                               atol=1e-10)
    # device placement: positions actually sharded over the horizon axis
    n_dev = len({s.device for s in pos_sh.addressable_shards})
    assert n_dev == 8, n_dev


def test_ksharded_rollout_long_horizon():
    """The point of the K axis: a horizon far past single-chunk sizes."""
    rng = np.random.default_rng(1)
    N, K, h = 2, 4096, 0.1
    a = jnp.asarray(rng.normal(size=(N, K, 2)) * 0.1, jnp.float64)
    p0 = jnp.asarray([[5.0, 5.0], [15.0, 15.0]], jnp.float64)
    v0 = jnp.zeros((N, 2), jnp.float64)
    pos_ref, _ = rollout(a, p0, v0, h)
    pos_sh, _ = rollout_ksharded(a, p0, v0, h, _mesh())
    np.testing.assert_allclose(np.asarray(pos_sh), np.asarray(pos_ref),
                               rtol=1e-12, atol=1e-8)


def test_ksharded_feasibility_and_linearize_match():
    rng = np.random.default_rng(2)
    N, K, h = 4, 32, 0.2
    pairs = make_pair_index(N, dtype=jnp.float64)
    a = jnp.asarray(rng.normal(size=(N, K, 2)) * 0.3, jnp.float64)
    p0 = jnp.asarray(rng.uniform(0, 20, (N, 2)), jnp.float64)
    v0 = jnp.zeros((N, 2), jnp.float64)
    pos, _ = rollout(a, p0, v0, h)

    from ba_path_planning_tpu.ops.collisions import check_feasible, linearize
    mesh = _mesh()
    for R in (0.5, 30.0):       # one feasible, one clearly infeasible
        ok_ref = bool(check_feasible(pos, pairs, R))
        ok_sh = bool(check_feasible_ksharded(pos, pairs, R, mesh))
        assert ok_sh == ok_ref, R

    key = jax.random.key(3)
    eta_ref, dist_ref = linearize(pos, pairs, key)
    eta_sh, dist_sh = linearize_ksharded(pos, pairs, key, mesh)
    # no degenerate pairs in this layout -> exact agreement (the degenerate
    # PRNG stream is local-k indexed; see linearize_ksharded docstring)
    np.testing.assert_allclose(np.asarray(eta_sh), np.asarray(eta_ref),
                               atol=1e-12)
    np.testing.assert_allclose(np.asarray(dist_sh), np.asarray(dist_ref),
                               atol=1e-12)
