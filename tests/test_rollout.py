"""Differential tests: prefix-sum rollout vs. the loop-based numpy oracle."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ba_path_planning_tpu.ops import (rollout, rollout_positions_zero_ic,
                                      rollout_positions_zero_ic_adjoint)
from oracles import reference_math as oracle


@pytest.mark.parametrize("N,K", [(1, 1), (2, 3), (3, 7), (5, 30)])
def test_rollout_matches_oracle(N, K):
    rng = np.random.default_rng(0)
    h = 0.1
    a = rng.normal(size=(N, K, 2))
    p0 = rng.normal(size=(N, 2))
    v0 = rng.normal(size=(N, 2))

    pos_o, vel_o = oracle.rollout(a, p0, v0, h)
    pos, vel = rollout(jnp.asarray(a), jnp.asarray(p0), jnp.asarray(v0), h)

    np.testing.assert_allclose(np.asarray(vel), vel_o, atol=1e-12)
    np.testing.assert_allclose(np.asarray(pos), pos_o, atol=1e-12)


def test_rollout_batched():
    rng = np.random.default_rng(1)
    B, N, K, h = 4, 3, 11, 0.2
    a = rng.normal(size=(B, N, K, 2))
    p0 = rng.normal(size=(B, N, 2))
    v0 = rng.normal(size=(B, N, 2))
    pos, vel = rollout(jnp.asarray(a), jnp.asarray(p0), jnp.asarray(v0), h)
    for b in range(B):
        pos_o, vel_o = oracle.rollout(a[b], p0[b], v0[b], h)
        np.testing.assert_allclose(np.asarray(pos[b]), pos_o, atol=1e-12)
        np.testing.assert_allclose(np.asarray(vel[b]), vel_o, atol=1e-12)


def test_zero_ic_rollout_is_dynamics_part():
    rng = np.random.default_rng(2)
    N, K, h = 3, 9, 0.15
    a = rng.normal(size=(N, K, 2))
    zeros = np.zeros((N, 2))
    pos_o, _ = oracle.rollout(a, zeros, zeros, h)
    ptilde = rollout_positions_zero_ic(jnp.asarray(a), h)
    np.testing.assert_allclose(np.asarray(ptilde), pos_o, atol=1e-12)


def test_zero_ic_adjoint_dot_product_identity():
    """<A a, g> == <a, A^T g> for the zero-IC position rollout operator."""
    rng = np.random.default_rng(3)
    N, K, h = 4, 13, 0.1
    a = jnp.asarray(rng.normal(size=(N, K, 2)))
    g = jnp.asarray(rng.normal(size=(N, K, 2)))
    lhs = jnp.vdot(rollout_positions_zero_ic(a, h), g)
    rhs = jnp.vdot(a, rollout_positions_zero_ic_adjoint(g, h))
    assert abs(float(lhs - rhs)) < 1e-10 * max(1.0, abs(float(lhs)))


def test_rollout_jit_and_vmap():
    rng = np.random.default_rng(4)
    B, N, K, h = 3, 2, 6, 0.1
    a = jnp.asarray(rng.normal(size=(B, N, K, 2)))
    p0 = jnp.asarray(rng.normal(size=(B, N, 2)))
    v0 = jnp.asarray(rng.normal(size=(B, N, 2)))
    f = jax.jit(lambda a, p, v: rollout(a, p, v, h))
    pos_direct, _ = f(a, p0, v0)
    pos_vmap, _ = jax.vmap(lambda a, p, v: rollout(a, p, v, h))(a, p0, v0)
    np.testing.assert_allclose(np.asarray(pos_direct), np.asarray(pos_vmap),
                               atol=1e-12)
