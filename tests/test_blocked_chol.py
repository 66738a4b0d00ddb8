"""Matmul-form Cholesky/inversion vs XLA linalg primitives."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ba_path_planning_tpu.ops.blocked_chol import chol_inv, tri_inv
from ba_path_planning_tpu.solvers.banded import factorize_matmul, factorize_xla


def _spd(key, b, n, scale=1.0):
    A = jax.random.normal(key, (b, n, n), jnp.float32)
    return (jnp.einsum('bij,bkj->bik', A, A) / n
            + scale * jnp.eye(n, dtype=jnp.float32))


@pytest.mark.parametrize("n", [1, 3, 7, 16, 24, 60,
    pytest.param(120, marks=pytest.mark.slow)])
def test_chol_inv_matches_xla(n):
    S = _spd(jax.random.PRNGKey(n), 4, n)
    L, Linv = jax.jit(chol_inv)(S)
    L_ref = jax.lax.linalg.cholesky(S)
    np.testing.assert_allclose(np.asarray(L), np.asarray(L_ref),
                               rtol=2e-4, atol=2e-5)
    eye = np.eye(n, dtype=np.float32)
    np.testing.assert_allclose(
        np.asarray(jnp.einsum('bij,bjk->bik', L, Linv)),
        np.broadcast_to(eye, (4, n, n)), atol=5e-4)


@pytest.mark.parametrize("n", [2, 5, 16, 40])
def test_tri_inv(n):
    key = jax.random.PRNGKey(n + 100)
    L = jnp.tril(jax.random.normal(key, (3, n, n), jnp.float32))
    L = L + 3.0 * jnp.eye(n)
    X = jax.jit(tri_inv)(L)
    eye = np.eye(n, dtype=np.float32)
    np.testing.assert_allclose(np.asarray(jnp.einsum('bij,bjk->bik', L, X)),
                               np.broadcast_to(eye, (3, n, n)), atol=1e-4)


def test_chol_inv_ill_conditioned():
    """Survives the equality-rho conditioning (~1e3 rho scale) of the
    solver's normal matrices."""
    n = 48
    key = jax.random.PRNGKey(7)
    Q = jnp.linalg.qr(jax.random.normal(key, (n, n), jnp.float32))[0]
    eigs = jnp.logspace(0, 4, n, dtype=jnp.float32)   # cond 1e4
    S = (Q * eigs) @ Q.T
    S = 0.5 * (S + S.T)
    L, Linv = chol_inv(S[None])
    resid = np.asarray(jnp.einsum('bij,bkj->bik', L, L) - S[None])
    assert np.max(np.abs(resid)) / 1e4 < 1e-5
    eye = np.eye(n, dtype=np.float32)
    err = np.asarray(jnp.einsum('bij,bjk->bik', L, Linv)) - eye
    assert np.max(np.abs(err)) < 2e-3


@pytest.mark.slow
def test_factorize_matmul_matches_xla():
    """Full block-tridiagonal factorization equivalence at solver-like
    shapes (K=6 blocks of n=36)."""
    K, n = 6, 36
    key = jax.random.PRNGKey(3)
    D = _spd(key, K, n, scale=5.0)
    Bm = 0.1 * jax.random.normal(jax.random.PRNGKey(4), (K - 1, n, n),
                                 jnp.float32)
    Linv_a, E_a = jax.jit(factorize_matmul)(D, Bm)
    Linv_b, E_b = jax.jit(factorize_xla)(D, Bm)
    np.testing.assert_allclose(np.asarray(Linv_a), np.asarray(Linv_b),
                               rtol=5e-3, atol=5e-4)
    np.testing.assert_allclose(np.asarray(E_a), np.asarray(E_b),
                               rtol=5e-3, atol=5e-4)
