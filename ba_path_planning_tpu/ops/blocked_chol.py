"""Matmul-form Cholesky factorization + triangular inversion.

XLA's batched ``cholesky`` and ``triangular_solve`` on TPU run their
column-sequential algorithms ~25-50x slower than the equivalent matmul
volume (measured on v5e at the solver's shapes: 6400 x (120, 120) SPD
blocks — chol 0.72 ms/scenario-equiv, each trsm 0.53, the same-shape
batched matmul 0.03).  The banded solver factorizes a fresh normal matrix
every QP (``solvers/banded.py:factorize``), making those two primitives the
dominant fixed cost of a collision QP.

This module re-expresses both as recursive 2x2 block algorithms whose work
is almost entirely batched matmuls (MXU) plus an unrolled rank-1 Cholesky
on small (<= 16) diagonal blocks (VPU), and fuses the factor inversion into
the recursion:

    chol_inv(S) -> (L, L^{-1})        with S = L L^T

        [S11 S21^T]      L = [L11   0 ]     Linv = [ X11        0  ]
        [S21 S22  ]          [L21  L22]            [-X22 L21 X11  X22]

so a block-tridiagonal factorization needs NO triangular solves at all:
the sub-diagonal factors become E_k = B_k Linv_{k-1}^T (a matmul), and the
ADMM substitution sweeps already consume inverted factors.

All matmuls run at HIGHEST precision (true f32 on the MXU): the normal
matrices carry the equality-row rho boost (~1e3 conditioning), which bf16
passes would not survive.  Equivalence against XLA's cholesky is tested in
``tests/test_blocked_chol.py``.

Replaces (TPU-native) the per-iteration OSQP ``setup()`` factorization of
the reference (``/root/reference/src/path_planning/solvers/scp.py:442``).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

_HP = jax.lax.Precision.HIGHEST

# Diagonal blocks at or below this size use the unrolled rank-1 algorithm.
_BASE = 16


def _mm(a, b):
    return jnp.einsum('...ij,...jk->...ik', a, b, precision=_HP)


def _mm_nt(a, b):
    """a @ b^T."""
    return jnp.einsum('...ij,...kj->...ik', a, b, precision=_HP)


def _chol_unrolled(S: jnp.ndarray) -> jnp.ndarray:
    """Right-looking rank-1 Cholesky for small blocks, fully unrolled.

    S: (..., b, b) SPD with b <= _BASE.  Every step is elementwise VPU work
    on the whole batch; b static -> b unrolled steps, no scan.
    """
    b = S.shape[-1]
    cols = []
    for j in range(b):
        d = jnp.sqrt(S[..., j, j])
        col = S[..., :, j] / d[..., None]
        mask = jnp.asarray(np.arange(b) >= j, dtype=S.dtype)
        col = col * mask
        cols.append(col)
        S = S - col[..., :, None] * col[..., None, :]
    return jnp.stack(cols, axis=-1)


def tri_inv(L: jnp.ndarray) -> jnp.ndarray:
    """Inverse of a lower-triangular matrix via the recursive block formula.

    inv([[A, 0], [B, C]]) = [[inv(A), 0], [-inv(C) B inv(A), inv(C)]]

    All work is matmuls of geometrically shrinking blocks (total ~n^3/3
    flops); recursion is static in the trace.
    """
    n = L.shape[-1]
    if n == 1:
        return 1.0 / L
    m = n // 2
    X11 = tri_inv(L[..., :m, :m])
    X22 = tri_inv(L[..., m:, m:])
    X21 = -_mm(X22, _mm(L[..., m:, :m], X11))
    top = jnp.concatenate(
        [X11, jnp.zeros(L.shape[:-2] + (m, n - m), L.dtype)], axis=-1)
    bot = jnp.concatenate([X21, X22], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def chol_inv(S: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Cholesky factor and its inverse, fused: S = L L^T, returns (L, L^{-1}).

    Recursive 2x2 blocking; leaves use the unrolled rank-1 factorization and
    the recursive triangular inverse.  S: (..., n, n) SPD.
    """
    n = S.shape[-1]
    if n <= _BASE:
        L = _chol_unrolled(S)
        return L, tri_inv(L)
    m = n // 2
    L11, X11 = chol_inv(S[..., :m, :m])
    L21 = _mm_nt(S[..., m:, :m], X11)
    S22 = S[..., m:, m:] - _mm_nt(L21, L21)
    L22, X22 = chol_inv(S22)
    X21 = -_mm(X22, _mm(L21, X11))
    zt = jnp.zeros(S.shape[:-2] + (m, n - m), S.dtype)
    L = jnp.concatenate([
        jnp.concatenate([L11, zt], axis=-1),
        jnp.concatenate([L21, L22], axis=-1)], axis=-2)
    Linv = jnp.concatenate([
        jnp.concatenate([X11, zt], axis=-1),
        jnp.concatenate([X21, X22], axis=-1)], axis=-2)
    return L, Linv


def chol_inverse_factor(S: jnp.ndarray) -> jnp.ndarray:
    """Just L^{-1} from SPD S (the factor the substitution sweeps consume)."""
    return chol_inv(S)[1]
