"""Pallas TPU kernel: fused block-bidiagonal substitution sweeps.

The direct QP solver's x-update solves  M x = b  through the block-Cholesky
factors (``solvers/banded.py``): a forward sweep  y_k = Linv_k (b_k - E_k
y_{k-1})  and a backward sweep  x_k = Linv_k^T (y_k - E_{k+1}^T x_{k+1}).
As XLA scans these are 2K sequential steps of tiny ops — per-step loop
overhead dominates the runtime on TPU.

This kernel fuses BOTH sweeps into one ``pallas_call``: the grid iterates
over scenarios, each grid step DMAs the scenario's entire factor set
(Linv (K, n, n) + E (K-1, n, n), a few MB — fits VMEM) once, then runs the
K-step recurrences as in-kernel ``fori_loop`` matvecs on the VPU with zero
per-step dispatch cost.  The forward pass stashes y in a VMEM scratch for
the backward pass.

Matvecs are broadcast-multiply + lane reductions; n = 6N is padded to the
lane width by Mosaic automatically.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _solve_kernel(linv_ref, eb_ref, b_ref, x_ref, y_scr):
    """One scenario per grid step.

    linv_ref: (1, K, n, n)   eb_ref: (1, K-1, n, n)   b_ref/x_ref: (1, K, n)
    y_scr:    (K, n) VMEM scratch
    """
    K = b_ref.shape[1]

    def mv(M, t):
        # (n, n) @ (n,) on the VPU: broadcast along rows, reduce lanes
        return jnp.sum(M * t[None, :], axis=1)

    def mv_t(M, t):
        return jnp.sum(M * t[:, None], axis=0)

    # forward: y_k = Linv_k (b_k - E_k y_{k-1})
    y_scr[0, :] = mv(linv_ref[0, 0], b_ref[0, 0, :])

    def fwd(k, _):
        t = b_ref[0, k, :] - mv(eb_ref[0, k - 1], y_scr[k - 1, :])
        y_scr[k, :] = mv(linv_ref[0, k], t)
        return 0

    jax.lax.fori_loop(1, K, fwd, 0)

    # backward: x_k = Linv_k^T (y_k - E_{k+1}^T x_{k+1})
    x_ref[0, K - 1, :] = mv_t(linv_ref[0, K - 1], y_scr[K - 1, :])

    def bwd(i, _):
        k = K - 2 - i
        t = y_scr[k, :] - mv_t(eb_ref[0, k], x_ref[0, k + 1, :])
        x_ref[0, k, :] = mv_t(linv_ref[0, k], t)
        return 0

    jax.lax.fori_loop(0, K - 1, bwd, 0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def solve_factorized_pallas(Linv, Eb, b, *, interpret: bool = False):
    """Batched banded solve:  Linv (B, K, n, n), Eb (B, K-1, n, n),
    b (B, K, n)  ->  x (B, K, n).

    Equivalent to ``jax.vmap(banded.solve_factorized)`` (tested against it);
    one fused kernel instead of 2K scan steps.
    """
    B, K, n, _ = Linv.shape
    return pl.pallas_call(
        _solve_kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, K, n, n), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K - 1, n, n), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K, n), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, K, n), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, K, n), b.dtype),
        scratch_shapes=[pltpu.VMEM((K, n), b.dtype)],
        interpret=interpret,
    )(Linv, Eb, b)


@jax.jit
def solve_factorized_single(Linv, Eb, b):
    """Single-scenario variant: Linv (K, n, n), Eb (K-1, n, n), b (K, n).

    vmap adds the scenario grid dimension automatically, so this composes
    with the per-scenario solver under ``jax.vmap`` in the SCP engine.
    """
    K, n, _ = Linv.shape
    return pl.pallas_call(
        _solve_kernel_nb,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((K, n), b.dtype),
        scratch_shapes=[pltpu.VMEM((K, n), b.dtype)],
    )(Linv, Eb, b)


def _solve_kernel_nb(linv_ref, eb_ref, b_ref, x_ref, y_scr):
    """Unbatched kernel body: refs (K, n, n), (K-1, n, n), (K, n)."""
    K = b_ref.shape[0]

    def mv(M, t):
        return jnp.sum(M * t[None, :], axis=1)

    def mv_t(M, t):
        return jnp.sum(M * t[:, None], axis=0)

    y_scr[0, :] = mv(linv_ref[0], b_ref[0, :])

    def fwd(k, _):
        t = b_ref[k, :] - mv(eb_ref[k - 1], y_scr[k - 1, :])
        y_scr[k, :] = mv(linv_ref[k], t)
        return 0

    jax.lax.fori_loop(1, K, fwd, 0)

    x_ref[K - 1, :] = mv_t(linv_ref[K - 1], y_scr[K - 1, :])

    def bwd(i, _):
        k = K - 2 - i
        t = y_scr[k, :] - mv_t(eb_ref[k], x_ref[k + 1, :])
        x_ref[k, :] = mv_t(linv_ref[k], t)
        return 0

    jax.lax.fori_loop(0, K - 1, bwd, 0)
