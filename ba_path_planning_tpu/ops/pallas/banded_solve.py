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


# ---------------------------------------------------------------------------
# Streaming variant: factors stay in HBM, double-buffered per-k DMA
# ---------------------------------------------------------------------------
#
# The resident kernel above holds a scenario's whole factor set in VMEM,
# which caps the block size at roughly 6N <= ~150 (K = 50).  This variant
# keeps Linv/E in HBM and streams one (n, n) block per recurrence step with
# double buffering, so it works for any N at the cost of touching HBM twice
# per solve (forward + backward sweeps).

def _solve_streaming_batched(Linv, Eb, b):
    """Batched streaming solve: grid over scenarios, factors in HBM."""
    B, K, n, _ = Linv.shape
    return pl.pallas_call(
        _stream_kernel_nb,
        grid=(B,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((1, K, n), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, K, n), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, K, n), b.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, n, n), b.dtype),
            pltpu.VMEM((2, n, n), b.dtype),
            pltpu.VMEM((K, n), b.dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(Linv, Eb, b)


@jax.custom_batching.custom_vmap
def solve_factorized_streaming(Linv, Eb, b):
    """Single-scenario streaming banded solve (any block size).

    Linv (K, n, n), Eb (K-1, n, n), b (K, n) -> x (K, n).  Under ``vmap``
    a custom batching rule routes to the natively-batched grid (unblocked
    HBM refs cannot be auto-batched by the generic pallas rule).
    """
    return _solve_streaming_batched(Linv[None], Eb[None], b[None])[0]


@solve_factorized_streaming.def_vmap
def _streaming_vmap(axis_size, in_batched, Linv, Eb, b):
    assert all(in_batched), "all operands must be batched together"
    return _solve_streaming_batched(Linv, Eb, b), True


def _stream_kernel_nb(linv_hbm, eb_hbm, b_ref, x_ref, lbuf, ebuf, y_scr,
                      sems):
    """Streaming kernel, one scenario per grid step.

    linv_hbm (B, K, n, n) / eb_hbm (B, K-1, n, n): full arrays in HBM,
    indexed by the scenario grid position; b_ref/x_ref: (1, K, n) VMEM blocks.
    """
    K = b_ref.shape[1]
    i = pl.program_id(0)

    def mv(M, t):
        return jnp.sum(M * t[None, :], axis=1)

    def mv_t(M, t):
        return jnp.sum(M * t[:, None], axis=0)

    def l_dma(slot, k):
        return pltpu.make_async_copy(linv_hbm.at[i, k], lbuf.at[slot],
                                     sems.at[0, slot])

    def e_dma(slot, k):
        return pltpu.make_async_copy(eb_hbm.at[i, k], ebuf.at[slot],
                                     sems.at[1, slot])

    l_dma(0, 0).start()

    def fwd(k, _):
        slot = k % 2
        nxt = (k + 1) % 2

        @pl.when(k + 1 < K)
        def _():
            l_dma(nxt, k + 1).start()
            e_dma(nxt, k).start()

        l_dma(slot, k).wait()

        @pl.when(k == 0)
        def _():
            y_scr[0, :] = mv(lbuf[slot], b_ref[0, 0, :])

        @pl.when(k > 0)
        def _():
            e_dma(slot, k - 1).wait()
            t = b_ref[0, k, :] - mv(ebuf[slot], y_scr[k - 1, :])
            y_scr[k, :] = mv(lbuf[slot], t)
        return 0

    jax.lax.fori_loop(0, K, fwd, 0)

    l_dma((K - 1) % 2, K - 1).start()

    def bwd(i, _):
        k = K - 1 - i
        slot = k % 2
        nxt = (k - 1) % 2

        @pl.when(k > 0)
        def _():
            l_dma(nxt, k - 1).start()
            e_dma(nxt, k - 1).start()

        l_dma(slot, k).wait()

        @pl.when(k == K - 1)
        def _():
            x_ref[0, K - 1, :] = mv_t(lbuf[slot], y_scr[K - 1, :])

        @pl.when(k < K - 1)
        def _():
            e_dma(slot, k).wait()
            t = y_scr[k, :] - mv_t(ebuf[slot], x_ref[0, k + 1, :])
            x_ref[0, k, :] = mv_t(lbuf[slot], t)
        return 0

    jax.lax.fori_loop(0, K, bwd, 0)
