"""Pallas TPU kernel: scenario-GROUPED streaming banded substitution sweeps.

The per-scenario resident kernel (``banded_solve.solve_factorized_pallas``)
runs each scenario's 2K-step substitution recurrence serially on the VPU;
with the whole batch serialized over grid steps, per-step instruction/reduce
latency (~170 ns per (6N)^2 matvec at N=20) dominates — the solve sits ~5x
above the HBM-bandwidth floor.

This kernel processes G scenarios per grid step: every serial recurrence
step does a G-way batched matvec (one (G, np, np) * (G, 1, np) VPU
multiply-reduce), amortizing the per-step issue cost G-fold, while each
scenario's per-step factor block streams from HBM with double-buffered DMA
(G copies in flight per buffer slot).  The recurrence becomes DMA-bound,
i.e. runs near the HBM floor.

Alignment: Mosaic requires DMA slices of HBM-tiled memrefs to be
128-aligned on the lane (minor) dimension, so factors must be zero-padded
to (np, np) with np = ceil(n/128)*128 BEFORE the call (see
:func:`pad_factors`) — done once per factorization, not per iteration.
The padded rows/cols are zero, so sweep values in the pad lanes stay 0.
This padding is also what the plain streaming kernel in ``banded_solve.py``
was missing — it never compiled on hardware for n % 128 != 0.

Reference context: accelerates the x-update linear solve replacing OSQP's
factorization cache (``/root/reference/src/path_planning/solvers/scp.py:
441-447``) for the batched state-space QP.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def pad_factors(Linv, Eb=None):
    """Zero-pad factor blocks (..., n, n) to the TPU lane width
    (..., np, np), np = ceil(n/128)*128.  Call once per factorization.
    With ``Eb=None`` pads and returns only ``Linv``."""
    n = Linv.shape[-1]
    np_ = _round_up(n, 128)
    if np_ == n:
        return Linv if Eb is None else (Linv, Eb)
    pad = [(0, 0)] * (Linv.ndim - 2) + [(0, np_ - n), (0, np_ - n)]
    if Eb is None:
        return jnp.pad(Linv, pad)
    return jnp.pad(Linv, pad), jnp.pad(Eb, pad)


def _group_kernel(linv_hbm, eb_hbm, b_ref, x_ref, lbuf, ebuf, y_scr,
                  sems):
    """One scenario-group per grid step.

    linv_hbm (B, K, np, np) / eb_hbm (B, K-1, np, np): HBM, streamed one
    (np, np) step-block per scenario with double buffering (G copies in
    flight).  b_ref / x_ref: (G, K, np) VMEM blocks.  y_scr: (K, G, np).
    """
    G, K = b_ref.shape[0], b_ref.shape[1]
    i = pl.program_id(0)

    def mv(M, t):
        # y_g = M_g t_g: (G, np, np) x (G, np) -> (G, np) on the VPU
        return jnp.sum(M * t[:, None, :], axis=2)

    def mv_t(M, t):
        return jnp.sum(M * t[:, :, None], axis=1)

    def l_dma(slot, k):
        return [pltpu.make_async_copy(linv_hbm.at[i * G + g, k],
                                      lbuf.at[slot, g], sems.at[0, slot, g])
                for g in range(G)]

    def e_dma(slot, k):
        return [pltpu.make_async_copy(eb_hbm.at[i * G + g, k],
                                      ebuf.at[slot, g], sems.at[1, slot, g])
                for g in range(G)]

    def start(dmas):
        for d in dmas:
            d.start()

    def wait(dmas):
        for d in dmas:
            d.wait()

    # forward: y_k = Linv_k (b_k - E_k y_{k-1})
    start(l_dma(0, 0))

    def fwd(k, _):
        slot = k % 2
        nxt = (k + 1) % 2

        @pl.when(k + 1 < K)
        def _():
            start(l_dma(nxt, k + 1))
            start(e_dma(nxt, k))

        wait(l_dma(slot, k))

        @pl.when(k == 0)
        def _():
            y_scr[0] = mv(lbuf[slot], b_ref[:, 0])

        @pl.when(k > 0)
        def _():
            wait(e_dma(slot, k - 1))
            t = b_ref[:, k] - mv(ebuf[slot], y_scr[k - 1])
            y_scr[k] = mv(lbuf[slot], t)
        return 0

    jax.lax.fori_loop(0, K, fwd, 0)

    # backward: x_k = Linv_k^T (y_k - E_{k+1}^T x_{k+1})
    start(l_dma((K - 1) % 2, K - 1))

    def bwd(j, _):
        k = K - 1 - j
        slot = k % 2
        nxt = (k - 1) % 2

        @pl.when(k > 0)
        def _():
            start(l_dma(nxt, k - 1))
            start(e_dma(nxt, k - 1))

        wait(l_dma(slot, k))

        @pl.when(k == K - 1)
        def _():
            x_ref[:, K - 1] = mv_t(lbuf[slot], y_scr[K - 1])

        @pl.when(k < K - 1)
        def _():
            wait(e_dma(slot, k))
            t = y_scr[k] - mv_t(ebuf[slot], x_ref[:, k + 1])
            x_ref[:, k] = mv_t(lbuf[slot], t)
        return 0

    jax.lax.fori_loop(0, K, bwd, 0)


def _auto_interpret() -> bool:
    return jax.default_backend() in ("cpu",)


@functools.partial(jax.jit, static_argnames=("group", "interpret"))
def solve_factorized_grouped(Lp, Ep, b, *, group: int = 8,
                             interpret: bool | None = None):
    """Batched banded solve, G scenarios per serial recurrence step.

    Lp (B, K, np, np), Ep (B, K-1, np, np): lane-PADDED factors (see
    :func:`pad_factors`); b (B, K, n) -> x (B, K, n), n <= np.
    Equivalent to ``jax.vmap(banded.solve_factorized)`` on the unpadded
    factors.  B is padded up to a multiple of ``group`` internally.
    """
    B, K, np_, _ = Lp.shape
    n = b.shape[-1]
    if interpret is None:
        interpret = _auto_interpret()
    G = min(group, B)
    Bp = _round_up(B, G)
    fdt = Lp.dtype

    if Bp > B:
        # identity pad systems keep the sweeps well-defined
        eye = jnp.broadcast_to(jnp.eye(np_, dtype=fdt),
                               (Bp - B, K, np_, np_))
        Lp = jnp.concatenate([Lp, eye], axis=0)
        Ep = jnp.concatenate(
            [Ep, jnp.zeros((Bp - B, K - 1, np_, np_), fdt)], axis=0)
        b = jnp.concatenate([b, jnp.zeros((Bp - B, K, n), b.dtype)], axis=0)
    bp = jnp.pad(b, [(0, 0), (0, 0), (0, np_ - n)]) if np_ > n else b

    NG = Bp // G
    xg = pl.pallas_call(
        _group_kernel,
        grid=(NG,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec((G, K, np_), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((G, K, np_), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bp, K, np_), b.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, G, np_, np_), fdt),
            pltpu.VMEM((2, G, np_, np_), fdt),
            pltpu.VMEM((K, G, np_), b.dtype),
            pltpu.SemaphoreType.DMA((2, 2, G)),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=bool(interpret),
    )(Lp, Ep, bp)
    return xg[:B, :, :n]


# ---------------------------------------------------------------------------
# Per-scenario wrapper (custom vmap: the SCP engine is written per-scenario)
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def grouped_solver(group: int):
    """Per-scenario solve on PADDED factors whose vmap rule dispatches the
    G-way grouped kernel.  Single-scenario calls fall back to the XLA scan
    sweeps on the unpadded blocks."""

    @jax.custom_batching.custom_vmap
    def solve(Lp, Ep, b):
        from ...solvers.banded import solve_factorized
        n = b.shape[-1]
        return solve_factorized(Lp[..., :n, :n], Ep[..., :n, :n], b)

    @solve.def_vmap
    def _rule(axis_size, in_batched, Lp, Ep, b):
        assert all(in_batched), "factors and rhs must be batched together"
        return solve_factorized_grouped(Lp, Ep, b, group=group), True

    return solve


# ---------------------------------------------------------------------------
# L-only variant: stream HALF the factor bytes per iteration
# ---------------------------------------------------------------------------
#
# The (Linv, Eb) sweeps stream two dense block sets; but the normal matrix's
# off-diagonals are slot-scalar (B_k = C_k (x) I_2N, 6 scalars per step —
# ``banded.b_slot_mats``), so the solve can be rewritten around
# w_k = Linv_k^T y_k with E-applies replaced by free slot recombinations
# (``banded.solve_factorized_L``).  Only Linv streams: the DMA-bound solve
# gets 2x cheaper.

def _make_group_kernel_L(n: int, G: int, kmajor: bool = False):
    n2 = n // 3

    def kernel(linv_hbm, c_ref, b_ref, x_ref, lbuf, w_scr, sems):
        """linv_hbm HBM factor blocks — (B, K, np, np), or (K, B, np, np)
        when ``kmajor`` (one contiguous (G, np, np) DMA per recurrence step
        instead of G strided per-scenario copies); c_ref (K-1, 9) SMEM slot
        scalars (row-major 3x3); b_ref/x_ref (G, K, np) VMEM; w_scr
        (G, K, np)."""
        K = b_ref.shape[1]
        np_ = b_ref.shape[2]
        i = pl.program_id(0)
        dtype = b_ref.dtype

        def mv(M, t):
            return jnp.sum(M * t[:, None, :], axis=2)

        def mv_t(M, t):
            return jnp.sum(M * t[:, :, None], axis=1)

        def pad_cat(ra, rp, rv):
            parts = [ra, rp, rv]
            if np_ > n:
                parts.append(jnp.zeros((G, np_ - n), dtype))
            return jnp.concatenate(parts, axis=-1)

        def b_apply(k, w):
            # B_k w (C row k-1); C upper-triangular: indices 3, 6, 7 are 0
            wa, wp, wv = w[:, 0:n2], w[:, n2:2 * n2], w[:, 2 * n2:n]
            c = lambda j: c_ref[k - 1, j]
            ra = c(0) * wa + c(1) * wp + c(2) * wv
            rp = c(4) * wp + c(5) * wv
            rv = c(8) * wv
            return pad_cat(ra, rp, rv)

        def b_apply_t(k, x):
            # B_k^T x (C row k-1)
            xa, xp, xv = x[:, 0:n2], x[:, n2:2 * n2], x[:, 2 * n2:n]
            c = lambda j: c_ref[k - 1, j]
            ra = c(0) * xa
            rp = c(1) * xa + c(4) * xp
            rv = c(2) * xa + c(5) * xp + c(8) * xv
            return pad_cat(ra, rp, rv)

        if kmajor:
            def l_dma(slot, k):
                return [pltpu.make_async_copy(
                    linv_hbm.at[k, pl.ds(i * G, G)], lbuf.at[slot],
                    sems.at[slot, 0])]
        else:
            def l_dma(slot, k):
                return [pltpu.make_async_copy(linv_hbm.at[i * G + g, k],
                                              lbuf.at[slot, g],
                                              sems.at[slot, g])
                        for g in range(G)]

        def start(dmas):
            for d in dmas:
                d.start()

        def wait(dmas):
            for d in dmas:
                d.wait()

        # forward: y_k = Linv_k (b_k - B_k w_{k-1}),  w_k = Linv_k^T y_k
        start(l_dma(0, 0))

        def fwd(k, _):
            slot = k % 2
            nxt = (k + 1) % 2

            @pl.when(k + 1 < K)
            def _():
                start(l_dma(nxt, k + 1))

            wait(l_dma(slot, k))

            @pl.when(k == 0)
            def _():
                y = mv(lbuf[slot], b_ref[:, 0])
                w_scr[:, 0] = mv_t(lbuf[slot], y)

            @pl.when(k > 0)
            def _():
                t = b_ref[:, k] - b_apply(k, w_scr[:, k - 1])
                y = mv(lbuf[slot], t)
                w_scr[:, k] = mv_t(lbuf[slot], y)
            return 0

        jax.lax.fori_loop(0, K, fwd, 0)

        # backward: x_{K-1} = w_{K-1};
        #           x_k = w_k - Linv_k^T (Linv_k (B_{k+1}^T x_{k+1}))
        x_ref[:, K - 1] = w_scr[:, K - 1]
        start(l_dma((K - 2) % 2, K - 2))

        def bwd(j, _):
            k = K - 2 - j
            slot = k % 2
            nxt = (k - 1) % 2

            @pl.when(k > 0)
            def _():
                start(l_dma(nxt, k - 1))

            wait(l_dma(slot, k))
            v = b_apply_t(k + 1, x_ref[:, k + 1])
            u = mv(lbuf[slot], v)
            x_ref[:, k] = w_scr[:, k] - mv_t(lbuf[slot], u)
            return 0

        jax.lax.fori_loop(0, K - 1, bwd, 0)

    return kernel


@functools.partial(jax.jit, static_argnames=("group", "interpret", "kmajor"))
def solve_factorized_grouped_L(Lp, C, b, *, group: int = 8,
                               interpret: bool | None = None,
                               kmajor: bool = True):
    """Batched L-only banded solve, G scenarios per serial recurrence step.

    Lp (B, K, np, np): lane-PADDED inverted diagonal factors
    (``banded.factorize_L`` + :func:`pad_factors`); C (K-1, 3, 3) shared
    slot scalars; b (B, K, n) -> x (B, K, n).

    ``kmajor``: transpose the factors to (K, B, np, np) once so every
    recurrence step issues ONE contiguous (G, np, np) DMA instead of G
    strided 64 KB copies (the transpose costs one extra pass over the
    factor bytes, amortized over the ~2*iters streaming passes).
    """
    B, K, np_, _ = Lp.shape
    n = b.shape[-1]
    if interpret is None:
        interpret = _auto_interpret()
    G = min(group, B)
    Bp = _round_up(B, G)
    fdt = Lp.dtype

    if Bp > B:
        eye = jnp.broadcast_to(jnp.eye(np_, dtype=fdt),
                               (Bp - B, K, np_, np_))
        Lp = jnp.concatenate([Lp, eye], axis=0)
        b = jnp.concatenate([b, jnp.zeros((Bp - B, K, n), b.dtype)], axis=0)
    bp = jnp.pad(b, [(0, 0), (0, 0), (0, np_ - n)]) if np_ > n else b
    c_flat = C.reshape(K - 1, 9).astype(b.dtype)
    if kmajor:
        Lp = jnp.swapaxes(Lp, 0, 1)

    NG = Bp // G
    xg = pl.pallas_call(
        _make_group_kernel_L(n, G, kmajor=kmajor),
        grid=(NG,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((G, K, np_), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((G, K, np_), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bp, K, np_), b.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, G, np_, np_), fdt),
            pltpu.VMEM((G, K, np_), b.dtype),
            pltpu.SemaphoreType.DMA((2, G)),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=bool(interpret),
    )(Lp, c_flat, bp)
    return xg[:B, :, :n]


# ---------------------------------------------------------------------------
# X-form variant: symmetric block inverses, ONE matvec per step per sweep
# ---------------------------------------------------------------------------
#
# The L-form sweeps apply Linv_k and Linv_k^T in pairs, i.e. they only ever
# use X_k = S_k^{-1} (``banded.factorize_X``).  Streaming X_k directly keeps
# the DMA volume identical but halves the VPU multiply-reduce work, and the
# factorization producing X is itself far cheaper (Newton-Schulz warm
# starts) — see banded.py.

def _make_group_kernel_X(n: int, G: int, kmajor: bool = True):
    n2 = n // 3

    def kernel(x_hbm, c_ref, b_ref, x_ref, xbuf, w_scr, sems):
        """x_hbm HBM symmetric-inverse blocks — (K, B, np, np) when
        ``kmajor`` else (B, K, np, np); c_ref (K-1, 9) SMEM slot scalars;
        b_ref/x_ref (G, K, np) VMEM; w_scr (G, K, np)."""
        K = b_ref.shape[1]
        np_ = b_ref.shape[2]
        i = pl.program_id(0)
        dtype = b_ref.dtype

        def mv(M, t):
            return jnp.sum(M * t[:, None, :], axis=2)

        def pad_cat(ra, rp, rv):
            parts = [ra, rp, rv]
            if np_ > n:
                parts.append(jnp.zeros((G, np_ - n), dtype))
            return jnp.concatenate(parts, axis=-1)

        def b_apply(k, w):
            wa, wp, wv = w[:, 0:n2], w[:, n2:2 * n2], w[:, 2 * n2:n]
            c = lambda j: c_ref[k - 1, j]
            ra = c(0) * wa + c(1) * wp + c(2) * wv
            rp = c(4) * wp + c(5) * wv
            rv = c(8) * wv
            return pad_cat(ra, rp, rv)

        def b_apply_t(k, x):
            xa, xp, xv = x[:, 0:n2], x[:, n2:2 * n2], x[:, 2 * n2:n]
            c = lambda j: c_ref[k - 1, j]
            ra = c(0) * xa
            rp = c(1) * xa + c(4) * xp
            rv = c(2) * xa + c(5) * xp + c(8) * xv
            return pad_cat(ra, rp, rv)

        if kmajor:
            def x_dma(slot, k):
                return [pltpu.make_async_copy(
                    x_hbm.at[k, pl.ds(i * G, G)], xbuf.at[slot],
                    sems.at[slot, 0])]
        else:
            def x_dma(slot, k):
                return [pltpu.make_async_copy(x_hbm.at[i * G + g, k],
                                              xbuf.at[slot, g],
                                              sems.at[slot, g])
                        for g in range(G)]

        def start(dmas):
            for d in dmas:
                d.start()

        def wait(dmas):
            for d in dmas:
                d.wait()

        # forward: w_k = X_k (b_k - B_k w_{k-1})
        start(x_dma(0, 0))

        def fwd(k, _):
            slot = k % 2
            nxt = (k + 1) % 2

            @pl.when(k + 1 < K)
            def _():
                start(x_dma(nxt, k + 1))

            wait(x_dma(slot, k))

            @pl.when(k == 0)
            def _():
                w_scr[:, 0] = mv(xbuf[slot], b_ref[:, 0])

            @pl.when(k > 0)
            def _():
                w_scr[:, k] = mv(xbuf[slot],
                                 b_ref[:, k] - b_apply(k, w_scr[:, k - 1]))
            return 0

        jax.lax.fori_loop(0, K, fwd, 0)

        # backward: x_{K-1} = w_{K-1};  x_k = w_k - X_k (B_{k+1}^T x_{k+1})
        x_ref[:, K - 1] = w_scr[:, K - 1]
        start(x_dma((K - 2) % 2, K - 2))

        def bwd(j, _):
            k = K - 2 - j
            slot = k % 2
            nxt = (k - 1) % 2

            @pl.when(k > 0)
            def _():
                start(x_dma(nxt, k - 1))

            wait(x_dma(slot, k))
            x_ref[:, k] = w_scr[:, k] - mv(xbuf[slot],
                                           b_apply_t(k + 1, x_ref[:, k + 1]))
            return 0

        jax.lax.fori_loop(0, K - 1, bwd, 0)

    return kernel


@functools.partial(jax.jit, static_argnames=("group", "interpret", "kmajor"))
def solve_factorized_grouped_X(Xp, C, b, *, group: int = 8,
                               interpret: bool | None = None,
                               kmajor: bool = True):
    """Batched X-form banded solve, G scenarios per serial recurrence step.

    Xp (B, K, np, np): lane-PADDED symmetric inverse blocks
    (``banded.factorize_X`` + :func:`pad_factors`); C (K-1, 3, 3) shared
    slot scalars; b (B, K, n) -> x (B, K, n).
    """
    B, K, np_, _ = Xp.shape
    n = b.shape[-1]
    if interpret is None:
        interpret = _auto_interpret()
    G = min(group, B)
    Bp = _round_up(B, G)
    fdt = Xp.dtype

    if Bp > B:
        eye = jnp.broadcast_to(jnp.eye(np_, dtype=fdt),
                               (Bp - B, K, np_, np_))
        Xp = jnp.concatenate([Xp, eye], axis=0)
        b = jnp.concatenate([b, jnp.zeros((Bp - B, K, n), b.dtype)], axis=0)
    bp = jnp.pad(b, [(0, 0), (0, 0), (0, np_ - n)]) if np_ > n else b
    c_flat = C.reshape(K - 1, 9).astype(b.dtype)
    if kmajor:
        Xp = jnp.swapaxes(Xp, 0, 1)

    NG = Bp // G
    xg = pl.pallas_call(
        _make_group_kernel_X(n, G, kmajor=kmajor),
        grid=(NG,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((G, K, np_), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((G, K, np_), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bp, K, np_), b.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, G, np_, np_), fdt),
            pltpu.VMEM((G, K, np_), b.dtype),
            pltpu.SemaphoreType.DMA((2, G)),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=bool(interpret),
    )(Xp, c_flat, bp)
    return xg[:B, :, :n]


@functools.lru_cache(maxsize=None)
def grouped_solver_X(group: int):
    """Per-scenario X-form solve on PADDED factors; vmap dispatches the
    G-way grouped kernel.  C must be batch-shared."""

    @jax.custom_batching.custom_vmap
    def solve(Xp, C, b):
        from ...solvers.banded import solve_factorized_X
        n = b.shape[-1]
        return solve_factorized_X(Xp[..., :n, :n], C, b)

    @solve.def_vmap
    def _rule(axis_size, in_batched, Xp, C, b):
        xb, cb, bb = in_batched
        if cb:
            raise NotImplementedError(
                "grouped X-solve needs batch-shared slot scalars "
                "(use rho_pattern_masks)")
        assert xb and bb, "factors and rhs must be batched together"
        return solve_factorized_grouped_X(Xp, C, b, group=group), True

    return solve


@functools.lru_cache(maxsize=None)
def grouped_solver_L(group: int):
    """Per-scenario L-only solve on PADDED factors; vmap dispatches the
    G-way grouped kernel.  C must be batch-shared (mask-based rho
    patterns)."""

    @jax.custom_batching.custom_vmap
    def solve(Lp, C, b):
        from ...solvers.banded import solve_factorized_L
        n = b.shape[-1]
        return solve_factorized_L(Lp[..., :n, :n], C, b)

    @solve.def_vmap
    def _rule(axis_size, in_batched, Lp, C, b):
        lb, cb, bb = in_batched
        if cb:
            raise NotImplementedError(
                "grouped L-solve needs batch-shared slot scalars "
                "(use rho_pattern_masks)")
        assert lb and bb, "factors and rhs must be batched together"
        return solve_factorized_grouped_L(Lp, C, b, group=group), True

    return solve
