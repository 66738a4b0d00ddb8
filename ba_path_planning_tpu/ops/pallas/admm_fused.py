"""Pallas TPU kernel: the ENTIRE ADMM inner loop in one dispatch.

The direct QP solver (``solvers/banded.py``) runs ``check_interval`` ADMM
iterations between residual checks.  As XLA ops each iteration is a chain of
small tensors (constraint applies, the banded substitution sweeps, the
z/y proximal updates), and — critically — every x-update re-streams the
scenario's (K, 6N, 6N) block-Cholesky factor set from HBM into VMEM
(~5.8 MB per scenario per iteration at the N=20/K=50 benchmark config;
~40 iterations -> ~230 MB of HBM traffic per scenario per QP solve).

This kernel fuses the whole interval: one grid step per scenario DMAs the
factor set into VMEM ONCE, then runs all ``n_iters`` ADMM iterations
in-kernel — substitution sweeps as VPU matvecs, collision-row coupling as
MXU matmuls against the fixed pair-incidence matrices, and the z/y updates
as elementwise VPU work.  HBM factor traffic drops by the iteration count
and per-iteration XLA dispatch overhead disappears.

Layout: the kernel works on *plane* tensors —

  * x, b:        (K, 6N)   stacked state (slot-major a|p|v, channel
                           interleaved n*2+c; ``banded.to_stacked``)
  * static rows: (K, 12N)  six (K, 2N) blocks in fixed order
                           (dyn_p, dyn_v, jerk, acc, vbox, pbox); the jerk
                           block's row K-1 is a zero-coefficient dummy so
                           all blocks share the K axis
  * collision:   (K, P)    row values / duals, (K, 2P) interleaved eta
  * pair maps:   E2 (2N, 2P) = E (x) I_2 incidence, Sx (P, 2P) channel
                 expansion, and their transposes — scenario-independent

Semantics are bit-for-bit the ``admm_iter`` body in
``solvers/banded.py:solve_qp_state`` (same operations in the same order);
the interpret-mode equivalence test pins this.

Reference context: this fuses the per-iteration work that replaces OSQP's
ADMM loop (``/root/reference/src/path_planning/solvers/scp.py:360-365,
441-447``) for the state-space QP formulation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_F32 = jnp.float32


# ---------------------------------------------------------------------------
# Plane-layout converters (plain jnp; used outside the kernel)
# ---------------------------------------------------------------------------

def _flat_kn2(leaf):
    """(..., N, K', 2) -> (..., K', 2N) with column index n*2 + c."""
    moved = jnp.swapaxes(leaf, -3, -2)
    return moved.reshape(moved.shape[:-2] + (moved.shape[-2] * 2,))


def _unflat_kn2(plane, n_vehicles):
    """(..., K', 2N) -> (..., N, K', 2)."""
    K = plane.shape[-2]
    arr = plane.reshape(plane.shape[:-1] + (n_vehicles, 2))
    return jnp.swapaxes(arr, -3, -2)


_SLOTS = ("dyn_p", "dyn_v", "jerk", "acc", "vbox", "pbox")


def rowvals_to_planes(rv):
    """RowVals -> (s_plane (..., K, 12N), col (..., K, P)).

    The jerk block (K-1 rows) is padded with one zero dummy row at k = K-1.
    """
    planes = []
    for name in _SLOTS:
        leaf = getattr(rv, name)
        p = _flat_kn2(leaf)
        if name == "jerk":
            pad = jnp.zeros(p.shape[:-2] + (1, p.shape[-1]), p.dtype)
            p = jnp.concatenate([p, pad], axis=-2)
        planes.append(p)
    return jnp.concatenate(planes, axis=-1), rv.col


def planes_to_rowvals(s_plane, col, n_vehicles, make):
    """Inverse of :func:`rowvals_to_planes`; ``make`` is the RowVals ctor."""
    n2 = 2 * n_vehicles
    parts = {}
    for idx, name in enumerate(_SLOTS):
        p = s_plane[..., idx * n2:(idx + 1) * n2]
        if name == "jerk":
            p = p[..., :-1, :]
        parts[name] = _unflat_kn2(p, n_vehicles)
    return make(col=col, **parts)


def bound_planes(rv, inf_fill):
    """Bounds RowVals -> plane with the jerk dummy row set to ±inf."""
    s, col = rowvals_to_planes(rv)
    K = s.shape[-2]
    n2 = s.shape[-1] // 6
    row = jax.lax.broadcasted_iota(jnp.int32, (K, 1), 0)
    dummy = jnp.full_like(s[..., :n2], inf_fill)
    block = jnp.where(row == K - 1, dummy, s[..., 2 * n2:3 * n2])
    return jnp.concatenate(
        [s[..., :2 * n2], block, s[..., 3 * n2:]], axis=-1), col


def rho_planes(rho_b, loose):
    """rho RowVals (broadcastable (K', 1) leaves + (K, P) col) ->
    (rho_sk (K, 6) per-(k, slot) static rho, rho_c (K, P)).

    rho patterns from ``rho_pattern_masks`` are batch-independent, so these
    planes are shared by every scenario in a batch.
    """
    planes = []
    for name in _SLOTS:
        leaf = getattr(rho_b, name)
        if leaf.ndim != 2 or leaf.shape[-1] != 1:
            raise ValueError(
                "fused ADMM kernel needs broadcastable (K', 1) rho leaves "
                "(use rho_pattern_masks)")
        if name == "jerk":
            leaf = jnp.concatenate(
                [leaf, jnp.full((1, 1), loose, leaf.dtype)], axis=0)
        planes.append(leaf)
    rho_s_k = jnp.concatenate(planes, axis=-1)           # (K, 6)
    return rho_s_k, rho_b.col


def pair_matrices(n_vehicles: int, dtype=_F32):
    """Static pair maps for N vehicles: (E2 (2N, 2P), E2T, Sx (P, 2P), SxT).

    E2 = channel-interleaved signed incidence (same pair order as
    ``ops.collisions.make_pair_index``): dpf (K, 2P) = p_plane (K, 2N) @ E2.
    Sx expands a per-pair scalar onto both channels; SxT sums them back.
    Built from the static vehicle count so it stays concrete under jit.
    """
    N = int(n_vehicles)
    ii, jj = np.triu_indices(N, k=1)
    P = len(ii)
    E = np.zeros((N, P))
    E[ii, np.arange(P)] = 1.0
    E[jj, np.arange(P)] = -1.0
    E2 = np.zeros((2 * N, 2 * P), dtype=np.float32)
    for c in range(2):
        E2[c::2, c::2] = E
    Sx = np.zeros((P, 2 * P), dtype=np.float32)
    Sx[np.arange(P), 2 * np.arange(P)] = 1.0
    Sx[np.arange(P), 2 * np.arange(P) + 1] = 1.0
    return (jnp.asarray(E2, dtype), jnp.asarray(E2.T, dtype),
            jnp.asarray(Sx, dtype), jnp.asarray(Sx.T, dtype))


# ---------------------------------------------------------------------------
# The kernel
# ---------------------------------------------------------------------------

def _admm_kernel(
        # scalar params (SMEM)
        fpar_ref, ipar_ref,
        # per-scenario tensors (VMEM blocks, resident for the whole interval)
        linv_ref, eb_ref,          # (1, K, n, n) / (1, K-1, n, n)
        eta2_ref,                  # (1, K, 2P)
        ls_ref, us_ref,            # (1, K, 12N)
        lc_ref,                    # (1, K, P)
        x0_ref, zs0_ref, zc0_ref, ys0_ref, yc0_ref,
        # shared tensors
        rsk_ref,                   # (K, 6) per-(k, slot) static rho
        rc_ref,                    # (K, P) collision rho
        e2_ref, e2t_ref, sx_ref, sxt_ref,
        # outputs
        x_ref, zs_ref, zc_ref, ys_ref, yc_ref,
        # scratch
        ysw, xt, bsc):
    K, n = x0_ref.shape[1], x0_ref.shape[2]
    n2 = n // 3
    h = fpar_ref[0]
    sigma = fpar_ref[1]
    alpha = fpar_ref[2]
    lam = fpar_ref[3]
    n_iters = ipar_ref[0]

    # init carries in the output refs
    x_ref[0] = x0_ref[0]
    zs_ref[0] = zs0_ref[0]
    zc_ref[0] = zc0_ref[0]
    ys_ref[0] = ys0_ref[0]
    yc_ref[0] = yc0_ref[0]

    row = jax.lax.broadcasted_iota(jnp.int32, (K, 1), 0)
    not_last = (row < K - 1).astype(x0_ref.dtype)        # jerk dummy mask

    # static rho as (K, 2N) blocks (broadcast per-slot scalars over channels)
    rho_blk = [jnp.broadcast_to(rsk_ref[:, s:s + 1], (K, n2))
               for s in range(6)]
    rho_s = jnp.concatenate(rho_blk, axis=-1)            # (K, 12N)
    rho_c = rc_ref[:]
    eta2 = eta2_ref[0]
    l_s = ls_ref[0]
    u_s = us_ref[0]
    l_c = lc_ref[0]

    # K-shifts as roll+mask: Mosaic rejects dim-0 concatenates of
    # offset-mismatched slices, so never build shifted tensors from slices
    def shift_down(M):
        r = pltpu.roll(M, 1, 0)
        return jnp.where(row > 0, r, jnp.zeros_like(r))

    def shift_up(M):
        r = pltpu.roll(M, K - 1, 0)
        return jnp.where(row < K - 1, r, jnp.zeros_like(r))

    def mv(M, t):
        return jnp.sum(M * t[None, :], axis=1)

    def mv_t(M, t):
        return jnp.sum(M * t[:, None], axis=0)

    def dot(a, b):
        # HIGHEST: full-f32 MXU passes — the pair-coupling products feed a
        # 10s-of-iterations fixed point; bf16 default drifts ~1e-2 vs XLA
        return jnp.dot(a, b, preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)

    def body(it, _):
        x = x_ref[0]
        zs = zs_ref[0]
        zc = zc_ref[0]
        ys = ys_ref[0]
        yc = yc_ref[0]

        # ---- b = A^T (rho z - y) + sigma x  (adjoint in plane layout)
        rzs = rho_s * zs - ys
        rzc = rho_c * zc - yc
        dyn_p = rzs[:, 0 * n2:1 * n2]
        dyn_v = rzs[:, 1 * n2:2 * n2]
        jrk = rzs[:, 2 * n2:3 * n2] * not_last
        acc = rzs[:, 3 * n2:4 * n2]
        vbx = rzs[:, 4 * n2:5 * n2]
        pbx = rzs[:, 5 * n2:6 * n2]
        a_adj = (-0.5 * h * h) * dyn_p - h * dyn_v \
            + (shift_down(jrk) - jrk) / h + acc
        dp_next = shift_up(dyn_p)
        dv_next = shift_up(dyn_v)
        w2 = dot(rzc, sx_ref[:]) * eta2                  # (K, 2P)
        col_adj = dot(shift_up(w2), e2t_ref[:])          # (K, 2N)
        p_adj = dyn_p - dp_next + pbx + col_adj
        v_adj = -h * dp_next + dyn_v - dv_next + vbx
        bsc[:] = jnp.concatenate([a_adj, p_adj, v_adj], axis=-1) + sigma * x

        # ---- substitution sweeps with resident factors: M xt = b
        ysw[0, :] = mv(linv_ref[0, 0], bsc[0, :])

        def fwd(k, _):
            t = bsc[k, :] - mv(eb_ref[0, k - 1], ysw[k - 1, :])
            ysw[k, :] = mv(linv_ref[0, k], t)
            return 0

        jax.lax.fori_loop(1, K, fwd, 0)
        xt[K - 1, :] = mv_t(linv_ref[0, K - 1], ysw[K - 1, :])

        def bwd(j, _):
            k = K - 2 - j
            t = ysw[k, :] - mv_t(eb_ref[0, k], xt[k + 1, :])
            xt[k, :] = mv_t(linv_ref[0, k], t)
            return 0

        jax.lax.fori_loop(0, K - 1, bwd, 0)
        xtv = xt[:]

        # ---- relaxation + row values of the relaxed iterate
        x_ref[0] = alpha * xtv + (1.0 - alpha) * x
        at = xtv[:, 0 * n2:1 * n2]
        pt = xtv[:, 1 * n2:2 * n2]
        vt = xtv[:, 2 * n2:3 * n2]
        ax_dyn_p = pt - shift_down(pt) - h * shift_down(vt) \
            - (0.5 * h * h) * at
        ax_dyn_v = vt - shift_down(vt) - h * at
        ax_jerk = (shift_up(at) - at) / h * not_last
        axs = jnp.concatenate(
            [ax_dyn_p, ax_dyn_v, ax_jerk, at, vt, pt], axis=-1)
        dpf = dot(pt, e2_ref[:])                         # (K, 2P)
        colv = dot(eta2 * shift_down(dpf), sxt_ref[:])   # (K, P)

        # ---- z/y proximal updates (identical to banded.admm_iter)
        zrel_s = alpha * axs + (1.0 - alpha) * zs
        zrel_c = alpha * colv + (1.0 - alpha) * zc
        zns = jnp.clip(zrel_s + ys / rho_s, l_s, u_s)
        w = zrel_c + yc / rho_c
        znc = jnp.where(w >= l_c, w,
                        jnp.minimum(w + lam / rho_c, l_c))
        zs_ref[0] = zns
        zc_ref[0] = znc
        ys_ref[0] = ys + rho_s * (zrel_s - zns)
        yc_ref[0] = yc + rho_c * (zrel_c - znc)
        return 0

    jax.lax.fori_loop(0, n_iters, body, 0)


# ---------------------------------------------------------------------------
# Host wrapper (natively batched; custom_vmap for per-scenario use)
# ---------------------------------------------------------------------------

def _fused_batched(fpar, ipar, Linv, Eb, eta2, l_s, u_s, l_c,
                   x0, zs0, zc0, ys0, yc0, rho_sk, rho_c,
                   E2, E2T, Sx, SxT, *, interpret=False):
    B, K, n, _ = Linv.shape
    P = l_c.shape[-1]
    n12 = l_s.shape[-1]
    dtype = x0.dtype

    def b_spec(*shape):
        nd = len(shape)
        return pl.BlockSpec((1,) + shape, lambda i, nd=nd: (i,) + (0,) * nd,
                            memory_space=pltpu.VMEM)

    def shared_spec(*shape):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda i, nd=nd: (0,) * nd,
                            memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        _admm_kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),       # fpar (4,)
            pl.BlockSpec(memory_space=pltpu.SMEM),       # ipar (1,)
            b_spec(K, n, n),                             # Linv
            b_spec(K - 1, n, n),                         # Eb
            b_spec(K, 2 * P),                            # eta2
            b_spec(K, n12), b_spec(K, n12),              # l_s, u_s
            b_spec(K, P),                                # l_c
            b_spec(K, n),                                # x0
            b_spec(K, n12), b_spec(K, P),                # zs0, zc0
            b_spec(K, n12), b_spec(K, P),                # ys0, yc0
            shared_spec(K, 6),                           # rho_sk
            shared_spec(K, P),                           # rho_c
            shared_spec(n // 3, 2 * P),                  # E2  (2N, 2P)
            shared_spec(2 * P, n // 3),                  # E2T
            shared_spec(P, 2 * P),                       # Sx
            shared_spec(2 * P, P),                       # SxT
        ],
        out_specs=(b_spec(K, n), b_spec(K, n12), b_spec(K, P),
                   b_spec(K, n12), b_spec(K, P)),
        out_shape=(jax.ShapeDtypeStruct((B, K, n), dtype),
                   jax.ShapeDtypeStruct((B, K, n12), dtype),
                   jax.ShapeDtypeStruct((B, K, P), dtype),
                   jax.ShapeDtypeStruct((B, K, n12), dtype),
                   jax.ShapeDtypeStruct((B, K, P), dtype)),
        scratch_shapes=[
            pltpu.VMEM((K, n), dtype),                   # fwd-sweep y
            pltpu.VMEM((K, n), dtype),                   # x tilde
            pltpu.VMEM((K, n), dtype),                   # b
        ],
        interpret=interpret,
    )(fpar, ipar, Linv, Eb, eta2, l_s, u_s, l_c,
      x0, zs0, zc0, ys0, yc0, rho_sk, rho_c, E2, E2T, Sx, SxT)
    return out


def _auto_interpret() -> bool:
    return jax.default_backend() in ("cpu",)


@functools.partial(jax.custom_batching.custom_vmap)
def admm_interval_fused(fpar, ipar, Linv, Eb, eta2, l_s, u_s, l_c,
                        x0, zs0, zc0, ys0, yc0, rho_sk, rho_c,
                        E2, E2T, Sx, SxT):
    """Run ``ipar[0]`` ADMM iterations for ONE scenario; returns
    (x, z_s, z_c, y_s, y_c) planes.  Under ``vmap`` a custom batching rule
    dispatches the natively batched grid (the HBM factor refs cannot be
    auto-batched)."""
    out = _fused_batched(fpar, ipar, Linv[None], Eb[None], eta2[None],
                         l_s[None], u_s[None], l_c[None], x0[None],
                         zs0[None], zc0[None], ys0[None], yc0[None],
                         rho_sk, rho_c, E2, E2T, Sx, SxT,
                         interpret=_auto_interpret())
    return jax.tree.map(lambda t: t[0], out)


@admm_interval_fused.def_vmap
def _fused_vmap(axis_size, in_batched, fpar, ipar, Linv, Eb, eta2,
                l_s, u_s, l_c, x0, zs0, zc0, ys0, yc0,
                rho_sk, rho_c, E2, E2T, Sx, SxT):
    (fb, ib, lb, ebb, etab, lsb, usb, lcb, x0b, zs0b, zc0b, ys0b, yc0b,
     rskb, rcb, e2b, e2tb, sxb, sxtb) = in_batched
    if any((fb, ib, rskb, rcb, e2b, e2tb, sxb, sxtb)):
        raise NotImplementedError(
            "solver params and shared pair/rho tensors must not be batched")

    def bcast(arr, batched):
        return arr if batched else jnp.broadcast_to(
            arr[None], (axis_size,) + arr.shape)

    out = _fused_batched(
        fpar, ipar, bcast(Linv, lb), bcast(Eb, ebb), bcast(eta2, etab),
        bcast(l_s, lsb), bcast(u_s, usb), bcast(l_c, lcb), bcast(x0, x0b),
        bcast(zs0, zs0b), bcast(zc0, zc0b), bcast(ys0, ys0b),
        bcast(yc0, yc0b), rho_sk, rho_c, E2, E2T, Sx, SxT,
        interpret=_auto_interpret())
    return out, (True,) * 5


# ---------------------------------------------------------------------------
# X-form variant: symmetric block inverses + slot-scalar off-diagonals
# ---------------------------------------------------------------------------
#
# The L-form kernel holds TWO dense (K, n, n) factor sets (Linv, Eb) in
# VMEM — 2 K n^2 bytes caps it at N <= 20 on a 16 MB-VMEM core.  The
# normal matrix's off-diagonal blocks are slot scalars (B_k = C_k (x) I_2N,
# banded.b_slot_mats), so with the symmetric inverses X_k = S_k^{-1}
# (banded.factorize_X) the resident factor state is ONE (K, n, n) array
# plus (K-1, 9) scalars: half the VMEM (N=30 fits), one matvec per
# recurrence step instead of two, and the factorization itself comes from
# the cheap Newton-Schulz path.  Sweep algebra matches
# banded.solve_factorized_X exactly.
#
# Two further VMEM savings vs the L-form kernel:
#   * the factor array arrives as an HBM ref and is DMA'd into a VMEM
#     scratch ONCE per scenario (Pallas would double-buffer an input
#     block, doubling the dominant allocation);
#   * pair quantities use a channel-BLOCK layout (x-pairs | y-pairs)
#     instead of interleaved, so the P->2P expansion is a concatenate and
#     the 2P->P reduction a split+add — the dense Sx/SxT maps (the
#     second-largest resident tensors at large N) disappear.

def _admm_kernel_X(
        # scalar params (SMEM)
        fpar_ref, ipar_ref, c_ref,
        # per-scenario tensors
        xf_hbm,                    # (B, K, n, n) symmetric inverses, HBM
        eta2_ref,                  # (1, K, 2P) channel-BLOCK eta
        ls_ref, us_ref,            # (1, K, 12N)
        lc_ref,                    # (1, K, P)
        x0_ref, zs0_ref, zc0_ref, ys0_ref, yc0_ref,
        # shared tensors
        rsk_ref, rc_ref,
        e2_ref, e2t_ref,           # channel-block pair maps (2N, 2P)/(2P, 2N)
        # outputs
        x_ref, zs_ref, zc_ref, ys_ref, yc_ref,
        # scratch
        xf_vmem, wsw, xt, bsc, dsem):
    K, n = x0_ref.shape[1], x0_ref.shape[2]
    n2 = n // 3
    npk = wsw.shape[1]         # n rounded up to the 128-lane tile
    nrs = xf_vmem.shape[1]     # n rounded up to the 8-sublane tile
    P = lc_ref.shape[2]
    h = fpar_ref[0]
    sigma = fpar_ref[1]
    alpha = fpar_ref[2]
    lam = fpar_ref[3]
    n_iters = ipar_ref[0]

    # factors -> VMEM once per scenario (single-buffered by construction)
    i = pl.program_id(0)
    cp = pltpu.make_async_copy(xf_hbm.at[i], xf_vmem, dsem)
    cp.start()
    cp.wait()

    x_ref[0] = x0_ref[0]
    zs_ref[0] = zs0_ref[0]
    zc_ref[0] = zc0_ref[0]
    ys_ref[0] = ys0_ref[0]
    yc_ref[0] = yc0_ref[0]

    row = jax.lax.broadcasted_iota(jnp.int32, (K, 1), 0)
    not_last = (row < K - 1).astype(x0_ref.dtype)

    rho_blk = [jnp.broadcast_to(rsk_ref[:, s:s + 1], (K, n2))
               for s in range(6)]
    rho_s = jnp.concatenate(rho_blk, axis=-1)
    rho_c = rc_ref[:]
    eta2 = eta2_ref[0]
    l_s = ls_ref[0]
    u_s = us_ref[0]
    l_c = lc_ref[0]

    def shift_down(M):
        r = pltpu.roll(M, 1, 0)
        return jnp.where(row > 0, r, jnp.zeros_like(r))

    def shift_up(M):
        r = pltpu.roll(M, K - 1, 0)
        return jnp.where(row < K - 1, r, jnp.zeros_like(r))

    def mv(M, t):
        return jnp.sum(M * t[None, :], axis=1)

    def dot(a, b):
        return jnp.dot(a, b, preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)

    # B_k applies on a (1, nr) sweep-vector view: slot scalars C row k-1
    # (upper-triangular 3x3 — indices 3, 6, 7 are structurally zero).
    # All sweep values are handled as 2-D (1, nr) rows — Mosaic lowers
    # minor-dim slices of 2-D tiles at any offset, but not 1-D vector
    # slices past the first 128-lane tile.  Pad lanes (nr - n) stay zero
    # (the factor pad rows/cols are zero).
    def _pad_nr(parts):
        if npk > n:
            parts = parts + [jnp.zeros((1, npk - n), parts[0].dtype)]
        return jnp.concatenate(parts, axis=-1)

    def b_apply(k, w):
        wa, wp, wv = w[:, 0:n2], w[:, n2:2 * n2], w[:, 2 * n2:n]
        c = lambda j: c_ref[k - 1, j]
        return _pad_nr(
            [c(0) * wa + c(1) * wp + c(2) * wv,
             c(4) * wp + c(5) * wv,
             c(8) * wv])

    def b_apply_t(k, v):
        va, vp, vv = v[:, 0:n2], v[:, n2:2 * n2], v[:, 2 * n2:n]
        c = lambda j: c_ref[k - 1, j]
        return _pad_nr(
            [c(0) * va,
             c(1) * va + c(4) * vp,
             c(2) * va + c(5) * vp + c(8) * vv])

    def body(it, _):
        x = x_ref[0]
        zs = zs_ref[0]
        zc = zc_ref[0]
        ys = ys_ref[0]
        yc = yc_ref[0]

        # ---- b = A^T (rho z - y) + sigma x  (adjoint in plane layout)
        rzs = rho_s * zs - ys
        rzc = rho_c * zc - yc
        dyn_p = rzs[:, 0 * n2:1 * n2]
        dyn_v = rzs[:, 1 * n2:2 * n2]
        jrk = rzs[:, 2 * n2:3 * n2] * not_last
        acc = rzs[:, 3 * n2:4 * n2]
        vbx = rzs[:, 4 * n2:5 * n2]
        pbx = rzs[:, 5 * n2:6 * n2]
        a_adj = (-0.5 * h * h) * dyn_p - h * dyn_v \
            + (shift_down(jrk) - jrk) / h + acc
        dp_next = shift_up(dyn_p)
        dv_next = shift_up(dyn_v)
        # P -> 2P channel-block expansion is a concatenate (no Sx map)
        w2 = jnp.concatenate([rzc, rzc], axis=-1) * eta2
        col_adj = dot(shift_up(w2), e2t_ref[:])
        p_adj = dyn_p - dp_next + pbx + col_adj
        v_adj = -h * dp_next + dyn_v - dv_next + vbx
        parts = [jnp.concatenate([a_adj, p_adj, v_adj], axis=-1) + sigma * x]
        if npk > n:
            parts.append(jnp.zeros((K, npk - n), x.dtype))
        bsc[:] = jnp.concatenate(parts, axis=-1)

        # ---- substitution sweeps, resident X factors (solve_factorized_X)
        # 2-D (1, npk) row views throughout (see b_apply note); the factor
        # rows stop at nrs, so matvec results are lane-padded back to npk
        def mv2(M, t):
            r = jnp.sum(M * t, axis=1)[None]
            if npk > nrs:
                r = jnp.concatenate(
                    [r, jnp.zeros((1, npk - nrs), r.dtype)], axis=-1)
            return r

        wsw[pl.ds(0, 1), :] = mv2(xf_vmem[0], bsc[pl.ds(0, 1), :])

        def fwd(k, _):
            t = bsc[pl.ds(k, 1), :] - b_apply(k, wsw[pl.ds(k - 1, 1), :])
            wsw[pl.ds(k, 1), :] = mv2(xf_vmem[k], t)
            return 0

        jax.lax.fori_loop(1, K, fwd, 0)
        xt[pl.ds(K - 1, 1), :] = wsw[pl.ds(K - 1, 1), :]

        def bwd(j, _):
            k = K - 2 - j
            t = b_apply_t(k + 1, xt[pl.ds(k + 1, 1), :])
            xt[pl.ds(k, 1), :] = wsw[pl.ds(k, 1), :] - mv2(xf_vmem[k], t)
            return 0

        jax.lax.fori_loop(0, K - 1, bwd, 0)
        xtv = xt[:][:, 0:n]

        # ---- relaxation + row values of the relaxed iterate
        x_ref[0] = alpha * xtv + (1.0 - alpha) * x
        at = xtv[:, 0 * n2:1 * n2]
        pt = xtv[:, 1 * n2:2 * n2]
        vt = xtv[:, 2 * n2:3 * n2]
        ax_dyn_p = pt - shift_down(pt) - h * shift_down(vt) \
            - (0.5 * h * h) * at
        ax_dyn_v = vt - shift_down(vt) - h * at
        ax_jerk = (shift_up(at) - at) / h * not_last
        axs = jnp.concatenate(
            [ax_dyn_p, ax_dyn_v, ax_jerk, at, vt, pt], axis=-1)
        dpf = dot(pt, e2_ref[:])
        u2 = eta2 * shift_down(dpf)
        colv = u2[:, :P] + u2[:, P:]          # 2P -> P block reduction

        # ---- z/y proximal updates (identical to banded.admm_iter)
        zrel_s = alpha * axs + (1.0 - alpha) * zs
        zrel_c = alpha * colv + (1.0 - alpha) * zc
        zns = jnp.clip(zrel_s + ys / rho_s, l_s, u_s)
        w = zrel_c + yc / rho_c
        znc = jnp.where(w >= l_c, w,
                        jnp.minimum(w + lam / rho_c, l_c))
        zs_ref[0] = zns
        zc_ref[0] = znc
        ys_ref[0] = ys + rho_s * (zrel_s - zns)
        yc_ref[0] = yc + rho_c * (zrel_c - znc)
        return 0

    jax.lax.fori_loop(0, n_iters, body, 0)


def pair_matrices_block(n_vehicles: int, dtype=_F32):
    """Channel-BLOCK pair maps: E2b (2N, 2P) with columns [x-pairs | y-pairs]
    and rows channel-interleaved (2n + c), plus its transpose.

    dpf_blk (K, 2P) = p_plane (K, 2N) @ E2b; the P -> 2P expansion is then a
    concatenate and the 2P -> P reduction a split+add — no Sx/SxT maps.
    """
    N = int(n_vehicles)
    ii, jj = np.triu_indices(N, k=1)
    P = len(ii)
    E2b = np.zeros((2 * N, 2 * P), dtype=np.float32)
    for c in range(2):
        E2b[2 * ii + c, c * P + np.arange(P)] = 1.0
        E2b[2 * jj + c, c * P + np.arange(P)] = -1.0
    return jnp.asarray(E2b, dtype), jnp.asarray(E2b.T, dtype)


def eta_to_block(eta):
    """(K, P, 2) collision directions -> (K, 2P) channel-block plane."""
    return jnp.concatenate([eta[..., 0], eta[..., 1]], axis=-1)


def _admm_kernel_XG(
        # scalar params (SMEM)
        fpar_ref, ipar_ref, c_ref,
        # per-scenario tensors (blocks carry a leading G axis)
        xf_hbm,                    # (B, K, nr, npk) symmetric inverses, HBM
        eta2_ref,                  # (G, K, 2P) channel-BLOCK eta
        ls_ref, us_ref,            # (G, K, 12N)
        lc_ref,                    # (G, K, P)
        x0_ref, zs0_ref, zc0_ref, ys0_ref, yc0_ref,
        # shared tensors
        rsk_ref, rc_ref,
        e2_ref, e2t_ref,
        # outputs
        x_ref, zs_ref, zc_ref, ys_ref, yc_ref,
        # scratch: G factor slabs, G fwd/xt/b sweep planes, G DMA sems
        *scr, G: int):
    """G-scenario-interleaved variant of :func:`_admm_kernel_X`.

    The per-scenario kernel's substitution sweeps issue one small
    (1, n) x (n, npk) matvec per k step — a serial chain that leaves the
    MXU pipeline mostly empty (measured ~0.6 us per step at N=40, far
    above the arithmetic floor).  Interleaving G independent scenarios per
    grid step issues G dependency-free matvecs back-to-back at every k,
    exactly the pipeline-filling trick of the NS-chain factorization
    kernel (ops/pallas/ns_chain.py).  All elementwise phases run per-g on
    the same (K, .) planes as the one-scenario kernel, so the ADMM
    semantics are identical — only the issue order changes.
    """
    xf_l = scr[0:G]
    wsw_l = scr[G:2 * G]
    xt_l = scr[2 * G:3 * G]
    bsc_l = scr[3 * G:4 * G]
    sem_l = scr[4 * G:5 * G]

    K, n = x0_ref.shape[1], x0_ref.shape[2]
    n2 = n // 3
    npk = wsw_l[0].shape[1]
    nrs = xf_l[0].shape[1]
    P = lc_ref.shape[2]
    h = fpar_ref[0]
    sigma = fpar_ref[1]
    alpha = fpar_ref[2]
    lam = fpar_ref[3]
    n_iters = ipar_ref[0]

    # factors -> VMEM once per scenario; the G copies overlap
    i = pl.program_id(0)
    cps = [pltpu.make_async_copy(xf_hbm.at[i * G + g], xf_l[g], sem_l[g])
           for g in range(G)]
    for cp in cps:
        cp.start()
    for cp in cps:
        cp.wait()

    for g in range(G):
        x_ref[g] = x0_ref[g]
        zs_ref[g] = zs0_ref[g]
        zc_ref[g] = zc0_ref[g]
        ys_ref[g] = ys0_ref[g]
        yc_ref[g] = yc0_ref[g]

    row = jax.lax.broadcasted_iota(jnp.int32, (K, 1), 0)
    not_last = (row < K - 1).astype(x0_ref.dtype)

    rho_blk = [jnp.broadcast_to(rsk_ref[:, s:s + 1], (K, n2))
               for s in range(6)]
    rho_s = jnp.concatenate(rho_blk, axis=-1)
    rho_c = rc_ref[:]

    def shift_down(M):
        r = pltpu.roll(M, 1, 0)
        return jnp.where(row > 0, r, jnp.zeros_like(r))

    def shift_up(M):
        r = pltpu.roll(M, K - 1, 0)
        return jnp.where(row < K - 1, r, jnp.zeros_like(r))

    def dot(a, b):
        return jnp.dot(a, b, preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)

    def _pad_nr(parts):
        if npk > n:
            parts = parts + [jnp.zeros((1, npk - n), parts[0].dtype)]
        return jnp.concatenate(parts, axis=-1)

    def b_apply(k, w):
        wa, wp, wv = w[:, 0:n2], w[:, n2:2 * n2], w[:, 2 * n2:n]
        c = lambda j: c_ref[k - 1, j]
        return _pad_nr(
            [c(0) * wa + c(1) * wp + c(2) * wv,
             c(4) * wp + c(5) * wv,
             c(8) * wv])

    def b_apply_t(k, v):
        va, vp, vv = v[:, 0:n2], v[:, n2:2 * n2], v[:, 2 * n2:n]
        c = lambda j: c_ref[k - 1, j]
        return _pad_nr(
            [c(0) * va,
             c(1) * va + c(4) * vp,
             c(2) * va + c(5) * vp + c(8) * vv])

    def mv2(M, t):
        r = jnp.sum(M * t, axis=1)[None]
        if npk > nrs:
            r = jnp.concatenate(
                [r, jnp.zeros((1, npk - nrs), r.dtype)], axis=-1)
        return r

    def body(it, _):
        # ---- b = A^T (rho z - y) + sigma x, per scenario
        for g in range(G):
            x = x_ref[g]
            zs = zs_ref[g]
            zc = zc_ref[g]
            ys = ys_ref[g]
            yc = yc_ref[g]
            rzs = rho_s * zs - ys
            rzc = rho_c * zc - yc
            dyn_p = rzs[:, 0 * n2:1 * n2]
            dyn_v = rzs[:, 1 * n2:2 * n2]
            jrk = rzs[:, 2 * n2:3 * n2] * not_last
            acc = rzs[:, 3 * n2:4 * n2]
            vbx = rzs[:, 4 * n2:5 * n2]
            pbx = rzs[:, 5 * n2:6 * n2]
            a_adj = (-0.5 * h * h) * dyn_p - h * dyn_v \
                + (shift_down(jrk) - jrk) / h + acc
            dp_next = shift_up(dyn_p)
            dv_next = shift_up(dyn_v)
            w2 = jnp.concatenate([rzc, rzc], axis=-1) * eta2_ref[g]
            col_adj = dot(shift_up(w2), e2t_ref[:])
            p_adj = dyn_p - dp_next + pbx + col_adj
            v_adj = -h * dp_next + dyn_v - dv_next + vbx
            parts = [jnp.concatenate([a_adj, p_adj, v_adj], axis=-1)
                     + sigma * x]
            if npk > n:
                parts.append(jnp.zeros((K, npk - n), x.dtype))
            bsc_l[g][:] = jnp.concatenate(parts, axis=-1)

        # ---- substitution sweeps: G independent chains interleaved per k
        for g in range(G):
            wsw_l[g][pl.ds(0, 1), :] = mv2(xf_l[g][0],
                                           bsc_l[g][pl.ds(0, 1), :])

        def fwd(k, _):
            for g in range(G):
                t = bsc_l[g][pl.ds(k, 1), :] \
                    - b_apply(k, wsw_l[g][pl.ds(k - 1, 1), :])
                wsw_l[g][pl.ds(k, 1), :] = mv2(xf_l[g][k], t)
            return 0

        jax.lax.fori_loop(1, K, fwd, 0)
        for g in range(G):
            xt_l[g][pl.ds(K - 1, 1), :] = wsw_l[g][pl.ds(K - 1, 1), :]

        def bwd(j, _):
            k = K - 2 - j
            for g in range(G):
                t = b_apply_t(k + 1, xt_l[g][pl.ds(k + 1, 1), :])
                xt_l[g][pl.ds(k, 1), :] = wsw_l[g][pl.ds(k, 1), :] \
                    - mv2(xf_l[g][k], t)
            return 0

        jax.lax.fori_loop(0, K - 1, bwd, 0)

        # ---- relaxation + z/y proximal updates, per scenario
        for g in range(G):
            x = x_ref[g]
            zs = zs_ref[g]
            zc = zc_ref[g]
            ys = ys_ref[g]
            yc = yc_ref[g]
            xtv = xt_l[g][:][:, 0:n]
            x_ref[g] = alpha * xtv + (1.0 - alpha) * x
            at = xtv[:, 0 * n2:1 * n2]
            pt = xtv[:, 1 * n2:2 * n2]
            vt = xtv[:, 2 * n2:3 * n2]
            ax_dyn_p = pt - shift_down(pt) - h * shift_down(vt) \
                - (0.5 * h * h) * at
            ax_dyn_v = vt - shift_down(vt) - h * at
            ax_jerk = (shift_up(at) - at) / h * not_last
            axs = jnp.concatenate(
                [ax_dyn_p, ax_dyn_v, ax_jerk, at, vt, pt], axis=-1)
            dpf = dot(pt, e2_ref[:])
            u2 = eta2_ref[g] * shift_down(dpf)
            colv = u2[:, :P] + u2[:, P:]
            zrel_s = alpha * axs + (1.0 - alpha) * zs
            zrel_c = alpha * colv + (1.0 - alpha) * zc
            zns = jnp.clip(zrel_s + ys / rho_s, ls_ref[g], us_ref[g])
            w = zrel_c + yc / rho_c
            znc = jnp.where(w >= lc_ref[g], w,
                            jnp.minimum(w + lam / rho_c, lc_ref[g]))
            zs_ref[g] = zns
            zc_ref[g] = znc
            ys_ref[g] = ys + rho_s * (zrel_s - zns)
            yc_ref[g] = yc + rho_c * (zrel_c - znc)
        return 0

    jax.lax.fori_loop(0, n_iters, body, 0)


def _pick_fused_group(B, K, nr, npk, n12, P, n, itemsize=4):
    """Largest G in {8, 6, 4, 3, 2} whose G resident factor slabs + sweep
    planes + elementwise temps fit the fused kernel's VMEM budget AND that
    divides B (no padded grid work); 1 if none fits/divides."""
    factor = K * nr * npk * itemsize
    sweeps = 3 * K * npk * itemsize
    temps = 2 * K * (2 * P + 2 * n12 + P + n + 2 * (n12 + P)) * itemsize
    budget = 100 * 1024 * 1024
    for g in (8, 6, 4, 3, 2):
        if B % g == 0 and g * (factor + sweeps + temps) + factor // 4 \
                <= budget:
            return g
    return 1


def _fused_batched_X(fpar, ipar, cflat, Xf, eta_b, l_s, u_s, l_c,
                     x0, zs0, zc0, ys0, yc0, rho_sk, rho_c,
                     E2b, E2bT, *, interpret=False, group=None):
    B, K, n, _ = Xf.shape
    P = l_c.shape[-1]
    n12 = l_s.shape[-1]
    dtype = x0.dtype
    # HBM->VMEM DMA extents must match the (8, 128) tiling: pad the factor
    # blocks to (nr, npk) = (ceil8(n), ceil128(n)).  Sublane padding only
    # on rows — 28% less factor traffic+residency than square np x np
    # padding at N=30.  Zero pad rows/cols keep the padded sweep lanes at
    # zero.
    nr = (n + 7) // 8 * 8
    npk = (n + 127) // 128 * 128
    if nr > n or npk > n:
        Xf = jnp.pad(Xf, [(0, 0), (0, 0), (0, nr - n), (0, npk - n)])

    G = _pick_fused_group(B, K, nr, npk, n12, P, n) if group is None \
        else int(group)

    def b_spec(*shape):
        nd = len(shape)
        return pl.BlockSpec((G,) + shape, lambda i, nd=nd: (i,) + (0,) * nd,
                            memory_space=pltpu.VMEM)

    def shared_spec(*shape):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda i, nd=nd: (0,) * nd,
                            memory_space=pltpu.VMEM)

    if G > 1:
        out = pl.pallas_call(
            functools.partial(_admm_kernel_XG, G=G),
            grid=(B // G,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),   # fpar (4,)
                pl.BlockSpec(memory_space=pltpu.SMEM),   # ipar (1,)
                pl.BlockSpec(memory_space=pltpu.SMEM),   # cflat (K-1, 9)
                pl.BlockSpec(memory_space=pl.ANY),       # X factors (HBM)
                b_spec(K, 2 * P),                        # eta (block layout)
                b_spec(K, n12), b_spec(K, n12),          # l_s, u_s
                b_spec(K, P),                            # l_c
                b_spec(K, n),                            # x0
                b_spec(K, n12), b_spec(K, P),            # zs0, zc0
                b_spec(K, n12), b_spec(K, P),            # ys0, yc0
                shared_spec(K, 6),                       # rho_sk
                shared_spec(K, P),                       # rho_c
                shared_spec(n // 3, 2 * P),              # E2b  (2N, 2P)
                shared_spec(2 * P, n // 3),              # E2bT
            ],
            out_specs=(b_spec(K, n), b_spec(K, n12), b_spec(K, P),
                       b_spec(K, n12), b_spec(K, P)),
            out_shape=(jax.ShapeDtypeStruct((B, K, n), dtype),
                       jax.ShapeDtypeStruct((B, K, n12), dtype),
                       jax.ShapeDtypeStruct((B, K, P), dtype),
                       jax.ShapeDtypeStruct((B, K, n12), dtype),
                       jax.ShapeDtypeStruct((B, K, P), dtype)),
            scratch_shapes=(
                [pltpu.VMEM((K, nr, npk), Xf.dtype)] * G     # factors
                + [pltpu.VMEM((K, npk), dtype)] * G          # fwd-sweep w
                + [pltpu.VMEM((K, npk), dtype)] * G          # x tilde
                + [pltpu.VMEM((K, npk), dtype)] * G          # b
                + [pltpu.SemaphoreType.DMA] * G),
            compiler_params=pltpu.CompilerParams(
                has_side_effects=True,
                vmem_limit_bytes=min(
                    120 * 1024 * 1024,
                    int(1.3 * 4 * G * (K * nr * npk + 3 * K * npk
                                       + 2 * K * (2 * P + 2 * n12 + P + n
                                                  + 2 * (n12 + P))))
                    + 4 * (K * (6 + P) + 4 * P * n // 3)
                    + 6 * 1024 * 1024)),
            interpret=interpret,
        )(fpar, ipar, cflat, Xf, eta_b, l_s, u_s, l_c,
          x0, zs0, zc0, ys0, yc0, rho_sk, rho_c, E2b, E2bT)
        return out

    out = pl.pallas_call(
        _admm_kernel_X,
        grid=(B,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),       # fpar (4,)
            pl.BlockSpec(memory_space=pltpu.SMEM),       # ipar (1,)
            pl.BlockSpec(memory_space=pltpu.SMEM),       # cflat (K-1, 9)
            pl.BlockSpec(memory_space=pl.ANY),           # X factors (HBM)
            b_spec(K, 2 * P),                            # eta (block layout)
            b_spec(K, n12), b_spec(K, n12),              # l_s, u_s
            b_spec(K, P),                                # l_c
            b_spec(K, n),                                # x0
            b_spec(K, n12), b_spec(K, P),                # zs0, zc0
            b_spec(K, n12), b_spec(K, P),                # ys0, yc0
            shared_spec(K, 6),                           # rho_sk
            shared_spec(K, P),                           # rho_c
            shared_spec(n // 3, 2 * P),                  # E2b  (2N, 2P)
            shared_spec(2 * P, n // 3),                  # E2bT
        ],
        out_specs=(b_spec(K, n), b_spec(K, n12), b_spec(K, P),
                   b_spec(K, n12), b_spec(K, P)),
        out_shape=(jax.ShapeDtypeStruct((B, K, n), dtype),
                   jax.ShapeDtypeStruct((B, K, n12), dtype),
                   jax.ShapeDtypeStruct((B, K, P), dtype),
                   jax.ShapeDtypeStruct((B, K, n12), dtype),
                   jax.ShapeDtypeStruct((B, K, P), dtype)),
        scratch_shapes=[
            pltpu.VMEM((K, nr, npk), Xf.dtype),          # resident X factors
            pltpu.VMEM((K, npk), dtype),                 # fwd-sweep w
            pltpu.VMEM((K, npk), dtype),                 # x tilde
            pltpu.VMEM((K, npk), dtype),                 # b
            pltpu.SemaphoreType.DMA,
        ],
        # v5e has 128 MB of physical VMEM; Mosaic's default scoped limit is
        # only 16 MB, which would reject the resident factors past N~30
        # (measured: 120 MB scratch allocates fine on-chip).  Budget the
        # actual footprint: resident factors + sweep planes + ~2x the
        # per-scenario revolving blocks, with slack for compiler temps.
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            vmem_limit_bytes=min(
                110 * 1024 * 1024,
                int(1.3 * 4 * (K * nr * npk + 3 * K * npk
                               + 2 * K * (2 * P + 2 * n12 + P + n
                                          + 2 * (n12 + P))
                               + K * (6 + P) + 4 * P * n // 3))
                + 6 * 1024 * 1024)),
        interpret=interpret,
    )(fpar, ipar, cflat, Xf, eta_b, l_s, u_s, l_c,
      x0, zs0, zc0, ys0, yc0, rho_sk, rho_c, E2b, E2bT)
    return out


@functools.partial(jax.custom_batching.custom_vmap)
def admm_interval_fused_X(fpar, ipar, cflat, Xf, eta_b, l_s, u_s, l_c,
                          x0, zs0, zc0, ys0, yc0, rho_sk, rho_c,
                          E2b, E2bT):
    """X-form fused interval for ONE scenario (see admm_interval_fused).

    ``cflat`` (K-1, 9): row-major slot-scalar off-diagonals
    (``banded.b_slot_mats`` reshaped), batch-shared.  ``eta_b``: channel-
    block eta plane (:func:`eta_to_block`); ``E2b``/``E2bT``: block pair
    maps (:func:`pair_matrices_block`).
    """
    out = _fused_batched_X(fpar, ipar, cflat, Xf[None], eta_b[None],
                           l_s[None], u_s[None], l_c[None], x0[None],
                           zs0[None], zc0[None], ys0[None], yc0[None],
                           rho_sk, rho_c, E2b, E2bT,
                           interpret=_auto_interpret())
    return jax.tree.map(lambda t: t[0], out)


@admm_interval_fused_X.def_vmap
def _fused_vmap_X(axis_size, in_batched, fpar, ipar, cflat, Xf, eta_b,
                  l_s, u_s, l_c, x0, zs0, zc0, ys0, yc0,
                  rho_sk, rho_c, E2b, E2bT):
    (fb, ib, cb, xb, etab, lsb, usb, lcb, x0b, zs0b, zc0b, ys0b, yc0b,
     rskb, rcb, e2b_, e2tb_) = in_batched
    if any((fb, ib, cb, rskb, rcb, e2b_, e2tb_)):
        raise NotImplementedError(
            "solver params and shared slot/pair/rho tensors must not be "
            "batched (use rho_pattern_masks)")

    def bcast(arr, batched):
        return arr if batched else jnp.broadcast_to(
            arr[None], (axis_size,) + arr.shape)

    out = _fused_batched_X(
        fpar, ipar, cflat, bcast(Xf, xb), bcast(eta_b, etab),
        bcast(l_s, lsb), bcast(u_s, usb), bcast(l_c, lcb), bcast(x0, x0b),
        bcast(zs0, zs0b), bcast(zc0, zc0b), bcast(ys0, ys0b),
        bcast(yc0, yc0b), rho_sk, rho_c, E2b, E2bT,
        interpret=_auto_interpret())
    return out, (True,) * 5
