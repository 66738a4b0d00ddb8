"""Fused Newton-Schulz factorization chain (X-form) as one Pallas kernel.

The block-tridiagonal X-form factorization (``banded.factorize_X``) is the
large-N throughput cliff: the Schur/NS recurrence

    S_k = D_k - (C_k (x) I) X_{k-1} (C_k (x) I)^T
    X_k ~= NS(S_k, warm start X_{k-1})          (ns_iters Newton-Schulz steps)

is sequential in k, so the XLA path lowers it to a ``lax.scan`` whose batched
(B, 6N, 6N) matmul iterates round-trip through HBM every step; at N=40/K=50
the measured factorization ran at 6.4 % of f32 peak and dominated the whole
QP (docs/roofline.json, r4).

This kernel keeps the carries **resident in VMEM**: the grid is
(B/G, K_interior); each grid step advances G independent scenario chains by
one k, so

* only D_k streams in and X_k streams out (auto-pipelined revolving
  buffers, double-buffered by Pallas);
* the G chains' NS matmuls are mutually independent, filling the MXU
  pipeline that a single serial chain (T = S X, then X T) would stall;
* the per-grid-step DMA is G blocks (~1 MB at N=40/G=8), amortizing the
  per-step DMA latency that dominates ungrouped revolving pipelines
  (measured floor 7.5 us/k/scn ungrouped vs 2.2 us/k/scn at G=8).

Layout: DMA blocks are (rows = n rounded to 8, lanes = n rounded to 128) —
the lane pad alone nearly doubles effective DMA bandwidth vs raw n=240
blocks (measured 117 -> 220 GB/s).  In VMEM the matrices are square
(nc, nc), zero-padded; Newton-Schulz preserves zero padding, so no
identity-block fixup is needed.

The B (x) I off-diagonal application uses the slot-recombination identity
of ``banded.bxbt``; with X symmetric,

    (C (x) I) X (C (x) I)^T  =  colmix(C, rowmix(C, X))

is two sets of scaled block adds (VPU) — no transpose, no extra MXU work.

Precision: Mosaic supports HIGHEST (6 bf16 passes) and DEFAULT (1 pass)
natively but not HIGH, so "high" is a manual bf16x3 hi/lo split — the same
3-pass scheme ``factorize_X`` measured numerically identical to HIGHEST for
the self-correcting NS iteration at 2.55x the speed.

The exact anchors of ``factorize_X`` (k = 0..2 and k = K-1, plain Cholesky
inverses) stay on the XLA path: the chain splits cleanly at anchors, and 4
of K steps are not worth a Pallas Cholesky.  Semantics match
``factorize_X(D, C, ns_iters=j, ns_anchor=0)`` — the production
configuration (``utils/config.py:SolverConfig.production``).

Replaces the per-iteration OSQP ``setup()`` factorization of the reference
(``/root/reference/src/path_planning/solvers/scp.py:441-443``) at large N.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _pick_group(B: int, n: int) -> int:
    """Largest group with the kernel's VMEM footprint within budget:
    square scratch G*nc^2 + in/out revolving buffers 4*G*nr*nc + warm-start
    block G*nr*nc (all f32), plus compiler temporaries (S/T values, bf16
    splits).  v5e has 128 MB physical VMEM (the kernel passes an explicit
    vmem_limit_bytes); the 40 MB budget admits G=16 at N=40."""
    nc = _round_up(n, 128)
    nr = _round_up(n, 8)
    per_g = 4 * (nc * nc + 5 * nr * nc)
    budget = 40 * 1024 * 1024
    g = max(1, min(16, budget // per_g))
    while B % g:
        g -= 1
    return g


def _make_dot(precision: str):
    if precision == "high":
        def dot3(a, b):
            ah = a.astype(jnp.bfloat16)
            al = (a - ah.astype(jnp.float32)).astype(jnp.bfloat16)
            bh = b.astype(jnp.bfloat16)
            bl = (b - bh.astype(jnp.float32)).astype(jnp.bfloat16)
            hh = jnp.dot(ah, bh, preferred_element_type=jnp.float32)
            hl = jnp.dot(ah, bl, preferred_element_type=jnp.float32)
            lh = jnp.dot(al, bh, preferred_element_type=jnp.float32)
            return hh + (hl + lh)
        return dot3
    prec = {"highest": jax.lax.Precision.HIGHEST,
            "default": jax.lax.Precision.DEFAULT}[precision]

    def dotp(a, b):
        return jnp.dot(a, b, preferred_element_type=jnp.float32,
                       precision=prec)
    return dotp


def _ns_chain_kernel(ns_iters: int, G: int, n: int, nr: int, nc: int,
                     precision: str):
    """One (group, k) grid step: advance G scenario chains by one k.

    Scratch X (G, nc, nc) persists across the k axis (innermost grid dim);
    at k == 0 it is (re)loaded from the group's warm-start block, so each
    group's chains are independent."""
    n2 = n // 3
    dot = _make_dot(precision)

    def kern(c_ref, xs_ref, d_ref, o_ref, x_scr):
        k = pl.program_id(1)

        @pl.when(k == 0)
        def _():
            x_scr[:, :nr, :] = xs_ref[:]
            if nc > nr:
                x_scr[:, nr:, :] = jnp.zeros((G, nc - nr, nc), jnp.float32)

        def rowmix(M):
            # (C_k (x) I) M on the n valid rows (slot-row scaled adds)
            bs = [M[s * n2:(s + 1) * n2, :] for s in range(3)]
            return jnp.concatenate(
                [c_ref[0, s, 0] * bs[0] + c_ref[0, s, 1] * bs[1]
                 + c_ref[0, s, 2] * bs[2] for s in range(3)], axis=0)

        def colmix(M):
            # M (C_k (x) I)^T on the n valid cols
            bs = [M[:, s * n2:(s + 1) * n2] for s in range(3)]
            return jnp.concatenate(
                [c_ref[0, s, 0] * bs[0] + c_ref[0, s, 1] * bs[1]
                 + c_ref[0, s, 2] * bs[2] for s in range(3)], axis=1)

        for g in range(G):
            X = x_scr[g]
            # S_k = D_k - (C (x) I) X (C (x) I)^T  (symmetric; colmix form
            # avoids a transpose), zero-padded back to (nc, nc)
            W = colmix(rowmix(X[:n, :]))                       # (n, n)
            Dg = d_ref[g, 0]                                   # (nr, nc)
            S = Dg[:n, :] - jnp.concatenate(
                [W, jnp.zeros((n, nc - n), jnp.float32)], axis=1)
            if nc > n:
                S = jnp.concatenate(
                    [S, jnp.zeros((nc - n, nc), jnp.float32)], axis=0)
            for _ in range(ns_iters):
                T = dot(S, X)
                X = 2.0 * X - dot(X, T)
            X = 0.5 * (X + X.T)
            x_scr[g] = X
            o_ref[g, 0] = X[:nr, :]

    return kern


@functools.partial(jax.jit, static_argnames=("ns_iters", "precision",
                                             "group", "interpret"))
def ns_chain_interior(D_int, C_int, X_start, *, ns_iters: int,
                      precision: str = "highest", group: int | None = None,
                      interpret: bool = False):
    """Run the interior NS chain.

    D_int:  (B, Kin, n, n) interior diagonal blocks (k = 3..K-2)
    C_int:  (Kin, 3, 3) batch-shared slot scalars (C[k-1] for those k)
    X_start: (B, n, n) warm start (the exact X_2 anchor)
    precision: "highest" | "high" (manual bf16x3) | "default"
    Returns X for the interior steps: (B, Kin, n, n).
    """
    B, Kin, n, _ = D_int.shape
    nr = _round_up(n, 8)
    nc = _round_up(n, 128)
    G = _pick_group(B, n) if group is None else group
    if B % G:
        raise ValueError(f"batch {B} not divisible by group {G}")
    if nr != n or nc != n:
        padw = ((0, 0), (0, 0), (0, nr - n), (0, nc - n))
        D_int = jnp.pad(D_int, padw)
        X_start = jnp.pad(X_start, ((0, 0), (0, nr - n), (0, nc - n)))

    out = pl.pallas_call(
        _ns_chain_kernel(ns_iters, G, n, nr, nc, precision),
        grid=(B // G, Kin),
        in_specs=[
            pl.BlockSpec((1, 3, 3), lambda g, k: (k, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((G, nr, nc), lambda g, k: (g, 0, 0)),
            pl.BlockSpec((G, 1, nr, nc), lambda g, k: (g, k, 0, 0)),
        ],
        out_specs=pl.BlockSpec((G, 1, nr, nc), lambda g, k: (g, k, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, Kin, nr, nc), jnp.float32),
        scratch_shapes=[pltpu.VMEM((G, nc, nc), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            # v5e physical VMEM is 128 MB; Mosaic's 16 MB default would
            # reject G >= 8 at N=40 (measured 16.7 MB)
            vmem_limit_bytes=min(
                110 * 1024 * 1024,
                int(1.3 * 4 * G * (nc * nc + 5 * nr * nc))
                + 8 * 1024 * 1024)),
        interpret=bool(interpret),
    )(C_int, X_start, D_int)
    return out[..., :n, :n]


def _exact_steps(Xprev, Dk, Ck):
    """One exact anchor step, batched over the leading axis.  The result is
    pinned to D's dtype: under x64 ``_spd_inv`` promotes through jnp.eye."""
    from ...solvers.banded import _spd_inv, bxbt
    return _spd_inv(Dk - bxbt(Ck, Xprev)).astype(Dk.dtype)


def factorize_X_chain_batched(D, C, *, ns_iters: int,
                              ns_precision: str = "highest",
                              group: int | None = None,
                              interpret: bool = False):
    """Batched ``factorize_X(..., ns_anchor=0)``: exact XLA anchors at
    k = 0..2 and K-1, fused Pallas NS chain for k = 3..K-2.

    D: (B, K, n, n); C: (K-1, 3, 3) batch-shared.  Returns (B, K, n, n).
    """
    from ...solvers.banded import _spd_inv
    B, K, n, _ = D.shape
    assert K >= 6, "chain split needs K >= 6 (anchors at 0..2 and K-1)"
    if D.dtype != jnp.float32:
        raise ValueError(f"chain kernel is float32-only, got {D.dtype}")
    X0 = _spd_inv(D[:, 0]).astype(D.dtype)
    X1 = _exact_steps(X0, D[:, 1], C[0])
    X2 = _exact_steps(X1, D[:, 2], C[1])
    Xint = ns_chain_interior(D[:, 3:K - 1], C[2:K - 2], X2,
                             ns_iters=ns_iters, precision=ns_precision,
                             group=group, interpret=interpret)
    XK = _exact_steps(Xint[:, -1], D[:, K - 1], C[K - 2])
    return jnp.concatenate(
        [X0[:, None], X1[:, None], X2[:, None], Xint, XK[:, None]], axis=1)


@functools.lru_cache(maxsize=None)
def chain_factorizer(ns_iters: int, ns_precision_name: str = "highest"):
    """Per-scenario X-form factorization whose vmap rule dispatches the
    fused chain kernel (the SCP engine is written per-scenario and vmapped
    by the drivers).  C must be batch-shared — true for the production rho
    pattern (``rho_pattern_masks``; collision rows only touch D)."""
    xla_prec = {"highest": None,             # factorize_X: None = HIGHEST
                "high": jax.lax.Precision.HIGH,
                "default": jax.lax.Precision.DEFAULT}[ns_precision_name]

    @jax.custom_batching.custom_vmap
    def fac(D, C):
        from ...solvers.banded import factorize_X
        return factorize_X(D, C, ns_iters=ns_iters, ns_anchor=0,
                           ns_precision=xla_prec)

    @fac.def_vmap
    def _rule(axis_size, in_batched, D, C):
        db, cb = in_batched
        if cb or not db or D.dtype != jnp.float32:
            # batched slot scalars (e.g. per-scenario adaptive rho) cannot
            # share the kernel's SMEM C stream — keep the XLA scan path
            from ...solvers.banded import factorize_X
            bd = 0 if db else None
            bc = 0 if cb else None
            out = jax.vmap(
                lambda d, c: factorize_X(d, c, ns_iters=ns_iters,
                                         ns_anchor=0, ns_precision=xla_prec),
                in_axes=(bd, bc), axis_size=axis_size)(D, C)
            return out, True
        return factorize_X_chain_batched(
            D, C, ns_iters=ns_iters, ns_precision=ns_precision_name), True

    return fac
