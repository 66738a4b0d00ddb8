"""Profiling / tracing helpers.

The reference's only observability is wall-clock prints (``scp.py:135,
177-178``; ``compute_trajectories_batch.py:46-66``).  Here: jax.profiler
trace capture around solve steps (XProf/Perfetto-compatible), simple phase
timers, and a roofline estimator for the ADMM iteration so kernel efficiency
can be reported against speed-of-light (SURVEY.md section 6).
"""

from __future__ import annotations

import contextlib
import json
import time
from dataclasses import dataclass, field


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace around a block (view with XProf)."""
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@dataclass
class PhaseTimer:
    """Accumulates wall time per named phase; reports a JSON-able summary."""
    phases: dict = field(default_factory=dict)

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.phases[name] = self.phases.get(name, 0.0) + (
                time.perf_counter() - t0)

    def summary(self) -> dict:
        total = sum(self.phases.values())
        return {"total_sec": total,
                "phases": {k: {"sec": v, "frac": v / total if total else 0.0}
                           for k, v in self.phases.items()}}

    def report(self) -> str:
        return json.dumps(self.summary(), indent=2)


def lane_pad(n: int, lanes: int = 128) -> int:
    """Pad to the TPU lane count (the padded super-block width np)."""
    return ((n + lanes - 1) // lanes) * lanes


def direct_xupdate_cost(n_vehicles: int, n_steps: int,
                        itemsize: int = 4) -> dict:
    """Cost model of ONE production x-update (X-form banded solve) for one
    scenario: the forward and backward substitution sweeps each read all K
    padded (np, np) symmetric-inverse blocks once and do one dense matvec
    per step (``banded.solve_factorized_X``).  The sweeps are HBM-bound:
    the factor stream is ~np/5 times larger than every vector touched.
    """
    K = n_steps
    npad = lane_pad(6 * n_vehicles)
    flops = 2 * K * 2 * npad * npad            # 2 sweeps x K matvecs
    hbm_bytes = 2 * K * npad * npad * itemsize  # factor stream dominates
    return {"flops": flops, "hbm_bytes": hbm_bytes, "np": npad}


def admm_iteration_cost(n_vehicles: int, n_steps: int,
                        itemsize: int = 4) -> dict:
    """Cost model of one production ADMM iteration (direct path): the
    x-update banded solve plus the constraint-operator applications
    (apply_A + apply_AT: collision einsums 2NPK MACs each, plus O(NK)
    elementwise row work) and the z/y updates."""
    N, K = n_vehicles, n_steps
    P = N * (N - 1) // 2
    xup = direct_xupdate_cost(N, K, itemsize)
    einsum = 2 * (2 * N * P * K * 2) * 2       # A and A^T, 2 flops/MAC
    rowwork = 12 * (6 * N * K)                 # z/y/rhs elementwise passes
    row_bytes = 10 * (6 * N * K + K * P) * itemsize
    return {"flops": xup["flops"] + einsum + rowwork,
            "hbm_bytes": xup["hbm_bytes"] + row_bytes}


def factorize_X_cost(n_vehicles: int, n_steps: int, ns_iters: int = 2,
                     n_anchors: int = 4, itemsize: int = 4) -> dict:
    """Cost model of the X-form factorization for one scenario QP
    (``banded.factorize_X``): per interior step, ``ns_iters`` Newton-Schulz
    iterations of two (np, np) matmuls each plus the bxbt slot
    recombination; exact anchors pay a blocked Cholesky + inversion
    (~(7/3) np^3 MACs).  MXU-bound at production sizes.
    """
    K = n_steps
    npad = lane_pad(6 * n_vehicles)
    interior = (K - n_anchors) * (ns_iters * 2 * 2 * npad ** 3
                                  + 4 * npad * npad)
    anchors = n_anchors * int((7 / 3) * 2 * npad ** 3)
    hbm_bytes = 3 * K * npad * npad * itemsize   # D in, X out, warm X re-read
    return {"flops": interior + anchors, "hbm_bytes": hbm_bytes, "np": npad}


def admm_iteration_flops(n_vehicles: int, n_steps: int, cg_iters: int) -> int:
    """FLOPs of one ADMM iteration of the VALIDATION-tier accel-space CG
    solver (``solvers/admm.py``) — kept for A/B accounting; the production
    path is modeled by :func:`admm_iteration_cost`.

    Counts the dominant terms: collision einsums (2 * N * P * K * 2 MACs per
    operator application), prefix sums (~6 passes over N*K*2), and the
    preconditioner's two K x K matmuls per CG step.
    """
    N, K = n_vehicles, n_steps
    P = N * (N - 1) // 2
    einsum = 2 * (2 * N * P * K * 2)          # apply + adjoint, 2 flops/MAC
    scans = 6 * (N * K * 2) * 2
    op_pair = einsum + scans                   # one A + A^T application
    precond = 2 * (2 * K * K * N * 2)
    # per ADMM iter: rhs A^T, CG (cg_iters x (matvec + precond)), final A
    return op_pair + cg_iters * (op_pair + precond) + op_pair // 2


def solve_flops(n_vehicles: int, n_steps: int, cg_iters: int,
                admm_iters: int, scp_iters: int) -> int:
    return admm_iteration_flops(n_vehicles, n_steps, cg_iters) * admm_iters


# Public v5e per-chip peaks (cloud.google.com/tpu/docs/v5e): 197 TFLOP/s
# bf16 MXU, 819 GB/s HBM bandwidth.  float32 matmuls at HIGHEST precision
# run as 6 bf16 passes (~33 TFLOP/s effective ceiling).
V5E_PEAK_BF16_FLOPS = 197e12
V5E_PEAK_F32_HIGHEST_FLOPS = V5E_PEAK_BF16_FLOPS / 6
V5E_PEAK_HBM_BYTES = 819e9
