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


def admm_iteration_flops(n_vehicles: int, n_steps: int, cg_iters: int) -> int:
    """Estimated FLOPs of one ADMM iteration for one scenario.

    Counts the dominant terms: collision einsums (2 * N * P * K * 2 MACs per
    operator application), prefix sums (~6 passes over N*K*2), and the
    preconditioner's two K x K matmuls per CG step.  Used to report measured
    throughput as a fraction of chip peak.
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
