"""Configuration layer.

The reference keeps its knobs in scattered inline dicts and hard-coded
constants (``compute_trajectories_batch.py:14-24``, ``compute_trajectories.py:16-20``,
``scp.py:32-74``) and ships an empty ``configs/`` TODO stub.  This module is
the real config system: frozen dataclasses (hashable, so they can be passed
as jit static args) plus YAML loading.

Default values replicate the reference exactly (``scp.py:32-74``).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Any


@dataclass(frozen=True)
class Limits:
    """State-space box limits (reference defaults at scp.py:63-74)."""
    vel_min: float = -2.0
    vel_max: float = 2.0
    acc_min: float = -15.0
    acc_max: float = 15.0
    jerk_min: float = -20.0
    jerk_max: float = 20.0
    pos_min: tuple[float, float] = (0.0, 0.0)
    pos_max: tuple[float, float] = (20.0, 20.0)


@dataclass(frozen=True)
class ProblemConfig:
    """SCP problem definition (reference ctor signature, scp.py:31-49)."""
    n_vehicles: int = 5
    time_horizon: float = 3.0
    time_step: float = 0.1
    min_distance: float = 0.1
    space_dims: tuple[float, float, float, float] = (0.0, 0.0, 20.0, 20.0)
    max_iterations: int = 15
    convergence_tolerance: float = 1.5e-2   # scp.py:52
    # SCP loop stopping rule:
    #   "reference": step-norm convergence only, exactly scp.py:152-166 (the
    #     reference never re-checks feasibility once iterating)
    #   "feasible": keep iterating until the iterate's trajectory is actually
    #     collision-free (or max_iterations) — goal-directed; usually exits
    #     earlier AND yields far more collision-free solutions
    stop_mode: str = "reference"
    # Exact terminal-equality projection ("goal polish"): close the terminal
    # residual a fixed-budget ADMM solve leaves on the hard equality rows
    # (scp.py:242-257) with the closed-form least-norm acceleration
    # correction (DoubleIntegrator2D.goal_projection).  The stop rule and
    # the final output both use the projected iterate, falling back to the
    # raw iterate per scenario if the projection breaks collision
    # feasibility.  Off by default (reference semantics untouched).
    goal_project: bool = False
    vel_min: float = -2.0
    vel_max: float = 2.0
    acc_min: float = -15.0
    acc_max: float = 15.0
    jerk_min: float = -20.0
    jerk_max: float = 20.0

    @property
    def n_steps(self) -> int:
        """K = int(T/h), truncating exactly as scp.py:43."""
        return int(self.time_horizon / self.time_step)

    @property
    def n_pairs(self) -> int:
        return self.n_vehicles * (self.n_vehicles - 1) // 2

    @property
    def limits(self) -> Limits:
        return Limits(vel_min=self.vel_min, vel_max=self.vel_max,
                      acc_min=self.acc_min, acc_max=self.acc_max,
                      jerk_min=self.jerk_min, jerk_max=self.jerk_max,
                      pos_min=tuple(self.space_dims[:2]),
                      pos_max=tuple(self.space_dims[2:]))

    def replace(self, **kw) -> "ProblemConfig":
        return dataclasses.replace(self, **kw)


@dataclass(frozen=True)
class SolverStatic:
    """Structural solver options — part of the jit static cache key.
    Changing these recompiles; changing SolverConfig numerics does not."""
    rho_eq_scale: float = 1e3        # OSQP: rho boost on equality rows
    adaptive_rho: bool = True        # OSQP-style residual-balancing rho updates
    polish: bool = True              # active-set KKT polish after ADMM
    operator_impl: str = "scan"      # "scan" (VPU prefix sums) | "matmul" (MXU)
    method: str = "cg"               # "cg" (accel-space PCG) | "direct"
    #                                  (state-space block-tridiag Cholesky)
    pallas: bool = False             # fused Pallas kernel for banded solves
    fused: bool = False              # whole-interval fused ADMM kernel
    group: int = 0                   # scenarios per serial step in the
    #                                  grouped streaming solve (0 = off)
    factor_dtype: str = "f32"        # "f32" | "bf16" factor storage (direct)
    # Factor form for the grouped streaming solve:
    #   "L": inverted Cholesky diagonal factors Linv_k (two triangular-shaped
    #        matvecs per recurrence step)
    #   "X": symmetric block inverses X_k = S_k^{-1} (ONE matvec per step;
    #        enables the Newton-Schulz warm-started factorization below)
    factor_form: str = "L"
    # X-form factorization: number of Newton-Schulz iterations per interior
    # step, warm-started from X_{k-1} (0 = exact inverse at every step), and
    # the exact-anchor cadence (every ns_anchor-th step is computed exactly;
    # 0 = anchors only at k = 0 and k = K-1, where the rho pattern jumps)
    ns_iters: int = 0
    ns_anchor: int = 0
    # NS matmul precision: "highest" (6-pass f32) | "high" (bf16x3 — same
    # measured NS residual at 2.55x the factorization speed) | "default"
    ns_precision: str = "highest"
    # Collision normal-block assembly precision (the K x (2N)^2 x P einsum
    # dominating QP setup at large N); "default" = bf16 inputs with f32
    # accumulation — error ~1e-3 relative, far below the NS residual
    assemble_precision: str = "highest"


@dataclass(frozen=True)
class SolverConfig:
    """Batched ADMM QP solver settings (OSQP-compatible defaults).

    The reference delegates to OSQP with default settings plus
    ``warm_start=True, max_iter=10000`` (scp.py:360, 442).

    Numeric fields are passed to the compiled solver as *traced* scalars, so
    sweeping them reuses one executable; structural fields (see
    :class:`SolverStatic`) are static and trigger recompilation.
    """
    rho: float = 0.1
    sigma: float = 1e-6
    alpha: float = 1.6
    eps_abs: float = 1e-3
    eps_rel: float = 1e-3
    max_iter: int = 4000
    check_interval: int = 25         # residual check cadence
    rho_eq_scale: float = 1e3        # OSQP: rho boost on equality rows
    adaptive_rho: bool = True        # OSQP-style residual-balancing rho updates
    cg_iters: int = 20               # PCG iterations for the x-update
    cg_tol: float = 1e-7             # PCG relative tolerance (early exit)
    polish: bool = True              # active-set KKT polish after ADMM
    polish_cg_iters: int = 40        # CG iterations for the polish solve
    operator_impl: str = "scan"      # "scan" (VPU prefix sums) | "matmul" (MXU)
    method: str = "cg"               # QP solver: "cg" | "direct" (see SolverStatic)
    pallas: bool = False             # fused Pallas kernel for banded solves
    fused: bool = False              # whole-interval fused ADMM kernel
    group: int = 0                   # scenarios per serial step in the
    #                                  grouped streaming solve (0 = off)
    factor_dtype: str = "f32"        # "f32" | "bf16" factor storage (direct)
    factor_form: str = "L"           # "L" | "X" grouped-solve factor form
    ns_iters: int = 0                # X-form: Newton-Schulz iters (0 = exact)
    ns_anchor: int = 0               # X-form: exact-anchor cadence (0 = ends)
    ns_precision: str = "highest"    # NS matmul precision (see SolverStatic)
    assemble_precision: str = "highest"  # collision-block einsum precision
    # Exact-penalty weight on collision rows: inf = hard constraints
    # (reference semantics); finite = soft rows that keep infeasible SCP
    # linearizations well-posed (bench/production mode)
    col_penalty: float = float("inf")
    # Extra rho factor on collision rows: > 1 enforces them more tightly at
    # a given termination tolerance (the feasibility slack is only 1 cm)
    col_rho_boost: float = 1.0
    # Constraint tightening: solve collision rows with R + margin so solver
    # noise lands above the true R (robust-MPC-style); feasibility is still
    # checked at the true R - 0.01
    collision_margin: float = 0.0

    def replace(self, **kw) -> "SolverConfig":
        return dataclasses.replace(self, **kw)

    def static_part(self) -> SolverStatic:
        return SolverStatic(rho_eq_scale=self.rho_eq_scale,
                            adaptive_rho=self.adaptive_rho,
                            polish=self.polish,
                            operator_impl=self.operator_impl,
                            method=self.method, pallas=self.pallas,
                            fused=self.fused, group=self.group,
                            factor_dtype=self.factor_dtype,
                            factor_form=self.factor_form,
                            ns_iters=self.ns_iters,
                            ns_anchor=self.ns_anchor,
                            ns_precision=self.ns_precision,
                            assemble_precision=self.assemble_precision)

    @classmethod
    def production(cls, pallas: bool | None = None,
                   n_vehicles: int | None = None,
                   problem: "ProblemConfig | None" = None) -> "SolverConfig":
        """Tuned high-throughput configuration (TPU-measured, round 1):
        state-space direct solver, fused Pallas substitution kernel,
        constraint tightening that keeps eps-level noise above the true
        safety radius.  ~65 collision-free solves/s/chip at the reference
        benchmark config with 100% feasibility.

        ``pallas=None`` auto-detects: the fused kernel compiles only on TPU
        backends (CPU falls back to the XLA scan path).

        Numerics re-tuned on v5e with the compacting driver
        (scripts/ab_bench.py, round 2): a 25-iteration ADMM budget at
        rho 2.6 / collision-rho boost 2.5 trades slightly more SCP
        re-linearizations (mean 1.37 vs 1.25) for cheaper QP solves, and
        2 Newton-Schulz iterations (down from 3) lose no SCP iterations —
        1056 vs 983 solves/s at 100% collision-free over 1024 randomized
        benchmark scenarios (N=20, K=50).

        Validated range: these constants (fixed 25-iteration ADMM budget with
        a single terminal residual check, ns_iters=2 approximate factors,
        collision margin 0.13) were tuned at N=20/K=50/h=0.2/R=0.8 and
        validated 100% collision-free over the committed N=10..40 sweep at
        that horizon (docs/soak_nsweep_v5e.json).  At materially different
        K, h, or R the safety story rests on collision_margin plus the
        post-hoc feasibility check — re-validate (scripts/soak_and_nsweep.py)
        before trusting the tuned budget elsewhere."""
        if pallas is None:
            try:
                import jax
                pallas = jax.default_backend() not in ("cpu",)
            except Exception:
                pallas = False
        # fused=True enables the whole-interval X-form kernel where its
        # resident factors fit AND the grouped kernel's auto group is
        # starved (solve_qp_state routing) — measured N=30/K=50: 163 ->
        # 360 solves/s, N=20 unchanged (grouped path still selected).
        cfg = cls(method="direct", pallas=pallas, fused=pallas, rho=2.6,
                  max_iter=25, check_interval=25, collision_margin=0.13,
                  polish=False, adaptive_rho=False, factor_form="X",
                  ns_iters=2, alpha=1.9, col_rho_boost=2.5,
                  # NS matmuls at 3-pass bf16x3: measured residual-identical
                  # to HIGHEST for the self-correcting NS iteration
                  # (banded.factorize_X docstring, r4) and r5 A/B at N=40:
                  # 239.7 -> 259.9 solves/s at equal feasibility (1024/1024)
                  # and equal SCP iterations (2.34 vs 2.35)
                  ns_precision="high",
                  assemble_precision="default")
        if problem is not None and n_vehicles is None:
            n_vehicles = problem.n_vehicles
        if n_vehicles is not None and n_vehicles >= 25:
            # large-N retune (r4 sweep at N=30/40): a stiffer rho cuts mean
            # SCP re-linearizations 1.91 -> 1.74 at equal feasibility
            cfg = cfg.replace(rho=5.2)
        if problem is not None:
            # the bf16-input collision-block assembly ("default") and the
            # tuned fixed budget were validated at the benchmark horizon
            # only (N=10..40, K=50, h=0.2, R=0.8); outside that envelope
            # fall back to full-precision assembly (ADVICE r3)
            in_envelope = (problem.n_steps == 50
                           and abs(problem.time_step - 0.2) < 1e-9
                           and abs(problem.min_distance - 0.8) < 1e-9)
            if not in_envelope:
                cfg = cfg.replace(assemble_precision="highest")
        return cfg

    @classmethod
    def latency(cls, pallas: bool | None = None) -> "SolverConfig":
        """Single-scenario latency-tuned configuration: same solution
        quality as :meth:`production`, but the ADMM budget is split into
        9-iteration intervals with residual-check early exit — a lone
        scenario pays its ACTUAL iteration count instead of the full
        batch-tuned 25-iteration budget (swept in
        scripts/latency_sweep.py: min latency 38.1 ms vs 44.2 ms for the
        production budget at N=20/K=50; p50 is dominated by the ~25-35 ms
        remote-tunnel round trip on this host)."""
        return cls.production(pallas).replace(max_iter=27, check_interval=9)


def load_yaml(path: str) -> dict[str, Any]:
    """Load a YAML config file (PyYAML if available, minimal parser otherwise)."""
    try:
        import yaml
        with open(path) as f:
            return yaml.safe_load(f)
    except ImportError:
        return _parse_simple_yaml(path)


def _parse_simple_yaml(path: str) -> dict[str, Any]:
    """Tiny fallback parser: flat and one-level-nested 'key: value' YAML."""
    import ast
    out: dict[str, Any] = {}
    stack = [out]
    indents = [0]
    with open(path) as f:
        for raw in f:
            line = raw.split('#', 1)[0].rstrip()
            if not line.strip():
                continue
            indent = len(line) - len(line.lstrip())
            key, _, val = line.strip().partition(':')
            val = val.strip()
            while indent < indents[-1]:
                stack.pop()
                indents.pop()
            if not val:
                child: dict[str, Any] = {}
                stack[-1][key] = child
                stack.append(child)
                indents.append(indent + 2)
            else:
                try:
                    stack[-1][key] = ast.literal_eval(val)
                except (ValueError, SyntaxError):
                    stack[-1][key] = val
    return out


def problem_from_dict(d: dict[str, Any]) -> ProblemConfig:
    fields = {f.name for f in dataclasses.fields(ProblemConfig)}
    kw = {k: v for k, v in d.items() if k in fields}
    if 'space_dims' in kw:
        kw['space_dims'] = tuple(kw['space_dims'])
    return ProblemConfig(**kw)


def solver_from_dict(d: dict[str, Any]) -> SolverConfig:
    fields = {f.name for f in dataclasses.fields(SolverConfig)}
    return SolverConfig(**{k: v for k, v in d.items() if k in fields})
