"""Sequential Convex Programming engine — jitted functional core + class API.

Control flow replicates the reference solver exactly
(``/root/reference/src/path_planning/solvers/scp.py:131-180``):

  1. solve the initial QP without collision rows            (scp.py:138)
  2. roll out; if the initial guess is already collision-free, skip the
     SCP loop entirely                                       (scp.py:144,152)
  3. while iter < max_iterations and not converged (and not feasible):
     re-linearize collisions about the previous iterate, re-solve the QP
     warm-started at the previous accelerations, declare convergence when
     ||a+ - a|| / ||a|| <= 1.5e-2                             (scp.py:152-166)
  4. final rollout -> trajectories dict of (N, K, 2) arrays  (scp.py:168-180)

TPU-native differences (SURVEY.md section 8): the loop is a
``lax.while_loop`` inside one jitted program; collision rows exist from the
start with fixed shape (K, P) and are enabled by a mask, so a single compiled
executable serves both phases; the whole solve is vmappable over scenario
batches; degenerate-pair directions come from a per-(scenario, iteration)
PRNG fold instead of unseeded ``np.random`` (scp.py:505).

Per-scenario failure handling carries status codes in the result instead of
raising (a failed scenario must not kill a batch — mirroring the batch
harness's isolation semantics, ``compute_trajectories_batch.py:50-54``).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops.collisions import (PairIndex, check_feasible, collision_lower_bounds,
                              linearize, make_pair_index)
from ..ops.constraints import ConstraintBlocks, static_bounds
from ..ops.rollout import rollout
from ..utils.config import ProblemConfig, SolverConfig, SolverStatic
from .admm import (QPData, SolverParams, build_static_normal_inverse,
                   make_solver_params, solve_qp_impl)

# Status codes (per-scenario, carried in the batch)
STATUS_FEASIBLE_INITIAL = 0   # initial QP already collision-free, loop skipped
STATUS_CONVERGED = 1          # SCP step-norm convergence (scp.py:161)
STATUS_MAX_ITERS = 2          # hit max_iterations without converging


class SCPResult(NamedTuple):
    positions: jnp.ndarray        # (..., N, K, 2)
    velocities: jnp.ndarray       # (..., N, K, 2)
    accelerations: jnp.ndarray    # (..., N, K, 2)
    iterations: jnp.ndarray       # (...) SCP iterations actually run
    status: jnp.ndarray           # (...) status code above
    converged: jnp.ndarray        # (...) bool: step-norm converged
    feasible_initial: jnp.ndarray  # (...) bool: pre-loop feasibility (scp.py:144)
    feasible_final: jnp.ndarray   # (...) bool: final trajectory collision-free
    qp_iterations: jnp.ndarray    # (...) total ADMM iterations across QP solves
    qp_converged_all: jnp.ndarray  # (...) bool: every QP solve converged
    rel_step: jnp.ndarray         # (...) last relative step norm


class SCPEngine:
    """Compiled SCP solver for a fixed (problem, solver) configuration.

    Builds the static artifacts (pair index, preconditioner inverse) once;
    ``solve`` handles a single scenario, ``solve_batch`` a leading batch axis.
    """

    def __init__(self, problem: ProblemConfig,
                 solver: SolverConfig | None = None,
                 dtype=jnp.float32):
        if problem.n_steps < 2:
            raise ValueError(
                f"K = int(T/h) = {problem.n_steps}; need K >= 2")
        self.problem = problem
        self.solver = solver if solver is not None else SolverConfig()
        self.dtype = dtype
        self.pairs = make_pair_index(problem.n_vehicles, dtype=dtype)
        self.Minv = build_static_normal_inverse(problem.n_steps,
                                                problem.time_step,
                                                self.solver, dtype=dtype)
        self.solver_static = self.solver.static_part()
        self.solver_params = make_solver_params(self.solver, dtype)

    def solve_fn(self):
        """The raw (un-jitted) per-scenario solve closure, for callers that
        compose their own jit/vmap/shard_map around it."""
        if self.solver_static.method == "direct":
            return partial(_scp_solve_direct, params=self.solver_params,
                           pairs=self.pairs, problem=self.problem,
                           solver=self.solver_static)
        return partial(_scp_solve, params=self.solver_params,
                       pairs=self.pairs, Minv=self.Minv,
                       problem=self.problem, solver=self.solver_static)

    def start_step_finalize_fns(self):
        """Resumable pieces of the direct path (un-jitted closures), for the
        compacting batch driver: ``start(p0,v0,pf,vf,key) -> carry``,
        ``step(carry, p0,v0,pf,vf, key, it_cap) -> carry``,
        ``finalize(carry, p0, v0, pf, vf) -> SCPResult``."""
        if self.solver_static.method != "direct":
            raise NotImplementedError(
                "resumable SCP requires the direct (state-space) solver")
        kw = dict(params=self.solver_params, pairs=self.pairs,
                  problem=self.problem, solver=self.solver_static)
        start = partial(_scp_start_direct, **kw)
        step = partial(_scp_step_direct, **kw)
        finalize = partial(_scp_finalize_direct, pairs=self.pairs,
                           problem=self.problem)
        return start, step, finalize

    # -- single scenario ---------------------------------------------------

    def solve(self, p0, v0, pf, vf, key=None) -> SCPResult:
        """p0/v0/pf/vf: (N, 2) arrays; key: JAX PRNG key for degenerate pairs."""
        if key is None:
            key = jax.random.key(0)
        args = [jnp.asarray(a, dtype=self.dtype) for a in (p0, v0, pf, vf)]
        return self.solve_fn()(*args, key)

    # -- batched -----------------------------------------------------------

    def solve_batch(self, p0, v0, pf, vf, keys) -> SCPResult:
        """All state arrays (B, N, 2); keys (B,) PRNG keys.  vmapped solve."""
        args = [jnp.asarray(a, dtype=self.dtype) for a in (p0, v0, pf, vf)]
        return jax.vmap(self.solve_fn())(*args, keys)


@partial(jax.jit, static_argnames=("problem", "solver"))
def _scp_solve(p0, v0, pf, vf, key, *, params: SolverParams,
               pairs: PairIndex, Minv, problem: ProblemConfig,
               solver: SolverStatic) -> SCPResult:
    N = problem.n_vehicles
    K = problem.n_steps
    P = problem.n_pairs
    h = problem.time_step
    R = problem.min_distance
    dtype = p0.dtype

    lo_s, up_s = static_bounds(p0, v0, pf, vf, n_vehicles=N, n_steps=K, h=h,
                               limits=problem.limits)
    inf = jnp.asarray(jnp.inf, dtype)
    col_lo_off = jnp.full((K, P), -inf, dtype=dtype)
    col_up = jnp.full((K, P), inf, dtype=dtype)
    eta0 = jnp.zeros((K, P, 2), dtype=dtype)

    # ---- phase 1: initial QP without collision rows (scp.py:138, 323-369)
    data0 = QPData(eta=eta0, col_mask=jnp.asarray(0.0, dtype),
                   lower=ConstraintBlocks(col=col_lo_off, **lo_s),
                   upper=ConstraintBlocks(col=col_up, **up_s))
    x0 = jnp.zeros((N, K, 2), dtype=dtype)
    qp0 = solve_qp_impl(data0, pairs.E, Minv, x0, params, h=h,
                        static=solver)
    a = qp0.x

    a_chk = (_goal_projected(a, p0, v0, pf, vf, problem)
             if problem.goal_project else a)
    pos_init, _ = rollout(a_chk, p0, v0, h)
    feasible_initial = check_feasible(pos_init, pairs, R)

    # ---- phase 2: SCP iterations (scp.py:152-166)
    goal_feasible = problem.stop_mode == "feasible"

    def body(carry):
        a, y_prev, it, converged, stop, rel, qp_iters, qp_ok = carry
        prev_pos, _ = rollout(a, p0, v0, h)
        subkey = jax.random.fold_in(key, it)
        eta, dist = linearize(prev_pos, pairs, subkey)
        # constraint tightening: enforce R + margin so QP-accuracy noise
        # still lands above the true R (feasibility checked at true R)
        col_lo = collision_lower_bounds(eta, dist, prev_pos, p0, v0, pairs,
                                        h=h,
                                        min_distance=R + params.col_margin)
        data = QPData(eta=eta, col_mask=jnp.asarray(1.0, dtype),
                      lower=ConstraintBlocks(col=col_lo, **lo_s),
                      upper=ConstraintBlocks(col=col_up, **up_s))
        qp = solve_qp_impl(data, pairs.E, Minv, a, params, y_prev, h=h,
                           static=solver)
        a_new = qp.x
        # Divergence guard: an infeasible linearization can blow the ADMM
        # iterates up (the dual grows unboundedly).  Any valid QP solution
        # respects the acceleration box, so an iterate far outside it marks a
        # failed solve — reject the step and keep the previous iterate, the
        # counterpart of the reference's warn-and-continue on OSQP failure
        # (scp.py:446-449) without propagating garbage.
        acc_cap = 2.0 * max(abs(problem.acc_min), abs(problem.acc_max))
        bad = jnp.logical_or(jnp.logical_not(jnp.all(jnp.isfinite(a_new))),
                             jnp.max(jnp.abs(a_new)) > acc_cap)
        a_new = jnp.where(bad, a, a_new)
        step = jnp.linalg.norm((a_new - a).reshape(-1))
        denom = jnp.maximum(jnp.linalg.norm(a.reshape(-1)), 1e-30)
        rel_step = step / denom
        converged = rel_step <= problem.convergence_tolerance
        if goal_feasible:
            a_stop = (_goal_projected(a_new, p0, v0, pf, vf, problem)
                      if problem.goal_project else a_new)
            new_pos, _ = rollout(a_stop, p0, v0, h)
            stop = check_feasible(new_pos, pairs, R)
        else:
            stop = converged
        return (a_new, qp.y, it + 1, converged, stop, rel_step,
                qp_iters + qp.iters, jnp.logical_and(qp_ok, qp.converged))

    def cond(carry):
        _, _, it, _, stop, *_ = carry
        return jnp.logical_and(
            it < problem.max_iterations,
            jnp.logical_and(jnp.logical_not(stop),
                            jnp.logical_not(feasible_initial)))

    init = (a, qp0.y, jnp.int32(0), jnp.asarray(False), jnp.asarray(False),
            jnp.asarray(jnp.inf, dtype), qp0.iters, qp0.converged)
    a, _y, iters, converged, stopped, rel_step, qp_iters, qp_ok = \
        jax.lax.while_loop(cond, body, init)

    # ---- final rollout (scp.py:168-180)
    if problem.goal_project:
        a_proj = _goal_projected(a, p0, v0, pf, vf, problem)
        pos_p, _ = rollout(a_proj, p0, v0, h)
        feas_p = check_feasible(pos_p, pairs, R)
        a = jnp.where(feas_p, a_proj, a)
    positions, velocities = rollout(a, p0, v0, h)
    feasible_final = check_feasible(positions, pairs, R)

    # status reflects the active stopping rule (see _scp_solve_direct)
    status = jnp.where(
        feasible_initial, STATUS_FEASIBLE_INITIAL,
        jnp.where(stopped, STATUS_CONVERGED, STATUS_MAX_ITERS))

    return SCPResult(positions=positions, velocities=velocities,
                     accelerations=a, iterations=iters,
                     status=status.astype(jnp.int32), converged=converged,
                     feasible_initial=feasible_initial,
                     feasible_final=feasible_final,
                     qp_iterations=qp_iters, qp_converged_all=qp_ok,
                     rel_step=rel_step)


# ---------------------------------------------------------------------------
# Reference-compatible class API (path_planning.SCP drop-in)
# ---------------------------------------------------------------------------

class SCP:
    """Drop-in equivalent of the reference ``path_planning.SCP`` class
    (``scp.py:31-180``): same constructor signature, ``set_initial_states`` /
    ``set_final_states`` / ``generate_trajectories`` methods, and
    ``trajectories`` dict of (N, K, 2) numpy arrays — backed by the jitted
    TPU engine instead of scipy+OSQP.
    """

    def __init__(self, n_vehicles=5, time_horizon=3.0, time_step=0.1,
                 min_distance=0.1, space_dims=None, *, solver=None,
                 dtype=None, verbose=True):
        if space_dims is None:
            space_dims = [0, 0, 20, 20]
        self.N = n_vehicles
        self.T = time_horizon
        self.h = time_step
        self.K = int(time_horizon / time_step)
        self.R = min_distance
        self.space_dims = list(space_dims)
        self.convergence_tolerance = 1.5e-2
        self.trajectories = None
        self.result: SCPResult | None = None
        self.initial_positions = None
        self.initial_velocities = None
        self.final_positions = None
        self.final_velocities = None
        if solver is None:
            # direct state-space solver: equivalent QP solutions (tested),
            # far faster and float32-safe; hard collision constraints and
            # "reference" stop mode preserve reference semantics
            solver = SolverConfig(method="direct", polish=False,
                                  adaptive_rho=False, max_iter=2000)
        self._solver_cfg = solver
        self._dtype = dtype if dtype is not None else jnp.float32
        self._engine_cache: dict[int, SCPEngine] = {}
        if verbose:
            print("---=== SCP Problem initialized (TPU engine) ===---")
            print(f"Number of timesteps: {self.K}")
            print(f"Timestep: {self.h}")
            print(f"Minimum distance between vehicles: {self.R}")
            print(f"Space dimensions: {self.space_dims}")

    def set_initial_states(self, positions, velocities=None):
        import numpy as np
        positions = np.asarray(positions, dtype=float).reshape(self.N, 2)
        if velocities is None:
            velocities = np.zeros((self.N, 2))
        velocities = np.asarray(velocities, dtype=float).reshape(self.N, 2)
        self.initial_positions = positions.reshape(-1)
        self.initial_velocities = velocities.reshape(-1)

    def set_final_states(self, positions, velocities=None):
        import numpy as np
        positions = np.asarray(positions, dtype=float).reshape(self.N, 2)
        if velocities is None:
            velocities = np.zeros((self.N, 2))
        velocities = np.asarray(velocities, dtype=float).reshape(self.N, 2)
        self.final_positions = positions.reshape(-1)
        self.final_velocities = velocities.reshape(-1)

    def _engine(self, max_iterations: int) -> SCPEngine:
        if max_iterations not in self._engine_cache:
            problem = ProblemConfig(
                n_vehicles=self.N, time_horizon=self.T, time_step=self.h,
                min_distance=self.R, space_dims=tuple(self.space_dims),
                max_iterations=max_iterations)
            self._engine_cache[max_iterations] = SCPEngine(
                problem, self._solver_cfg, dtype=self._dtype)
        return self._engine_cache[max_iterations]

    def generate_trajectories(self, max_iterations=15, seed=0):
        import time as _time
        import numpy as np
        if self.initial_positions is None or self.final_positions is None:
            raise ValueError("Set initial and final states first")
        t0 = _time.time()
        engine = self._engine(max_iterations)
        res = engine.solve(self.initial_positions.reshape(self.N, 2),
                           self.initial_velocities.reshape(self.N, 2),
                           self.final_positions.reshape(self.N, 2),
                           self.final_velocities.reshape(self.N, 2),
                           key=jax.random.key(seed))
        res = jax.tree.map(np.asarray, res)
        self.result = res
        self.trajectories = {
            "positions": res.positions,
            "velocities": res.velocities,
            "accelerations": res.accelerations,
        }
        print(f"Trajectory generation completed in {_time.time() - t0:.3f} "
              f"seconds ({int(res.iterations)} SCP iterations, "
              f"status={int(res.status)})")
        return self.trajectories

    # -- visualization (delegates to the viz layer) ------------------------

    def visualize_trajectories(self, show_animation=False,
                               save_path="trajectories.pdf"):
        from ..viz.plots import plot_trajectories
        if self.trajectories is None:
            raise ValueError("Trajectories not generated yet")
        return plot_trajectories(self.trajectories["positions"],
                                 self.space_dims, self.R,
                                 save_path=save_path, show=show_animation)

    def visualize_time_snapshots(self, num_snapshots=5, save_path=None):
        from ..viz.plots import plot_time_snapshots
        if self.trajectories is None:
            raise ValueError("Trajectories not generated yet")
        return plot_time_snapshots(self.trajectories["positions"],
                                   self.space_dims, self.R, self.h,
                                   num_snapshots=num_snapshots,
                                   save_path=save_path)


# ---------------------------------------------------------------------------
# Direct (state-space) SCP path: exact block-tridiagonal QP solves
# ---------------------------------------------------------------------------

def _warm_state(a, p0, v0, h):
    """StateVars warm start with p/v from the exact rollout of ``a``.

    Variables are p[1..K], v[1..K]; rollout returns indices 0..K-1, so shift
    by one and extrapolate the terminal state via the dynamics model.
    """
    from ..models.double_integrator import DoubleIntegrator2D
    from .banded import StateVars
    pos, vel = rollout(a, p0, v0, h)
    model = DoubleIntegrator2D(n_steps=a.shape[-2], time_step=h)
    pK, vK = model.terminal_state(pos, vel, a)
    p_var = jnp.concatenate([pos[..., 1:, :], pK[..., None, :]], axis=-2)
    v_var = jnp.concatenate([vel[..., 1:, :], vK[..., None, :]], axis=-2)
    return StateVars(a=a, p=p_var, v=v_var)


class SCPCarry(NamedTuple):
    """Resumable per-scenario SCP loop state.

    Everything the loop body needs between SCP iterations, so a batch can be
    paused, compacted on the host (drop finished lanes), and resumed — the
    PRNG fold uses the global iteration index carried here, making a resumed
    run bit-identical to an uninterrupted one.
    """
    a: jnp.ndarray                 # (N, K, 2) current accelerations
    y: object                      # RowVals dual warm start
    it: jnp.ndarray                # int32 SCP iterations run so far
    converged: jnp.ndarray         # bool: step-norm converged
    stop: jnp.ndarray              # bool: active stopping rule fired
    rel: jnp.ndarray               # last relative step norm
    qp_iters: jnp.ndarray          # int32 total ADMM iterations
    qp_ok: jnp.ndarray             # bool: every QP solve converged
    feasible_initial: jnp.ndarray  # bool: pre-loop feasibility (scp.py:144)


def _goal_projected(a, p0, v0, pf, vf, problem: ProblemConfig):
    """Exact terminal-equality projection (see ProblemConfig.goal_project)."""
    from ..models.double_integrator import DoubleIntegrator2D
    model = DoubleIntegrator2D(n_steps=problem.n_steps,
                               time_step=problem.time_step)
    return model.goal_projection(a, p0, v0, pf, vf)


def _direct_body(p0, v0, pf, vf, key, lower_s, upper_s, *,
                 params: SolverParams,
                 pairs: PairIndex, problem: ProblemConfig,
                 solver: SolverStatic, axis_name: str | None = None):
    """One SCP iteration of the direct (state-space) path as a function of
    :class:`SCPCarry` — shared by the monolithic solve and the resumable
    step so their semantics cannot drift."""
    from .banded import collision_lower_bounds_state, solve_qp_state

    N = problem.n_vehicles
    h = problem.time_step
    R = problem.min_distance
    goal_feasible = problem.stop_mode == "feasible"

    def body(carry: SCPCarry) -> SCPCarry:
        a = carry.a
        prev_pos, _ = rollout(a, p0, v0, h)
        subkey = jax.random.fold_in(key, carry.it)
        eta, dist = linearize(prev_pos, pairs, subkey)
        col_lo = collision_lower_bounds_state(
            eta, dist, prev_pos, pairs,
            min_distance=R + params.col_margin)
        lower_it = lower_s._replace(col=col_lo)
        x_warm = _warm_state(a, p0, v0, h)
        qp = solve_qp_state(lower_it, upper_s, eta, x_warm, params, pairs.E,
                            h=h, static=solver, n_vehicles=N, y_init=carry.y,
                            axis_name=axis_name)
        a_new = qp.x.a
        if solver.polish:
            from .banded import polish_qp_state
            a_new = polish_qp_state(lower_it, upper_s, eta, qp.x, qp.y,
                                    pairs.E, h=h, n_vehicles=N,
                                    axis_name=axis_name).a
        # Divergence guard: an infeasible linearization can blow the ADMM
        # iterates up (the dual grows unboundedly).  Any valid QP solution
        # respects the acceleration box, so an iterate far outside it marks a
        # failed solve — reject the step and keep the previous iterate, the
        # counterpart of the reference's warn-and-continue on OSQP failure
        # (scp.py:446-449) without propagating garbage.
        acc_cap = 2.0 * max(abs(problem.acc_min), abs(problem.acc_max))
        bad = jnp.logical_or(jnp.logical_not(jnp.all(jnp.isfinite(a_new))),
                             jnp.max(jnp.abs(a_new)) > acc_cap)
        a_new = jnp.where(bad, a, a_new)
        step = jnp.linalg.norm((a_new - a).reshape(-1))
        denom = jnp.maximum(jnp.linalg.norm(a.reshape(-1)), 1e-30)
        rel_step = step / denom
        converged = rel_step <= problem.convergence_tolerance
        if goal_feasible:
            # with goal_project the lane only stops once the PROJECTED
            # (exact-terminal) trajectory is collision-free — goal-missing
            # lanes keep iterating (warm-started, so accumulated ADMM work
            # keeps shrinking the needed correction)
            a_stop = (_goal_projected(a_new, p0, v0, pf, vf, problem)
                      if problem.goal_project else a_new)
            new_pos, _ = rollout(a_stop, p0, v0, h)
            stop = check_feasible(new_pos, pairs, R, axis_name)
        else:
            stop = converged
        return SCPCarry(a=a_new, y=qp.y, it=carry.it + 1,
                        converged=converged, stop=stop, rel=rel_step,
                        qp_iters=carry.qp_iters + qp.iters,
                        qp_ok=jnp.logical_and(carry.qp_ok, qp.converged),
                        feasible_initial=carry.feasible_initial)

    return body


def _direct_cond(carry: SCPCarry, it_cap) -> jnp.ndarray:
    return jnp.logical_and(
        carry.it < it_cap,
        jnp.logical_and(jnp.logical_not(carry.stop),
                        jnp.logical_not(carry.feasible_initial)))


@partial(jax.jit, static_argnames=("problem", "solver", "axis_name"))
def _scp_start_direct(p0, v0, pf, vf, key, *, params: SolverParams,
                      pairs: PairIndex, problem: ProblemConfig,
                      solver: SolverStatic,
                      axis_name: str | None = None) -> SCPCarry:
    """Phase 1 of the direct path: initial collision-free QP + feasibility
    pre-check (scp.py:138-144), as a resumable carry."""
    from .banded import build_bounds, solve_qp_state

    N = problem.n_vehicles
    K = problem.n_steps
    P = pairs.E.shape[1]      # shard-local pair count under pair sharding
    h = problem.time_step
    R = problem.min_distance
    dtype = p0.dtype

    lower_s, upper_s = build_bounds(p0, v0, pf, vf, n_vehicles=N, n_steps=K,
                                    h=h, limits=problem.limits, n_pairs=P)
    eta0 = jnp.zeros((K, P, 2), dtype=dtype)

    # collision rows disabled via -inf bounds; col_enabled=False routes the
    # x-updates through the shared per-channel (K, 3, 3) factorization —
    # batch-independent, so vmap computes it once for the whole batch
    x0 = _warm_state(jnp.zeros((N, K, 2), dtype=dtype), p0, v0, h)
    qp0 = solve_qp_state(lower_s, upper_s, eta0, x0, params, pairs.E, h=h,
                         static=solver, n_vehicles=N, col_enabled=False,
                         axis_name=axis_name)
    a = qp0.x.a
    if solver.polish:
        from .banded import polish_qp_state
        a = polish_qp_state(lower_s, upper_s, eta0, qp0.x, qp0.y, pairs.E,
                            h=h, n_vehicles=N, axis_name=axis_name).a

    # under goal_project, "feasible" means the projected (exact-terminal)
    # initial guess is collision-free — otherwise the loop must run
    a_chk = (_goal_projected(a, p0, v0, pf, vf, problem)
             if problem.goal_project else a)
    pos_init, _ = rollout(a_chk, p0, v0, h)
    feasible_initial = check_feasible(pos_init, pairs, R, axis_name)
    return SCPCarry(a=a, y=qp0.y, it=jnp.int32(0), converged=jnp.asarray(False),
                    stop=jnp.asarray(False),
                    rel=jnp.asarray(jnp.inf, dtype), qp_iters=qp0.iters,
                    qp_ok=qp0.converged, feasible_initial=feasible_initial)


@partial(jax.jit, static_argnames=("problem", "solver", "axis_name"))
def _scp_step_direct(carry: SCPCarry, p0, v0, pf, vf, key, it_cap, *,
                     params: SolverParams, pairs: PairIndex,
                     problem: ProblemConfig, solver: SolverStatic,
                     axis_name: str | None = None) -> SCPCarry:
    """Run SCP iterations from ``carry`` until the stopping rule fires or
    ``carry.it`` reaches ``min(it_cap, problem.max_iterations)``.

    ``it_cap`` is a traced scalar: a compacting driver calls this with
    ``it_cap = carry.it + j`` to advance j iterations per dispatch without
    recompiling."""
    from .banded import build_bounds

    N, K = problem.n_vehicles, problem.n_steps
    P = pairs.E.shape[1]
    lower_s, upper_s = build_bounds(p0, v0, pf, vf, n_vehicles=N, n_steps=K,
                                    h=problem.time_step,
                                    limits=problem.limits, n_pairs=P)
    body = _direct_body(p0, v0, pf, vf, key, lower_s, upper_s, params=params,
                        pairs=pairs, problem=problem, solver=solver,
                        axis_name=axis_name)
    cap = jnp.minimum(jnp.asarray(it_cap, jnp.int32),
                      jnp.int32(problem.max_iterations))
    return jax.lax.while_loop(lambda c: _direct_cond(c, cap), body, carry)


@partial(jax.jit, static_argnames=("problem", "axis_name"))
def _scp_finalize_direct(carry: SCPCarry, p0, v0, pf=None, vf=None, *,
                         pairs: PairIndex, problem: ProblemConfig,
                         axis_name: str | None = None) -> SCPResult:
    """Final rollout + status codes from a finished carry (scp.py:168-180).

    With ``problem.goal_project`` the emitted trajectory is the
    exact-terminal projection of the iterate whenever that projection is
    collision-free (per scenario), else the raw iterate — terminal goal
    error collapses to float roundoff without ever trading away a
    collision-free solve."""
    h = problem.time_step
    a_out = carry.a
    if problem.goal_project:
        if pf is None or vf is None:
            raise ValueError("goal_project finalize requires pf and vf")
        a_proj = _goal_projected(carry.a, p0, v0, pf, vf, problem)
        pos_p, _ = rollout(a_proj, p0, v0, h)
        feas_p = check_feasible(pos_p, pairs, problem.min_distance, axis_name)
        a_out = jnp.where(feas_p, a_proj, carry.a)
    positions, velocities = rollout(a_out, p0, v0, h)
    feasible_final = check_feasible(positions, pairs, problem.min_distance,
                                    axis_name)
    # status reflects the active stopping rule: in "feasible" mode, stopping
    # early means the trajectory went collision-free; in "reference" mode it
    # means step-norm convergence (scp.py:161)
    status = jnp.where(
        carry.feasible_initial, STATUS_FEASIBLE_INITIAL,
        jnp.where(carry.stop, STATUS_CONVERGED, STATUS_MAX_ITERS))
    return SCPResult(positions=positions, velocities=velocities,
                     accelerations=a_out, iterations=carry.it,
                     status=status.astype(jnp.int32),
                     converged=carry.converged,
                     feasible_initial=carry.feasible_initial,
                     feasible_final=feasible_final,
                     qp_iterations=carry.qp_iters,
                     qp_converged_all=carry.qp_ok, rel_step=carry.rel)


def _scp_solve_direct(p0, v0, pf, vf, key, *, params: SolverParams,
                      pairs: PairIndex, problem: ProblemConfig,
                      solver: SolverStatic) -> SCPResult:
    """SCP loop over the state-space QP solver (solvers/banded.py).

    Identical control flow and semantics to :func:`_scp_solve`; only the QP
    subproblem formulation differs (dynamics as banded equalities instead of
    eliminated, exact x-updates instead of PCG).  Composed from the
    resumable start/step/finalize pieces so the compacting batch driver
    (``parallel/mesh.py``) shares every line of the iteration semantics.
    """
    carry = _scp_start_direct(p0, v0, pf, vf, key, params=params,
                              pairs=pairs, problem=problem, solver=solver)
    carry = _scp_step_direct(carry, p0, v0, pf, vf, key,
                             jnp.int32(problem.max_iterations),
                             params=params, pairs=pairs, problem=problem,
                             solver=solver)
    return _scp_finalize_direct(carry, p0, v0, pf, vf, pairs=pairs,
                                problem=problem)
