#!/usr/bin/env python
"""Phase-level microbenchmark of the direct SCP path on the bench config.

Times, for a batch of scenarios on the real chip, the main cost slices of
one SCP solve so we know which to attack next:

  1. scenario generation
  2. initial QP (channel-factorized, collision-free)
  3. rollout + collision linearization + bounds
  4. assemble + factorize (+ lane pad) for the collision QP
  5. full collision QP to budget (factorize + ADMM iterations)
  6. end-to-end batched SCP solve

Every repetition uses FRESH inputs: the remote runtime serves identical
repeated dispatches from a cache, which silently zeroes out repeat timings
(root cause of earlier nonsensical profiles).
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from ba_path_planning_tpu.ops.collisions import make_pair_index, linearize
from ba_path_planning_tpu.ops.rollout import rollout
from ba_path_planning_tpu.scenarios import generate_scenario_batch
from ba_path_planning_tpu.solvers.admm import make_solver_params
from ba_path_planning_tpu.solvers import banded
from ba_path_planning_tpu.solvers.scp import _warm_state
from ba_path_planning_tpu.utils import ProblemConfig, SolverConfig

import os
B = int(os.environ.get("PROF_B", "128"))
REPS = int(os.environ.get("PROF_REPS", "8"))
problem = ProblemConfig(n_vehicles=int(os.environ.get("PROF_N", "20")),
                        time_horizon=10.0, time_step=0.2,
                        min_distance=0.8, max_iterations=15,
                        stop_mode="feasible")
solver = SolverConfig.production()
params = make_solver_params(solver, jnp.float32)
static = solver.static_part()
N, K, P = problem.n_vehicles, problem.n_steps, problem.n_pairs
h = problem.time_step
pairs = make_pair_index(N)
limits = problem.limits


def fresh_inputs(seed):
    """One batch of scenarios + a representative linearization point."""
    sc = generate_scenario_batch(jax.random.key(seed), B, n_vehicles=N,
                                 min_distance=problem.min_distance)
    p0, pf = sc.initial, sc.final
    v0 = jnp.zeros_like(p0)
    a0 = jnp.zeros((B, N, K, 2), jnp.float32)
    pos, _ = jax.vmap(lambda a, p, v: rollout(a, p, v, h))(a0, p0, v0)
    keys = jax.random.split(jax.random.key(seed + 1), B)
    eta, dist = jax.vmap(lambda pp, k: linearize(pp, pairs, k))(pos, keys)
    return dict(p0=p0, pf=pf, v0=v0, pos=pos, eta=eta, dist=dist, keys=keys)


INPUTS = [fresh_inputs(1000 + 97 * r) for r in range(REPS + 1)]
for d in INPUTS:
    np.asarray(d["pos"])               # force materialization


def timeit(name, fn):
    np.asarray(jax.tree.leaves(fn(INPUTS[0]))[0])      # warmup/compile
    t0 = time.perf_counter()
    outs = [fn(INPUTS[1 + r]) for r in range(REPS)]
    for o in outs:
        np.asarray(jax.tree.leaves(o)[0])
    dt = (time.perf_counter() - t0) / REPS
    print(f"{name:42s} {dt*1e3:9.2f} ms  ({dt/B*1e3:7.3f} ms/scenario)",
          flush=True)


# --- phases ---------------------------------------------------------------

def ph_scenarios(d):
    return generate_scenario_batch(d["keys"][0, None][0], B, n_vehicles=N,
                                   min_distance=problem.min_distance).initial


@jax.jit
def ph_lin(d):
    pos, vel = jax.vmap(lambda a, p, v: rollout(a, p, v, h))(
        jnp.zeros((B, N, K, 2), jnp.float32), d["p0"], d["v0"])
    eta, dist = jax.vmap(lambda pp, k: linearize(pp, pairs, k))(pos,
                                                               d["keys"])
    return jnp.sum(eta[:, -1]) + jnp.sum(dist[:, -1])


def _bounds_one(d, i):
    lower, upper = banded.build_bounds(
        d["p0"][i], d["v0"][i], d["pf"][i], d["v0"][i], n_vehicles=N,
        n_steps=K, h=h, limits=limits, n_pairs=P)
    col_lo = banded.collision_lower_bounds_state(
        d["eta"][i], d["dist"][i], d["pos"][i], pairs,
        min_distance=problem.min_distance)
    return lower._replace(col=col_lo), upper


@jax.jit
def ph_factorize(d):
    scaling = banded.row_scaling_state(K, h, dtype=jnp.float32)
    rho_b = banded.rho_pattern_masks(scaling, static, params.rho,
                                     params.col_rho_boost, n_steps=K,
                                     n_pairs=P, col_enabled=True,
                                     dtype=jnp.float32)

    def one(eta1):
        D, Bm = banded.assemble_blocks(rho_b, eta1, pairs.E, h=h,
                                       sigma=params.sigma, n_vehicles=N)
        L, Eb = banded.factorize(D, Bm)
        from ba_path_planning_tpu.ops.pallas.group_solve import pad_factors
        return pad_factors(L, Eb)

    Lp, Ep = jax.vmap(one)(d["eta"])
    return jnp.sum(Lp[:, -1, 0]) + jnp.sum(Ep[:, -1, 0])


@jax.jit
def ph_qp(d):
    def one(i):
        lower, upper = _bounds_one(d, i)
        x0 = _warm_state(jnp.zeros((N, K, 2), jnp.float32), d["p0"][i],
                         d["v0"][i], h)
        return banded.solve_qp_state(lower, upper, d["eta"][i], x0, params,
                                     pairs.E, h=h, static=static,
                                     n_vehicles=N)
    return jnp.sum(jax.vmap(one)(jnp.arange(B)).x.a[:, :, -1])


def ph_e2e(d):
    from ba_path_planning_tpu.parallel.mesh import ShardedSCPSolver, make_mesh
    global _SH
    try:
        _SH
    except NameError:
        _SH = ShardedSCPSolver(problem, solver, mesh=make_mesh(),
                               dtype=jnp.float32)
    out = _SH.solve_compacted(d["p0"], d["v0"], d["pf"], d["v0"], d["keys"],
                              chunk=min(128, B))
    return out.feasible_final


if __name__ == "__main__":
    timeit("scenario generation", ph_scenarios)
    timeit("rollout + linearize", ph_lin)
    timeit("assemble + factorize + pad", ph_factorize)
    timeit("full collision QP (35-iter budget)", ph_qp)
    timeit("end-to-end SCP (compacted)", ph_e2e)
