#!/usr/bin/env python
"""Phase-level microbenchmark of the direct SCP path on the bench config.

Times, for a batch of scenarios on the real chip:
  1. assemble+factorize  (per-scenario (6N)^2 block-Cholesky)
  2. one ADMM iteration  (substitution sweeps + constraint applies)
  3. full collision QP   (factorize + while_loop to convergence)
so we know which slice to attack next (pallas factorization vs pentadiagonal
compression vs fewer iterations).
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

from ba_path_planning_tpu.ops.collisions import make_pair_index, linearize
from ba_path_planning_tpu.ops.rollout import rollout
from ba_path_planning_tpu.scenarios import generate_scenario_batch
from ba_path_planning_tpu.solvers.admm import make_solver_params
from ba_path_planning_tpu.solvers import banded
from ba_path_planning_tpu.utils import ProblemConfig, SolverConfig

B = 128
problem = ProblemConfig(n_vehicles=20, time_horizon=10.0, time_step=0.2,
                        min_distance=0.8, max_iterations=15,
                        stop_mode="feasible")
solver = SolverConfig.production()
params = make_solver_params(solver, jnp.float32)
static = solver.static_part()
N, K, P = problem.n_vehicles, problem.n_steps, problem.n_pairs
h = problem.time_step
pairs = make_pair_index(N)

key = jax.random.PRNGKey(0)
scen = generate_scenario_batch(key, B, n_vehicles=N,
                               min_distance=problem.min_distance)
p0, pf = scen.initial, scen.final
v0 = jnp.zeros_like(p0)
vf = jnp.zeros_like(pf)

# build a representative linearization point: straight-line interp accel=0
a0 = jnp.zeros((B, N, K, 2), jnp.float32)
pos, _ = jax.vmap(lambda a, p, v: rollout(a, p, v, h))(a0, p0, v0)
keys = jax.random.split(jax.random.PRNGKey(1), B)
eta, dist = jax.vmap(lambda pp, k: linearize(pp, pairs, k))(pos, keys)

scaling = banded.row_scaling_state(K, h, dtype=jnp.float32)
rho_b = banded.rho_pattern_masks(scaling, static, params.rho,
                                 params.col_rho_boost, n_steps=K, n_pairs=P,
                                 col_enabled=True, dtype=jnp.float32)


def timeit(name, fn, *args, iters=5):
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0])  # force
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0])
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:34s} {dt*1e3:9.2f} ms  ({dt/B*1e3:7.3f} ms/scenario)")
    return out


@jax.jit
def assemble_only(eta):
    def one(e):
        D, Bm = banded.assemble_blocks(rho_b, e, pairs.E, h=h,
                                       sigma=params.sigma, n_vehicles=N)
        return D, Bm
    return jax.vmap(one)(eta)


@jax.jit
def factorize_full(eta):
    def one(e):
        D, Bm = banded.assemble_blocks(rho_b, e, pairs.E, h=h,
                                       sigma=params.sigma, n_vehicles=N)
        return banded.factorize(D, Bm)
    return jax.vmap(one)(eta)


@jax.jit
def sweeps(L, Eb, b, n=10):
    def one(l, e, bb):
        def body(i, x):
            return banded.solve_factorized(l, e, x)
        return jax.lax.fori_loop(0, n, body, bb)
    return jax.vmap(one)(L, Eb, b)


L, Eb = factorize_full(eta)
b = jnp.ones((B, K, 6 * N), jnp.float32)

D_, B_ = timeit("assemble only", assemble_only, eta)
timeit("assemble + factorize", factorize_full, eta)
timeit("10x substitution sweep (scan)", sweeps, L, Eb, b)


@jax.jit
def pallas_sweeps(L, Eb, b, n=10):
    from ba_path_planning_tpu.ops.pallas.banded_solve import (
        solve_factorized_streaming)

    def one(l, e, bb):
        def body(i, x):
            return solve_factorized_streaming(l, e, x)
        return jax.lax.fori_loop(0, n, body, bb)
    return jax.vmap(one)(L, Eb, b)


if False:
    timeit("10x substitution sweep (pallas)", pallas_sweeps, L, Eb, b)


# full QP solve at this linearization
@jax.jit
def full_qp(eta, dist, pos):
    def one(e, d, pp, p0_, v0_, pf_, vf_):
        lower, upper = banded.build_bounds(
            p0_, v0_, pf_, vf_, n_vehicles=N, n_steps=K, h=h,
            limits=problem.limits, n_pairs=P)
        col_lo = banded.collision_lower_bounds_state(
            e, d, pp, pairs, min_distance=problem.min_distance
            + params.col_margin)
        lower = lower._replace(col=col_lo)
        from ba_path_planning_tpu.solvers.scp import _warm_state
        x0 = _warm_state(jnp.zeros((N, K, 2), jnp.float32), p0_, v0_, h)
        return banded.solve_qp_state(lower, upper, e, x0, params, pairs.E,
                                     h=h, static=static, n_vehicles=N)
    return jax.vmap(one)(eta, dist, pos, p0, v0, pf, vf)


res = timeit("full collision QP (to conv)", full_qp, eta, dist, pos, iters=3)
print("qp iters:", np.asarray(res.iters[:16]), "mean",
      float(np.mean(np.asarray(res.iters))))


# slope/intercept: full QP at different iteration budgets
import dataclasses
for mi in (25, 50, 100, 150):
    p2 = params._replace(max_iter=jnp.asarray(mi, jnp.int32),
                         eps_abs=jnp.asarray(0.0, jnp.float32),
                         eps_rel=jnp.asarray(0.0, jnp.float32))

    @jax.jit
    def full_qp_budget(eta, dist, pos, p2=p2):
        def one(e, d, pp, p0_, v0_, pf_, vf_):
            lower, upper = banded.build_bounds(
                p0_, v0_, pf_, vf_, n_vehicles=N, n_steps=K, h=h,
                limits=problem.limits, n_pairs=P)
            col_lo = banded.collision_lower_bounds_state(
                e, d, pp, pairs, min_distance=problem.min_distance
                + params.col_margin)
            lower = lower._replace(col=col_lo)
            from ba_path_planning_tpu.solvers.scp import _warm_state
            x0 = _warm_state(jnp.zeros((N, K, 2), jnp.float32), p0_, v0_, h)
            return banded.solve_qp_state(lower, upper, e, x0, p2, pairs.E,
                                         h=h, static=static, n_vehicles=N)
        return jax.vmap(one)(eta, dist, pos, p0, v0, pf, vf)

    timeit(f"full QP, {mi:3d} iters", full_qp_budget, eta, dist, pos, iters=3)


# phase-1 initial QP (channel factorization) on the batch
@jax.jit
def initial_qp(p0, v0, pf, vf):
    def one(p0_, v0_, pf_, vf_):
        lower, upper = banded.build_bounds(
            p0_, v0_, pf_, vf_, n_vehicles=N, n_steps=K, h=h,
            limits=problem.limits, n_pairs=P)
        from ba_path_planning_tpu.solvers.scp import _warm_state
        eta0 = jnp.zeros((K, P, 2), jnp.float32)
        x0 = _warm_state(jnp.zeros((N, K, 2), jnp.float32), p0_, v0_, h)
        return banded.solve_qp_state(lower, upper, eta0, x0, params, pairs.E,
                                     h=h, static=static, n_vehicles=N,
                                     col_enabled=False)
    return jax.vmap(one)(p0, v0, pf, vf)


timeit("initial QP (channel)", initial_qp, p0, v0, pf, vf, iters=3)


# scenario generation
@jax.jit
def gen(key):
    return generate_scenario_batch(key, B, n_vehicles=N,
                                   min_distance=problem.min_distance)


timeit("scenario generation", gen, key, iters=3)


# end-to-end solve via ShardedSCPSolver path (same as bench)
from ba_path_planning_tpu.solvers.scp import SCPEngine
eng = SCPEngine(problem, solver)
keys_b = jax.random.split(jax.random.PRNGKey(7), B)


@jax.jit
def e2e(p0, v0, pf, vf, keys_b):
    return eng.solve_batch(p0, v0, pf, vf, keys_b)


timeit("end-to-end SCP batch", e2e, p0, v0, pf, vf, keys_b, iters=3)
