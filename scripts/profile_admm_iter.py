#!/usr/bin/env python
"""Per-ADMM-iteration cost decomposition at large N (the r3 N>=30 cliff).

Times, on the real chip with fresh inputs per repetition:
  - grouped X-form x-update solve (the factor-streaming kernel)
  - apply_A / apply_AT (constraint row operators incl. collision rows)
  - the z/y elementwise updates
so the N>=30 optimization effort lands on the real bottleneck.
"""

import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from ba_path_planning_tpu.ops.collisions import make_pair_index
from ba_path_planning_tpu.solvers import banded
from ba_path_planning_tpu.solvers.admm import make_solver_params
from ba_path_planning_tpu.utils import ProblemConfig, SolverConfig

N = int(os.environ.get("PROF_N", "30"))
B = int(os.environ.get("PROF_B", "128"))
K, h = 50, 0.2
problem = ProblemConfig(n_vehicles=N, time_horizon=10.0, time_step=0.2,
                        min_distance=0.8)
solver = SolverConfig.production()
static = solver.static_part()
params = make_solver_params(solver, jnp.float32)
pairs = make_pair_index(N)
P = problem.n_pairs
n = 6 * N
np_ = -(-n // 128) * 128
isz = 4
per_g = 4 * np_ * np_ * isz + 5 * K * np_ * isz
G = max(1, min(32, (12 * 1024 * 1024) // per_g))
print(f"N={N} B={B} n={n} np={np_} P={P} G={G}")

REPS = 8
keys = [jax.random.key(1000 + r) for r in range(REPS + 1)]


def timeit(name, make_inputs, fn, per_iter_bytes=None):
    f = jax.jit(lambda *a: jax.tree.map(jnp.sum, fn(*a)))
    ins = [make_inputs(k) for k in keys]
    np.asarray(jax.tree.leaves(f(*ins[0]))[0])
    t0 = time.perf_counter()
    for r in range(REPS):
        out = f(*ins[r + 1])
    np.asarray(jax.tree.leaves(out)[0])
    dt = (time.perf_counter() - t0) / REPS
    msg = (f"{name:44s} {dt*1e3:9.3f} ms  ({dt/B*1e6:8.1f} us/scn)")
    if per_iter_bytes is not None:
        msg += f"  {per_iter_bytes / dt / 1e9:7.1f} GB/s"
    print(msg, flush=True)


# ---- grouped X-form x-update ------------------------------------------------
from ba_path_planning_tpu.ops.pallas.group_solve import (
    pad_factors, solve_factorized_grouped_X)

C3 = jax.random.normal(keys[0], (K - 1, 3, 3), jnp.float32) * 0.01


_X = jax.random.normal(keys[0], (B, K, n, n), jnp.float32) * 0.01
_Xp = pad_factors(_X + jnp.swapaxes(_X, -1, -2))


def mk_solve_inputs(key):
    # factors fixed (1.7 GB at N=30 — can't afford REPS copies); fresh rhs
    # per repetition defeats the runtime dispatch cache
    b = jax.random.normal(key, (B, K, n), jnp.float32)
    return _Xp, b


stream_bytes = 2 * B * K * np_ * np_ * 4
timeit("grouped X solve (1 iter: fwd+bwd)", mk_solve_inputs,
       lambda Xp, b: solve_factorized_grouped_X(Xp, C3, b, group=G),
       per_iter_bytes=stream_bytes)

# ---- row operators ----------------------------------------------------------
from ba_path_planning_tpu.solvers.banded import (StateVars, apply_A, apply_AT,
                                                 build_bounds, row_scaling_state)


def mk_state(key):
    ks = jax.random.split(key, 4)
    x = StateVars(a=jax.random.normal(ks[0], (B, N, K, 2), jnp.float32),
                  p=jax.random.normal(ks[1], (B, N, K, 2), jnp.float32),
                  v=jax.random.normal(ks[2], (B, N, K, 2), jnp.float32))
    eta = jax.random.normal(ks[3], (B, K, P, 2), jnp.float32)
    return x, eta


timeit("apply_A (all rows incl. collision)", mk_state,
       lambda x, eta: jax.vmap(lambda xx, ee: apply_A(xx, ee, pairs.E, h))(
           x, eta))


def mk_rows(key):
    x, eta = mk_state(key)
    Ax = jax.vmap(lambda xx, ee: apply_A(xx, ee, pairs.E, h))(x, eta)
    return Ax, eta


timeit("apply_AT", mk_rows,
       lambda r, eta: jax.vmap(
           lambda rr, ee: apply_AT(rr, ee, pairs.E, h, None))(r, eta))

timeit("z/y elementwise (clip+axpy x3)", mk_rows,
       lambda r, eta: jax.tree.map(
           lambda v: jnp.clip(v * 1.1 + 0.1, -1.0, 1.0) + 0.3 * v, r))
