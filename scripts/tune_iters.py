#!/usr/bin/env python
"""Sweep the ADMM iteration budget / rho on the bench config with the
compacting driver: find the smallest budget that keeps 100% collision-free
across a multi-batch soak."""

import time

import numpy as np
import jax
import jax.numpy as jnp

from ba_path_planning_tpu.parallel.mesh import ShardedSCPSolver, make_mesh
from ba_path_planning_tpu.scenarios import generate_scenario_batch
from ba_path_planning_tpu.utils import ProblemConfig, SolverConfig

problem = ProblemConfig(n_vehicles=20, time_horizon=10.0, time_step=0.2,
                        min_distance=0.8, max_iterations=15,
                        stop_mode="feasible")
B = 512
v0 = jnp.zeros((B, problem.n_vehicles, 2), jnp.float32)
mesh = make_mesh()

configs = []
for it in (35, 45, 55):
    for rho in (1.6,):
        configs.append((it, rho))

for it, rho in configs:
    solver = SolverConfig.production().replace(max_iter=it,
                                               check_interval=it, rho=rho)
    sh = ShardedSCPSolver(problem, solver, mesh=mesh, dtype=jnp.float32)

    def run(seed):
        sc = generate_scenario_batch(jax.random.key(seed), B,
                                     n_vehicles=problem.n_vehicles,
                                     min_distance=problem.min_distance)
        keys = jax.random.split(jax.random.key(seed + 1), B)
        out = sh.solve_compacted(sc.initial, v0, sc.final, v0, keys,
                                 chunk=128)
        np.asarray(out.feasible_final)
        return out

    run(0)
    t0 = time.perf_counter()
    outs = [run(100 + 10 * r) for r in range(3)]
    dt = time.perf_counter() - t0
    ok = sum(int(np.asarray(o.feasible_final).sum()) for o in outs)
    iters = np.concatenate([np.asarray(o.iterations) for o in outs])
    print(f"max_iter={it} rho={rho}: {ok}/{3*B} collision-free, "
          f"{3*B/dt:.1f} solves/s, scp_iters mean {iters.mean():.2f} "
          f"max {iters.max()}", flush=True)
