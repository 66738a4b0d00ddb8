#!/usr/bin/env python
"""Sweep (batch, chunk) on the bench workload — the remote tunnel charges
~25-35 ms per dispatch, so dispatch count dominates at current solve speed."""
import sys, time
import numpy as np
import jax
import jax.numpy as jnp
sys.path.insert(0, ".")
from ba_path_planning_tpu.parallel.mesh import ShardedSCPSolver, make_mesh
from ba_path_planning_tpu.scenarios import generate_scenario_batch
from ba_path_planning_tpu.utils import ProblemConfig, SolverConfig

problem = ProblemConfig(n_vehicles=20, time_horizon=10.0, time_step=0.2,
                        min_distance=0.8, max_iterations=15,
                        stop_mode="feasible")
mesh = make_mesh()

for B, chunk in [(512, 128), (512, 256), (512, 512), (1024, 512),
                 (1024, 1024), (2048, 1024)]:
    sh = ShardedSCPSolver(problem, SolverConfig.production(), mesh=mesh,
                          dtype=jnp.float32)
    v0 = jnp.zeros((B, problem.n_vehicles, 2), jnp.float32)

    def run(seed):
        sc = generate_scenario_batch(jax.random.key(seed), B,
                                     n_vehicles=problem.n_vehicles,
                                     min_distance=problem.min_distance)
        keys = jax.random.split(jax.random.key(seed + 1), B)
        out = sh.solve_compacted(sc.initial, v0, sc.final, v0, keys,
                                 chunk=chunk)
        np.asarray(out.feasible_final)
        return out

    run(0)
    best = 0.0
    for seed in (100, 200):
        t0 = time.perf_counter()
        out = run(seed)
        dt = time.perf_counter() - t0
        ok = int(np.asarray(out.feasible_final).sum())
        best = max(best, ok / dt)
    print(f"B={B:5d} chunk={chunk:5d}: {best:8.1f} solves/s  "
          f"feasible={ok}/{B}", flush=True)
