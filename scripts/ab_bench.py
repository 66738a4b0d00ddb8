#!/usr/bin/env python
"""A/B throughput comparison of solver-config variants on the bench workload.

Usage: python scripts/ab_bench.py '{"factor_dtype": "bf16"}' ...
Each JSON arg is a dict of SolverConfig overrides applied on top of
SolverConfig.production(); {} is the production baseline.  Prints solves/s
and feasibility per variant (fresh scenario batches per timed run so the
remote runtime cache can't serve repeats).
"""

import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from ba_path_planning_tpu.parallel.mesh import ShardedSCPSolver, make_mesh
from ba_path_planning_tpu.scenarios import generate_scenario_batch
from ba_path_planning_tpu.utils import ProblemConfig, SolverConfig

B = 1024
problem = ProblemConfig(n_vehicles=20, time_horizon=10.0, time_step=0.2,
                        min_distance=0.8, max_iterations=15,
                        stop_mode="feasible")
mesh = make_mesh()
v0 = jnp.zeros((B, problem.n_vehicles, 2), jnp.float32)


def run_variant(name, solver, seeds=(100, 200)):
    sh = ShardedSCPSolver(problem, solver, mesh=mesh, dtype=jnp.float32)

    def run(seed):
        sc = generate_scenario_batch(jax.random.key(seed), B,
                                     n_vehicles=problem.n_vehicles,
                                     min_distance=problem.min_distance)
        keys = jax.random.split(jax.random.key(seed + 1), B)
        out = sh.solve_compacted(sc.initial, v0, sc.final, v0, keys,
                                 chunk=512)
        np.asarray(out.feasible_final)
        return out

    run(0)  # warmup/compile
    best = 0.0
    for seed in seeds:
        t0 = time.perf_counter()
        out = run(seed)
        dt = time.perf_counter() - t0
        ok = int(np.asarray(out.feasible_final).sum())
        best = max(best, ok / dt)
    print(f"{name:40s} {best:8.1f} solves/s  feasible={ok}/{B} "
          f"mean_scp={float(np.asarray(out.iterations).mean()):.2f} "
          f"mean_qp={float(np.asarray(out.qp_iterations).mean()):.0f}",
          flush=True)


if __name__ == "__main__":
    variants = sys.argv[1:] or ["{}"]
    for v in variants:
        kw = json.loads(v)
        run_variant(v, SolverConfig.production().replace(**kw))
