#!/usr/bin/env python
"""A/B large-N throughput experiments (TPU): production config vs candidate
solver tweaks at N=30/40 (the r3 throughput cliff).  Ad-hoc measurement tool;
the committed artifact stays docs/soak_nsweep_v5e.json."""
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

mesh = make_mesh()


def run_cfg(N, B, chunk, solver, seeds=(100,), goal_project=True):
    problem = ProblemConfig(n_vehicles=N, time_horizon=10.0, time_step=0.2,
                            min_distance=0.8, max_iterations=15,
                            stop_mode="feasible", goal_project=goal_project)
    sh = ShardedSCPSolver(problem, solver, mesh=mesh, dtype=jnp.float32)
    v0 = jnp.zeros((B, N, 2), jnp.float32)

    compacted = solver.method == "direct"

    def run(seed):
        sc = generate_scenario_batch(jax.random.key(seed), B, n_vehicles=N,
                                     min_distance=problem.min_distance)
        keys = jax.random.split(jax.random.key(seed + 1), B)
        if compacted:
            out = sh.solve_compacted(sc.initial, v0, sc.final, v0, keys,
                                     chunk=chunk)
        else:
            out = sh.solve(sc.initial, v0, sc.final, v0, keys)
        np.asarray(out.feasible_final)
        return out

    run(0)
    best, ok = 0.0, 0
    for seed in seeds:
        t0 = time.perf_counter()
        out = run(seed)
        dt = time.perf_counter() - t0
        ok = int(np.asarray(out.feasible_final).sum())
        best = max(best, ok / dt)
    return dict(N=N, batch=B, chunk=chunk, solves_per_sec=round(best, 1),
                collision_free=ok,
                mean_scp_iters=round(
                    float(np.asarray(out.iterations).mean()), 2))


if __name__ == "__main__":
    variants = {
        "prod": SolverConfig.production(),
        "ns_high": SolverConfig.production().replace(ns_precision="high"),
        "bf16": SolverConfig.production().replace(factor_dtype="bf16"),
        "it35": SolverConfig.production().replace(max_iter=35,
                                                  check_interval=35),
        "it50": SolverConfig.production().replace(max_iter=50,
                                                  check_interval=50),
        "bf16_it35": SolverConfig.production().replace(
            factor_dtype="bf16", max_iter=35, check_interval=35),
        "cg": SolverConfig.production().replace(
            method="cg", pallas=False, group=0, fused=False),
        "cg40": SolverConfig.production().replace(
            method="cg", pallas=False, group=0, fused=False, cg_iters=40),
        "rho5": SolverConfig.production().replace(rho=5.2),
        "rho8": SolverConfig.production().replace(rho=8.0),
        "fusedx": SolverConfig.production().replace(fused=True, group=-1),
        "fusedx_rho5": SolverConfig.production().replace(
            fused=True, group=-1, rho=5.2),
    }
    for name in sys.argv[1:] or list(variants):
        solver = variants[name]
        for N, B, chunk in [(30, 512, 128), (40, 512, 128)]:
            r = run_cfg(N, B, chunk, solver)
            print(name, json.dumps(r), flush=True)
