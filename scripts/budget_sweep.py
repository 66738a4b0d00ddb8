#!/usr/bin/env python
"""Re-tune ADMM budget/rho at the 1024/512 operating point."""
import sys, time
import numpy as np
import jax
import jax.numpy as jnp
sys.path.insert(0, ".")
from ba_path_planning_tpu.parallel.mesh import ShardedSCPSolver, make_mesh
from ba_path_planning_tpu.scenarios import generate_scenario_batch
from ba_path_planning_tpu.utils import ProblemConfig, SolverConfig

B, CHUNK = 1024, 512
problem = ProblemConfig(n_vehicles=20, time_horizon=10.0, time_step=0.2,
                        min_distance=0.8, max_iterations=15,
                        stop_mode="feasible")
mesh = make_mesh()
v0 = jnp.zeros((B, problem.n_vehicles, 2), jnp.float32)

variants = [
    ("prod", {}),
    ("it25", {"max_iter": 25, "check_interval": 25}),
    ("it30", {"max_iter": 30, "check_interval": 30}),
    ("it45", {"max_iter": 45, "check_interval": 45}),
    ("rho1.8", {"rho": 1.8}),
    ("rho2.6", {"rho": 2.6}),
]
for name, kw in variants:
    sh = ShardedSCPSolver(problem, SolverConfig.production().replace(**kw),
                          mesh=mesh, dtype=jnp.float32)

    def run(seed):
        sc = generate_scenario_batch(jax.random.key(seed), B,
                                     n_vehicles=problem.n_vehicles,
                                     min_distance=problem.min_distance)
        keys = jax.random.split(jax.random.key(seed + 1), B)
        out = sh.solve_compacted(sc.initial, v0, sc.final, v0, keys,
                                 chunk=CHUNK)
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
    print(f"{name:8s}: {best:8.1f} solves/s  feasible={ok}/{B} "
          f"scp={float(np.asarray(out.iterations).mean()):.2f} "
          f"qp={float(np.asarray(out.qp_iterations).mean()):.0f}", flush=True)
