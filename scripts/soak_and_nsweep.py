#!/usr/bin/env python
"""Round-record run: 4096-scenario soak at the bench config + vehicle-count
sweep (N up to 40) on one chip.  Writes docs/soak_nsweep_v5e.json."""
import json, sys, time
import numpy as np
import jax
import jax.numpy as jnp
sys.path.insert(0, ".")
from ba_path_planning_tpu.parallel.mesh import ShardedSCPSolver, make_mesh
from ba_path_planning_tpu.scenarios import generate_scenario_batch
from ba_path_planning_tpu.utils import ProblemConfig, SolverConfig

mesh = make_mesh()
rec = {"soak": None, "n_sweep": []}

def run_cfg(N, B, chunk, seeds=(100,)):
    problem = ProblemConfig(n_vehicles=N, time_horizon=10.0, time_step=0.2,
                            min_distance=0.8, max_iterations=15,
                            stop_mode="feasible")
    sh = ShardedSCPSolver(problem,
                          SolverConfig.production(problem=problem),
                          mesh=mesh,
                          dtype=jnp.float32)
    v0 = jnp.zeros((B, N, 2), jnp.float32)

    def run(seed):
        sc = generate_scenario_batch(jax.random.key(seed), B, n_vehicles=N,
                                     min_distance=problem.min_distance)
        keys = jax.random.split(jax.random.key(seed + 1), B)
        out = sh.solve_compacted(sc.initial, v0, sc.final, v0, keys,
                                 chunk=chunk)
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
                mean_scp_iters=round(float(np.asarray(out.iterations).mean()), 2))

# soak: 4096 scenarios at the reference benchmark config
r = run_cfg(20, 4096, 512)
print("soak:", r, flush=True)
rec["soak"] = r

# N sweep on one chip (batch scaled down as pair count grows)
# B=2048 at N>=30: the chunked SCP rounds amortize the ~30 ms tunnel
# dispatch cost over 4x the scenarios (N=30: 339 -> 409 solves/s)
for N, B, chunk in [(10, 1024, 512), (20, 1024, 512), (30, 2048, 128),
                    (40, 2048, 128)]:
    r = run_cfg(N, B, chunk)
    print("nsweep:", r, flush=True)
    rec["n_sweep"].append(r)

with open("docs/soak_nsweep_v5e.json", "w") as f:
    json.dump(rec, f, indent=1)
print("saved docs/soak_nsweep_v5e.json")
