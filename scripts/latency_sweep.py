#!/usr/bin/env python
"""Single-scenario p50 latency sweep (BASELINE.md p50 row; VERDICT r2 #4).

Times individual SCP solves through the per-scenario jitted engine for a set
of candidate latency configurations, on fresh scenarios (identical repeated
dispatches can be served from the remote runtime cache).  The remote tunnel
charges ~25-35 ms per dispatch, so the single-dispatch whole-solve design is
already near the floor — the sweep finds which kernel path minimizes the
on-device tail.

Usage: python scripts/latency_sweep.py [--reps 9] [--n 20]
"""

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from ba_path_planning_tpu.scenarios import generate_scenario_batch
from ba_path_planning_tpu.solvers.scp import SCPEngine
from ba_path_planning_tpu.utils import ProblemConfig, SolverConfig


def candidates():
    prod = SolverConfig.production()
    return {
        "production": prod,
        # per-scenario VMEM-resident substitution kernel: no grouped-padding
        # waste at batch 1 (group=-1 routes to banded_solve.py)
        "resident": prod.replace(group=-1),
        # whole-interval fused kernel: all check_interval iterations in one
        # Pallas dispatch, factors VMEM-resident across iterations
        "fused": prod.replace(fused=True, group=-1),
        # XLA scan path (no pallas) for reference
        "xla": prod.replace(pallas=False),
        # smaller ADMM budget: latency pays the full budget even when
        # converged earlier (fixed-trip fori_loop inside the interval)
        "short15": prod.replace(max_iter=15, check_interval=15),
        "short15_resident": prod.replace(max_iter=15, check_interval=15,
                                         group=-1),
        # early-exit: two 13-iteration intervals — lanes that converge at 13
        # skip the second interval (latency pays actual, not budget)
        "ci13": prod.replace(max_iter=26, check_interval=13),
        "ci9": prod.replace(max_iter=27, check_interval=9),
    }


def measure(name, solver, problem, reps):
    engine = SCPEngine(problem, solver, dtype=jnp.float32)
    N = problem.n_vehicles
    v0 = jnp.zeros((N, 2), jnp.float32)
    lat, feas = [], 0
    for i in range(reps + 1):
        sc = generate_scenario_batch(jax.random.key(300 + i), 1,
                                     n_vehicles=N,
                                     min_distance=problem.min_distance)
        t0 = time.perf_counter()
        r = engine.solve(sc.initial[0], v0, sc.final[0], v0,
                         key=jax.random.key(400 + i))
        feas += int(np.asarray(r.feasible_final))
        lat.append(time.perf_counter() - t0)
    lat = lat[1:]                       # drop compile call
    rec = {"config": name, "p50_ms": float(np.median(lat) * 1e3),
           "min_ms": float(np.min(lat) * 1e3),
           "p90_ms": float(np.percentile(lat, 90) * 1e3),
           "feasible": feas}
    print(json.dumps(rec), flush=True)
    return rec


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--reps", type=int, default=9)
    ap.add_argument("--n", type=int, default=20)
    ap.add_argument("--only", nargs="*", default=None)
    ap.add_argument("--out", default=None)
    args = ap.parse_args(argv)

    problem = ProblemConfig(n_vehicles=args.n, time_horizon=10.0,
                            time_step=0.2, min_distance=0.8,
                            max_iterations=15, stop_mode="feasible")
    recs = []
    for name, solver in candidates().items():
        if args.only and name not in args.only:
            continue
        try:
            recs.append(measure(name, solver, problem, args.reps))
        except Exception as e:          # a kernel variant failing to compile
            print(json.dumps({"config": name, "error": str(e)[:200]}),
                  flush=True)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(recs, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
