#!/usr/bin/env python
"""Record the parity-config engine's per-SCP-iteration iterates for a case.

Usage:  python scripts/engine_trace.py <N> <seed>

Runs the float64 direct-path engine (the exact config scripts/parity_full.py
uses) ONE SCP iteration at a time via the resumable start/step API and saves
every iterate to docs/parity_oracle_cache/engine_N{N}_seed{seed}_trace.npz.
These iterates serve as optimality *candidates* for the oracle's staged
certification (scripts/oracle_cache.py --candidates): the oracle either
certifies each one with its own KKT machinery or discards it — see
tests/oracles/reference_math.py:solve_qp_admm.
"""

import json
import sys

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "tests")

import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp

from ba_path_planning_tpu.scenarios import generate_scenario_batch
from ba_path_planning_tpu.solvers.scp import SCPEngine
from ba_path_planning_tpu.utils import ProblemConfig, SolverConfig

K, h, R = 50, 0.2, 0.8


def trace_path(N, seed):
    return f"docs/parity_oracle_cache/engine_N{N}_seed{seed}_trace.npz"


def main(N, seed):
    sc = generate_scenario_batch(jax.random.key(seed), 1, n_vehicles=N,
                                 min_distance=R, dtype=jnp.float64)
    p0 = jnp.asarray(sc.initial[0], jnp.float64)
    pf = jnp.asarray(sc.final[0], jnp.float64)
    v0 = jnp.zeros((N, 2), jnp.float64)
    key = jax.random.key(seed + 1)

    problem = ProblemConfig(n_vehicles=N, time_horizon=K * h, time_step=h,
                            min_distance=R, max_iterations=15)
    # identical to scripts/parity_full.py's engine config (rho rationale
    # documented there)
    cfg = SolverConfig(method="direct", eps_abs=1e-6, eps_rel=1e-6,
                       polish=True, rho=1.6, adaptive_rho=False,
                       max_iter=50000, check_interval=100)
    eng = SCPEngine(problem, cfg, dtype=jnp.float64)
    start, step, _ = eng.start_step_finalize_fns()

    carry = start(p0, v0, pf, v0, key)
    a_hist = [np.asarray(carry.a)]
    if bool(carry.feasible_initial):
        print(json.dumps(dict(feasible_initial=True)), flush=True)
    else:
        for it in range(1, problem.max_iterations + 1):
            prev = a_hist[-1]
            carry = step(carry, p0, v0, pf, v0, key, jnp.int32(it))
            a = np.asarray(carry.a)
            a_hist.append(a)
            rel = float(np.linalg.norm(a - prev)
                        / max(np.linalg.norm(prev), 1e-30))
            print(json.dumps(dict(iteration=it, rel_step=rel,
                                  stopped=bool(carry.stop),
                                  qp_iters=int(carry.qp_iters))), flush=True)
            if bool(carry.stop):
                break

    np.savez_compressed(trace_path(N, seed), a_hist=np.asarray(a_hist),
                        p0=np.asarray(p0), pf=np.asarray(pf), R=R, h=h)
    print(f"saved {trace_path(N, seed)} ({len(a_hist)} iterates)")


if __name__ == "__main__":
    main(int(sys.argv[1]), int(sys.argv[2]))
