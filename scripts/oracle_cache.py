#!/usr/bin/env python
"""Compute and cache the float64 oracle SCP solution for one parity case.

Usage:  python scripts/oracle_cache.py <N> <seed>

Cache format v2 (docs/parity_oracle_cache/oracle_N{N}_seed{seed}_K{K}.npz):
stores the full problem identity (p0, pf, R, h, max_iterations) and the
oracle wall time alongside the solution, so ``scripts/parity_full.py`` can
validate a cache hit instead of trusting (N, seed, K) alone, and cache hits
report the original timing instead of 0.0.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "tests")

import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp

from oracles import reference_math as om
from ba_path_planning_tpu.scenarios import generate_scenario_batch

K, h, R = 50, 0.2, 0.8
MAX_ITERATIONS = 15
# v5: the active-set refinement's multiplier-sign drop rule was inverted
# (reference_math.py refine()); before the fix no QP with an active
# inequality row ever actually fired the KKT certificate — solve_qp_admm
# returned the (exact) round-0 min-norm point via the best-verified
# fallback.  v5 caches are produced with the corrected certificate and
# record how many QPs were candidate-certified vs solved from scratch.
ORACLE_VERSION = 5
CACHE_DIR = "docs/parity_oracle_cache"


def cache_path(N, seed):
    return f"{CACHE_DIR}/oracle_N{N}_seed{seed}_K{K}.npz"


def scenario(N, seed):
    sc = generate_scenario_batch(jax.random.key(seed), 1, n_vehicles=N,
                                 min_distance=R, dtype=jnp.float64)
    p0 = np.asarray(sc.initial[0], float)
    pf = np.asarray(sc.final[0], float)
    return p0, pf, np.zeros((N, 2))


def compute_and_cache(N, seed):
    p0, pf, v0 = scenario(N, seed)

    # Optional candidate warm start: if an engine trace exists for this case
    # (scripts/engine_trace.py), hand its per-iteration iterates to the
    # oracle as optimality candidates.  The oracle's staged certification is
    # candidate-agnostic — each candidate is either CERTIFIED by the
    # oracle's own KKT machinery (primal feasibility <= 1e-9 + multiplier
    # signs on the exact min-norm active-set solve) or discarded and the QP
    # solved from scratch — so this changes wall time, not the result.
    candidates = None
    tpath = f"{CACHE_DIR}/engine_N{N}_seed{seed}_trace.npz"
    if os.path.exists(tpath):
        with np.load(tpath) as z:
            if (np.max(np.abs(z["p0"] - p0)) == 0.0
                    and np.max(np.abs(z["pf"] - pf)) == 0.0):
                candidates = [a.reshape(-1) for a in z["a_hist"]]
                print(f"using {len(candidates)} engine-trace candidates "
                      f"from {tpath}", flush=True)
            else:
                print(f"trace {tpath} scenario mismatch; ignoring",
                      flush=True)

    om.solve_qp_admm.stats = {"candidate_certified": 0, "candidate_failed": 0}
    t0 = time.time()
    ref = om.scp_solve(p0, v0, pf, v0, R=R, h=h, K=K,
                       max_iterations=MAX_ITERATIONS, qp_solver="admm",
                       candidates=candidates)
    t_ref = time.time() - t0
    stats = om.solve_qp_admm.stats
    os.makedirs(CACHE_DIR, exist_ok=True)
    np.savez_compressed(
        cache_path(N, seed), positions=ref["positions"],
        velocities=ref["velocities"], iterations=ref["iterations"],
        converged=ref["converged"], feasible_initial=ref["feasible_initial"],
        p0=p0, pf=pf, R=R, h=h, max_iterations=MAX_ITERATIONS,
        oracle_version=ORACLE_VERSION, oracle_s=t_ref,
        candidate_certified=stats["candidate_certified"],
        candidate_failed=stats["candidate_failed"],
        x_history=ref["x_history"], rel_history=ref["rel_history"])
    print(f"cached N={N} seed={seed}: iters={ref['iterations']} "
          f"converged={ref['converged']} t={t_ref:.1f}s "
          f"candidate_certified={stats['candidate_certified']} "
          f"candidate_failed={stats['candidate_failed']}", flush=True)


if __name__ == "__main__":
    compute_and_cache(int(sys.argv[1]), int(sys.argv[2]))
