#!/usr/bin/env python
"""Benchmark-scale reference parity: N=18 and N=20 at the reference batch
config (K=50, h=0.2, R=0.8 — compute_trajectories_batch.py:14-24).

Runs the independent dense float64 oracle (tests/oracles/reference_math.py,
OSQP-semantics ADMM + active-set polish, cross-validated against scipy
trust-constr) and the TPU framework's SCP engine in reference mode on the
same generator scenarios, and records the trajectory agreement to
docs/PARITY.md.  ~0.5-1 h on the 2-core host; also runnable as
``PARITY_FULL=1 pytest tests/test_parity_scale.py``.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "tests")
sys.path.insert(0, "scripts")

import jax
# the sitecustomize forces jax_platforms=axon; this run is float64 on CPU
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp

from oracles import reference_math as om
from ba_path_planning_tpu.scenarios import generate_scenario_batch
from ba_path_planning_tpu.solvers.scp import SCPEngine
from ba_path_planning_tpu.utils import ProblemConfig, SolverConfig

K, h, R = 50, 0.2, 0.8
CASES = [(18, 42), (20, 7)]
# run a subset (e.g. PARITY_CASES="18:42"); results MERGE into the
# committed artifact so the two cases can run on separate cores/sessions
if os.environ.get("PARITY_CASES"):
    CASES = [tuple(int(v) for v in c.split(":"))
             for c in os.environ["PARITY_CASES"].split(",")]
# Engine QP tolerance.  Both sides must be near-EXACT per QP: the SCP
# re-linearizations amplify per-QP solution error ~1000x at benchmark scale
# (measured round 2: per-QP ~1e-5 at eps 1e-6 -> 1.2e-2 final).  The oracle
# certifies each QP to machine precision via active-set refinement
# (reference_math.solve_qp_admm); the engine runs ADMM to eps (below) and
# then the direct-path active-set polish (solvers/scp._polish_direct).
# NOTE: eps tighter than ~1e-7 makes the float64 ADMM STALL at max_iter,
# leaving inconsistent duals that poison the polish — 1e-6 terminates
# cleanly and the polish supplies the remaining accuracy.
ENGINE_EPS = float(os.environ.get("PARITY_EPS", "1e-6"))


def oracle_cached(N, seed, p0, v0, pf):
    """Oracle SCP solve, cached on disk with a VALIDATED cache: the stored
    problem identity (p0, pf, R, h, max_iterations, oracle version) must
    match, otherwise the cache is stale and is recomputed
    (scripts/oracle_cache.py owns the format).  Cache hits report the
    original oracle wall time."""
    import oracle_cache as oc
    path = oc.cache_path(N, seed)
    if os.path.exists(path):
        with np.load(path) as z:
            stale = []
            # v3+ caches are certified-or-best-verified oracles (the staged
            # refinement of v4 only improves robustness); accept and RECORD
            # the version instead of forcing a multi-hour recompute
            if int(z.get("oracle_version", 0)) < 3:
                stale.append("oracle_version")
            for name, want in (("p0", p0), ("pf", pf)):
                if name not in z or z[name].shape != np.asarray(want).shape \
                        or np.max(np.abs(z[name] - want)) != 0.0:
                    stale.append(name)
            for name, want in (("R", R), ("h", h),
                               ("max_iterations", 15)):
                if name not in z or float(z[name]) != float(want):
                    stale.append(name)
            if not stale:
                out = {k: z[k] for k in
                       ("positions", "velocities", "iterations",
                        "converged", "feasible_initial")}
                out["oracle_version"] = int(z["oracle_version"])
                return out, float(z["oracle_s"])
            print(f"  cache STALE for N={N} ({', '.join(stale)}); "
                  "recomputing", flush=True)
    t0 = time.time()
    oc.compute_and_cache(N, seed)
    with np.load(path) as z:
        out = {k: z[k] for k in
               ("positions", "velocities", "iterations", "converged",
                "feasible_initial")}
        out["oracle_version"] = int(z["oracle_version"])
        return out, time.time() - t0


def main():
    rows = []
    for N, seed in CASES:
        sc = generate_scenario_batch(jax.random.key(seed), 1, n_vehicles=N,
                                     min_distance=R, dtype=jnp.float64)
        p0 = np.asarray(sc.initial[0], float)
        pf = np.asarray(sc.final[0], float)
        v0 = np.zeros((N, 2))

        ref, t_ref = oracle_cached(N, seed, p0, v0, pf)

        problem = ProblemConfig(n_vehicles=N, time_horizon=K * h, time_step=h,
                                min_distance=R, max_iterations=15)
        # rho 1.6 fixed: at rho 0.1 the benchmark-scale collision QPs STALL
        # (prim 5.7e-2 after 50k iterations, N=18 QP-1; adaptive rho fails
        # to rescue it) and the polish then works from inconsistent duals —
        # the r3 N=18 parity failure's root cause.  At rho 1.6 the same QP
        # converges in ~1000 iterations (scripts/parity_diag_n18.py).
        cfg = SolverConfig(method="direct", eps_abs=ENGINE_EPS,
                           eps_rel=ENGINE_EPS, polish=True, rho=1.6,
                           adaptive_rho=False,
                           max_iter=50000, check_interval=100)
        eng = SCPEngine(problem, cfg, dtype=jnp.float64)
        t0 = time.time()
        res = eng.solve(p0, v0, pf, v0, key=jax.random.key(seed + 1))
        pos = np.asarray(res.positions)
        t_eng = time.time() - t0

        dpos = float(np.max(np.abs(pos - ref["positions"])))
        dvel = float(np.max(np.abs(np.asarray(res.velocities)
                                   - ref["velocities"])))
        row = dict(N=N, seed=seed, K=K,
                   oracle_iters=int(ref["iterations"]),
                   engine_iters=int(res.iterations),
                   oracle_converged=bool(ref["converged"]),
                   engine_converged=bool(res.converged),
                   feasible_initial=bool(ref["feasible_initial"]),
                   max_pos_diff=dpos, max_vel_diff=dvel,
                   within_1e3=bool(dpos <= 1e-3 and dvel <= 1e-3),
                   oracle_version=int(ref.get("oracle_version", 0)),
                   oracle_s=round(t_ref, 1), engine_s=round(t_eng, 1))
        rows.append(row)
        print(json.dumps(row), flush=True)

    # merge with any existing artifact (cases may be run separately)
    path = "docs/parity_full.json"
    merged = {r["N"]: r for r in rows}
    if os.path.exists(path):
        with open(path) as f:
            for r in json.load(f).get("cases", []):
                merged.setdefault(r["N"], r)
    rows = [merged[n] for n in sorted(merged)]
    with open(path, "w") as f:
        json.dump(dict(config=dict(K=K, h=h, R=R, max_iterations=15,
                                   tol=1.5e-2), cases=rows), f, indent=1)
    ok = all(r["within_1e3"] for r in rows)
    print("PARITY", "OK" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
