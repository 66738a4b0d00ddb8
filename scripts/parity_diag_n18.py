#!/usr/bin/env python
"""N=18/seed-42 parity diagnostics, step 1: engine-side iteration trace.

Runs the parity-config engine (float64, direct path, polish) ONE SCP
iteration at a time, recording each iterate, its relative step norm
against the 1.5e-2 stopping threshold, and the minimum pairwise distance
of the linearization point (degenerate-pair check).  Saves iterates to
docs/parity_oracle_cache/engine_N18_trace.npz for step 2 (independent
certification of the disputed QP).
"""

import json
import os
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
N, seed = 18, 42
ENGINE_EPS = float(os.environ.get("PARITY_EPS", "1e-6"))


def main():
    sc = generate_scenario_batch(jax.random.key(seed), 1, n_vehicles=N,
                                 min_distance=R, dtype=jnp.float64)
    p0 = jnp.asarray(sc.initial[0], jnp.float64)
    pf = jnp.asarray(sc.final[0], jnp.float64)
    v0 = jnp.zeros((N, 2), jnp.float64)
    key = jax.random.key(seed + 1)

    problem = ProblemConfig(n_vehicles=N, time_horizon=K * h, time_step=h,
                            min_distance=R, max_iterations=15)
    cfg = SolverConfig(method="direct", eps_abs=ENGINE_EPS,
                       eps_rel=ENGINE_EPS, polish=True,
                       max_iter=50000, check_interval=100)
    eng = SCPEngine(problem, cfg, dtype=jnp.float64)
    start, step, _ = eng.start_step_finalize_fns()

    carry = start(p0, v0, pf, v0, key)
    a_hist = [np.asarray(carry.a)]
    rows = []
    from ba_path_planning_tpu.ops.collisions import make_pair_index
    from ba_path_planning_tpu.ops.rollout import rollout
    pairs = make_pair_index(N, dtype=jnp.float64)

    for it in range(1, 8):
        prev = a_hist[-1]
        pos, _ = rollout(jnp.asarray(prev), p0, v0, h)
        diffs = (pos[pairs.i_idx] - pos[pairs.j_idx])
        dmin = float(jnp.min(jnp.sqrt(jnp.sum(diffs * diffs, axis=-1))))
        carry = step(carry, p0, v0, pf, v0, key, jnp.int32(it))
        a = np.asarray(carry.a)
        a_hist.append(a)
        rel = float(np.linalg.norm(a - prev) / max(np.linalg.norm(prev),
                                                   1e-30))
        rows.append(dict(iteration=it, rel_step=rel,
                         rel_minus_tol=rel - 1.5e-2,
                         lin_point_min_pair_dist=dmin,
                         stopped=bool(carry.stop),
                         qp_iters=int(carry.qp_iters)))
        print(json.dumps(rows[-1]), flush=True)
        if bool(carry.stop) or bool(carry.feasible_initial):
            break

    np.savez_compressed(
        "docs/parity_oracle_cache/engine_N18_trace.npz",
        a_hist=np.asarray(a_hist), p0=np.asarray(p0), pf=np.asarray(pf),
        rel_steps=np.asarray([r["rel_step"] for r in rows]))
    print("saved engine trace")


if __name__ == "__main__":
    main()
