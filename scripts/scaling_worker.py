"""Worker for the 2-process half of the scaling artifact
(``scripts/scaling_artifact.py``): joins a local ``jax.distributed``
coordinator (2 processes x 4 virtual devices), drives the multi-host data
path (``host_local_slice`` -> ``make_global_batch`` ->
``ShardedSCPSolver``) and reports whole-cluster solves/s from rank 0."""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    import numpy as np
    import jax

    jax.config.update("jax_platforms", "cpu")

    from ba_path_planning_tpu.parallel.distributed import (host_local_slice,
                                                           init_distributed,
                                                           make_global_batch)

    init_distributed(coordinator_address=os.environ["SCALING_COORD"],
                     num_processes=int(os.environ["SCALING_NPROC"]),
                     process_id=int(os.environ["SCALING_RANK"]))

    import jax.numpy as jnp
    from ba_path_planning_tpu.parallel.mesh import ShardedSCPSolver, make_mesh
    from ba_path_planning_tpu.scenarios import generate_scenario_batch
    from ba_path_planning_tpu.utils import ProblemConfig, SolverConfig

    problem = ProblemConfig(n_vehicles=10, time_horizon=10.0, time_step=0.2,
                            min_distance=0.8, max_iterations=15,
                            stop_mode="feasible")
    solver = SolverConfig(method="direct", polish=False, adaptive_rho=False,
                          max_iter=25, check_interval=25,
                          collision_margin=0.13, col_rho_boost=2.5, rho=2.6,
                          alpha=1.9)
    per_chip = int(os.environ.get("SCALING_PER_CHIP", "16"))
    B = per_chip * jax.device_count()

    mesh = make_mesh()                      # all global devices
    sh = ShardedSCPSolver(problem, solver, mesh=mesh, dtype=jnp.float32)

    def global_inputs(seed):
        sc = generate_scenario_batch(jax.random.key(seed), B,
                                     n_vehicles=problem.n_vehicles,
                                     min_distance=problem.min_distance)
        v0 = jnp.zeros((B, problem.n_vehicles, 2), jnp.float32)
        keys = jax.random.split(jax.random.key(seed + 1), B)
        lo, hi = host_local_slice(B)
        local = jax.tree.map(
            lambda x: np.asarray(x)[lo:hi],
            (sc.initial, v0, sc.final, v0,
             jax.random.key_data(keys)))
        gp0, gv0, gpf, gvf, gkd = make_global_batch(local, mesh=mesh)
        return gp0, gv0, gpf, gvf, jax.random.wrap_key_data(gkd)

    def run(seed):
        args = global_inputs(seed)
        res = sh._solve(*args)
        np.asarray([np.asarray(s.data)
                    for s in res.feasible_final.addressable_shards])
        return res

    run(0)                                   # compile + warmup
    t0 = time.perf_counter()
    res = run(100)
    dt = time.perf_counter() - t0
    ok_local = int(sum(np.asarray(s.data).sum()
                       for s in res.feasible_final.addressable_shards))

    if jax.process_index() == 0:
        out = {
            "n_processes": jax.process_count(),
            "n_devices_total": jax.device_count(),
            "per_chip_batch": per_chip,
            "configs": {
                f"{jax.device_count()}chips_2proc": {
                    "devices": jax.device_count(), "batch": B,
                    "wall_sec": dt, "solves_per_sec": B / dt,
                    "collision_free_frac_local": ok_local
                    / (B // jax.process_count()),
                },
            },
            "note": ("2 real processes x 4 virtual devices over the "
                     "jax.distributed runtime (DCN analogue); "
                     "communication-free data path"),
        }
        print("SCALING_JSON " + json.dumps(out), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
