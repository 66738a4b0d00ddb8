"""Worker process for the real 2-process ``jax.distributed`` test.

Launched by ``tests/test_distributed.py`` as two subprocesses on one host:
each process owns 4 virtual CPU devices and joins a local coordinator, so the
global runtime sees 2 processes x 4 devices — the same topology (processes
over DCN, devices within a host) as a real multi-host TPU slice, minus the
hardware.  The worker drives the full multi-host data path the production
batch harness uses (``compute_trajectories_batch.py:103-110`` scaled out per
SURVEY 2.3 DCN row):

  host_local_slice -> per-host scenario shard
  make_global_batch -> jax.make_array_from_process_local_data global arrays
  ShardedSCPSolver.solve -> one jitted sharded executable over all devices

and writes its addressable result shards to ``--out`` for the parent test to
reassemble and compare bit-for-bit against the single-process solve.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator", required=True)
    ap.add_argument("--process-id", type=int, required=True)
    ap.add_argument("--num-processes", type=int, default=2)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=4")
    os.environ["JAX_PLATFORMS"] = "cpu"

    import numpy as np
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    from ba_path_planning_tpu.parallel.distributed import (host_local_slice,
                                                           init_distributed,
                                                           make_global_batch)

    init_distributed(coordinator_address=args.coordinator,
                     num_processes=args.num_processes,
                     process_id=args.process_id)
    assert jax.process_count() == args.num_processes
    assert jax.device_count() == 4 * args.num_processes
    assert jax.local_device_count() == 4

    import jax.numpy as jnp
    from ba_path_planning_tpu.parallel.mesh import ShardedSCPSolver, make_mesh
    from ba_path_planning_tpu.scenarios import generate_scenario_batch
    from ba_path_planning_tpu.utils import ProblemConfig, SolverConfig

    problem, solver, B, dtype = test_config()
    mesh = make_mesh()            # global mesh over all 8 devices
    solver_sh = ShardedSCPSolver(problem, solver, mesh=mesh, dtype=dtype)

    # every host generates the SAME global scenario set (seeded JAX PRNG, cheap
    # and deterministic) and contributes only its host_local_slice
    sc = generate_scenario_batch(jax.random.key(0), B,
                                 n_vehicles=problem.n_vehicles,
                                 min_distance=problem.min_distance,
                                 dtype=dtype)
    keys = jax.random.split(jax.random.key(1), B)
    v0 = jnp.zeros((B, problem.n_vehicles, 2), dtype)
    lo, hi = host_local_slice(B)
    local = jax.tree.map(lambda x: np.asarray(x)[lo:hi],
                         (np.asarray(sc.initial), np.asarray(v0),
                          np.asarray(sc.final), np.asarray(v0),
                          np.asarray(jax.random.key_data(keys))))
    gp0, gv0, gpf, gvf, gkeys_data = make_global_batch(local, mesh=mesh)
    gkeys = jax.random.wrap_key_data(gkeys_data)

    res = solver_sh.solve(gp0, gv0, gpf, gvf, gkeys)
    jax.block_until_ready(res)

    # collect this process's addressable shards, keyed by global batch offset
    out = {}
    for name, arr in res._asdict().items():
        for shard in arr.addressable_shards:
            start = shard.index[0].start or 0
            out[f"{name}__{start}"] = np.asarray(shard.data)
    np.savez(args.out, **out)
    print(f"worker {args.process_id}: wrote {len(out)} shards", flush=True)
    return 0


def test_config():
    """Shared problem/solver config (also used by the parent for the
    single-process reference solve)."""
    import jax.numpy as jnp
    from ba_path_planning_tpu.utils import ProblemConfig, SolverConfig
    problem = ProblemConfig(n_vehicles=3, time_horizon=3.0, time_step=0.5,
                            min_distance=0.5, max_iterations=3)
    solver = SolverConfig(method="direct", max_iter=200, check_interval=25,
                          polish=False, adaptive_rho=False)
    return problem, solver, 16, jnp.float64


if __name__ == "__main__":
    raise SystemExit(main())
