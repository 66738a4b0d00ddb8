#!/usr/bin/env python
"""Headline benchmark: collision-free scenario solves/s per chip.

Workload: the reference's compute-trajectories-batch configuration
(N=20 vehicles, T=10s, h=0.2 -> K=50, R=0.8, 20x20 box, <=15 SCP iterations;
``compute_trajectories_batch.py:14-24``) — but run as ONE batched, jitted
program on a scenario batch instead of a sequential Python loop.

Prints one JSON line:
  {"metric": "scenario_solves_per_sec", "value": ..., "unit": "solves/s",
   "vs_baseline": ...}

vs_baseline normalizes against the BASELINE.json north-star target of
1000 solves/s on a v5e-16, i.e. 62.5 solves/s per chip: vs_baseline = 1.0
means exactly on track for the pod-slice target on this chip count.
"""

import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from ba_path_planning_tpu.parallel.mesh import ShardedSCPSolver, make_mesh
    from ba_path_planning_tpu.scenarios import generate_scenario_batch
    from ba_path_planning_tpu.utils import ProblemConfig, SolverConfig

    problem = ProblemConfig(n_vehicles=20, time_horizon=10.0, time_step=0.2,
                            min_distance=0.8, max_iterations=15,
                            stop_mode="feasible", goal_project=True)
    # state-space direct solver (block-tridiagonal exact x-updates) with
    # constraint tightening; produces ~100% collision-free trajectories
    solver = SolverConfig.production(problem=problem)

    devices = jax.devices()
    n_dev = len(devices)
    batch = int(4096 * n_dev)

    mesh = make_mesh(devices)
    sh = ShardedSCPSolver(problem, solver, mesh=mesh, dtype=jnp.float32)

    # straggler compaction: the SCP loop is driven from the host in
    # fixed-size chunk dispatches (each stays well under the runtime's
    # execution deadline); after every iteration round the still-active
    # lanes are packed densely, so total QP work tracks the MEAN per-lane
    # iteration count instead of the per-chunk maximum.  Chunk 512/chip:
    # the remote tunnel charges ~25-35 ms per dispatch, so at the current
    # per-scenario solve speed dispatch count dominates — swept at
    # scripts/chunk_sweep.py (128: 669, 256: 673, 512@B1024: 775 solves/s)
    chunk = 512 * n_dev
    v0 = jnp.zeros((batch, problem.n_vehicles, 2), jnp.float32)

    def run(seed):
        sc = generate_scenario_batch(jax.random.key(seed), batch,
                                     n_vehicles=problem.n_vehicles,
                                     min_distance=problem.min_distance)
        keys = jax.random.split(jax.random.key(seed + 1), batch)
        out = sh.solve_compacted(sc.initial, v0, sc.final, v0, keys,
                                 chunk=chunk)
        # the remote-tunnel runtime does not synchronize on
        # block_until_ready; force a (small) transfer instead
        np.asarray(out.feasible_final)
        return out, sc.final

    run(0)                            # warmup/compile
    t0 = time.perf_counter()
    # fresh scenarios for the timed run: identical repeated dispatches can
    # be served from the runtime cache
    out, res_pf = run(100)
    dt = time.perf_counter() - t0
    res = jax.tree.map(np.asarray, out)

    status = np.asarray(res.status)
    ff = np.asarray(res.feasible_final)
    # success = collision-free AND goal actually reached (<= 5 cm terminal
    # error): the reference enforces the terminal equality inside the QP and
    # errors out otherwise, so goal-missing lanes must not count as solves
    from ba_path_planning_tpu.models.double_integrator import DoubleIntegrator2D
    model = DoubleIntegrator2D(n_steps=problem.n_steps,
                               time_step=problem.time_step)
    pK, _ = model.terminal_state(res.positions, res.velocities,
                                 res.accelerations)
    goal_err = np.linalg.norm(np.asarray(pK) - np.asarray(res_pf),
                              axis=-1).max(axis=-1)
    ok = int((ff & (goal_err < 0.05)).sum())
    solves_per_sec = ok / dt

    # p50 single-scenario solve latency (BASELINE.md metric): individual
    # solves through the unbatched engine with the latency-tuned config
    # (early-exit ADMM intervals; scripts/latency_sweep.py)
    from ba_path_planning_tpu.solvers.scp import SCPEngine
    lat_engine = SCPEngine(problem, SolverConfig.latency(),
                           dtype=jnp.float32)
    lat = []
    for i in range(10):
        sci = generate_scenario_batch(jax.random.key(50 + i), 1,
                                      n_vehicles=problem.n_vehicles,
                                      min_distance=problem.min_distance)
        t0 = time.perf_counter()
        r1 = lat_engine.solve(sci.initial[0], v0[0], sci.final[0], v0[0],
                              key=jax.random.key(60 + i))
        np.asarray(r1.feasible_final)
        lat.append(time.perf_counter() - t0)
    p50_latency_ms = float(np.median(lat[1:]) * 1e3)   # skip compile call

    # ON-DEVICE p50 latency, isolated from the ~25-35 ms host-tunnel RTT
    # (VERDICT r3 weak #7): one dispatch runs M solves SEQUENTIALLY
    # (lax.map — no cross-scenario parallelism), so wall(M2) - wall(M1)
    # differences away the fixed dispatch/RTT cost and the slope is the
    # pure on-device per-solve time.
    solve_one = lat_engine.solve_fn()
    seq_solve = jax.jit(lambda a: jax.lax.map(lambda s: solve_one(*s), a))

    def run_seq(m, seed):
        sc = generate_scenario_batch(jax.random.key(seed), m,
                                     n_vehicles=problem.n_vehicles,
                                     min_distance=problem.min_distance)
        keys = jax.random.split(jax.random.key(seed + 1), m)
        args = (sc.initial, v0[:m], sc.final, v0[:m], keys)
        t0 = time.perf_counter()
        out = seq_solve(args)
        np.asarray(out.feasible_final)
        return time.perf_counter() - t0

    M1, M2 = 4, 24
    for m in (M1, M2):
        run_seq(m, 200 + m)                            # warmup/compile
    slopes = []
    for r in range(3):
        t1 = run_seq(M1, 300 + 10 * r)
        t2 = run_seq(M2, 400 + 10 * r)
        slopes.append((t2 - t1) / (M2 - M1))
    ondevice_p50_ms = float(np.median(slopes) * 1e3)

    target_per_chip = 1000.0 / 16.0
    out = {
        "metric": "scenario_solves_per_sec",
        "value": round(solves_per_sec, 2),
        "unit": "solves/s",
        "vs_baseline": round(solves_per_sec / (target_per_chip * n_dev), 3),
    }
    print(json.dumps(out))
    print(f"# batch={batch} devices={n_dev} wall={dt:.3f}s "
          f"ok={ok}/{batch} (collision_free={int(ff.sum())}, "
          f"goal<5cm={int((goal_err < 0.05).sum())}, "
          f"goal_err p50={float(np.median(goal_err)):.3f} "
          f"p99={float(np.percentile(goal_err, 99)):.3f}) "
          f"statuses={np.bincount(status, minlength=3).tolist()} "
          f"mean_scp_iters={float(np.asarray(res.iterations).mean()):.2f} "
          f"mean_qp_iters={float(np.asarray(res.qp_iterations).mean()):.0f} "
          f"p50_single_scenario_latency_ms={p50_latency_ms:.1f} "
          f"p50_ondevice_solve_ms={ondevice_p50_ms:.2f}",
          file=sys.stderr)


if __name__ == "__main__":
    main()
