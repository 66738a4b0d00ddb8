#!/usr/bin/env python
"""Committed scaling-efficiency artifact (BASELINE.md "Scaling efficiency"
row; VERDICT r3 task 5): runs ``parallel.distributed.scaling_report`` on

  1. the virtual 8-device CPU mesh (1/2/4/8 device sweep), and
  2. a real 2-process ``jax.distributed`` runtime (2 x 4 virtual devices),

and writes ``docs/scaling_v5e.json``.

Interpretation on this host: the virtual devices TIME-SHARE the physical
cores, so the naive weak-scaling efficiency is hardware-bounded at
(physical cores / devices) and is reported only for completeness.  The
claim a virtual mesh can actually validate is that the scenario-parallel
program is communication/overhead-free: TOTAL throughput must hold steady
as the device count grows (``throughput_retention`` ~ 1.0).  On real
multi-chip hardware the same ``scaling_report`` yields the true
near-linear curve (each device adds silicon).
"""

import json
import multiprocessing
import os
import socket
import subprocess
import sys

sys.path.insert(0, ".")

# the virtual mesh needs the device-count flag BEFORE jax initializes
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from ba_path_planning_tpu.parallel.distributed import scaling_report
from ba_path_planning_tpu.utils import ProblemConfig, SolverConfig

PROBLEM = ProblemConfig(n_vehicles=10, time_horizon=10.0, time_step=0.2,
                        min_distance=0.8, max_iterations=15,
                        stop_mode="feasible")
SOLVER = SolverConfig(method="direct", polish=False, adaptive_rho=False,
                      max_iter=25, check_interval=25, collision_margin=0.13,
                      col_rho_boost=2.5, rho=2.6, alpha=1.9)
PER_CHIP = int(os.environ.get("SCALING_PER_CHIP", "16"))


def virtual_mesh_sweep() -> dict:
    rec = scaling_report(PROBLEM, SOLVER, per_chip_batch=PER_CHIP,
                         dtype=jnp.float32)
    rec["physical_cores"] = multiprocessing.cpu_count()
    rec["note"] = (
        "virtual CPU mesh: devices time-share the physical cores, so "
        "weak-scaling efficiency is hardware-bounded at cores/devices; "
        "the strong_scaling sweep (fixed total batch) is the driver-"
        "overhead measurement a virtual mesh can validate: wall time must "
        "stay flat as the device count grows (on real chips it would drop "
        "~n-fold)")
    return rec


def strong_scaling_sweep(B_total: int = 128) -> dict:
    """Fixed TOTAL batch over 1/2/4/8 virtual devices: identical work and
    identical per-lane iteration counts in every config, so any wall-time
    growth is pure sharding-driver overhead."""
    import time as _t

    from ba_path_planning_tpu.parallel.mesh import ShardedSCPSolver, make_mesh
    from ba_path_planning_tpu.scenarios import generate_scenario_batch

    out = {"batch_total": B_total, "configs": {}}
    n = 1
    while n <= jax.device_count():
        mesh = make_mesh(jax.devices()[:n])
        sh = ShardedSCPSolver(PROBLEM, SOLVER, mesh=mesh, dtype=jnp.float32)
        v0 = jnp.zeros((B_total, PROBLEM.n_vehicles, 2), jnp.float32)

        def run(s):
            sc = generate_scenario_batch(jax.random.key(s), B_total,
                                         n_vehicles=PROBLEM.n_vehicles,
                                         min_distance=PROBLEM.min_distance)
            keys = jax.random.split(jax.random.key(s + 1), B_total)
            # production path: host-compacted driver (bench.py), not the
            # monolithic global while_loop
            res = sh.solve_compacted(sc.initial, v0, sc.final, v0, keys,
                                     chunk=B_total)
            np.asarray(res.feasible_final)
            return res

        run(0)
        t0 = _t.perf_counter()
        res = run(200)
        dt = _t.perf_counter() - t0
        out["configs"][f"{n}dev"] = {
            "devices": n, "wall_sec": dt,
            "solves_per_sec": B_total / dt,
            "collision_free_frac":
                float(np.asarray(res.feasible_final).mean()),
        }
        n *= 2
    base = out["configs"]["1dev"]["wall_sec"]
    for rec in out["configs"].values():
        rec["wall_vs_1dev"] = rec["wall_sec"] / base
    return out


def oversubscription_control() -> dict:
    """Calibrates the virtual-mesh floor: a PLAIN sharded matmul loop (no
    planner code at all) measured at 1 vs 8 virtual devices.  Any
    degradation here is CPU thread oversubscription (8 single-threaded
    device executors on the physical cores), and bounds what the planner's
    8-device numbers can be blamed for."""
    import time as _t

    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    B, n = 128, 512
    x = jnp.arange(B * n, dtype=jnp.float32).reshape(B, n) * 1e-6
    eye = jnp.eye(n)

    def heavy_fori(xx):
        def body(i, a):
            return jnp.tanh(a @ eye * 0.999 + 1e-3)
        return jax.lax.fori_loop(0, 60, body, xx)

    def heavy_while(xx):
        # solver-shaped: data-dependent while with a cross-device cond
        def cond(c):
            return jnp.logical_and(c[0] < 60,
                                   jnp.any(jnp.abs(c[1]) < 10.0))

        def body(c):
            return c[0] + 1, jnp.tanh(c[1] @ eye * 0.999 + 1e-3)
        return jax.lax.while_loop(cond, body, (0, xx))[1]

    out = {}
    for name, fn in (("fori", heavy_fori), ("while", heavy_while)):
        for nd in (1, 8):
            mesh = Mesh(np.asarray(jax.devices()[:nd]), ("b",))
            shd = NamedSharding(mesh, P("b"))
            f = jax.jit(fn, in_shardings=shd, out_shardings=shd)
            xs = jax.device_put(x, shd)
            np.asarray(f(xs))[0, 0]
            ts = []
            for r in range(5):
                t0 = _t.perf_counter()
                np.asarray(f(xs * (1 + r * 1e-6)))[0, 0]
                ts.append(_t.perf_counter() - t0)
            out[f"{name}_{nd}dev_ms"] = float(np.median(ts)) * 1e3
        out[f"{name}_overhead_x"] = (out[f"{name}_8dev_ms"]
                                     / out[f"{name}_1dev_ms"])
    out["note"] = ("planner-free sharded matmul loop; its 8-device "
                   "degradation is the virtual-mesh oversubscription "
                   "floor on this host")
    return out


def two_process_run() -> dict:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    here = os.path.dirname(os.path.abspath(__file__))
    worker = os.path.join(here, "scaling_worker.py")
    procs = []
    for rank in range(2):
        env = dict(os.environ)
        env.update(JAX_PLATFORMS="cpu",
                   XLA_FLAGS="--xla_force_host_platform_device_count=4",
                   SCALING_COORD=f"127.0.0.1:{port}",
                   SCALING_RANK=str(rank), SCALING_NPROC="2",
                   SCALING_PER_CHIP=str(PER_CHIP))
        env.pop("PALLAS_AXON_POOL_IPS", None)
        procs.append(subprocess.Popen(
            [sys.executable, worker], env=env, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True))
    outs = [p.communicate(timeout=1200)[0] for p in procs]
    for p, o in zip(procs, outs):
        if p.returncode != 0:
            raise RuntimeError(f"worker failed:\n{o[-2000:]}")
    line = [ln for ln in outs[0].splitlines()
            if ln.startswith("SCALING_JSON ")][0]
    return json.loads(line[len("SCALING_JSON "):])


def main() -> int:
    out = {"virtual_mesh": virtual_mesh_sweep()}
    print(json.dumps(out["virtual_mesh"]["configs"], indent=1), flush=True)
    out["strong_scaling"] = strong_scaling_sweep()
    print(json.dumps(out["strong_scaling"]["configs"], indent=1), flush=True)
    out["oversubscription_control"] = oversubscription_control()
    print(json.dumps(out["oversubscription_control"], indent=1), flush=True)
    try:
        out["two_process"] = two_process_run()
        print(json.dumps(out["two_process"]["configs"], indent=1),
              flush=True)
    except Exception as e:      # keep the single-process half on failure
        out["two_process_error"] = str(e)[-500:]
        print("two-process run failed:", e, file=sys.stderr)
    with open("docs/scaling_v5e.json", "w") as f:
        json.dump(out, f, indent=1)
    print("wrote docs/scaling_v5e.json")
    w8 = out["strong_scaling"]["configs"]["8dev"]["wall_vs_1dev"]
    print(f"8-device strong-scaling wall vs 1 device: {w8:.3f}x "
          "(1.0 = zero driver overhead on fixed silicon)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
