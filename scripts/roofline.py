#!/usr/bin/env python
"""Kernel-efficiency (roofline) report for the production direct path.

Measures, on the real chip, the two dominant kernels of the production QP
solve — the grouped X-form banded substitution (HBM-bound) and the
Newton-Schulz block factorization (MXU-bound) — and reports achieved
bandwidth / throughput against the v5e per-chip peaks, using the cost models
in ``utils/profiling.py``.  Writes ``docs/roofline.json`` (BASELINE.md
"kernel efficiency" row; VERDICT r2 missing #4).

Usage: python scripts/roofline.py [--ns 20 40] [--batch 256] [--reps 4]
"""

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from ba_path_planning_tpu.ops.collisions import make_pair_index, linearize
from ba_path_planning_tpu.ops.rollout import rollout
from ba_path_planning_tpu.scenarios import generate_scenario_batch
from ba_path_planning_tpu.solvers.admm import make_solver_params
from ba_path_planning_tpu.solvers import banded
from ba_path_planning_tpu.utils import ProblemConfig, SolverConfig
from ba_path_planning_tpu.utils.profiling import (
    V5E_PEAK_F32_HIGHEST_FLOPS, V5E_PEAK_HBM_BYTES, direct_xupdate_cost,
    factorize_X_cost, lane_pad)


def measure(n_vehicles: int, batch: int, reps: int) -> dict:
    problem = ProblemConfig(n_vehicles=n_vehicles, time_horizon=10.0,
                            time_step=0.2, min_distance=0.8)
    solver = SolverConfig.production()
    params = make_solver_params(solver, jnp.float32)
    static = solver.static_part()
    N, K, P = n_vehicles, problem.n_steps, problem.n_pairs
    h = problem.time_step
    pairs = make_pair_index(N)
    npad = lane_pad(6 * N)

    scaling = banded.row_scaling_state(K, h, dtype=jnp.float32)
    rho_b = banded.rho_pattern_masks(scaling, static, params.rho,
                                     params.col_rho_boost, n_steps=K,
                                     n_pairs=P, col_enabled=True,
                                     dtype=jnp.float32)

    def fresh(seed):
        sc = generate_scenario_batch(jax.random.key(seed), batch,
                                     n_vehicles=N, min_distance=0.8)
        v0 = jnp.zeros_like(sc.initial)
        a0 = jnp.zeros((batch, N, K, 2), jnp.float32)
        pos, _ = jax.vmap(lambda a, p, v: rollout(a, p, v, h))(
            a0, sc.initial, v0)
        keys = jax.random.split(jax.random.key(seed + 1), batch)
        eta, _ = jax.vmap(lambda pp, k: linearize(pp, pairs, k))(pos, keys)
        return eta

    # slot-scalar off-diagonals are batch-independent (mask-based rho)
    C_shared = banded.b_slot_mats(
        banded._tridiag_scalars(rho_b, h=h, sigma=params.sigma))

    @jax.jit
    def factorize(eta):
        def one(eta1):
            D, _ = banded.assemble_D(rho_b, eta1, pairs.E, h=h,
                                     sigma=params.sigma, n_vehicles=N)
            X = banded.factorize_X(D, C_shared, ns_iters=static.ns_iters,
                                   ns_anchor=static.ns_anchor)
            from ba_path_planning_tpu.ops.pallas.group_solve import pad_factors
            return pad_factors(X)
        return jax.vmap(one)(eta)

    # group size replicates solve_qp_state's VMEM-budgeted auto choice
    isz = 4
    per_g = 4 * npad * npad * isz + 5 * K * npad * isz
    group_n = max(1, min(32, (12 * 1024 * 1024) // per_g))

    from ba_path_planning_tpu.ops.pallas.group_solve import grouped_solver_X
    INNER = 16        # kernel invocations per dispatch: the remote tunnel
    #                   charges ~25-35 ms per dispatch, so a single solve
    #                   mostly measures the round trip, not the kernel

    @jax.jit
    def solve_g(X, C, b):
        vsolve = jax.vmap(grouped_solver_X(group_n), in_axes=(0, None, 0))

        def body(i, bb):
            out = vsolve(X, C, bb)
            return out * (1.0 + 1e-7 * i)      # data-dependent chain, no DCE
        return jax.lax.fori_loop(0, INNER, body, b)

    @jax.jit
    def factorize_loop(eta):
        def one(eta1):
            D, _ = banded.assemble_D(rho_b, eta1, pairs.E, h=h,
                                     sigma=params.sigma, n_vehicles=N)
            return banded.factorize_X(D, C_shared, ns_iters=static.ns_iters,
                                      ns_anchor=static.ns_anchor)

        def body(i, acc):
            e = eta * (1.0 + 1e-6 * i)
            return acc + jax.vmap(one)(e)[:, -1, 0, 0]
        return jax.lax.fori_loop(0, INNER, body,
                                 jnp.zeros((eta.shape[0],), eta.dtype))

    etas = [fresh(1000 + 13 * r) for r in range(reps + 1)]
    for e in etas:
        np.asarray(e[:, -1, 0])

    # --- factorization timing (INNER loops per dispatch) ---
    X0 = factorize(etas[0])
    np.asarray(X0[:, -1, 0, 0])
    np.asarray(factorize_loop(etas[0]))         # compile
    t0 = time.perf_counter()
    for r in range(reps):
        np.asarray(factorize_loop(etas[1 + r]))
    fact_s = (time.perf_counter() - t0) / reps / INNER

    # --- x-update (grouped X solve) timing; vary b per rep ---
    bs = [jax.random.normal(jax.random.key(r), (batch, K, 6 * N),
                            jnp.float32)
          for r in range(reps + 1)]
    for b in bs:
        np.asarray(b[:, 0, 0])
    out = solve_g(X0, C_shared, bs[0])
    np.asarray(out[:, 0, 0])
    t0 = time.perf_counter()
    outs = [solve_g(X0, C_shared, bs[1 + r]) for r in range(reps)]
    for o in outs:
        np.asarray(o[:, 0, 0])
    solve_s = (time.perf_counter() - t0) / reps / INNER

    xmodel = direct_xupdate_cost(N, K)
    fmodel = factorize_X_cost(N, K, ns_iters=static.ns_iters)
    solve_bw = batch * xmodel["hbm_bytes"] / solve_s
    fact_fl = batch * fmodel["flops"] / fact_s
    rec = {
        "N": N, "K": K, "batch": batch, "np": npad, "group": group_n,
        "xupdate": {
            "measured_s": solve_s,
            "modeled_hbm_bytes": batch * xmodel["hbm_bytes"],
            "modeled_flops": batch * xmodel["flops"],
            "achieved_GBps": solve_bw / 1e9,
            "frac_of_hbm_peak": solve_bw / V5E_PEAK_HBM_BYTES,
        },
        "factorize": {
            "measured_s": fact_s,
            "modeled_flops": batch * fmodel["flops"],
            "achieved_TFLOPs": fact_fl / 1e12,
            "frac_of_f32_peak": fact_fl / V5E_PEAK_F32_HIGHEST_FLOPS,
        },
    }

    # --- fused-interval kernel (the N>=25 route): per-ADMM-iteration cost
    # by differencing two interval budgets on full QP solves ---
    prod_n = SolverConfig.production(n_vehicles=N)
    if prod_n.fused:
        from ba_path_planning_tpu.solvers.scp import SCPEngine

        def qp_time(iters, seed):
            cfgv = prod_n.replace(max_iter=iters, check_interval=iters)
            eng = SCPEngine(problem.replace(max_iterations=1,
                                           stop_mode="reference"),
                            cfgv, dtype=jnp.float32)
            sc = generate_scenario_batch(jax.random.key(seed), batch,
                                         n_vehicles=N, min_distance=0.8)
            v0 = jnp.zeros_like(sc.initial)
            keys = jax.random.split(jax.random.key(seed + 1), batch)
            run = jax.jit(jax.vmap(eng.solve_fn()))
            np.asarray(run(sc.initial, v0, sc.final, v0,
                           keys).feasible_final)       # compile+warm
            t0 = time.perf_counter()
            sc2 = generate_scenario_batch(jax.random.key(seed + 7), batch,
                                          n_vehicles=N, min_distance=0.8)
            np.asarray(run(sc2.initial, v0, sc2.final, v0,
                           keys).feasible_final)
            return time.perf_counter() - t0

        i1, i2 = 25, 75
        t1 = qp_time(i1, 51)
        t2 = qp_time(i2, 61)
        per_iter_s = max(t2 - t1, 1e-9) / (i2 - i1) / batch
        # which kernel solve_qp_state actually routes at this N (mirror of
        # its gating: fused needs the padded factors in VMEM and a starved
        # auto group)
        nr8 = -(-6 * N // 8) * 8
        fused_fits = K * nr8 * npad * isz <= int(10.5 * 1024 * 1024)
        route = "fused" if (fused_fits and group_n < 16) else "grouped"
        # what the same iterations would STREAM without residency
        streamed_bytes = 2 * K * npad * npad * 4
        rec["per_iter_marginal"] = {
            "route": route,
            "per_iter_us_per_scenario": per_iter_s * 1e6,
            "streamed_bytes_per_iter": streamed_bytes,
            "equiv_streaming_GBps": streamed_bytes / per_iter_s / 1e9,
            "note": ("marginal per-ADMM-iteration cost of the production "
                     "route (interval-budget differencing on full QP "
                     "solves).  route=fused holds factors VMEM-resident "
                     "(VPU-serial recurrence, not HBM-bound): its "
                     "equiv_streaming_GBps EXCEEDS the 819 GB/s HBM peak, "
                     "i.e. no streaming kernel can match it.  "
                     "route=grouped streams factors per iteration."),
        }
    return rec


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--ns", type=int, nargs="+", default=[20, 40])
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--out", default="docs/roofline.json")
    args = ap.parse_args(argv)

    records = []
    for n in args.ns:
        batch = max(16, args.batch // max(1, (n // 20) ** 2))
        rec = measure(n, batch, args.reps)
        records.append(rec)
        print(json.dumps(rec), flush=True)

    out = {
        "device": str(jax.devices()[0]),
        "peaks": {"hbm_GBps": V5E_PEAK_HBM_BYTES / 1e9,
                  "f32_highest_TFLOPs": V5E_PEAK_F32_HIGHEST_FLOPS / 1e12},
        "kernels": records,
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
