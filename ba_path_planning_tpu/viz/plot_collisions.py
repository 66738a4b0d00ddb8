"""``plot-collisions``: collision-analysis plot over a solved scenario batch.

The reference's ``pyproject.toml:55`` declares this console script
(``plot-collisions = path_planning.viz.plot_collisions:main``) but the
module was never committed.  This implementation solves a (seeded) batch of
scenarios and renders the collision picture the solver actually enforces:

* per-timestep minimum pairwise distance — median and min/max band across
  the batch — against the safety radius R and the checker's R - 0.01
  tolerance line (reference ``scp.py:610``);
* a histogram of each scenario's closest approach, split by solver status.
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def collision_profile(positions, pairs=None):
    """(B, N, K, 2) trajectories -> (B, K) min pairwise distance per step."""
    import jax
    import jax.numpy as jnp

    from ..ops.collisions import make_pair_index, pairwise_diffs

    B, N, K, _ = positions.shape
    if pairs is None:
        pairs = make_pair_index(N, dtype=jnp.float32)

    def one(pos):
        d = pairwise_diffs(pos, pairs)             # (K, P, 2)
        return jnp.min(jnp.linalg.norm(d, axis=-1), axis=-1)

    return np.asarray(jax.jit(jax.vmap(one))(jnp.asarray(positions)))


def plot_collision_analysis(profiles, min_distance, feasible, time_step,
                            out_path, title=None):
    """Render the two-panel collision analysis to ``out_path``."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    B, K = profiles.shape
    t = np.arange(K) * time_step
    fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(11, 4.2))

    med = np.median(profiles, axis=0)
    ax1.fill_between(t, profiles.min(axis=0), profiles.max(axis=0),
                     alpha=0.25, color="tab:blue", label="min-max band")
    ax1.plot(t, med, color="tab:blue", lw=1.8, label="median")
    ax1.axhline(min_distance, color="tab:red", lw=1.2, label="R (safety)")
    ax1.axhline(min_distance - 0.01, color="tab:red", lw=0.8, ls="--",
                label="R - 0.01 (checker tol)")
    ax1.set_xlabel("time [s]")
    ax1.set_ylabel("min pairwise distance [m]")
    ax1.set_title(f"Closest pair over time ({B} scenarios)")
    ax1.legend(fontsize=8)
    ax1.grid(alpha=0.3)

    closest = profiles.min(axis=1)
    bins = np.linspace(min(closest.min(), min_distance - 0.05),
                       closest.max(), 30)
    feas = np.asarray(feasible, dtype=bool)
    ax2.hist(closest[feas], bins=bins, alpha=0.7, color="tab:green",
             label=f"collision-free ({int(feas.sum())})")
    if (~feas).any():
        ax2.hist(closest[~feas], bins=bins, alpha=0.7, color="tab:orange",
                 label=f"violating ({int((~feas).sum())})")
    ax2.axvline(min_distance, color="tab:red", lw=1.2)
    ax2.axvline(min_distance - 0.01, color="tab:red", lw=0.8, ls="--")
    ax2.set_xlabel("closest approach over horizon [m]")
    ax2.set_ylabel("scenarios")
    ax2.set_title("Closest-approach distribution")
    ax2.legend(fontsize=8)
    ax2.grid(alpha=0.3)

    if title:
        fig.suptitle(title)
    fig.tight_layout()
    fig.savefig(out_path, dpi=200)
    plt.close(fig)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--n-vehicles", type=int, default=10)
    ap.add_argument("--trials", type=int, default=32)
    ap.add_argument("--min-distance", type=float, default=0.8)
    ap.add_argument("--time-horizon", type=float, default=10.0)
    ap.add_argument("--time-step", type=float, default=0.2)
    ap.add_argument("--max-iterations", type=int, default=15)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out-path", type=str, default="collision_analysis.png")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from ..parallel.mesh import ShardedSCPSolver, make_mesh
    from ..scenarios import generate_scenario_batch
    from ..utils import ProblemConfig, SolverConfig

    problem = ProblemConfig(n_vehicles=args.n_vehicles,
                            time_horizon=args.time_horizon,
                            time_step=args.time_step,
                            min_distance=args.min_distance,
                            max_iterations=args.max_iterations,
                            stop_mode="feasible")
    mesh = make_mesh()
    B = max(args.trials, mesh.devices.size)
    B += (-B) % mesh.devices.size
    sh = ShardedSCPSolver(problem, SolverConfig.production(problem=problem), mesh=mesh,
                          dtype=jnp.float32)
    sc = generate_scenario_batch(jax.random.key(args.seed), B,
                                 n_vehicles=args.n_vehicles,
                                 min_distance=args.min_distance)
    v0 = jnp.zeros((B, args.n_vehicles, 2), jnp.float32)
    keys = jax.random.split(jax.random.key(args.seed + 1), B)
    chunk = min(B, 128 * mesh.devices.size)
    out = (sh.solve_compacted(sc.initial, v0, sc.final, v0, keys, chunk=chunk)
           if B % chunk == 0 else sh.solve(sc.initial, v0, sc.final, v0,
                                           keys))

    profiles = collision_profile(np.asarray(out.positions))
    feas = np.asarray(out.feasible_final)
    print(f"{int(feas.sum())}/{B} collision-free; global closest approach "
          f"{profiles.min():.3f} m (R = {args.min_distance})")
    plot_collision_analysis(profiles, args.min_distance, feas,
                            args.time_step, args.out_path,
                            title=f"N={args.n_vehicles}, "
                                  f"K={problem.n_steps}, R="
                                  f"{args.min_distance}")
    print(f"Saved plot: {args.out_path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
