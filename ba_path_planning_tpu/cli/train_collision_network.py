"""``train-network``: train the collision-prediction network.

The reference's ``pyproject.toml:57`` declares this console script
(``train-network = path_planning.viz.train_collision_network:main``) but the
module was never committed.  This implementation trains
:class:`~ba_path_planning_tpu.models.collision_net.CollisionNet` end-to-end
on device: scenarios are generated with the JAX-PRNG generator, labeled by
actually running the solver's phase-1 (collision-free initial QP + exact
feasibility check — the gate at reference ``scp.py:144``), and fit with
optax inside a jitted step.
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np


def _label_chunks(problem, n_samples, chunk, seed):
    """Generate scenarios and label feasibility of the initial QP."""
    import jax
    import jax.numpy as jnp

    from ..scenarios import generate_scenario_batch
    from ..solvers.scp import SCPEngine
    from ..utils import SolverConfig

    engine = SCPEngine(problem, SolverConfig.production(problem=problem),
                       dtype=jnp.float32)
    start, _, _ = engine.start_step_finalize_fns()
    start_b = jax.jit(jax.vmap(start))

    p0s, pfs, ys = [], [], []
    done = 0
    while done < n_samples:
        b = min(chunk, n_samples - done)
        key = jax.random.key(seed + done)
        sc = generate_scenario_batch(key, b, n_vehicles=problem.n_vehicles,
                                     min_distance=problem.min_distance)
        v0 = jnp.zeros((b, problem.n_vehicles, 2), jnp.float32)
        keys = jax.random.split(jax.random.key(seed + done + 1), b)
        carry = start_b(sc.initial, v0, sc.final, v0, keys)
        p0s.append(np.asarray(sc.initial))
        pfs.append(np.asarray(sc.final))
        ys.append(np.asarray(carry.feasible_initial, dtype=np.float32))
        done += b
    return (np.concatenate(p0s), np.concatenate(pfs), np.concatenate(ys))


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--n-vehicles", type=int, default=10)
    ap.add_argument("--min-distance", type=float, default=0.8)
    ap.add_argument("--time-horizon", type=float, default=10.0)
    ap.add_argument("--time-step", type=float, default=0.2)
    ap.add_argument("--samples", type=int, default=8192)
    ap.add_argument("--label-chunk", type=int, default=128)
    ap.add_argument("--batch-size", type=int, default=256)
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--lr", type=float, default=3e-3)
    ap.add_argument("--hidden", type=int, nargs="+", default=[64, 64])
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--eval-frac", type=float, default=0.2)
    ap.add_argument("--out", type=str, default="collision_net.npz")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from ..models.collision_net import (make_train_state, make_train_step,
                                        predict_logits, save_params)
    from ..utils import ProblemConfig

    problem = ProblemConfig(n_vehicles=args.n_vehicles,
                            time_horizon=args.time_horizon,
                            time_step=args.time_step,
                            min_distance=args.min_distance)

    print(f"Labeling {args.samples} scenarios (N={args.n_vehicles}) via the "
          f"phase-1 solve on {jax.default_backend()} ...", flush=True)
    t0 = time.perf_counter()
    p0, pf, y = _label_chunks(problem, args.samples, args.label_chunk,
                              args.seed)
    print(f"  done in {time.perf_counter() - t0:.1f}s; "
          f"feasible fraction {y.mean():.3f}", flush=True)

    n_eval = int(args.samples * args.eval_frac)
    rng = np.random.default_rng(args.seed)
    perm = rng.permutation(args.samples)
    tr, ev = perm[n_eval:], perm[:n_eval]

    params, opt_state, apply_fn, tx = make_train_state(
        jax.random.key(args.seed), args.n_vehicles, hidden=args.hidden,
        learning_rate=args.lr)
    train_step = make_train_step(apply_fn, tx)

    bs = args.batch_size
    for epoch in range(args.epochs):
        rng.shuffle(tr)
        losses, accs = [], []
        for lo in range(0, len(tr) - bs + 1, bs):
            idx = tr[lo:lo + bs]
            params, opt_state, loss, acc = train_step(
                params, opt_state, jnp.asarray(p0[idx]), jnp.asarray(pf[idx]),
                jnp.asarray(y[idx]))
            losses.append(float(loss))
            accs.append(float(acc))
        if epoch % 5 == 0 or epoch == args.epochs - 1:
            print(f"epoch {epoch:3d}: loss {np.mean(losses):.4f} "
                  f"train acc {np.mean(accs):.3f}", flush=True)

    # held-out evaluation
    logits = np.asarray(predict_logits(
        params, jnp.asarray(p0[ev]), jnp.asarray(pf[ev]), apply_fn=apply_fn))
    pred = logits > 0
    truth = y[ev] > 0.5
    acc = float((pred == truth).mean())
    tp = float((pred & truth).sum())
    prec = tp / max(pred.sum(), 1)
    rec = tp / max(truth.sum(), 1)
    order = np.argsort(-logits)
    ranked = truth[order]
    n_pos, n_neg = ranked.sum(), (~ranked).sum()
    auc = float(((np.cumsum(~ranked) * ranked).sum() / max(n_pos * n_neg, 1))
                if n_pos and n_neg else 1.0)
    auc = 1.0 - auc
    print(f"eval: acc {acc:.3f}  precision {prec:.3f}  recall {rec:.3f}  "
          f"auc {auc:.3f}  (n={n_eval}, base rate {truth.mean():.3f})")

    save_params(args.out, params)
    print(f"Saved parameters: {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
