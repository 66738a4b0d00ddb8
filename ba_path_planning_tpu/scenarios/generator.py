"""Randomized scenario generation — JAX PRNG, batched, reproducible.

Reimplements the reference's "WOW Fleet" layout and sampling distribution
(``/root/reference/src/path_planning/scenarios/position_generator.py``):

  * 20x20 box; 4 corner circles of radius 2.5 centered (3.5,3.5) ... (16.5,16.5);
    central diamond = square of side 6 rotated 45 deg about (10,10)
    (position_generator.py:18-40)
  * initial positions: uniform point on the border of a uniformly chosen
    circle (position_generator.py:52-57, 235-237)
  * final positions: 90% uniform on the diamond border (uniform edge, uniform
    t), 10% on a circle border (position_generator.py:63-71, 240-244)
  * rejection: accept a candidate iff >= min_distance from all previously
    accepted points of its own set; give up after max_attempts
    (position_generator.py:58-59, 72-73)

The reference uses *unseeded* stdlib ``random`` (irreproducible even when the
batch harness seeds numpy — its own TODO at compute_trajectories_batch.py:40).
Here every scenario derives from an explicit PRNG key, and the rejection loop
is a fixed-trip-count ``lax.while_loop`` (jit/vmap-safe, SURVEY 8.1(4)).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

# ----------------- Layout constants (position_generator.py:18-40) ----------
BOX_SIZE = 20.0
CIRCLE_RADIUS = 2.5
DIAMOND_SIDE = 6.0
DIAMOND_CENTER = (10.0, 10.0)
CIRCLE_CENTERS = np.array([
    [3.5, 3.5],
    [16.5, 3.5],
    [3.5, 16.5],
    [16.5, 16.5],
])
DIAMOND_SIZE = DIAMOND_SIDE / np.sqrt(2.0)   # center -> vertex distance
DIAMOND_VERTICES = np.array([
    [DIAMOND_CENTER[0], DIAMOND_CENTER[1] + DIAMOND_SIZE],
    [DIAMOND_CENTER[0] + DIAMOND_SIZE, DIAMOND_CENTER[1]],
    [DIAMOND_CENTER[0], DIAMOND_CENTER[1] - DIAMOND_SIZE],
    [DIAMOND_CENTER[0] - DIAMOND_SIZE, DIAMOND_CENTER[1]],
])
DIAMOND_FINAL_PROB = 0.9                      # position_generator.py:64


class Scenario(NamedTuple):
    initial: jnp.ndarray   # (..., N, 2)
    final: jnp.ndarray     # (..., N, 2)
    ok: jnp.ndarray        # (...) bool — False if rejection sampling gave up


def _sample_circle_point(key, dtype):
    """Uniform point on the border of a uniformly chosen corner circle."""
    k1, k2 = jax.random.split(key)
    which = jax.random.randint(k1, (), 0, 4)
    center = jnp.asarray(CIRCLE_CENTERS, dtype=dtype)[which]
    angle = jax.random.uniform(k2, (), dtype=dtype, maxval=2.0 * jnp.pi)
    return center + CIRCLE_RADIUS * jnp.stack([jnp.cos(angle), jnp.sin(angle)])


def _sample_diamond_point(key, dtype):
    """Uniform point on the diamond border: uniform edge, uniform t."""
    k1, k2 = jax.random.split(key)
    edge = jax.random.randint(k1, (), 0, 4)
    verts = jnp.asarray(DIAMOND_VERTICES, dtype=dtype)
    v1 = verts[edge]
    v2 = verts[(edge + 1) % 4]
    t = jax.random.uniform(k2, (), dtype=dtype)
    return v1 + t * (v2 - v1)


def _sample_final_point(key, dtype):
    k1, k2 = jax.random.split(key)
    on_diamond = jax.random.uniform(k1, (), dtype=dtype) < DIAMOND_FINAL_PROB
    return jnp.where(on_diamond, _sample_diamond_point(k2, dtype),
                     _sample_circle_point(k2, dtype))


def _fill_positions(key, sample_fn, n_vehicles: int, min_distance: float,
                    max_attempts: int, dtype, unroll: int = 8):
    """Sequential rejection fill of one position set, as a lax.while_loop.

    Mirrors the reference's loop semantics exactly: one candidate per attempt,
    accepted iff >= min_distance from every already-accepted point in the SAME
    set; stop at n accepted or max_attempts candidates
    (position_generator.py:52-59).

    ``unroll`` candidates are processed per while_loop trip (inactive steps
    are masked out), cutting the serial step count ~unroll-fold: under vmap
    the loop runs to the batch-max attempt count in lockstep, and each trip
    is a tiny VPU kernel whose dispatch latency dominates.  The PRNG key
    chain and acceptance sequence are identical to the unroll=1 form, so
    generated scenarios are bit-identical for a given key.
    """
    N = n_vehicles
    big = jnp.asarray(1e6, dtype)   # placeholder far away from the box

    def cond(carry):
        _, count, attempts, _ = carry
        return jnp.logical_and(count < N, attempts < max_attempts)

    def body(carry):
        pts, count, attempts, key = carry
        for _ in range(unroll):
            active = jnp.logical_and(count < N, attempts < max_attempts)
            key, sub = jax.random.split(key)
            cand = sample_fn(sub, dtype)
            d2 = jnp.sum((pts - cand) ** 2, axis=-1)
            valid_mask = jnp.arange(N) < count
            min_d2 = jnp.min(jnp.where(valid_mask, d2, jnp.inf))
            accept = jnp.logical_and(min_d2 >= min_distance * min_distance,
                                     active)
            pts = jnp.where(
                (jnp.arange(N) == count)[:, None] & accept, cand, pts)
            count = count + accept.astype(count.dtype)
            attempts = attempts + active.astype(attempts.dtype)
        return pts, count, attempts, key

    pts0 = jnp.full((N, 2), big, dtype=dtype)
    pts, count, _, _ = jax.lax.while_loop(
        cond, body, (pts0, jnp.int32(0), jnp.int32(0), key))
    return pts, count >= N


@partial(jax.jit, static_argnames=("n_vehicles", "max_attempts", "dtype"))
def generate_scenario(key, *, n_vehicles: int, min_distance: float = 0.4,
                      max_attempts: int = 1000, dtype=jnp.float32) -> Scenario:
    """One scenario from one PRNG key.  vmap over keys for batches."""
    k_init, k_final = jax.random.split(key)
    init, ok_i = _fill_positions(k_init, _sample_circle_point, n_vehicles,
                                 min_distance, max_attempts, dtype)
    final, ok_f = _fill_positions(k_final, _sample_final_point, n_vehicles,
                                  min_distance, max_attempts, dtype)
    return Scenario(initial=init, final=final, ok=jnp.logical_and(ok_i, ok_f))


def generate_scenario_batch(key, batch: int, *, n_vehicles: int,
                            min_distance: float = 0.4,
                            max_attempts: int = 1000,
                            dtype=jnp.float32) -> Scenario:
    """(B, N, 2) initial/final positions from one master key."""
    keys = jax.random.split(key, batch)
    fn = jax.vmap(partial(generate_scenario, n_vehicles=n_vehicles,
                          min_distance=min_distance,
                          max_attempts=max_attempts, dtype=dtype))
    return fn(keys)


# ---------------------------------------------------------------------------
# Reference-compatible functional API (path_planning.generate_positions)
# ---------------------------------------------------------------------------

def generate_positions(n_vehicles, min_distance=0.4, max_attempts=1000,
                       seed=None):
    """Drop-in for the reference ``generate_positions``
    (position_generator.py:44-75): returns ``(initial (N,2), final (N,2))``
    numpy arrays, raising ``ValueError`` when rejection sampling gives up.

    ``seed=None`` draws a fresh seed from numpy's global RNG (so repeated
    calls differ, like the reference's unseeded stdlib random) — pass an int
    for exact reproducibility.
    """
    if seed is None:
        seed = int(np.random.randint(0, 2**31 - 1))
    sc = generate_scenario(jax.random.key(seed), n_vehicles=n_vehicles,
                           min_distance=float(min_distance),
                           max_attempts=int(max_attempts))
    if not bool(sc.ok):
        raise ValueError("Could not generate enough positions.")
    return np.asarray(sc.initial), np.asarray(sc.final)


# ---------------------------------------------------------------------------
# Scenario analysis (position_generator.py:173-205)
# ---------------------------------------------------------------------------

def visualize_scenario(initial_positions, final_positions, min_distance=0.4,
                       save_path=None, show=False):
    """Drop-in for the reference ``visualize_scenario``
    (position_generator.py:78-170); delegates to the viz layer."""
    from ..viz.plots import plot_scenario
    return plot_scenario(initial_positions, final_positions,
                         min_distance=min_distance, save_path=save_path,
                         show=show)


def minimum_distance(positions: np.ndarray) -> tuple[float, tuple[int, int]]:
    """Min pairwise distance and the closest pair."""
    pos = np.asarray(positions)
    n = len(pos)
    if n < 2:
        return float("inf"), (-1, -1)
    diff = pos[:, None, :] - pos[None, :, :]
    d = np.linalg.norm(diff, axis=-1)
    d[np.arange(n), np.arange(n)] = np.inf
    idx = np.unravel_index(np.argmin(d), d.shape)
    return float(d[idx]), (int(idx[0]), int(idx[1]))


def print_distance_analysis(initial_positions, final_positions):
    """Console summary: global min spacing + longest displacement
    (position_generator.py:173-192)."""
    init_min, _ = minimum_distance(initial_positions)
    final_min, _ = minimum_distance(final_positions)
    global_min = min(init_min, final_min)
    displacements = np.linalg.norm(
        np.asarray(final_positions) - np.asarray(initial_positions), axis=1)
    longest_path = float(displacements.max())
    longest_vehicle = int(displacements.argmax())
    print("\n" + "=" * 40)
    print("DISTANCE SUMMARY")
    print("=" * 40)
    print(f"Global minimum distance: {global_min:.3f} m")
    print(f"Longest path traveled:  {longest_path:.3f} m "
          f"(Vehicle {longest_vehicle})")
    print("=" * 40 + "\n")
    return dict(global_min_distance=global_min, longest_path=longest_path,
                longest_vehicle=longest_vehicle)
