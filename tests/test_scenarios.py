"""Scenario generator tests: distribution properties, reproducibility, batching."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ba_path_planning_tpu.scenarios.generator import (
    BOX_SIZE, CIRCLE_CENTERS, CIRCLE_RADIUS, DIAMOND_CENTER, DIAMOND_SIZE,
    generate_positions, generate_scenario, generate_scenario_batch,
    minimum_distance, print_distance_analysis)


def _on_a_circle(points, atol=1e-5):
    """Each point lies on the border of one of the 4 corner circles."""
    d = np.linalg.norm(points[:, None, :] - CIRCLE_CENTERS[None], axis=-1)
    return np.all(np.any(np.abs(d - CIRCLE_RADIUS) < atol, axis=1))


def _on_diamond(points, atol=1e-5):
    """L1 distance from diamond center equals center->vertex distance."""
    l1 = np.abs(points - np.asarray(DIAMOND_CENTER)).sum(axis=-1)
    return np.abs(l1 - DIAMOND_SIZE) < atol


def test_initial_positions_on_corner_circles():
    sc = generate_scenario(jax.random.key(0), n_vehicles=12, min_distance=0.4,
                           dtype=jnp.float64)
    assert bool(sc.ok)
    init = np.asarray(sc.initial)
    assert _on_a_circle(init)
    assert np.all((init >= -0.01) & (init <= BOX_SIZE + 0.01))


@pytest.mark.slow
def test_final_positions_mostly_on_diamond():
    """~90% of final positions on the diamond border (position_generator.py:64)."""
    B, N = 64, 8
    sc = generate_scenario_batch(jax.random.key(1), B, n_vehicles=N,
                                 min_distance=0.3, dtype=jnp.float64)
    finals = np.asarray(sc.final).reshape(-1, 2)
    frac = _on_diamond(finals).mean()
    assert 0.8 < frac < 0.97, frac
    # the rest are on circles
    off = finals[~_on_diamond(finals)]
    assert _on_a_circle(off)


def test_min_distance_respected_within_sets():
    sc = generate_scenario(jax.random.key(2), n_vehicles=15, min_distance=0.8,
                           dtype=jnp.float64)
    assert bool(sc.ok)
    dmin_i, _ = minimum_distance(np.asarray(sc.initial))
    dmin_f, _ = minimum_distance(np.asarray(sc.final))
    assert dmin_i >= 0.8 - 1e-9
    assert dmin_f >= 0.8 - 1e-9


def test_reproducible_and_distinct():
    a = generate_scenario(jax.random.key(7), n_vehicles=5)
    b = generate_scenario(jax.random.key(7), n_vehicles=5)
    c = generate_scenario(jax.random.key(8), n_vehicles=5)
    np.testing.assert_array_equal(np.asarray(a.initial), np.asarray(b.initial))
    assert not np.allclose(np.asarray(a.initial), np.asarray(c.initial))


@pytest.mark.slow
def test_impossible_config_reports_failure():
    """Too many vehicles for the spacing -> ok=False, no exception in jit."""
    sc = generate_scenario(jax.random.key(3), n_vehicles=200, min_distance=2.0,
                           max_attempts=500)
    assert not bool(sc.ok)


@pytest.mark.slow
def test_generate_positions_reference_api():
    init, final = generate_positions(10, min_distance=0.8, seed=42)
    assert init.shape == (10, 2) and final.shape == (10, 2)
    import pytest
    with pytest.raises(ValueError):
        generate_positions(500, min_distance=2.0, max_attempts=100, seed=0)


@pytest.mark.slow
def test_distance_analysis_summary():
    init, final = generate_positions(6, min_distance=0.5, seed=1)
    out = print_distance_analysis(init, final)
    assert out["global_min_distance"] >= 0.5 - 1e-9
    assert out["longest_path"] > 0
