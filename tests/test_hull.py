"""Convex hull: exact monotone chain + batched direction-sweep area."""

import numpy as np
import jax.numpy as jnp

from coslam_tpu.geometry.hull import (
    convex_hull, polygon_area, points_in_hull, hull_area_masked)


def test_convex_hull_square_with_interior():
    pts = np.array([[0, 0], [1, 0], [1, 1], [0, 1],
                    [0.5, 0.5], [0.25, 0.75], [0.9, 0.1]])
    hull = convex_hull(pts)
    assert len(hull) == 4
    assert abs(polygon_area(hull) - 1.0) < 1e-12
    # all square corners present
    for c in [[0, 0], [1, 0], [1, 1], [0, 1]]:
        assert any(np.allclose(h, c) for h in hull)


def test_convex_hull_degenerate():
    assert polygon_area(convex_hull(np.array([[0, 0], [1, 1]]))) == 0.0
    col = np.stack([np.linspace(0, 1, 5), np.linspace(0, 2, 5)], -1)
    assert polygon_area(convex_hull(col)) < 1e-12


def test_points_in_hull():
    hull = convex_hull(np.array([[0, 0], [2, 0], [2, 2], [0, 2]]))
    pts = np.array([[1, 1], [3, 1], [0, 0], [-0.1, 1], [1.99, 1.99]])
    inside = points_in_hull(pts, hull)
    assert inside.tolist() == [True, False, True, False, True]


def test_direction_sweep_matches_exact_area():
    rng = np.random.default_rng(3)
    for _ in range(5):
        pts = rng.normal(size=(200, 2)) * [120.0, 80.0] + [320, 240]
        exact = polygon_area(convex_hull(pts))
        x = jnp.asarray(pts[:, 0:1], jnp.float32)   # [P, 1] batch dim
        y = jnp.asarray(pts[:, 1:2], jnp.float32)
        mask = jnp.ones_like(x, bool)
        approx = float(hull_area_masked(x, y, mask, n_dirs=64)[0])
        assert abs(approx - exact) / exact < 0.02
        # inner approximation: never exceeds the exact hull area
        assert approx <= exact * (1 + 1e-4)


def test_direction_sweep_masked_and_empty():
    rng = np.random.default_rng(0)
    pts = rng.uniform(0, 100, size=(64, 2)).astype(np.float32)
    x = jnp.asarray(np.stack([pts[:, 0]] * 3, -1))   # [P, 3]
    y = jnp.asarray(np.stack([pts[:, 1]] * 3, -1))
    mask = jnp.stack([jnp.ones(64, bool),            # all points
                      jnp.arange(64) < 2,            # 2 points -> area 0
                      jnp.zeros(64, bool)], -1)      # empty -> area 0
    areas = np.asarray(hull_area_masked(x, y, mask, n_dirs=32))
    exact = polygon_area(convex_hull(pts))
    assert abs(areas[0] - exact) / exact < 0.05
    assert areas[1] < 1e-3
    assert areas[2] == 0.0
