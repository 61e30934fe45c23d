"""Grid-planner tests.

Parity model (SURVEY.md §7.1): path *cost* equality, not expansion order.
Golden values: MovingAI `.scen` octile-optimal lengths checked into the
reference repo (benchdata/moving_ai/dao/arena2.map.scen) — the same maps the
reference's own comparison tests consume.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from rust_robotics_tpu.data.moving_ai import load_map, load_scenarios
from rust_robotics_tpu.planning.grid import grid_from_obstacle_points, grid_from_raster
from rust_robotics_tpu.planning.wavefront import (
    SQRT2,
    extract_path,
    goal_raster,
    plan_grid,
    wavefront_costs,
)

REF = "/root/reference/crates/rust_robotics_planning/benchdata/moving_ai"


def empty_grid(w=10, h=10):
    return grid_from_raster(np.zeros((w, h), dtype=bool))


def test_straight_line_cost():
    g = empty_grid()
    costs = wavefront_costs(g.free(), goal_raster((10, 10), jnp.array([9, 0])))
    np.testing.assert_allclose(float(costs[0, 0]), 9.0, atol=1e-12)


def test_diagonal_cost():
    g = empty_grid()
    costs = wavefront_costs(g.free(), goal_raster((10, 10), jnp.array([9, 9])))
    np.testing.assert_allclose(float(costs[0, 0]), 9 * SQRT2, atol=1e-9)


def test_octile_cost():
    g = empty_grid(12, 12)
    costs = wavefront_costs(g.free(), goal_raster((12, 12), jnp.array([11, 4])))
    # octile distance: 4 diagonals + 7 straights
    np.testing.assert_allclose(float(costs[0, 0]), 4 * SQRT2 + 7.0, atol=1e-9)


def test_wall_detour_and_unreachable():
    blocked = np.zeros((7, 7), dtype=bool)
    blocked[3, :6] = True  # wall with gap at y=6
    g = grid_from_raster(blocked)
    costs = wavefront_costs(g.free(), goal_raster((7, 7), jnp.array([6, 0])))
    assert np.isfinite(float(costs[0, 0]))
    assert float(costs[0, 0]) > 6.0
    blocked[3, :] = True  # full wall
    g2 = grid_from_raster(blocked)
    costs2 = wavefront_costs(g2.free(), goal_raster((7, 7), jnp.array([6, 0])))
    assert np.isinf(float(costs2[0, 0]))


def test_no_corner_cutting():
    # diagonal squeeze between two blocked cells must be disallowed
    blocked = np.zeros((3, 3), dtype=bool)
    blocked[1, 0] = True
    blocked[0, 1] = True
    g = grid_from_raster(blocked)
    costs = wavefront_costs(g.free(), goal_raster((3, 3), jnp.array([1, 1])))
    # (0,0) -> (1,1) directly would be sqrt2; blocked sides force unreachable
    assert np.isinf(float(costs[0, 0]))
    costs_cc = wavefront_costs(
        g.free(), goal_raster((3, 3), jnp.array([1, 1])), corner_cutting=True
    )
    np.testing.assert_allclose(float(costs_cc[0, 0]), SQRT2, atol=1e-12)


def test_extract_path_reaches_goal():
    g = empty_grid(8, 8)
    goal = jnp.array([7, 3])
    costs = wavefront_costs(g.free(), goal_raster((8, 8), goal))
    idx, mask, cost = extract_path(costs, g.free(), jnp.array([0, 0]), max_len=32)
    valid = np.asarray(idx)[np.asarray(mask)]
    assert (valid[0] == [0, 0]).all()
    assert (valid[-1] == [7, 3]).all()
    # path cost from steps equals D[start]
    steps = np.diff(valid, axis=0)
    step_costs = np.where(np.abs(steps).sum(-1) == 2, SQRT2, 1.0)
    np.testing.assert_allclose(step_costs.sum(), float(cost), atol=1e-9)


def test_plan_grid_world_coords():
    blocked = np.zeros((12, 12), dtype=bool)
    blocked[5, 2:10] = True
    g = grid_from_raster(blocked, min_x=-3.0, min_y=-3.0, resolution=0.5)
    path, cost = plan_grid(g, jnp.array([-2.0, -2.0]), jnp.array([2.0, 2.0]))
    pts = np.asarray(path.points)[np.asarray(path.mask) > 0]
    np.testing.assert_allclose(pts[0], [-2.0, -2.0], atol=1e-12)
    np.testing.assert_allclose(pts[-1], [2.0, 2.0], atol=1e-12)
    assert np.isfinite(float(cost))


def test_grid_from_points_matches_reference_semantics():
    # brute-force NumPy replication of GridMap::try_new (grid.rs:71-122)
    rng = np.random.default_rng(0)
    ox = np.concatenate([np.array([0.0, 10.0]), rng.uniform(0, 10, 30)])
    oy = np.concatenate([np.array([0.0, 10.0]), rng.uniform(0, 10, 30)])
    res, radius = 1.0, 1.2
    g = grid_from_obstacle_points(ox, oy, res, radius)
    min_x, min_y = round(ox.min()), round(oy.min())
    xw = round((round(ox.max()) - min_x) / res)
    yw = round((round(oy.max()) - min_y) / res)
    assert (g.x_width, g.y_width) == (xw, yw)
    expected = np.zeros((xw, yw), dtype=bool)
    for ix in range(xw):
        for iy in range(yw):
            x, y = ix * res + min_x, iy * res + min_y
            d = np.sqrt((ox - x) ** 2 + (oy - y) ** 2)
            expected[ix, iy] = bool((d <= radius).any())
    np.testing.assert_array_equal(np.asarray(g.blocked), expected)


def test_batched_multi_goal():
    g = empty_grid(9, 9)
    goals = jnp.stack(
        [
            goal_raster((9, 9), jnp.array([8, 8])),
            goal_raster((9, 9), jnp.array([0, 8])),
        ]
    )
    free = jnp.broadcast_to(g.free(), (2, 9, 9))
    costs = wavefront_costs(free, goals)
    np.testing.assert_allclose(float(costs[0, 0, 0]), 8 * SQRT2, atol=1e-9)
    np.testing.assert_allclose(float(costs[1, 0, 0]), 8.0, atol=1e-9)


@pytest.mark.slow
def test_movingai_arena2_scenario_golden():
    m = load_map(f"{REF}/dao/arena2.map")
    scens = load_scenarios(f"{REF}/dao/arena2.map.scen")
    grid = m.to_grid()
    free = grid.free()
    # pick scenarios across difficulty buckets
    chosen = scens[:: max(1, len(scens) // 12)][:12]
    for sc in chosen:
        sx, sy = m.planning_point(sc.start_x, sc.start_y)
        gx, gy = m.planning_point(sc.goal_x, sc.goal_y)
        g_idx = grid.world_to_index(jnp.array([gx, gy]))
        s_idx = grid.world_to_index(jnp.array([sx, sy]))
        costs = wavefront_costs(free, goal_raster(free.shape, g_idx))
        got = float(costs[int(s_idx[0]), int(s_idx[1])])
        assert got == pytest.approx(sc.optimal_length, abs=1e-6), (
            sc,
            got,
        )
