"""Incremental/anytime planners + 3D voxel planner.

Contracts tested (SURVEY.md §7.1: outputs, not expansion order):
- repair after a map edit returns EXACTLY the cold-replan field, in fewer
  lower-phase sweeps when the edit is local;
- ARA* per-stage costs are monotone nonincreasing and end optimal;
- IDA* returns the optimal cost with deepening stats;
- beam search cost ≥ optimal, equal for wide beams;
- 3D planner finds Euclidean-weighted shortest voxel paths.
"""

import jax.numpy as jnp
import numpy as np

from rust_robotics_tpu.planning.grid3d import (
    extract_path_3d,
    plan_grid_3d,
    wavefront_costs_3d,
)
from rust_robotics_tpu.planning.incremental import (
    ara_star_plan,
    beam_search_costs,
    dstar_lite_replan,
    fringe_search_costs,
    ida_star_costs,
    lpa_star_replan,
    octile_heuristic,
    relax_with_stats,
)
from rust_robotics_tpu.planning.wavefront import wavefront_costs


def _world(w=24, h=24):
    free = np.ones((w, h), bool)
    free[10, 2:20] = False  # wall with a gap at the top
    return jnp.asarray(free)


def _goals(shape, idx):
    g = np.zeros(shape, bool)
    g[idx] = True
    return jnp.asarray(g)


def test_repair_matches_cold_replan_after_obstacle_added():
    free = _world()
    goals = _goals(free.shape, (22, 22))
    d0, _ = relax_with_stats(jnp.full(free.shape, jnp.inf), free, goals)
    # close the gap: add obstacle cells
    free2 = np.asarray(free).copy()
    free2[10, 20:23] = False
    free2 = jnp.asarray(free2)
    d_repair, raise_sweeps, lower_sweeps = dstar_lite_replan(d0, free2, goals)
    d_cold = wavefront_costs(free2, goals)
    np.testing.assert_allclose(
        np.asarray(d_repair), np.asarray(d_cold), rtol=0, atol=1e-9
    )
    assert int(raise_sweeps) >= 1


def test_repair_matches_cold_replan_after_obstacle_removed():
    free = _world()
    goals = _goals(free.shape, (22, 22))
    d0, _ = relax_with_stats(jnp.full(free.shape, jnp.inf), free, goals)
    free2 = np.asarray(free).copy()
    free2[10, :] = True  # remove the wall entirely
    free2 = jnp.asarray(free2)
    d_repair, _, lower_sweeps = dstar_lite_replan(d0, free2, goals)
    d_cold = wavefront_costs(free2, goals)
    np.testing.assert_allclose(
        np.asarray(d_repair), np.asarray(d_cold), rtol=0, atol=1e-9
    )
    # local edit: warm repair needs fewer sweeps than a cold solve
    _, cold_sweeps = relax_with_stats(
        jnp.full(free.shape, jnp.inf), free2, goals
    )
    assert int(lower_sweeps) <= int(cold_sweeps)


def test_lpa_star_start_rooted():
    free = _world()
    starts = _goals(free.shape, (1, 1))
    d, _ = relax_with_stats(jnp.full(free.shape, jnp.inf), free, starts)
    d2, _, _ = lpa_star_replan(d, free, starts)
    np.testing.assert_allclose(np.asarray(d), np.asarray(d2), atol=1e-9)


def test_ara_star_monotone_and_optimal():
    free = _world()
    start = jnp.array([1, 1])
    goal = jnp.array([22, 22])
    d, costs, bounds = ara_star_plan(free, start, goal, stages=3,
                                     sweeps_per_stage=8)
    c = np.asarray(costs)
    finite = c[np.isfinite(c)]
    assert np.all(np.diff(finite) <= 1e-9)
    goals = _goals(free.shape, (22, 22))
    opt = float(wavefront_costs(free, goals)[1, 1])
    np.testing.assert_allclose(float(c[-1]), opt, atol=1e-9)
    assert np.isfinite(float(bounds[-1]))


def test_ida_star_optimal_with_stats():
    free = _world()
    start = jnp.array([1, 1])
    goal = jnp.array([22, 22])
    g, cost, stats = ida_star_costs(free, start, goal)
    goals = _goals(free.shape, (22, 22))
    opt = float(wavefront_costs(free, goals)[1, 1])
    np.testing.assert_allclose(float(cost), opt, atol=1e-6)
    assert int(stats["deepenings"]) >= 1
    assert int(stats["expanded_cells"]) <= free.size
    # fringe shares the engine
    _, cost_f, _ = fringe_search_costs(free, start, goal)
    np.testing.assert_allclose(float(cost_f), opt, atol=1e-6)


def test_ida_star_unreachable_is_inf():
    free = np.ones((12, 12), bool)
    free[6, :] = False
    _, cost, _ = ida_star_costs(jnp.asarray(free), jnp.array([1, 1]),
                                jnp.array([10, 10]), max_deepenings=16)
    assert not np.isfinite(float(cost))


def test_beam_search_bounds_optimal():
    free = _world()
    goals = _goals(free.shape, (22, 22))
    hmap = octile_heuristic(free.shape, jnp.array([1, 1]))
    opt = float(wavefront_costs(free, goals)[1, 1])
    d_wide, _ = beam_search_costs(free, goals, hmap, beam_width=free.size)
    np.testing.assert_allclose(float(d_wide[1, 1]), opt, atol=1e-9)
    d_narrow, _ = beam_search_costs(free, goals, hmap, beam_width=8)
    v = float(d_narrow[1, 1])
    assert (not np.isfinite(v)) or v >= opt - 1e-9


def test_grid3d_straight_line_costs():
    free = jnp.ones((8, 8, 8), bool)
    goals = np.zeros((8, 8, 8), bool)
    goals[0, 0, 0] = True
    d = wavefront_costs_3d(free, jnp.asarray(goals), connectivity=26)
    np.testing.assert_allclose(float(d[3, 0, 0]), 3.0, atol=1e-6)
    np.testing.assert_allclose(float(d[2, 2, 0]), 2 * np.sqrt(2), atol=1e-6)
    np.testing.assert_allclose(float(d[2, 2, 2]), 2 * np.sqrt(3), atol=1e-6)
    # 6-connected = Manhattan
    d6 = wavefront_costs_3d(free, jnp.asarray(goals), connectivity=6)
    np.testing.assert_allclose(float(d6[2, 2, 2]), 6.0, atol=1e-6)


def test_grid3d_plan_avoids_blocked_slab():
    free = np.ones((10, 10, 4), bool)
    free[5, :, :] = False
    free[5, 9, :] = True  # single corridor
    idx, mask, cost = plan_grid_3d(jnp.asarray(free), jnp.array([1, 1, 1]),
                                   jnp.array([8, 1, 1]))
    assert np.isfinite(float(cost))
    pts = np.asarray(idx)[np.asarray(mask)]
    fr = np.asarray(free)
    assert all(fr[tuple(p)] for p in pts)
    assert tuple(pts[0]) == (1, 1, 1)
    assert tuple(pts[-1]) == (8, 1, 1)
