"""CHOMP, traversal-risk graph, NAMO adaptive costmap, tangent bug."""

import jax.numpy as jnp
import numpy as np

from rust_robotics_tpu.planning.chomp import ChompConfig, chomp_optimize
from rust_robotics_tpu.planning.reactive import tangent_bug_plan
from rust_robotics_tpu.planning.risk_graph import (
    NamoConfig,
    add_clearance_exposure_risk,
    clearance_map,
    combined_cell_risk,
    inflate_blocked_cells,
    namo_new,
    namo_set_state,
    namo_to_risk,
    namo_update_movable,
    NAMO_MOVABLE,
    NAMO_STATIC,
    plan_risk_path,
    smooth_terrain_risk,
    sweep_risk_weights,
    terrain_risk_from_elevation,
)


def test_chomp_clears_obstacle_and_reduces_cost():
    start = jnp.array([0.0, 0.0])
    goal = jnp.array([10.0, 0.0])
    obs = jnp.array([[5.0, 0.0]])
    rad = jnp.array([1.0])
    cfg = ChompConfig(n_waypoints=40, max_iterations=200,
                      learning_rate=0.02, obstacle_cost_weight=5.0)
    x, cost, iters = chomp_optimize(start, goal, obs, rad, cfg)
    x = np.asarray(x)
    np.testing.assert_allclose(x[0], [0.0, 0.0], atol=1e-9)
    np.testing.assert_allclose(x[-1], [10.0, 0.0], atol=1e-9)
    assert int(iters) > 1
    # the optimized path must bow away from the obstacle center
    mid = x[np.argmin(np.abs(x[:, 0] - 5.0))]
    d = np.linalg.norm(mid - np.array([5.0, 0.0]))
    assert d > 1.0  # pushed outside the obstacle radius
    assert np.all(np.isfinite(x))


def test_chomp_straight_line_when_no_obstacles():
    start = jnp.array([0.0, 0.0])
    goal = jnp.array([4.0, 4.0])
    x, cost, _ = chomp_optimize(start, goal, jnp.zeros((1, 2)) + 100.0,
                                jnp.array([0.1]))
    x = np.asarray(x)
    # stays essentially straight (initial sine bump is 1e-3)
    t = np.linspace(0, 1, len(x))[:, None]
    straight = np.array(start) + t * (np.array(goal) - np.array(start))
    assert np.abs(x - straight).max() < 0.01


def test_elevation_risk_channels():
    z = np.zeros((16, 16))
    z[8:, :] = 2.0  # a step: big slope + roughness at the edge
    risk = terrain_risk_from_elevation(jnp.asarray(z), slope_risk_scale=8.0,
                                       roughness_risk_scale=10.0,
                                       max_risk=10.0,
                                       blocking_step_height=1.5)
    trav = np.asarray(risk.traversability)
    assert trav[7, 5] > 0 and trav[2, 5] == 0
    # roughness >= 1.5 at the step ⇒ blocked
    assert bool(np.asarray(risk.blocked)[7, 5]) or bool(
        np.asarray(risk.blocked)[8, 5]
    )
    sm = smooth_terrain_risk(risk, radius_cells=1)
    assert np.all(np.asarray(sm.blocked) == np.asarray(risk.blocked))
    assert np.all(np.isfinite(np.asarray(sm.traversability)))


def test_clearance_and_inflation():
    blocked = np.zeros((10, 10), bool)
    blocked[5, 5] = True
    c = np.asarray(clearance_map(jnp.asarray(blocked)))
    np.testing.assert_allclose(c[5, 5], 0.0)
    np.testing.assert_allclose(c[5, 8], 3.0)
    np.testing.assert_allclose(c[8, 9], np.hypot(3, 4), atol=1e-6)
    infl = np.asarray(inflate_blocked_cells(jnp.asarray(blocked), 2))
    assert infl[5, 7] and infl[7, 5] and not infl[5, 8]
    # no blocked cells -> infinite clearance
    c2 = clearance_map(jnp.zeros((4, 4), bool))
    assert np.all(np.isinf(np.asarray(c2)))


def test_risk_path_avoids_risky_corridor_when_weighted():
    from rust_robotics_tpu.planning.risk_graph import RiskChannels

    w = h = 15
    blocked = np.zeros((w, h), bool)
    trav = np.zeros((w, h))
    trav[:, 4:11] = 4.0  # risky middle band
    trav[7, 4:11] = 0.0  # a zero-risk corridor straight through
    blocked[6, 4:11] = True  # wall the corridor on one side
    risk = RiskChannels(jnp.asarray(blocked), jnp.asarray(trav),
                        jnp.zeros((w, h)), jnp.zeros((w, h)))
    idx0, m0, c0 = plan_risk_path(risk, (7, 0), (7, 14), risk_weight=0.0)
    idx1, m1, c1 = plan_risk_path(risk, (7, 0), (7, 14), risk_weight=10.0)
    p0 = np.asarray(idx0)[np.asarray(m0)]
    p1 = np.asarray(idx1)[np.asarray(m1)]
    # with risk weighting, the path uses the zero-risk corridor (row 7)
    band1 = p1[(p1[:, 1] >= 4) & (p1[:, 1] <= 10)]
    risk_on_path1 = trav[band1[:, 0], band1[:, 1]].sum()
    assert risk_on_path1 == 0.0
    assert float(c1) >= float(c0)  # adding risk can only raise total cost


def test_sweep_risk_weights_monotone_cost():
    from rust_robotics_tpu.planning.risk_graph import RiskChannels

    w = h = 12
    trav = np.random.default_rng(0).uniform(0, 2, (w, h))
    risk = RiskChannels(jnp.zeros((w, h), bool), jnp.asarray(trav),
                        jnp.zeros((w, h)), jnp.zeros((w, h)))
    out = sweep_risk_weights(risk, (0, 0), (11, 11), [0.0, 1.0, 4.0])
    costs = [float(o["cost"]) for o in out]
    assert costs[0] <= costs[1] <= costs[2]
    assert all(np.asarray(o["path_mask"]).any() for o in out)


def test_namo_stuck_raises_cost_until_blocked_then_replans_around():
    cfg = NamoConfig()
    cm = namo_new(10, 10)
    wall = [(5, y) for y in range(0, 9)]
    cm = namo_set_state(cm, jnp.asarray(wall), NAMO_STATIC, cfg)
    door = jnp.asarray([[5, 9]])
    cm = namo_set_state(cm, door, NAMO_MOVABLE, cfg)
    # stuck pushing against the movable door 3 times -> lethal (20+3*30>100)
    for _ in range(3):
        cm, changed = namo_update_movable(cm, door, commanded_speed=0.5,
                                          actual_speed=0.01, odom_delta=0.0,
                                          cfg=cfg)
    states, costs = cm
    assert float(costs[5, 9]) == cfg.lethal_cost
    risk = namo_to_risk(cm, block_lethal_movable=True, cfg=cfg)
    assert bool(risk.blocked[5, 9])  # the door is now untraversable
    # progress decays cost back toward initial
    cm2, _ = namo_update_movable(cm, door, commanded_speed=0.5,
                                 actual_speed=0.4, odom_delta=1.0, cfg=cfg)
    assert float(cm2[1][5, 9]) == cfg.lethal_cost - cfg.movable_cost_decrement


def test_namo_movable_cost_steers_path():
    cfg = NamoConfig()
    cm = namo_new(12, 12)
    wall = [(6, y) for y in range(1, 12)]
    cm = namo_set_state(cm, jnp.asarray(wall), NAMO_STATIC, cfg)
    cm = namo_set_state(cm, jnp.asarray([[6, 0]]), NAMO_MOVABLE, cfg)
    risk = namo_to_risk(cm, cfg=cfg)
    idx, mask, cost = plan_risk_path(risk, (0, 6), (11, 6), risk_weight=0.05)
    p = np.asarray(idx)[np.asarray(mask)]
    assert (p[:, 0] == 6).sum() >= 1  # crosses via the movable cell column
    assert np.isfinite(float(cost))


def test_tangent_bug_reaches_goal_around_obstacle():
    blocked = np.zeros((20, 20), bool)
    blocked[8:12, 5:15] = True
    path, reached = tangent_bug_plan(blocked, (2, 10), (18, 10),
                                     sensor_range=5.0)
    assert reached
    assert not blocked[path[:, 0], path[:, 1]].any()
    assert tuple(path[0]) == (2, 10) and tuple(path[-1]) == (18, 10)


def test_exposure_risk_added_near_walls():
    from rust_robotics_tpu.planning.risk_graph import RiskChannels

    blocked = np.zeros((10, 10), bool)
    blocked[0, :] = True
    risk = RiskChannels(jnp.asarray(blocked), jnp.zeros((10, 10)),
                        jnp.zeros((10, 10)), jnp.zeros((10, 10)))
    out = add_clearance_exposure_risk(risk, minimum_clearance=3.0,
                                      risk_scale=6.0, max_risk=10.0)
    e = np.asarray(out.exposure)
    np.testing.assert_allclose(e[1, 5], (1 - 1 / 3) * 6.0, atol=1e-6)
    np.testing.assert_allclose(e[2, 5], (1 - 2 / 3) * 6.0, atol=1e-6)
    assert e[5, 5] == 0.0
    total = combined_cell_risk(out, exposure_weight=2.0)
    np.testing.assert_allclose(float(total[1, 5]), 2 * e[1, 5], atol=1e-6)
