"""Kinematic RRT variants: Dubins/Reeds-Shepp edges, closed-loop tracking
validation, LQR metric — behavior tests (paths feasible, kinematically
sampled edges collision-free, closed-loop trajectory tracks the plan).
"""

import jax
import jax.numpy as jnp
import numpy as np

from rust_robotics_tpu.planning.rrt_kinematic import (
    BIG,
    KinematicRRTConfig,
    LQRRRTConfig,
    closed_loop_rrt_star_plan,
    extract_pose_path,
    lqr_rrt_star_plan,
    rrt_dubins_plan,
    rrt_star_dubins_plan,
    rrt_star_reeds_shepp_plan,
)

START = jnp.array([0.0, 0.0, 0.0])
GOAL = jnp.array([9.0, 9.0, jnp.pi / 2])
OBS = jnp.array([[4.5, 4.5], [2.0, 6.5]])
RAD = jnp.array([1.2, 0.9])
CFG = KinematicRRTConfig(max_nodes=96, curvature=0.8, connect_radius=5.0)


def _free(pts, mask):
    pts = np.asarray(pts)[np.asarray(mask)]
    d = np.linalg.norm(pts[:, None, :2] - np.asarray(OBS)[None], axis=-1)
    assert np.all(d > np.asarray(RAD)[None] - 1e-9)


def test_rrt_dubins_finds_feasible_path():
    tree, best, cost = rrt_dubins_plan(jax.random.PRNGKey(0), START, GOAL,
                                       OBS, RAD, CFG)
    assert float(cost) < BIG / 2
    poses, mask = extract_pose_path(tree, best, GOAL, CFG.curvature)
    _free(poses, mask)
    # dense samples trace a curvature-bounded curve ending at the goal
    kept = np.asarray(poses)[np.asarray(mask)]
    np.testing.assert_allclose(kept[-1][:2], np.asarray(GOAL)[:2], atol=0.05)


def test_rrt_star_dubins_not_worse_than_plain():
    k = jax.random.PRNGKey(1)
    _, _, c_star = rrt_star_dubins_plan(k, START, GOAL, OBS, RAD, CFG)
    assert float(c_star) < BIG / 2
    # cost is at least the unobstructed shortest Dubins length
    from rust_robotics_tpu.planning.curves import dubins_path_lengths
    lb = float(jnp.min(jnp.sum(
        dubins_path_lengths(START, GOAL, CFG.curvature), axis=-1
    )) / CFG.curvature)
    assert float(c_star) >= lb - 1e-6
    assert float(c_star) < 3.0 * lb


def test_rrt_star_reeds_shepp_feasible():
    tree, best, cost = rrt_star_reeds_shepp_plan(
        jax.random.PRNGKey(2), START, GOAL, OBS, RAD, CFG
    )
    assert float(cost) < BIG / 2
    poses, mask = extract_pose_path(tree, best, GOAL, CFG.curvature,
                                    reeds_shepp=True)
    _free(poses, mask)


def test_closed_loop_rrt_star_tracks_plan():
    traj, tree, cost, report = closed_loop_rrt_star_plan(
        jax.random.PRNGKey(3), START, GOAL, OBS, RAD, CFG,
        target_speed=1.2, sim_steps=600,
    )
    assert float(cost) < BIG / 2
    assert bool(report["tracked_collision_free"])
    assert float(report["min_goal_distance"]) < 2.0
    # simulated speeds stay bounded and finite
    v = np.asarray(traj[:, 3])
    assert np.all(np.isfinite(np.asarray(traj)))
    assert np.all(v <= 2.4 + 1e-9)


def test_lqr_rrt_star_reaches_goal_region():
    cfg = LQRRRTConfig(max_nodes=200)
    start = jnp.array([0.0, 0.0, 0.0, 0.0])
    goal = jnp.array([8.0, 8.0, 0.0, 0.0])
    tree, best, cost = lqr_rrt_star_plan(
        jax.random.PRNGKey(4), start, goal, OBS, RAD, cfg
    )
    assert float(cost) < BIG / 2
    node = np.asarray(tree["nodes"][best])
    assert np.linalg.norm(node[:2] - np.asarray(goal[:2])) <= cfg.goal_threshold
    # parent chain of the solution stays collision-free at node resolution
    cur = int(best)
    seen = 0
    while cur >= 0 and seen < cfg.max_nodes:
        p = np.asarray(tree["nodes"][cur][:2])
        d = np.linalg.norm(p - np.asarray(OBS), axis=-1)
        assert np.all(d > np.asarray(RAD) - 1e-9)
        cur = int(tree["parents"][cur])
        seen += 1
