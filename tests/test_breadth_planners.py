"""Breadth planners: branchout multimodal, bipedal LIPM, frontier
navigation, rigid-body certificates."""

import jax
import jax.numpy as jnp
import numpy as np

from rust_robotics_tpu.planning.bipedal import BipedalConfig, bipedal_plan
from rust_robotics_tpu.planning.branchout import (
    BranchOutConfig,
    BranchOutScene,
    branchout_plan,
    discrete_frechet,
    evaluate_multimodal,
    simulate_closed_loop,
    time_to_collision,
)
from rust_robotics_tpu.planning.frontier import (
    FrontierNavConfig,
    find_frontiers,
    frontier_navigate,
    sense_reveal,
)
from rust_robotics_tpu.planning.rigid_body import (
    RigidBodyConfig,
    aabb_obstacle,
    convex_polygon_halfspaces,
    pose_certificates,
    rigid_body_lattice_plan,
    rigid_body_rrt_plan,
)


# ---------------------------------------------------------------------------
# branchout


def test_branchout_probabilities_normalize_and_prefer_safe_mode():
    plan = branchout_plan(BranchOutScene.simple_overtake())
    p = np.asarray(plan["probability"])
    np.testing.assert_allclose(p.sum(), 1.0, atol=1e-6)
    # keep-lane drives straight through the stalled car: it must not win
    best = int(np.argmax(p))
    assert plan["modes"][best] != "keep-lane"
    assert np.all(np.asarray(plan["cost"]) > 0)


def test_branchout_forced_yield_yields():
    plan = branchout_plan(BranchOutScene.forced_yield())
    best = int(np.argmax(np.asarray(plan["probability"])))
    assert plan["modes"][best] == "yield"
    # the yield rollout slows down approaching the obstacle
    yield_traj = np.asarray(plan["poses"][1])
    assert yield_traj[-1, 2] < 0.5  # nearly stopped
    assert yield_traj[-1, 0] < 4.1  # behind the obstacle


def test_discrete_frechet_known_values():
    a = jnp.array([[0.0, 0.0], [1.0, 0.0], [2.0, 0.0]])
    b = jnp.array([[0.0, 1.0], [1.0, 1.0], [2.0, 1.0]])
    np.testing.assert_allclose(float(discrete_frechet(a, b)), 1.0, atol=1e-9)
    np.testing.assert_allclose(float(discrete_frechet(a, a)), 0.0, atol=1e-9)


def test_ttc_closing_and_separating():
    # head-on closing at 2 m/s from 4 m apart, radii sum 1 -> t = 1.5
    t = time_to_collision((0.0, 0.0), (2.0, 0.0), (4.0, 0.0), (0.0, 0.0), 1.0)
    np.testing.assert_allclose(float(t), 1.5, atol=1e-9)
    t2 = time_to_collision((0.0, 0.0), (-1.0, 0.0), (4.0, 0.0), (0.0, 0.0),
                           1.0)
    assert np.isinf(float(t2))
    t3 = time_to_collision((0.0, 0.0), (0.0, 0.0), (0.2, 0.0), (0.0, 0.0),
                           1.0)
    assert float(t3) == 0.0


def test_branchout_multimodal_metrics_and_closed_loop():
    scene = BranchOutScene.wide_overtake()
    plan = branchout_plan(scene)
    gt = np.asarray(plan["poses"][2])[None]  # lane-change-left as "truth"
    m = evaluate_multimodal(plan, gt)
    assert m["mode_count"] == 4
    assert m["mean_pairwise_final_distance"] > 0
    assert np.isfinite(m["negative_log_likelihood"])
    assert 0.0 <= m["speed_jsd"] <= np.log(2) + 1e-9
    assert 0.0 < m["expected_route_completion"] <= 1.0

    out = simulate_closed_loop(scene, [(0.0, 0.0)], steps=40)
    assert out["collision_steps"] == 0
    assert out["route_completion"] > 0.9
    assert out["min_clearance"] > 0
    assert len(out["mode_sequence"]) == 40


# ---------------------------------------------------------------------------
# bipedal


def test_bipedal_straight_walk_converges_and_tracks():
    steps = jnp.asarray([[0.0, 0.2, 0.0]] + [[0.3, 0.2, 0.0]] * 6
                        + [[0.0, 0.2, 0.0]])
    plan = bipedal_plan(steps)
    refs = np.asarray(plan["reference_footsteps"])
    mods = np.asarray(plan["modified_footsteps"])
    com = np.asarray(plan["com_trajectory"])
    assert refs.shape == mods.shape == (steps.shape[0] + 1, 3)
    assert np.all(np.isfinite(com))
    # reference x positions accumulate forward
    assert refs[-1, 0] > refs[1, 0]
    # modified footsteps stay near the references (stable gait)
    assert np.abs(mods[2:, :2] - refs[2:, :2]).max() < 0.5
    # COM sways laterally with the alternating support feet
    assert com[:, 1].max() - com[:, 1].min() > 0.05
    # COM advances with the gait
    assert com[-1, 0] > 1.0


# ---------------------------------------------------------------------------
# frontier navigation


def test_sense_reveal_occlusion_shadow():
    truth = np.zeros((20, 20), bool)
    truth[10, 8:13] = True  # wall casts a shadow
    known = jnp.zeros((20, 20), jnp.int32)
    known, visible = sense_reveal(known, jnp.asarray(truth),
                                  jnp.array([5, 10]), 8.0)
    k = np.asarray(known)
    assert k[7, 10] == 1  # free cell in range, clear LOS
    assert k[10, 10] == 2  # the wall face is revealed occupied
    assert k[13, 10] == 0  # behind the wall: shadowed, still unknown
    fr = np.asarray(find_frontiers(known))
    assert fr.any()


def test_frontier_navigate_reaches_goal_through_occlusions():
    truth = np.zeros((24, 24), bool)
    truth[12, 0:18] = True  # long wall with a gap near the top
    out = frontier_navigate(truth, (4, 4), (20, 4),
                            FrontierNavConfig(sensor_range=6.0,
                                              step_budget=5,
                                              max_episodes=400))
    assert out["reached"]
    t = out["trajectory"]
    assert not truth[t[:, 0], t[:, 1]].any()
    assert out["revealed_fraction"] > 0.3
    assert len(out["frontiers_chosen"]) >= 1


# ---------------------------------------------------------------------------
# rigid body


def test_halfspaces_contain_interior():
    hs = np.asarray(aabb_obstacle(2.0, 4.0, 2.0, 4.0))
    # interior point satisfies a·x + b·y <= c for all edges
    for a, b, c in hs:
        assert a * 3 + b * 3 - c <= 1e-9
    # exterior point violates at least one
    assert any(a * 9 + b * 9 - c > 0 for a, b, c in hs)


def test_pose_certificates_feasible_and_blocked():
    cfg = RigidBodyConfig()
    obs = [aabb_obstacle(4.0, 6.0, 4.0, 6.0)]
    from rust_robotics_tpu.planning.rigid_body import _stack_obstacles
    hs, valid = _stack_obstacles(obs)
    ok, idx, margin = pose_certificates(jnp.array([1.0, 1.0, 0.3]), hs,
                                        valid, cfg)
    assert bool(ok) and float(margin[0]) > cfg.clearance
    bad, _, _ = pose_certificates(jnp.array([5.0, 5.0, 0.0]), hs, valid, cfg)
    assert not bool(bad)


def test_rigid_body_lattice_plan_with_certificates():
    cfg = RigidBodyConfig(min_x=0, max_x=10, min_y=0, max_y=10,
                          position_step=0.5, heading_count=8)
    obs = [aabb_obstacle(3.5, 6.5, 0.0, 6.0)]
    out = rigid_body_lattice_plan((1.0, 1.0, 0.0), (9.0, 1.0, 0.0), obs, cfg)
    assert out is not None
    assert out["min_separation_margin"] > cfg.clearance
    poses = out["poses"]
    np.testing.assert_allclose(poses[0][:2], [1.0, 1.0], atol=0.26)
    np.testing.assert_allclose(poses[-1][:2], [9.0, 1.0], atol=0.26)
    # certificate margins are per-obstacle and positive along the path
    assert out["certificate_margins"].shape[1] == 1
    assert (out["certificate_margins"] > cfg.clearance).all()
    assert out["total_cost"] > 0


def test_rigid_body_rrt_backend_comparable():
    cfg = RigidBodyConfig(min_x=0, max_x=10, min_y=0, max_y=10)
    obs = [aabb_obstacle(3.5, 6.5, 0.0, 6.0)]
    out = rigid_body_rrt_plan(jax.random.PRNGKey(0), (1.0, 1.0, 0.0),
                              (9.0, 1.0, 0.0), obs, cfg, max_nodes=600)
    assert out is not None
    assert out["min_separation_margin"] > cfg.clearance
    assert out["path_length"] >= 8.0  # at least the straight-line distance
    assert out["backend"] == "rrt"


def test_convex_polygon_halfspaces_triangle():
    hs = np.asarray(convex_polygon_halfspaces([(0, 0), (2, 0), (0, 2)]))
    assert hs.shape == (3, 3)
    # centroid inside
    for a, b, c in hs:
        assert a * (2 / 3) + b * (2 / 3) - c <= 1e-9
