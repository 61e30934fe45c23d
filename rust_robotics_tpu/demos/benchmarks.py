"""Deterministic benchmark registry + CSV regression gate.

Reference: the 32 benchmark_* examples and the regression gate
(scripts/check_benchmark_gate.sh:20-33 runs 12 pinned deterministic
benchmarks, diffs their CSVs under docs/assets/ via
check_benchmark_gate.py — headers/rows exact, numerics to 1e-6,
wall-clock `*_ms/_us/_ns` columns ignored; BENCHMARKS.md:10-22. Pinned
functional metrics: path length, success rate, residual norms, collisions,
clearance, lap completion, BENCHMARKS.md:3-7).

This module is the same contract: `PINNED` maps benchmark name → a
deterministic function returning (header, rows); `run_all` writes
docs/assets/<name>.csv; `check_gate` compares a fresh run against the
checked-in assets with `utils.bench_gate.compare_csv` (the reference's
comparison semantics, including wall-clock exclusion).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from rust_robotics_tpu.utils.bench_gate import compare_csv, write_csv

__all__ = ["PINNED", "run_benchmark", "run_all", "check_gate"]


def _fmt(v):
    if isinstance(v, bool):
        return str(v).lower()
    if isinstance(v, float):
        return f"{v:.9g}"
    return str(v)


def bench_ekf_localization():
    from rust_robotics_tpu.demos.ekf_localization import (
        run_ekf_localization_demo,
    )

    out = run_ekf_localization_demo(steps=330)
    err = np.asarray(out["estimate"])[:, :2] - np.asarray(out["truth"])[:, :2]
    rmse = float(np.sqrt(np.mean(np.sum(err**2, axis=-1))))
    header = ["steps", "position_rmse", "final_error"]
    rows = [[330, rmse, float(np.linalg.norm(err[-1]))]]
    return header, rows


def bench_pose_graph():
    from rust_robotics_tpu.demos.pose_graph_bench import (
        rmse,
        synthesize_chain,
    )
    from rust_robotics_tpu.slam.pose_graph import optimize_pose_graph_2d

    header = ["size", "iterations", "rmse"]
    rows = []
    for size in (50, 200):
        truth, initial, ef, et, meas, info = synthesize_chain(size)
        poses, summary = optimize_pose_graph_2d(initial, ef, et, meas, info)
        rows.append([size, int(summary.iterations),
                     rmse(np.asarray(poses), truth)])
    return header, rows


def bench_grid_planners():
    from rust_robotics_tpu.planning.grid import grid_from_raster
    from rust_robotics_tpu.planning.wavefront import plan_grid

    free = np.ones((64, 64), bool)
    free[20:44, 20] = False
    free[20, 20:50] = False
    grid = grid_from_raster(jnp.asarray(~free), resolution=1.0)
    header = ["connectivity", "path_cost", "path_cells"]
    rows = []
    for conn in (4, 8):
        path, cost = plan_grid(grid, (2.0, 2.0), (60.0, 60.0),
                               connectivity=conn)
        rows.append([conn, float(cost), int(np.asarray(path.mask).sum())])
    return header, rows


def bench_dwa_navigation():
    from rust_robotics_tpu.demos.headless import headless_navigation_loop

    m = headless_navigation_loop()
    header = ["goal_reached", "path_length", "min_clearance",
              "mean_estimate_error"]
    rows = [[m["goal_reached"], m["path_length"],
             m["min_obstacle_clearance"], m["mean_estimate_error"]]]
    return header, rows


def bench_rrt_star():
    from rust_robotics_tpu.planning.rrt import RRTConfig, rrt_plan

    obs = jnp.array([[5.0, 5.0], [3.0, 6.0], [7.0, 4.0]])
    rad = jnp.array([1.0, 0.8, 0.8])
    cfg = RRTConfig(expand_dis=1.0, max_nodes=300, connect_radius=2.5,
                    goal_threshold=1.0)
    header = ["seed", "star", "cost", "nodes"]
    rows = []
    for seed in (0, 1):
        for star in (False, True):
            tree, best, cost = rrt_plan(
                jax.random.PRNGKey(seed), jnp.zeros(2),
                jnp.array([10.0, 10.0]), obs, rad, cfg, star=star,
            )
            rows.append([seed, star, float(cost),
                         int(np.asarray(tree.active).sum())])
    return header, rows


def bench_frenet():
    from rust_robotics_tpu.planning.curves import Spline2D
    from rust_robotics_tpu.planning.frenet import FrenetConfig, frenet_optimal_plan

    wx = jnp.array([0.0, 10.0, 20.5, 35.0, 70.5])
    wy = jnp.array([0.0, -6.0, 5.0, 6.5, 0.0])
    csp = Spline2D.fit(wx, wy)
    obstacles = jnp.array([[20.0, 10.0], [30.0, 6.0], [35.0, 8.0]])
    out = frenet_optimal_plan(csp, 0.0, 10.0 / 3.6, 2.0, 0.0, 0.0, obstacles)
    header = ["best_cost", "valid_candidates", "any_valid"]
    rows = [[float(out["cost"]), int(out["num_valid"]),
             bool(out["any_valid"])]]
    return header, rows


def bench_mppi():
    from rust_robotics_tpu.control.mppi import (
        MPPIConfig,
        double_integrator_dynamics,
        make_goal_costs,
        mppi_plan,
        shift_nominal,
    )

    cfg = MPPIConfig(horizon=25, num_samples=256)
    stage, terminal = make_goal_costs(jnp.array([5.0, 5.0]))
    state = jnp.zeros(4)
    u = jnp.zeros((25, 2))
    key = jax.random.PRNGKey(0)
    for k in range(40):
        key, sk = jax.random.split(key)
        u, first, diag = mppi_plan(sk, double_integrator_dynamics, stage,
                                   terminal, state, u, cfg)
        state = double_integrator_dynamics(state, first, cfg.dt)
        u = shift_nominal(u)
    header = ["final_distance", "final_speed", "best_cost"]
    rows = [[float(jnp.linalg.norm(state[:2] - 5.0)),
             float(jnp.linalg.norm(state[2:])), float(diag.best_cost)]]
    return header, rows


def bench_mppi_value():
    """Value-guided vs vanilla MPPI behind a wall (mppi.rs:362 terminal
    value grids + :1114 terminal_value_cost): the wavefront-derived value
    grid steers around the obstacle, the quadratic terminal does not."""
    import numpy as np

    from rust_robotics_tpu.control.mppi import (
        MPPIConfig,
        double_integrator_dynamics,
        make_goal_costs,
        mppi_plan,
        shift_nominal,
    )
    from rust_robotics_tpu.control.mppi_value import (
        TerminalValueGrid,
        make_value_terminal_cost,
    )
    from rust_robotics_tpu.planning.wavefront import (
        goal_raster,
        wavefront_costs,
    )

    res = 0.25
    origin = (-2.0, -4.0)
    w, h = 48, 48
    goal = jnp.array([6.0, 0.0])
    free = np.ones((w, h), bool)
    wall_x = int((2.5 - origin[0]) / res)
    wall_top = int((2.0 - origin[1]) / res)
    free[wall_x:wall_x + 2, :wall_top] = False
    free = jnp.asarray(free)
    goal_idx = jnp.asarray([int((goal[0] - origin[0]) / res),
                            int((goal[1] - origin[1]) / res)])
    vgrid = TerminalValueGrid(
        jnp.asarray(origin), jnp.asarray(res),
        wavefront_costs(free, goal_raster((w, h), goal_idx)) * res)
    obstacle_pts = (np.argwhere(~np.asarray(free)) * res
                    + np.asarray(origin) + res / 2)
    stage, quad_terminal = make_goal_costs(
        goal, obstacles=jnp.asarray(obstacle_pts), obstacle_radius=0.4,
        obstacle_weight=500.0)
    cfg = MPPIConfig(horizon=25, num_samples=512, noise_sigma=(0.8, 0.8))

    def run(terminal, steps=70):
        state = jnp.array([0.0, 0.0, 0.0, 0.0])
        u = jnp.zeros((cfg.horizon, 2))
        key = jax.random.PRNGKey(7)
        for _ in range(steps):
            key, sk = jax.random.split(key)
            u, first, _ = mppi_plan(sk, double_integrator_dynamics, stage,
                                    terminal, state, u, cfg)
            state = double_integrator_dynamics(state, first, cfg.dt)
            u = shift_nominal(u)
        return float(jnp.linalg.norm(state[:2] - goal))

    d_value = run(make_value_terminal_cost(vgrid, weight=30.0))
    d_vanilla = run(quad_terminal)
    header = ["variant", "final_distance", "beats_vanilla"]
    rows = [["value_guided", d_value, int(d_value < d_vanilla)],
            ["vanilla_quadratic", d_vanilla, 0]]
    return header, rows


def bench_controller_arena():
    from rust_robotics_tpu.control.arena import run_controller_arena

    results, (header, rows) = run_controller_arena(steps=500)
    return header, rows


def bench_icp():
    from rust_robotics_tpu.slam.icp import icp_matching

    key = jax.random.PRNGKey(3)
    pts = jax.random.uniform(key, (120, 2)) * 10.0
    ang = 0.3
    rot = jnp.array([[jnp.cos(ang), -jnp.sin(ang)],
                     [jnp.sin(ang), jnp.cos(ang)]])
    cur = pts @ rot.T + jnp.array([1.0, -0.5])
    res = icp_matching(pts, cur)
    header = ["iterations", "final_error_mean", "inlier_ratio_5cm",
              "converged"]
    rows = [[int(res.iterations), float(res.final_error_mean),
             float(res.inlier_ratio_5cm), bool(res.converged)]]
    return header, rows


def bench_particle_filter():
    from rust_robotics_tpu.filters.particle import (
        init_particles,
        pf_estimate,
        pf_step,
    )
    from rust_robotics_tpu.models.motion import unicycle_propagate

    key = jax.random.PRNGKey(0)
    landmarks = jnp.array([[10.0, 0.0], [10.0, 10.0], [0.0, 15.0],
                           [-5.0, 20.0]])
    belief = init_particles(jax.random.PRNGKey(1), jnp.zeros(4), 0.1, 512)
    truth = jnp.zeros(4)
    u = jnp.array([1.0, 0.1])
    errs = []
    for k in range(60):
        key, k1, k2 = jax.random.split(key, 3)
        truth = unicycle_propagate(truth, u, 0.1)
        ranges = jnp.linalg.norm(landmarks - truth[:2], axis=-1)
        ranges = ranges + 0.05 * jnp.sin(jnp.arange(4.0) + 0.3 * k)
        belief, gauss = pf_step(belief, u, ranges, landmarks, 0.1, k1,
                                control_noise_std=jnp.array([0.1, 0.05]),
                                range_noise=0.2)
        errs.append(float(jnp.linalg.norm(gauss.mean[:2] - truth[:2])))
    header = ["steps", "final_error", "mean_error"]
    rows = [[60, errs[-1], float(np.mean(errs))]]
    return header, rows


def bench_coverage():
    from rust_robotics_tpu.planning.coverage import (
        coverage_metrics,
        spiral_stc_plan,
        wavefront_cpp,
    )

    blocked = np.zeros((12, 12), bool)
    blocked[5:7, 3:9] = True
    path, _ = wavefront_cpp(blocked, (0, 0), (11, 11))
    m = coverage_metrics(path, blocked)
    stc = spiral_stc_plan(np.ones((8, 8), bool), (0, 0))
    header = ["wavefront_coverage_ratio", "wavefront_revisits",
              "stc_mega_cells", "stc_edges"]
    rows = [[m["coverage_ratio"], m["revisits"],
             len({tuple(r) for r in stc["route"]}), len(stc["edges"])]]
    return header, rows


def bench_stl_cbs():
    from rust_robotics_tpu.planning.stl import first_conflict, stl_cbs_plan

    free = np.ones((9, 3), bool)
    out = stl_cbs_plan(jnp.asarray(free), [(0, 1), (8, 1)],
                       [(8, 1), (0, 1)], t_max=20)
    header = ["total_cost", "conflicts_resolved", "min_separation",
              "conflict_free"]
    rows = [[out["total_cost"], out["conflicts_resolved"],
             out["min_pairwise_separation_robustness"],
             first_conflict(out["paths"]) is None]]
    return header, rows


def bench_mission_recovery():
    from rust_robotics_tpu.demos.headless import headless_mission_recovery

    m = headless_mission_recovery()
    header = ["mission_done", "recovery_count", "final_distance"]
    rows = [[m["mission_done"], m["recovery_count"], m["final_distance"]]]
    return header, rows


def bench_slam_node():
    from rust_robotics_tpu.slam.slam_node import REASONS, run_slam_node_loop

    out = run_slam_node_loop(steps=30)
    d = out["diagnostics"]
    accepted = int(np.sum(np.asarray(d.reason_xy) == 0))
    header = ["final_pose_error", "final_odom_error", "accepted_scans",
              "mean_alpha_xy", "submap_points"]
    rows = [[float(d.pose_error[-1]), float(d.odom_error[-1]), accepted,
             float(np.mean(np.asarray(d.alpha_xy))),
             int(d.submap_points[-1])]]
    return header, rows


def bench_arm_rrt_star():
    from rust_robotics_tpu.control.arm import rrt_star_arm_plan

    lengths = jnp.ones(7) * 0.5
    centers = jnp.array([[1.2, 0.6, 0.3], [0.8, -0.8, 0.5]])
    radii = jnp.array([0.25, 0.25])
    out = rrt_star_arm_plan(
        jax.random.PRNGKey(0), jnp.zeros(7), jnp.full(7, 0.6), lengths,
        centers, radii, max_nodes=192, step_size=0.5, rewire_radius=1.2,
        edge_checks=6, path_len=32)
    header = ["found", "cost", "waypoints"]
    rows = [[bool(out["found"]), float(out["cost"]),
             int(out["mask"].sum())]]
    return header, rows


def bench_sampling_quality():
    from rust_robotics_tpu.experiments.point_cloud_sampling import (
        CloudCase, run_point_cloud_sampling_quality)

    problems = {
        "point_cloud_sampling": [
            CloudCase("plane_baseline", (24,), base_point_count=96)],
        "occlusion_corruption": [
            CloudCase("ring_sector", (24,), kind="ring", base_point_count=96,
                      corruption="sector_drop", sector_start=0.4,
                      sector_end=1.8, drop_probability=0.9)],
    }
    reports = run_point_cloud_sampling_quality(
        0, problems=problems, scenarios_per_bucket=4, max_iter=256)
    header = ["variant", "agreement_vs_reference", "coverage_ratio",
              "winner_case0"]
    rows = [[name, rep["agreement_vs_reference"],
             rep["average_coverage_ratio"],
             rep["observations"][0].winner()]
            for name, rep in sorted(reports.items())]
    return header, rows


# ---------------------------------------------------------------------------
# Round-2 breadth: the remaining reference benchmark_* families
# (benchmark_localizers.rs, benchmark_admm_*.rs, benchmark_cbf_safety_filter.rs,
#  benchmark_conformal_*.rs, benchmark_factor_graph_scaling.rs,
#  benchmark_hierarchical_mapf_*.rs, benchmark_meta_control.rs,
#  benchmark_pusher_slider*.rs, benchmark_racing_*.rs,
#  benchmark_rigid_body_backends.rs, benchmark_traversal_risk_sweep.rs,
#  benchmark_branchout_closed_loop.rs, benchmark_adap_rpf_metrics.rs)


def bench_localizers():
    from rust_robotics_tpu.demos.headless_family import headless_localizers

    out = headless_localizers(steps=120)
    header = ["filter", "position_rmse"]
    rows = [[n, out[f"{n}_rmse"]] for n in ("ekf", "ukf", "ckf", "pf")]
    return header, rows


def bench_admm_formation():
    from rust_robotics_tpu.control.admm import (
        ADMMConfig, solve_formation_consensus)

    offsets = jnp.array([[1.0, 0.0], [-1.0, 0.0], [0.0, 1.0], [0.0, -1.0]])
    positions = jnp.array([[5.8, 2.1], [4.1, 2.0], [5.1, 2.9], [4.9, 1.2]])
    center, targets, res = solve_formation_consensus(
        positions, offsets, cfg=ADMMConfig(iterations=200))
    header = ["agents", "center_x", "center_y", "primal_residual",
              "max_offset_error"]
    err = float(jnp.max(jnp.linalg.norm(
        (targets - center) - offsets, axis=-1)))
    rows = [[4, float(center[0]), float(center[1]),
             float(res.primal_residual), err]]
    return header, rows


def bench_admm_graph_consensus():
    from rust_robotics_tpu.control.admm import ADMMConfig, solve_consensus

    header = ["agents", "consensus_x", "consensus_y", "primal_residual",
              "mean_error"]
    rows = []
    for n in (3, 8):
        t = jnp.stack([jnp.linspace(0.0, 4.0, n),
                       jnp.sin(jnp.linspace(0.0, 3.0, n))], axis=-1)
        res = solve_consensus(t, cfg=ADMMConfig(iterations=300))
        rows.append([n, float(res.z[0]), float(res.z[1]),
                     float(res.primal_residual),
                     float(jnp.mean(jnp.linalg.norm(t - res.z, axis=-1)))])
    return header, rows


def bench_cbf_safety_filter():
    from rust_robotics_tpu.control.cbf import (
        CBFConfig, cbf_filter_single_integrator)

    cfg = CBFConfig(alpha=2.0)
    obstacles = jnp.array([[2.0, 0.0]])
    radii = jnp.array([1.0])
    pos = jnp.array([0.0, 0.0])
    dt = 0.05
    min_h = np.inf
    for _ in range(150):
        u = cbf_filter_single_integrator(pos, jnp.array([1.5, 0.0]),
                                         obstacles, radii, cfg)
        pos = pos + dt * u
        min_h = min(min_h, float(
            jnp.sum((pos - obstacles[0]) ** 2) - radii[0] ** 2))
    far = cbf_filter_single_integrator(jnp.array([-50.0, 0.0]),
                                       jnp.array([1.5, 0.0]),
                                       obstacles, radii, cfg)
    header = ["steps", "min_barrier_value", "barrier_maintained",
              "inactive_far_error"]
    rows = [[150, min_h, min_h > -0.05,
             float(jnp.linalg.norm(far - jnp.array([1.5, 0.0])))]]
    return header, rows


def bench_conformal_coverage():
    from rust_robotics_tpu.planning.conformal import (
        calibration_errors_from_trajectories, conformal_radius_at,
        empirical_quantile)

    t = np.arange(12, dtype=float)
    pred = np.stack([t, 0.5 * np.sin(0.3 * t)], -1)[None]
    obs = pred + 0.3 * np.stack([np.sin(1.1 * t), np.cos(0.7 * t)], -1)[None]
    errs = calibration_errors_from_trajectories(jnp.asarray(pred),
                                                jnp.asarray(obs))
    header = ["horizon", "q50", "q90", "radius_90"]
    rows = []
    for k in (2, 6, 11):
        s = errs[k]
        rows.append([k, float(empirical_quantile(s, 0.5)),
                     float(empirical_quantile(s, 0.9)),
                     float(conformal_radius_at(errs, k, 0.9,
                                               obstacle_radius=0.5))])
    return header, rows


def bench_conformal_sipp():
    from rust_robotics_tpu.demos.headless_family import (
        headless_conformal_sipp)

    out = headless_conformal_sipp()
    header = ["arrival", "min_confidence", "trajectory_violation_bound"]
    rows = [[out["arrival"], out["min_confidence"],
             out["trajectory_violation_bound"]]]
    return header, rows


def bench_factor_graph_scaling():
    from rust_robotics_tpu.demos.pose_graph_bench import (
        rmse, synthesize_chain)
    from rust_robotics_tpu.slam.pose_graph import optimize_pose_graph_2d

    header = ["size", "solver", "iterations", "rmse"]
    rows = []
    for size, solver in ((100, "dense"), (100, "pcg"), (400, "dense")):
        truth, initial, ef, et, meas, info = synthesize_chain(size)
        poses, summary = optimize_pose_graph_2d(initial, ef, et, meas, info,
                                                linear_solver=solver)
        rows.append([size, solver, int(summary.iterations),
                     rmse(np.asarray(poses), truth)])
    return header, rows


def bench_hierarchical_mapf():
    from rust_robotics_tpu.demos.headless_family import (
        headless_hierarchical_mapf_replanning)
    from rust_robotics_tpu.planning.stl import hierarchical_mapf_plan

    out = headless_hierarchical_mapf_replanning()
    header = ["scenario", "makespan", "success", "region_conflicts"]
    rows = [["base", out["base_makespan"], out["base_success"],
             out["region_conflicts"]],
            ["narrowed_door", out["replan_makespan"], out["replan_success"],
             out["region_conflicts"]]]
    # scale row (benchmark_hierarchical_mapf_scale.rs): 6 agents on 32x32
    free = np.ones((32, 32), bool)
    free[16, 4:28] = False
    starts = [(2, 2), (2, 29), (29, 2), (4, 16), (29, 16), (16, 2)]
    goals = [(29, 29), (29, 2), (2, 29), (28, 16), (4, 15), (16, 29)]
    big = hierarchical_mapf_plan(jnp.asarray(free), starts, goals,
                                 t_max=96, region_size=8)
    arr = np.asarray(big["arrivals"])
    rows.append(["six_agents_32x32", int(arr.max()),
                 bool(np.all(arr >= 0)), int(big["region_conflicts"])])
    return header, rows


def bench_meta_control():
    from rust_robotics_tpu.control.meta import meta_control_step
    from rust_robotics_tpu.control.trackers import (
        bicycle_kinematics, pure_pursuit_control, stanley_control)

    xs = jnp.linspace(0.0, 40.0, 401)
    pts = jnp.stack([xs, 2.0 * jnp.sin(xs / 8.0)], axis=-1)
    mask = jnp.ones(401)
    state = jnp.array([0.0, -1.0, 0.2, 1.0])
    use, ema = jnp.asarray(False), jnp.asarray(0.0)
    switches = 0
    prev = False
    for _ in range(200):
        accel, steer, use, ema = meta_control_step(
            state, pts, mask, 3.0, use, ema,
            lambda s: pure_pursuit_control(s, pts, mask, 3.0),
            lambda s: stanley_control(s, pts, mask, 3.0))
        cur = bool(use)
        switches += int(cur != prev)
        prev = cur
        state = bicycle_kinematics(state, accel, steer, 0.1, 2.9)
    d = jnp.linalg.norm(pts[:, :2] - state[:2], axis=-1)
    header = ["steps", "progress_x", "final_cross_track", "switches"]
    rows = [[200, float(state[0]), float(jnp.min(d)), switches]]
    return header, rows


def bench_pusher_slider():
    from rust_robotics_tpu.control.pusher_slider import (
        PusherMppiConfig, PusherSliderParams, simulate_push, two_contact_step)

    p = PusherSliderParams(half_extent=0.5, char_len=0.35,
                           pusher_friction=0.3)
    rep = simulate_push(
        jax.random.PRNGKey(0), p,
        start=jnp.array([0.0, 0.0, 0.0]),
        goal=jnp.array([1.2, 0.6, 0.0]),
        steps=40, cfg=PusherMppiConfig(horizon=12, num_samples=64),
        goal_tol=0.12)
    header = ["variant", "final_position_error", "faces_used", "finite"]
    rows = [["single_contact_mppi", float(rep["final_position_error"]),
             len(set(np.asarray(rep["faces"]).tolist())),
             bool(np.all(np.isfinite(rep["trajectory"])))]]
    # two-contact couple on opposite faces: spin-dominant twist
    from rust_robotics_tpu.control.pusher_slider import two_contact_twist

    twist, modes, valid = two_contact_twist(
        p, faces=(0, 2), contacts=(0.0, 0.0),
        push_speeds=(0.05, 0.05), tangent_speeds=(0.5, 0.5))
    rows.append(["two_contact_couple",
                 float(jnp.linalg.norm(twist[:2])), 2,
                 bool(valid) and abs(float(twist[2])) > 0.1])
    return header, rows


def bench_racing_motor():
    from rust_robotics_tpu.control.racing import (
        MotorQuadParams, hover_state, motor_quad_step)

    p = MotorQuadParams()
    s = hover_state(0.0, 0.0, 1.5, p)
    hover_cmd = jnp.full(4, p.gravity / 4.0)  # unit mass, thrust = Σ rotors
    for _ in range(100):
        s = motor_quad_step(p, s, hover_cmd, 0.01)
    header = ["steps", "hover_drift", "final_vertical_speed", "finite"]
    rows = [[100, float(jnp.linalg.norm(
                s[:3] - jnp.array([0.0, 0.0, 1.5]))),
             float(jnp.abs(s[5])), bool(jnp.all(jnp.isfinite(s)))]]
    return header, rows


def bench_racing_powertrain():
    from rust_robotics_tpu.demos.headless_family import (
        headless_mppi_racing_gate_progress)

    out = headless_mppi_racing_gate_progress()
    header = ["gates_passed", "lap_fraction", "saturation_fraction",
              "final_soc"]
    rows = [[out["gates_passed"], out["lap_fraction"],
             out["saturation_fraction"], out["final_soc"]]]
    return header, rows


def bench_rigid_body_backends():
    from rust_robotics_tpu.planning.rigid_body import (
        RigidBodyConfig, aabb_obstacle, rigid_body_lattice_plan,
        rigid_body_rrt_plan)

    cfg = RigidBodyConfig(position_step=0.5, heading_count=8)
    obstacles = (aabb_obstacle(3.5, 6.5, 0.0, 6.0),)
    header = ["backend", "path_length", "min_separation_margin"]
    lat = rigid_body_lattice_plan((1.0, 1.0, 0.0), (9.0, 1.0, 0.0),
                                  obstacles, cfg)
    rows = [["lattice", lat["path_length"], lat["min_separation_margin"]]]
    rrt = rigid_body_rrt_plan(jax.random.PRNGKey(0), (1.0, 1.0, 0.0),
                              (9.0, 1.0, 0.0), obstacles, cfg,
                              max_nodes=600)
    rows.append(["rrt", rrt["path_length"], rrt["min_separation_margin"]])
    return header, rows


def bench_traversal_risk_sweep():
    from rust_robotics_tpu.demos.headless_family import _ridge_elevation
    from rust_robotics_tpu.planning.risk_graph import (
        sweep_risk_weights, terrain_risk_from_elevation)

    risk = terrain_risk_from_elevation(jnp.asarray(_ridge_elevation()),
                                       blocking_step_height=1.0)
    out = sweep_risk_weights(risk, (0, 4), (14, 4),
                             risk_weights=jnp.array([0.0, 2.0, 8.0]))
    header = ["risk_weight", "cost", "path_cells"]
    rows = [[float(o["risk_weight"]), float(o["cost"]),
             int(np.asarray(o["path_mask"]).sum())] for o in out]
    return header, rows


def bench_branchout_closed_loop():
    from rust_robotics_tpu.demos.headless_family import (
        headless_branchout_multimodal_driving)

    out = headless_branchout_multimodal_driving()
    header = ["route_completion", "no_collision_rate", "min_clearance",
              "modes_used"]
    rows = [[out["route_completion"], out["no_collision_rate"],
             out["min_clearance"], out["modes_used"]]]
    return header, rows


def bench_adap_rpf_metrics():
    from rust_robotics_tpu.demos.headless_family import headless_adap_rpf_mppi

    out = headless_adap_rpf_mppi(steps=24)
    header = ["sampler", "mean_occlusion", "mean_proximity",
              "final_distance"]
    rows = [["fixed_back_point", out["fixed_mean_occlusion"],
             out["fixed_mean_proximity"], out["fixed_final_distance"]],
            ["adaptive_rpf", out["adaptive_mean_occlusion"],
             out["adaptive_mean_proximity"], out["adaptive_final_distance"]]]
    return header, rows


def bench_safe_decode():
    from rust_robotics_tpu.planning.stl import StlRectangle, safe_decode_nav

    free = np.ones((12, 12), bool)
    hazard = StlRectangle(3.0, 8.0, 3.0, 8.0)
    out = safe_decode_nav(free, (0, 0), (11, 11), t_max=30,
                          avoid_regions=((hazard, (0, 29)),))
    header = ["overrides", "greedy_avoid_robustness",
              "shielded_avoid_robustness", "robustness_gain"]
    rows = [[int(out["overrides"]), float(out["greedy_avoid_robustness"]),
             float(out["shielded_avoid_robustness"]),
             float(out["robustness_gain"])]]
    return header, rows


def _square_gates(radius=3.0, height=1.5, aperture=1.2):
    from rust_robotics_tpu.control.racing import GatePlane

    def gate(center, normal):
        return GatePlane(center, normal, half_width=aperture,
                         half_height=aperture)

    return [
        gate((radius, 0.0, height), (0.0, 1.0, 0.0)),
        gate((0.0, radius, height), (-1.0, 0.0, 0.0)),
        gate((-radius, 0.0, height), (0.0, -1.0, 0.0)),
        gate((0.0, -radius, height), (1.0, 0.0, 0.0)),
    ]


def _race(key_seed, params, steps=60, **kw):
    from rust_robotics_tpu.control.racing import simulate_gate_race

    gates = _square_gates()
    return simulate_gate_race(
        jax.random.PRNGKey(key_seed), gates, params,
        start=(3.0, -3.0, 1.5), steps=steps, num_samples=128, horizon=14,
        **kw)


def bench_racing_mppi_3d():
    """benchmark_racing_mppi_3d.rs analog: gate lap racing with ideal
    actuators at two aperture settings."""
    from rust_robotics_tpu.control.racing import (
        MotorQuadParams, PowertrainParams, simulate_gate_race)

    header = ["scenario", "gates", "gates_passed", "lap_fraction",
              "mean_speed", "max_speed", "path_length"]
    rows = []
    for scen, aperture in (("open", 1.6), ("tight", 1.0)):
        gates = _square_gates(aperture=aperture)
        out = simulate_gate_race(
            jax.random.PRNGKey(11), gates,
            PowertrainParams.ideal(MotorQuadParams()),
            start=(3.0, -3.0, 1.5), steps=60, num_samples=128, horizon=14)
        traj = out["trajectory"]
        plen = float(np.sum(np.linalg.norm(np.diff(traj[:, :3], axis=0),
                                           axis=1)))
        rows.append([scen, 4, out["gates_passed"], out["lap_fraction"],
                     out["mean_speed"], out["max_speed"], plen])
    return header, rows


def bench_racing_quadrotor():
    """benchmark_racing_quadrotor.rs analog: motor-level quad race with
    attitude metrics (tilt from the body-z / world-z angle)."""
    from rust_robotics_tpu.control.racing import (
        MotorQuadParams, PowertrainParams)

    out = _race(13, PowertrainParams.ideal(MotorQuadParams()))
    traj = out["trajectory"]
    q = traj[:, 6:10]  # [w, x, y, z]
    # body-z in world = rotate (0,0,1): z-component = 1 - 2(x² + y²)
    cos_tilt = np.clip(1.0 - 2.0 * (q[:, 1] ** 2 + q[:, 2] ** 2), -1, 1)
    tilt = np.degrees(np.arccos(cos_tilt))
    rates = np.linalg.norm(traj[:, 10:13], axis=1)
    header = ["gates", "gates_passed", "lap_fraction", "mean_speed",
              "mean_tilt_deg", "max_tilt_deg", "mean_body_rate"]
    rows = [[4, out["gates_passed"], out["lap_fraction"],
             out["mean_speed"], float(tilt.mean()), float(tilt.max()),
             float(rates.mean())]]
    return header, rows


def bench_racing_powertrain_aware():
    """benchmark_racing_powertrain_aware.rs analog: planning through the
    real powertrain vs planning with ideal actuators (both EXECUTE through
    the real powertrain)."""
    from rust_robotics_tpu.control.racing import PowertrainParams

    params = PowertrainParams(sag_coeff=0.35, discharge_rate=0.12)
    header = ["scenario", "aware", "gates_passed", "lap_fraction",
              "mean_speed", "saturation_fraction", "min_soc", "final_soc"]
    rows = []
    for scen, aware in (("unaware", False), ("aware", True)):
        out = _race(17, params, aware=aware)
        rows.append([scen, int(aware), out["gates_passed"],
                     out["lap_fraction"], out["mean_speed"],
                     out["saturation_fraction"], out["min_soc"],
                     out["final_soc"]])
    return header, rows


def bench_racing_powertrain_budget():
    """benchmark_racing_powertrain_budget.rs analog: ChargeBudget sweep —
    penalizing load below the reserve preserves state of charge."""
    from rust_robotics_tpu.control.racing import PowertrainParams

    params = PowertrainParams(sag_coeff=0.2, discharge_rate=0.25)
    header = ["charge_weight", "gates_passed", "lap_fraction",
              "mean_speed", "min_soc", "final_soc"]
    rows = []
    for weight in (0.0, 2.0, 8.0):
        out = _race(19, params, charge_weight=weight, charge_reserve=0.9)
        rows.append([weight, out["gates_passed"], out["lap_fraction"],
                     out["mean_speed"], out["min_soc"], out["final_soc"]])
    return header, rows


def bench_racing_powertrain_endurance():
    """benchmark_racing_powertrain_endurance.rs analog: long race under
    fatigue (relaxation build-up) with and without recovery dynamics."""
    from rust_robotics_tpu.control.racing import PowertrainParams

    header = ["scenario", "recovery", "gates_passed", "lap_fraction",
              "mean_speed", "saturation_fraction", "min_soc", "final_soc"]
    rows = []
    for scen, recover in (("no_recovery", 0.0), ("recovery", 0.8)):
        params = PowertrainParams(
            sag_coeff=0.25, discharge_rate=0.1, relax_build=0.5,
            relax_recover=recover, relax_coeff=0.3)
        out = _race(23, params, steps=80, aware=True)
        rows.append([scen, int(recover > 0), out["gates_passed"],
                     out["lap_fraction"], out["mean_speed"],
                     out["saturation_fraction"], out["min_soc"],
                     out["final_soc"]])
    return header, rows


def bench_racing_powertrain_recovery():
    """benchmark_racing_powertrain_recovery.rs analog: open-loop
    square-wave load profile; terminal voltage with vs without relaxation
    recovery (no MPPI — pure battery dynamics trace)."""
    from rust_robotics_tpu.control.racing import (
        MotorQuadParams, PowertrainParams, _voltage_scale, hover_state,
        powertrain_init, powertrain_step)

    base = MotorQuadParams()
    common = dict(sag_coeff=0.25, discharge_rate=0.15, relax_build=0.6,
                  relax_coeff=0.25)
    p_no = PowertrainParams(base, **common, relax_recover=0.0)
    p_re = PowertrainParams(base, **common, relax_recover=1.2)
    dt = 0.1
    hover = base.gravity / 4.0
    header = ["step", "time", "load_fraction", "soc",
              "voltage_no_recovery", "voltage_recovery",
              "relaxation_recovery"]
    rows = []
    s_no = powertrain_init(hover_state(0.0, 0.0, 1.5, base), p_no)
    s_re = powertrain_init(hover_state(0.0, 0.0, 1.5, base), p_re)
    for i in range(40):
        burst = (i // 10) % 2 == 0  # 1 s on / 1 s off square wave
        cmd = jnp.full(4, (1.8 if burst else 0.6) * hover)
        s_no = powertrain_step(p_no, s_no, cmd, dt)
        s_re = powertrain_step(p_re, s_re, cmd, dt)
        load = float(jnp.clip(jnp.sum(s_re[14:18])
                              / (4.0 * base.max_rotor_thrust), 0.0, 1.0))
        v_no = float(_voltage_scale(p_no, s_no[18], load, s_no[19]))
        v_re = float(_voltage_scale(p_re, s_re[18], load, s_re[19]))
        rows.append([i, (i + 1) * dt, load, float(s_re[18]), v_no, v_re,
                     float(s_re[19])])
    return header, rows


def bench_admm_horizon_consensus():
    """benchmark_admm_horizon_consensus.rs analog: receding-horizon
    formation consensus tracking an L-corner goal with per-agent noise;
    stiff (no smoothing) vs smooth executed center paths + metrics."""
    from rust_robotics_tpu.control.admm import (
        ADMMConfig, solve_horizon_consensus)

    cycles, horizon, dx, corner, amp = 34, 10, 0.18, 18, 0.25

    def goal(step):
        if step <= corner:
            return np.array([step * dx, 0.0])
        return np.array([corner * dx, (step - corner) * dx])

    def run(smooth_weight):
        center = goal(0)
        path = [center]
        for c in range(cycles):
            goals = np.stack([goal(c + t) for t in range(horizon)])
            trajs = []
            for a in range(4):
                noise = np.stack([
                    [amp * np.sin(2.1 * a + 0.7 * (c + t)),
                     amp * np.cos(1.3 * a + 0.9 * (c + t))]
                    for t in range(horizon)])
                trajs.append(goals + noise)
            z, _ = solve_horizon_consensus(
                jnp.asarray(np.stack(trajs)), jnp.asarray(center),
                smooth_weight=smooth_weight,
                cfg=ADMMConfig(iterations=120))
            center = np.asarray(z[1])  # execute the first step
            path.append(center)
        path = np.stack(path)
        accel = np.diff(path, 2, axis=0)
        rms_accel = float(np.sqrt(np.mean(np.sum(accel ** 2, -1))))
        track = float(np.mean([
            np.linalg.norm(path[c] - goal(c)) for c in range(len(path))]))
        return path, rms_accel, track

    stiff_path, stiff_acc, stiff_track = run(0.0)
    smooth_path, smooth_acc, smooth_track = run(40.0)
    header = ["cycle", "goal_x", "goal_y", "stiff_x", "stiff_y",
              "smooth_x", "smooth_y"]
    rows = []
    for c in range(cycles + 1):
        g = goal(c)
        rows.append([c, g[0], g[1], stiff_path[c, 0], stiff_path[c, 1],
                     smooth_path[c, 0], smooth_path[c, 1]])
    rows.append(["metrics", stiff_acc, stiff_track, smooth_acc,
                 smooth_track,
                 stiff_acc / max(smooth_acc, 1e-12), 0.0])
    return header, rows


PINNED = {
    "ekf-localization-benchmark": bench_ekf_localization,
    "admm-horizon-consensus-benchmark": bench_admm_horizon_consensus,
    "racing-mppi-3d-benchmark": bench_racing_mppi_3d,
    "racing-quadrotor-benchmark": bench_racing_quadrotor,
    "racing-powertrain-aware-benchmark": bench_racing_powertrain_aware,
    "racing-powertrain-budget-benchmark": bench_racing_powertrain_budget,
    "racing-powertrain-endurance-benchmark":
        bench_racing_powertrain_endurance,
    "racing-powertrain-recovery-benchmark":
        bench_racing_powertrain_recovery,
    "pose-graph-benchmark": bench_pose_graph,
    "grid-planner-benchmark": bench_grid_planners,
    "dwa-navigation-benchmark": bench_dwa_navigation,
    "rrt-star-benchmark": bench_rrt_star,
    "frenet-benchmark": bench_frenet,
    "mppi-benchmark": bench_mppi,
    "mppi-value-benchmark": bench_mppi_value,
    "controller-arena-benchmark": bench_controller_arena,
    "icp-benchmark": bench_icp,
    "particle-filter-benchmark": bench_particle_filter,
    "coverage-benchmark": bench_coverage,
    "stl-cbs-benchmark": bench_stl_cbs,
    "mission-recovery-benchmark": bench_mission_recovery,
    "slam-node-benchmark": bench_slam_node,
    "arm-rrt-star-benchmark": bench_arm_rrt_star,
    "sampling-quality-benchmark": bench_sampling_quality,
    "localizers-benchmark": bench_localizers,
    "admm-formation-benchmark": bench_admm_formation,
    "admm-graph-consensus-benchmark": bench_admm_graph_consensus,
    "cbf-safety-filter-benchmark": bench_cbf_safety_filter,
    "conformal-coverage-benchmark": bench_conformal_coverage,
    "conformal-sipp-benchmark": bench_conformal_sipp,
    "factor-graph-scaling-benchmark": bench_factor_graph_scaling,
    "hierarchical-mapf-benchmark": bench_hierarchical_mapf,
    "meta-control-benchmark": bench_meta_control,
    "pusher-slider-benchmark": bench_pusher_slider,
    "racing-motor-benchmark": bench_racing_motor,
    "racing-powertrain-benchmark": bench_racing_powertrain,
    "rigid-body-backends-benchmark": bench_rigid_body_backends,
    "traversal-risk-sweep-benchmark": bench_traversal_risk_sweep,
    "branchout-closed-loop-benchmark": bench_branchout_closed_loop,
    "adap-rpf-metrics-benchmark": bench_adap_rpf_metrics,
    "safe-decode-benchmark": bench_safe_decode,
}


def run_benchmark(name):
    header, rows = PINNED[name]()
    rows = [[_fmt(v) for v in r] for r in rows]
    return header, rows


def run_all(outdir):
    os.makedirs(outdir, exist_ok=True)
    paths = {}
    for name in sorted(PINNED):
        header, rows = run_benchmark(name)
        p = os.path.join(outdir, f"{name}.csv")
        write_csv(p, header, rows)
        paths[name] = p
    return paths


def check_gate(assets_dir, names=None):
    """Re-run every pinned benchmark and diff against the checked-in CSVs
    (check_benchmark_gate.py contract). Returns (ok, failures)."""
    failures = []
    for name in sorted(names or PINNED):
        base = os.path.join(assets_dir, f"{name}.csv")
        if not os.path.exists(base):
            failures.append((name, "missing baseline"))
            continue
        header, rows = run_benchmark(name)
        gen = ",".join(header) + "\n" + "\n".join(
            ",".join(r) for r in rows
        ) + "\n"
        problems = compare_csv(open(base).read(), gen)
        if problems:
            failures.append((name, problems))
    return len(failures) == 0, failures
