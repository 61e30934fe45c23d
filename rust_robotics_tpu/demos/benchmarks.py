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


PINNED = {
    "ekf-localization-benchmark": bench_ekf_localization,
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
