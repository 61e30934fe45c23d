"""Headless demo family — the CI-runnable closed-loop sims of the
reference's examples layer (SURVEY.md §2.11: 27 headless_* examples).

Reference call stacks mirrored here:
- headless_navigation_loop.rs (§3.1): DWA plan → step → EKF estimate, 120
  steps, goal-reached check.
- examples/headless_mission_recovery.rs: waypoint mission FSM with stuck
  detection and rotate/backoff recovery budgets.
- headless_euroc_vio.rs (§3.3): EuRoC-layout fixture → preintegration →
  BA → IMU refinement → SE(3) fusion with pose-error reporting.

Each demo is deterministic (sinusoid pseudo-noise, fixed keys — the
reference's gallery convention, render_gif_ekf_localization.rs:21-24) and
returns a metrics dict consumed by the benchmark gate.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "headless_navigation_loop",
    "headless_mission_recovery",
    "headless_euroc_vio",
]


def headless_navigation_loop(steps: int = 240):
    """DWA + EKF closed loop (headless_navigation_loop.rs:11-63)."""
    from rust_robotics_tpu.core.types import GaussianBelief
    from rust_robotics_tpu.filters.kalman import ekf_step
    from rust_robotics_tpu.planning.dwa import DWAConfig, dwa_step, goal_reached

    f = jnp.result_type(float)
    cfg = DWAConfig()
    goal = jnp.array([8.0, 8.0], f)
    obstacles = jnp.array(
        [[2.0, 2.5], [4.0, 4.5], [6.0, 5.0], [5.0, 7.0]], f
    )
    state = jnp.zeros(5, f)  # x, y, yaw, v, omega
    belief = GaussianBelief(jnp.zeros(4, f), jnp.eye(4, dtype=f))
    q = jnp.diag(jnp.array([0.1, 0.1, 0.017, 1.0], f)) ** 2
    r = jnp.diag(jnp.array([0.5, 0.5], f)) ** 2

    path = [np.asarray(state[:2])]
    reached = False
    est_err = []
    for k in range(steps):
        if bool(goal_reached(state, goal, cfg)):
            reached = True
            break
        control, state, _, _ = dwa_step(state, goal, obstacles, cfg)
        # deterministic sinusoid pseudo-noise (gallery convention)
        z = state[:2] + 0.05 * jnp.array(
            [jnp.sin(0.7 * k), jnp.cos(1.1 * k)], f
        )
        belief = ekf_step(belief, z, control, cfg.dt, q, r)
        est_err.append(float(jnp.linalg.norm(belief.mean[:2] - state[:2])))
        path.append(np.asarray(state[:2]))
    path = np.stack(path)
    d = np.linalg.norm(path[:, None, :] - np.asarray(obstacles)[None], axis=-1)
    return {
        "goal_reached": reached,
        "steps_used": len(path) - 1,
        "path_length": float(np.linalg.norm(np.diff(path, axis=0),
                                            axis=1).sum()),
        "min_obstacle_clearance": float(d.min()),
        "final_estimate_error": est_err[-1] if est_err else float("nan"),
        "mean_estimate_error": float(np.mean(est_err)) if est_err else
        float("nan"),
    }


def headless_mission_recovery(max_steps: int = 400):
    """Waypoint mission with a blocking obstacle: the FSM detects the
    stall, runs a rotate/backoff recovery, then completes
    (headless_mission_recovery.rs:1-30)."""
    from rust_robotics_tpu.control.mission import make_waypoint_mission
    from rust_robotics_tpu.planning.dwa import DWAConfig, dwa_step

    f = jnp.result_type(float)
    waypoints = [np.array([4.0, 0.0]), np.array([8.0, 4.0])]
    # a cul-de-sac in front of the first leg traps greedy progress
    obstacles = jnp.array(
        [[2.0, 0.0], [2.0, 0.6], [2.0, -0.6], [2.4, 1.0], [2.4, -1.0]], f
    )
    cfg = DWAConfig()
    sm = make_waypoint_mission(waypoints, goal_tolerance=0.6,
                               stuck_window=12, stuck_min_progress=0.05,
                               recovery_steps=10)
    bb = {"position": np.zeros(2), "wp_index": 0, "recovery_count": 0}
    state = jnp.zeros(5, f)
    for _ in range(max_steps):
        sm.step(bb)
        if sm.state == "done":
            break
        wp = jnp.asarray(waypoints[bb["wp_index"]], f)
        if sm.state == "recover":
            # rotate in place + back off (waypoint_navigator recovery)
            state = state.at[2].add(0.4).at[0].add(
                -0.1 * jnp.cos(state[2])
            ).at[1].add(-0.1 * jnp.sin(state[2]))
        else:
            _, state, _, _ = dwa_step(state, wp, obstacles, cfg)
        bb["position"] = np.asarray(state[:2])
    return {
        "mission_done": sm.state == "done",
        "recovery_count": bb.get("recovery_count", 0),
        "final_wp_index": bb["wp_index"],
        "final_distance": float(np.linalg.norm(
            bb["position"] - waypoints[-1])),
    }


def headless_euroc_vio(tmpdir=None):
    """Fixture EuRoC replay through the full VIO pipeline
    (headless_euroc_vio.rs:22-58). Prefers the reference's own checked-in
    euroc_mini fixture (true artifact parity, with the example's landmark
    perturbation and 5e-2 terminal SE(3) acceptance gate); falls back to
    the synthetic generator when the reference checkout is absent."""
    import importlib.util
    import os
    import sys
    import tempfile

    from rust_robotics_tpu.data.euroc import EurocDataset
    from rust_robotics_tpu.data.fixtures import reference_fixture_root
    from rust_robotics_tpu.slam.vio import pose_error, run_vio_pipeline

    ref_root = tmpdir is None and reference_fixture_root("euroc_mini")
    if ref_root:
        import dataclasses

        from rust_robotics_tpu.data.euroc import quat_to_rot
        from rust_robotics_tpu.slam.vio import nav_to_se3, pose_error_se3

        ds = EurocDataset.load(ref_root)
        tracks = ds.load_feature_tracks()
        tracks = dataclasses.replace(
            tracks,
            landmarks=tracks.landmarks + np.array([0.02, -0.01, 0.04]),
        )
        res = run_vio_pipeline(ds, tracks)
        gt = ds.ground_truth
        wfb = np.eye(4)
        wfb[:3, :3] = quat_to_rot(gt.quaternions[-1])
        wfb[:3, 3] = gt.positions[-1]
        t_bs = np.asarray(ds.cam.t_bs)
        fused = np.asarray(res.fused_poses)
        terminal = float(pose_error_se3(fused[-1] @ t_bs, wfb @ t_bs))
        err_fused = pose_error(fused, gt.positions)
        err_dead = pose_error(
            np.asarray(nav_to_se3(res.dead_reckoned)), gt.positions)
        return {
            "source": "reference_fixture",
            "keyframes": int(fused.shape[0]),
            "imu_samples": int(ds.imu.timestamps.shape[0]),
            "feature_observations": int(tracks.obs_pixels.shape[0]),
            "terminal_se3_error": terminal,
            "acceptance": bool(terminal <= 5.0e-2),
            "fused_position_rmse": float(err_fused),
            "dead_reckoned_rmse": float(err_dead),
            "fusion_improves": bool(err_fused <= err_dead + 1e-9),
        }

    # the synthetic fixture generator lives beside the tests (the
    # reference checks its euroc_mini fixture into tests/fixtures)
    here = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    spec = importlib.util.spec_from_file_location(
        "fixture_gen", os.path.join(here, "tests", "fixture_gen.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    root = tmpdir or tempfile.mkdtemp(prefix="euroc_mini_")
    truth, landmarks, _ = mod.make_euroc_fixture(root)
    ds = EurocDataset.load(root)
    tracks = ds.load_feature_tracks()
    res = run_vio_pipeline(ds, tracks, max_keyframes=10,
                           point_init_noise=0.05)
    k = np.asarray(res.fused_poses).shape[0]
    cam_idx = truth["cam_idx"][:k]
    gt_pos = truth["pos"][cam_idx]
    err_fused = pose_error(np.asarray(res.fused_poses), gt_pos)
    from rust_robotics_tpu.slam.vio import nav_to_se3

    err_dead = pose_error(np.asarray(nav_to_se3(res.dead_reckoned)), gt_pos)
    return {
        "keyframes": k,
        "fused_position_rmse": float(err_fused),
        "dead_reckoned_rmse": float(err_dead),
        "fusion_improves": bool(err_fused <= err_dead + 1e-9),
    }
