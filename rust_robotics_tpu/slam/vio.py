"""Offline visual-inertial odometry pipeline.

Reference: slam/src/vio_pipeline.rs — `run_vio_pipeline` (:176):
IMU initialization + per-keyframe preintegration (:278, :344) → bundle
adjustment over keyframe cameras + sidecar landmarks (bundle_adjust) →
visual-constrained state/bias refinement (`optimize_imu_trajectory`) →
SE(3) pose-graph fusion of visual and inertial odometry (`fuse_pose_graph`
:408); `euroc_vio_input` (:92) builds the input from an EuRoC layout;
`pose_error` (:450).

TPU-native: each stage is the batched/jitted subsystem built elsewhere in
this package (preintegration scan, BA factor blocks with Schur, IMU factor
graph, SE(3) pose graph); the pipeline composes them host-side exactly as
the reference composes its crates.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from rust_robotics_tpu.core.lie import se3_exp, se3_inverse, se3_log, so3_exp, so3_log
from rust_robotics_tpu.nlls import RobustKernel, SolverConfig
from rust_robotics_tpu.slam.bundle_adjustment import CameraIntrinsics, bundle_adjust
from rust_robotics_tpu.slam.imu import (
    GRAVITY,
    optimize_imu_trajectory,
    predict_nav_state,
    preintegrate,
)
from rust_robotics_tpu.slam.pose_graph import optimize_pose_graph_3d


@dataclasses.dataclass
class VIOResult:
    nav_states: Any          # [K, 9] refined IMU states (body frame)
    biases: Any              # [K, 6]
    fused_poses: Any         # [K, 4, 4] body poses after pose-graph fusion
    ba_cameras: Any          # [K, 4, 4]
    ba_points: Any           # [L, 3]
    dead_reckoned: Any       # [K, 9]
    summaries: dict


def nav_to_se3(nav):
    """[...,9] -> homogeneous body pose [..., 4, 4]."""
    rot = so3_exp(nav[..., 0:3])
    top = jnp.concatenate([rot, nav[..., 3:6, None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], nav.dtype), top[..., :1, :].shape
    )
    return jnp.concatenate([top, bottom], axis=-2)


def run_vio_pipeline(dataset, tracks, accel_sigma=0.02, gyro_sigma=0.002,
                     gravity=GRAVITY, max_keyframes=None,
                     pixel_sigma=1.0, point_init_noise=0.0):
    """Full pipeline on an EurocDataset + FeatureTracks (vio_pipeline.rs:176).

    Returns VIOResult. Ground truth (first state) initializes pose/velocity/
    biases only, matching docs/datasets.md:47-49.
    """
    cam_ts = dataset.cam.timestamps
    if max_keyframes is not None:
        cam_ts = cam_ts[:max_keyframes]
    k = len(cam_ts)
    f = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32

    # --- stage 1: IMU initialization + dead reckoning (:278) ---
    gt = dataset.ground_truth
    if gt is not None:
        from rust_robotics_tpu.data.euroc import quat_to_rot

        rot0 = jnp.asarray(quat_to_rot(gt.quaternions[0]))
        nav0 = jnp.concatenate(
            [so3_log(rot0), jnp.asarray(gt.positions[0]), jnp.asarray(gt.velocities[0])]
        ).astype(f)
        bias0 = jnp.concatenate(
            [jnp.asarray(gt.accel_bias[0]), jnp.asarray(gt.gyro_bias[0])]
        ).astype(f)
    else:
        nav0 = jnp.zeros(9, f)
        bias0 = jnp.zeros(6, f)

    pres = []
    navs = [nav0]
    nav = nav0
    for i in range(k - 1):
        accel, gyro, dts = dataset.imu_between(cam_ts[i], cam_ts[i + 1])
        pre = preintegrate(
            jnp.asarray(accel, f), jnp.asarray(gyro, f), jnp.asarray(dts, f),
            bias0, accel_sigma, gyro_sigma,
        )
        pres.append(pre)
        nav = predict_nav_state(pre, nav, bias0, gravity)
        navs.append(nav)
    dead_reckoned = jnp.stack(navs)
    pres_stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *pres)

    # --- stage 2: bundle adjustment (:, bundle_adjust) ---
    t_bs = jnp.asarray(dataset.cam.t_bs, f)
    cams0 = nav_to_se3(dead_reckoned) @ t_bs  # world-from-camera
    intr_arr = dataset.cam.intrinsics
    intr = CameraIntrinsics(*[float(v) for v in intr_arr])
    ts_to_idx = {int(t): i for i, t in enumerate(cam_ts)}
    sel = np.isin(tracks.obs_timestamps, np.asarray(cam_ts))
    cam_idx = np.array([ts_to_idx[int(t)] for t in tracks.obs_timestamps[sel]],
                       np.int32)
    pt_idx = tracks.obs_landmark_ids[sel].astype(np.int32)
    pixels = jnp.asarray(tracks.obs_pixels[sel], f)
    points0 = jnp.asarray(tracks.landmarks, f)
    if point_init_noise:
        points0 = points0 + point_init_noise * jax.random.normal(
            jax.random.PRNGKey(0), points0.shape, f
        )
    # two fixed cameras anchor the monocular gauge AND scale (one camera
    # leaves a similarity freedom that reprojects perfectly but drifts the
    # structure); the reference defaults to one because its demo problems
    # carry depth-true initializations
    ba_cams, ba_points, ba_summary = bundle_adjust(
        cams0, points0, cam_idx, pt_idx, pixels, intr,
        fixed_cameras=2, robust=RobustKernel("huber", 2.0),
        config=SolverConfig(linear_solver="schur", max_iterations=30),
    )

    # --- stage 3: visual-constrained IMU refinement (:799) ---
    ba_body = ba_cams @ se3_inverse(t_bs)
    ba_positions = ba_body[:, :3, 3]
    # velocity proxies from finite differences of BA positions
    dts_k = jnp.asarray(np.diff(np.asarray(cam_ts)) / 1e9, f)
    vel = jnp.concatenate(
        [
            (ba_positions[1:] - ba_positions[:-1]) / dts_k[:, None],
            (ba_positions[-1:] - ba_positions[-2:-1]) / dts_k[-1],
        ]
    )
    posvel = jnp.concatenate([ba_positions, vel], axis=-1)
    biases0 = jnp.broadcast_to(bias0, (k, 6))
    info9 = jnp.eye(9, dtype=f) * 1e4
    nav_refined, biases, imu_summary = optimize_imu_trajectory(
        dead_reckoned, biases0, pres_stacked, gravity,
        nav_prior=dead_reckoned[0], nav_prior_info=1e8 * jnp.eye(9, dtype=f),
        bias_prior=bias0, bias_prior_info=1e2 * jnp.eye(6, dtype=f),
        bias_between_info=1e6 * jnp.eye(6, dtype=f),
        posvel_meas=posvel, posvel_indices=jnp.arange(k),
        posvel_info=jnp.broadcast_to(
            jnp.diag(jnp.concatenate([jnp.full((3,), 1e2), jnp.full((3,), 1e0)])).astype(f),
            (k, 6, 6),
        ),
        config=SolverConfig(max_iterations=30),
    )

    # --- stage 4: SE(3) pose-graph fusion (:408) ---
    imu_poses = nav_to_se3(nav_refined)
    vis_rel = se3_log(se3_inverse(ba_body[:-1]) @ ba_body[1:])
    imu_rel = se3_log(se3_inverse(imu_poses[:-1]) @ imu_poses[1:])
    ef = jnp.concatenate([jnp.arange(k - 1), jnp.arange(k - 1)]).astype(jnp.int32)
    et = jnp.concatenate([jnp.arange(1, k), jnp.arange(1, k)]).astype(jnp.int32)
    meas = jnp.concatenate([vis_rel, imu_rel])
    info = jnp.concatenate(
        [
            jnp.broadcast_to(10.0 * jnp.eye(6, dtype=f), (k - 1, 6, 6)),
            jnp.broadcast_to(1.0 * jnp.eye(6, dtype=f), (k - 1, 6, 6)),
        ]
    )
    init_tangents = se3_log(imu_poses)
    # dense solve is right for fixture-scale keyframe counts; long
    # replays should pass linear_solver="chain_direct" — the fusion graph
    # is exactly the chain+parallel-edge shape nlls/tridiag.py solves
    # device-resident (tests/test_tridiag.py pins the parallel-edge case)
    fused_tangents, fuse_summary = optimize_pose_graph_3d(
        init_tangents, ef, et, meas, info, max_iterations=30,
    )
    fused = se3_exp(fused_tangents)

    return VIOResult(
        nav_states=nav_refined,
        biases=biases,
        fused_poses=fused,
        ba_cameras=ba_cams,
        ba_points=ba_points,
        dead_reckoned=dead_reckoned,
        summaries={
            "ba": ba_summary,
            "imu": imu_summary,
            "fusion": fuse_summary,
        },
    )


def pose_error(poses, gt_positions):
    """Translation RMSE of [K, 4, 4] poses vs ground-truth positions."""
    d = np.asarray(poses[:, :3, 3]) - np.asarray(gt_positions)
    return float(np.sqrt(np.mean(np.sum(d**2, axis=-1))))


def pose_error_se3(actual, expected):
    """SE(3) tangent-norm pose error ‖log(expected⁻¹·actual)‖ — the exact
    metric of the reference's `pose_error` (vio_pipeline.rs:450-452) used
    by the headless EuRoC acceptance gate (headless_euroc_vio.rs:43-47).
    Accepts single [4,4] poses or batched [..., 4, 4]."""
    actual = jnp.asarray(actual)
    expected = jnp.asarray(expected)
    tau = se3_log(se3_inverse(expected) @ actual)
    return np.asarray(jnp.linalg.norm(tau, axis=-1))
