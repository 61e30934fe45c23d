"""Pipeline-parallel windowed VIO replay (fixed-lag smoother).

Reference: slam/src/vio_pipeline.rs:176 composes preintegration → BA →
refinement → pose-graph fusion strictly sequentially over the whole
sequence (keyframe windows :296-316). SURVEY §2.12's PP row: microbatch
the keyframe windows and pipeline the stages across devices.

Stage decomposition (uniform shapes — one compiled program per stage, so
every window reuses the same executables on its pipeline device):

  A  preintegrate   [independent]  vmapped IMU preintegration over the
                                   window's frame transitions
  B  dead-reckon    [chain, cheap] nav-state propagation; carry = nav at
                                   window boundary
  C  visual refine  [independent]  per-camera GN on reprojection residuals
                                   against the (fixed) landmark map — the
                                   heavy stage that overlaps across windows
  D  fuse           [chain]        per-window SE(3) pose graph anchored on
                                   the previous window's fused tail pose
                                   (entry edge = IMU odometry; in-window
                                   edges = visual + inertial odometry, the
                                   10:1 weighting of vio_pipeline.rs:408)

Windows stream through `parallel.pipeline.run_pipelined` (GPipe diagonal);
`pipelined=False` runs the identical stages window-major — outputs match
bitwise, which tests assert (the PP acceptance criterion).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from rust_robotics_tpu.core.lie import se3_exp, se3_inverse, se3_log
from rust_robotics_tpu.parallel.pipeline import Stage, run_pipelined, run_sequential
from rust_robotics_tpu.slam.bundle_adjustment import CameraIntrinsics
from rust_robotics_tpu.slam.imu import GRAVITY, predict_nav_state, preintegrate
from rust_robotics_tpu.slam.pose_graph import optimize_pose_graph_3d
from rust_robotics_tpu.slam.vio import nav_to_se3


def _window_inputs(dataset, tracks, window_frames, f, max_imu, max_obs):
    """Host-side packing of uniform-shape window pytrees."""
    cam_ts = dataset.cam.timestamps
    k = (len(cam_ts) // window_frames) * window_frames
    cam_ts = cam_ts[:k]
    n_w = k // window_frames
    ts_to_local = {int(t): i for i, t in enumerate(cam_ts)}

    if max_imu is None:  # uniform shapes sized to the data
        max_imu = 1
        for gi in range(1, k):
            _, _, d = dataset.imu_between(int(cam_ts[gi - 1]),
                                          int(cam_ts[gi]))
            max_imu = max(max_imu, len(d))
    if max_obs is None:
        max_obs = 1
        for w in range(n_w):
            lo = w * window_frames
            max_obs = max(max_obs, int(np.isin(
                tracks.obs_timestamps,
                cam_ts[lo:lo + window_frames]).sum()))

    windows = []
    for w in range(n_w):
        lo = w * window_frames
        accel = np.zeros((window_frames, max_imu, 3))
        gyro = np.zeros((window_frames, max_imu, 3))
        dts = np.zeros((window_frames, max_imu))
        for j in range(window_frames):
            gi = lo + j  # transition (gi-1) -> gi; dummy for gi == 0
            if gi == 0:
                continue
            a, g, d = dataset.imu_between(int(cam_ts[gi - 1]),
                                          int(cam_ts[gi]))
            if len(d) > max_imu:
                raise ValueError("max_imu too small for interval")
            accel[j, :len(d)] = a
            gyro[j, :len(d)] = g
            dts[j, :len(d)] = d

        sel = np.isin(tracks.obs_timestamps, cam_ts[lo:lo + window_frames])
        o = int(sel.sum())
        if o > max_obs:
            raise ValueError("max_obs too small for window")
        cam_local = np.zeros((max_obs,), np.int32)
        pt_idx = np.zeros((max_obs,), np.int32)
        pixels = np.zeros((max_obs, 2))
        mask = np.zeros((max_obs,), bool)
        cam_local[:o] = [ts_to_local[int(t)] - lo
                         for t in tracks.obs_timestamps[sel]]
        pt_idx[:o] = tracks.obs_landmark_ids[sel]
        pixels[:o] = tracks.obs_pixels[sel]
        mask[:o] = True
        windows.append({
            "accel": jnp.asarray(accel, f),
            "gyro": jnp.asarray(gyro, f),
            "dts": jnp.asarray(dts, f),
            "cam_local": jnp.asarray(cam_local),
            "pt_idx": jnp.asarray(pt_idx),
            "pixels": jnp.asarray(pixels, f),
            "obs_mask": jnp.asarray(mask),
        })
    return windows, k


def _refine_cameras(cam0_tangents, landmarks, cam_local, pt_idx, pixels,
                    obs_mask, intr, iters=10, damping=1e-4):
    """Per-camera GN against fixed landmarks (PnP refinement). Cameras are
    world-from-camera tangents [Wf, 6]; observations are window-local."""

    def residuals(tangents):
        cam = se3_exp(tangents[cam_local])           # [O, 4, 4]
        inv = se3_inverse(cam)
        p = landmarks[pt_idx]
        p_cam = jnp.einsum("oij,oj->oi", inv[:, :3, :3], p) + inv[:, :3, 3]
        r = intr.project(p_cam) - pixels             # [O, 2]
        return jnp.where(obs_mask[:, None], r, 0.0)

    def gn_step(tangents, _):
        r = residuals(tangents)                      # [O, 2]
        j = jax.jacfwd(residuals)(tangents)          # [O, 2, Wf, 6]
        # per-camera normal equations (cameras are decoupled given the map)
        jt = jnp.einsum("ocwi,ocwj->wij", j, j)      # [Wf, 6, 6]
        g = jnp.einsum("ocwi,oc->wi", j, r)          # [Wf, 6]
        h = jt + damping * jnp.eye(6, dtype=tangents.dtype)
        step = jnp.linalg.solve(h, g[..., None])[..., 0]
        return tangents - step, None

    out, _ = jax.lax.scan(gn_step, cam0_tangents, None, length=iters)
    return out


def make_stages(dataset, tracks, window_frames=3, accel_sigma=0.02,
                gyro_sigma=0.002, gravity=GRAVITY, max_imu=None,
                max_obs=None, vis_weight=10.0, imu_weight=1.0,
                fuse_iterations=20):
    """Build (stages, windows, nav0, k). Stage outputs are enriched dicts so
    downstream stages see upstream results (the pipeline passes one value).
    """
    f = jnp.result_type(float)
    gt = dataset.ground_truth
    if gt is not None:
        from rust_robotics_tpu.data.euroc import quat_to_rot
        from rust_robotics_tpu.core.lie import so3_log

        rot0 = jnp.asarray(quat_to_rot(gt.quaternions[0]))
        nav0 = jnp.concatenate([
            so3_log(rot0), jnp.asarray(gt.positions[0]),
            jnp.asarray(gt.velocities[0]),
        ]).astype(f)
        bias0 = jnp.concatenate([
            jnp.asarray(gt.accel_bias[0]), jnp.asarray(gt.gyro_bias[0]),
        ]).astype(f)
    else:
        nav0 = jnp.zeros(9, f)
        bias0 = jnp.zeros(6, f)

    windows, k = _window_inputs(dataset, tracks, window_frames, f,
                                max_imu, max_obs)
    t_bs = jnp.asarray(dataset.cam.t_bs, f)
    landmarks = jnp.asarray(tracks.landmarks, f)
    intr = CameraIntrinsics(*[float(v) for v in dataset.cam.intrinsics])
    gravity = jnp.asarray(gravity, f)

    @jax.jit
    def stage_preintegrate(win):
        pres = jax.vmap(
            lambda a, g, d: preintegrate(a, g, d, bias0, accel_sigma,
                                         gyro_sigma)
        )(win["accel"], win["gyro"], win["dts"])
        return {**win, "pres": pres}

    @jax.jit
    def stage_dead_reckon(carry_nav, win):
        def prop(nav, pre):
            new = predict_nav_state(pre, nav, bias0, gravity)
            return new, new

        last, navs = jax.lax.scan(prop, carry_nav, win["pres"])
        return last, {**win, "navs": navs, "anchor_nav": carry_nav}

    @jax.jit
    def stage_visual_refine(win):
        cams0 = se3_log(nav_to_se3(win["navs"]) @ t_bs)
        refined = _refine_cameras(
            cams0, landmarks, win["cam_local"], win["pt_idx"],
            win["pixels"], win["obs_mask"], intr)
        body = se3_exp(refined) @ se3_inverse(t_bs)
        return {**win, "refined_body": body}

    def stage_fuse(carry_pose, win):
        wf = win["navs"].shape[0]
        imu_poses = nav_to_se3(win["navs"])
        anchor_pose = nav_to_se3(win["anchor_nav"])
        carry_pose = anchor_pose if carry_pose is None else carry_pose

        # entry edge: IMU odometry anchor -> frame 0 of the window
        entry = se3_log(se3_inverse(anchor_pose) @ imu_poses[0])[None]
        vis_rel = se3_log(
            se3_inverse(win["refined_body"][:-1]) @ win["refined_body"][1:])
        imu_rel = se3_log(se3_inverse(imu_poses[:-1]) @ imu_poses[1:])
        ef = jnp.concatenate([
            jnp.asarray([0]), jnp.arange(1, wf), jnp.arange(1, wf),
        ]).astype(jnp.int32)
        et = jnp.concatenate([
            jnp.asarray([1]), jnp.arange(2, wf + 1), jnp.arange(2, wf + 1),
        ]).astype(jnp.int32)
        meas = jnp.concatenate([entry, vis_rel, imu_rel])
        f6 = jnp.eye(6, dtype=entry.dtype)
        info = jnp.concatenate([
            jnp.broadcast_to(imu_weight * f6, (1, 6, 6)),
            jnp.broadcast_to(vis_weight * f6, (wf - 1, 6, 6)),
            jnp.broadcast_to(imu_weight * f6, (wf - 1, 6, 6)),
        ])
        init = jnp.concatenate([
            se3_log(carry_pose)[None], se3_log(win["refined_body"])])
        fused_t, _ = optimize_pose_graph_3d(
            init, ef, et, meas, info, max_iterations=fuse_iterations)
        fused = se3_exp(fused_t[1:])
        return fused[-1], {"fused": fused,
                           "dead_reckoned": imu_poses,
                           "refined_body": win["refined_body"]}

    stages = [
        Stage(stage_preintegrate),
        Stage(stage_dead_reckon, chain=True, init_carry=nav0),
        Stage(stage_visual_refine),
        Stage(stage_fuse, chain=True, init_carry=None),
    ]
    return stages, windows, nav0, k


@dataclasses.dataclass
class WindowedVIOResult:
    fused_poses: Any       # [K, 4, 4]
    dead_reckoned: Any     # [K, 4, 4]
    refined_body: Any      # [K, 4, 4]
    schedule: list
    num_windows: int


def run_vio_pipeline_windowed(dataset, tracks, window_frames=3,
                              pipelined=True, devices=None, **kw):
    """Windowed VIO replay; pipelined=True streams windows through the
    GPipe schedule (one device per stage), False runs window-major. Both
    produce identical output."""
    stages, windows, _, k = make_stages(dataset, tracks, window_frames, **kw)
    record = []
    if pipelined:
        outs = run_pipelined(stages, windows, devices=devices, record=record)
    else:
        outs = run_sequential(stages, windows)
    fused = jnp.concatenate([o["fused"] for o in outs])
    dead = jnp.concatenate([o["dead_reckoned"] for o in outs])
    refined = jnp.concatenate([o["refined_body"] for o in outs])
    return WindowedVIOResult(fused, dead, refined, record, len(windows))
