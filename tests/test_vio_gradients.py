"""SURVEY §7.2 M5 differentiability check: gradients of pose error w.r.t.
IMU biases and visual structure THROUGH the VIO stages on the reference's
own euroc_mini fixture, pinned by finite-difference agreement.

- Stage 1 (IMU dead reckoning) is pure jax: `jax.grad` flows straight
  through `preintegrate` + `predict_nav_state` (imu_preintegration.rs:180
  semantics) — grad of terminal position error w.r.t. the initial bias.
- The BA solve is differentiated with the implicit-function theorem
  (nlls/implicit.py): grad of camera-position error w.r.t. the PIXEL
  measurements, finite-difference-checked by re-solving.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rust_robotics_tpu.data.euroc import EurocDataset, quat_to_rot
from rust_robotics_tpu.data.fixtures import reference_fixture_root
from rust_robotics_tpu.nlls import SolverConfig, solve
from rust_robotics_tpu.nlls.implicit import implicit_vjp
from rust_robotics_tpu.nlls.kernels import RobustKernel
from rust_robotics_tpu.slam.bundle_adjustment import (
    CameraIntrinsics,
    build_bundle_adjustment,
)
from rust_robotics_tpu.slam.imu import (
    GRAVITY,
    predict_nav_state,
    preintegrate,
)
from rust_robotics_tpu.core.lie import so3_log

EUROC = reference_fixture_root("euroc_mini")
needs_euroc = pytest.mark.skipif(EUROC is None,
                                 reason="reference euroc_mini absent")


@needs_euroc
def test_grad_of_pose_error_wrt_imu_bias():
    """d(terminal position error)/d(bias0) through the dead-reckoning
    chain on euroc_mini — finite-difference agreement."""
    ds = EurocDataset.load(EUROC)
    gt = ds.ground_truth
    cam_ts = ds.cam.timestamps
    rot0 = jnp.asarray(quat_to_rot(gt.quaternions[0]))
    nav0 = jnp.concatenate([
        so3_log(rot0), jnp.asarray(gt.positions[0]),
        jnp.asarray(gt.velocities[0])])
    target = jnp.asarray(gt.positions[-1])
    segments = [ds.imu_between(cam_ts[i], cam_ts[i + 1])
                for i in range(len(cam_ts) - 1)]

    def terminal_error(bias):
        nav = nav0
        for accel, gyro, dts in segments:
            pre = preintegrate(jnp.asarray(accel), jnp.asarray(gyro),
                               jnp.asarray(dts), bias, 0.02, 0.002)
            nav = predict_nav_state(pre, nav, bias, GRAVITY)
        return jnp.sum((nav[3:6] - target) ** 2)

    bias0 = jnp.zeros(6)
    g = jax.grad(terminal_error)(bias0)
    assert g.shape == (6,)
    assert bool(jnp.all(jnp.isfinite(g)))
    eps = 1e-6
    for k in (0, 2, 4):
        e = jnp.zeros(6).at[k].set(eps)
        fd = (terminal_error(bias0 + e) - terminal_error(bias0 - e)) / (
            2 * eps)
        np.testing.assert_allclose(float(g[k]), float(fd), rtol=1e-4,
                                   atol=1e-9)


def _ba_problem(pixels_np):
    """Small well-conditioned synthetic BA problem (3 cams, 6 points)."""
    intr = CameraIntrinsics(400.0, 400.0, 320.0, 240.0)
    rng = np.random.default_rng(3)
    points = np.array([[x, y, 5.0 + 0.3 * x] for x, y in
                       rng.uniform(-1, 1, (6, 2))])
    cams = np.tile(np.eye(4), (3, 1, 1))
    cams[:, 0, 3] = [0.0, 0.4, 0.8]
    cam_idx = np.repeat(np.arange(3), 6).astype(np.int32)
    pt_idx = np.tile(np.arange(6), 3).astype(np.int32)
    prob = build_bundle_adjustment(
        jnp.asarray(cams), jnp.asarray(points + rng.normal(0, 0.01,
                                                           points.shape)),
        cam_idx, pt_idx, jnp.asarray(pixels_np), intr, fixed_cameras=2,
        robust=RobustKernel("l2"),
    )
    return prob, intr, cams, points, cam_idx, pt_idx


def _project_all(intr, cams, points, cam_idx, pt_idx):
    inv = np.linalg.inv(cams)
    px = []
    for c, p in zip(cam_idx, pt_idx):
        pc = inv[c, :3, :3] @ points[p] + inv[c, :3, 3]
        px.append([intr.fx * pc[0] / pc[2] + intr.cx,
                   intr.fy * pc[1] / pc[2] + intr.cy])
    return np.asarray(px)


@pytest.mark.slow
def test_grad_of_camera_error_wrt_pixels_through_ba():
    """IFT gradient through the bundle-adjustment solve: d(third-camera
    position error)/d(pixel measurements), FD-checked by re-solving."""
    intr0 = CameraIntrinsics(400.0, 400.0, 320.0, 240.0)
    rng = np.random.default_rng(3)
    points = np.array([[x, y, 5.0 + 0.3 * x] for x, y in
                       rng.uniform(-1, 1, (6, 2))])
    cams = np.tile(np.eye(4), (3, 1, 1))
    cams[:, 0, 3] = [0.0, 0.4, 0.8]
    cam_idx = np.repeat(np.arange(3), 6).astype(np.int32)
    pt_idx = np.tile(np.arange(6), 3).astype(np.int32)
    pixels0 = _project_all(intr0, cams, points, cam_idx, pt_idx)
    pixels0 = pixels0 + rng.normal(0, 0.2, pixels0.shape)  # noisy obs

    cfg = SolverConfig(method="lm", max_iterations=40,
                       gradient_tolerance=1e-12, step_tolerance=1e-12,
                       cost_tolerance=1e-14)

    def solve_ba(pixels_np):
        prob, *_ = _ba_problem(pixels_np)
        solved, _ = solve(prob, cfg)
        return solved

    def loss_fn(values_tuple):
        cam_tangents = values_tuple[0]
        return jnp.sum(cam_tangents[2, 3:] ** 2)  # 3rd-camera translation...

    solved = solve_ba(pixels0)
    loss, grads = implicit_vjp(solved, loss_fn)
    g = np.asarray(grads[0])
    assert g.shape == pixels0.shape
    assert np.all(np.isfinite(g))
    # the two fixed cameras' observations still influence the points ->
    # nonzero gradients overall
    assert np.abs(g).max() > 0

    eps = 1e-4
    for o, k in [(12, 0), (15, 1)]:  # observations of the free camera
        p2 = pixels0.copy()
        p2[o, k] += eps
        l2 = float(loss_fn(solve_ba(p2).values()))
        p3 = pixels0.copy()
        p3[o, k] -= eps
        l3 = float(loss_fn(solve_ba(p3).values()))
        fd = (l2 - l3) / (2 * eps)
        np.testing.assert_allclose(g[o, k], fd, rtol=5e-3, atol=1e-10)
