"""Closed-loop tracking tests for the Tier-1 controllers.

Behavior-check style (the reference's inline tests drive each controller
along a course and assert convergence/goal-reaching)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rust_robotics_tpu.control.trackers import (
    LQRSteerConfig,
    MoveToPoseConfig,
    PIDConfig,
    PurePursuitConfig,
    RearWheelFeedbackConfig,
    StanleyConfig,
    bicycle_kinematics,
    lqr_steer_control,
    move_to_pose_control,
    pid_reset,
    pid_step,
    pure_pursuit_control,
    rear_wheel_feedback_control,
    stanley_control,
)


def course():
    """Gentle sine path, densely sampled."""
    xs = jnp.linspace(0.0, 50.0, 501)
    ys = 2.0 * jnp.sin(xs / 10.0)
    pts = jnp.stack([xs, ys], axis=-1)
    return pts, jnp.ones(501)


def rollout(control_fn, state0, steps=500, dt=0.1, wheelbase=2.9):
    pts, mask = course()

    def step(state, _):
        accel, steer, _ = control_fn(state, pts, mask)
        state = bicycle_kinematics(state, accel, steer, dt, wheelbase)
        return state, state

    _, traj = jax.lax.scan(step, state0, None, length=steps)
    return np.asarray(traj)


def cross_track_rmse(traj):
    xs, ys = traj[:, 0], traj[:, 1]
    ref = 2.0 * np.sin(xs / 10.0)
    sel = (xs > 5.0) & (xs < 48.0)
    return float(np.sqrt(np.mean((ys[sel] - ref[sel]) ** 2)))


def test_pid_converges_to_setpoint():
    cfg = PIDConfig(kp=1.5, ki=0.3, kd=0.05, dt=0.1)
    state = pid_reset()
    x = jnp.asarray(0.0)
    for _ in range(200):
        state, u = pid_step(state, 5.0 - x, cfg)
        x = x + 0.1 * u
    assert abs(float(x) - 5.0) < 0.05


def test_pure_pursuit_tracks_sine():
    state0 = jnp.array([0.0, -1.0, 0.3, 0.0])
    traj = rollout(
        lambda s, p, m: pure_pursuit_control(s, p, m, 3.0), state0
    )
    assert cross_track_rmse(traj) < 0.5
    assert traj[-1, 0] > 40.0  # made progress along the course


def test_stanley_tracks_sine():
    state0 = jnp.array([0.0, -1.0, 0.3, 1.0])
    traj = rollout(
        lambda s, p, m: stanley_control(s, p, m, 3.0), state0
    )
    assert cross_track_rmse(traj) < 0.4


def test_rear_wheel_feedback_tracks_sine():
    state0 = jnp.array([0.0, -0.5, 0.2, 1.0])
    traj = rollout(
        lambda s, p, m: rear_wheel_feedback_control(s, p, m, 3.0), state0
    )
    assert cross_track_rmse(traj) < 0.4


def test_lqr_steer_tracks_sine():
    cfg = LQRSteerConfig(wheelbase=2.9)
    state0 = jnp.array([0.0, -0.5, 0.2, 1.0])
    pts, mask = course()

    def step(carry, _):
        state, (pe, pth) = carry
        accel, steer, (e, th) = lqr_steer_control(
            state, pts, mask, 3.0, pe, pth, cfg
        )
        state = bicycle_kinematics(state, accel, steer, 0.1, cfg.wheelbase)
        return (state, (e, th)), state

    (_, _), traj = jax.lax.scan(
        step, (state0, (jnp.asarray(0.0), jnp.asarray(0.0))), None, length=500
    )
    assert cross_track_rmse(np.asarray(traj)) < 0.4


def test_move_to_pose_reaches_goal():
    cfg = MoveToPoseConfig()
    pose = jnp.array([0.0, 0.0, 0.0])
    goal = jnp.array([5.0, 3.0, jnp.pi / 2])

    def step(pose, _):
        v, w = move_to_pose_control(pose, goal, cfg)
        x = pose[0] + v * jnp.cos(pose[2]) * cfg.dt
        y = pose[1] + v * jnp.sin(pose[2]) * cfg.dt
        yaw = pose[2] + w * cfg.dt
        return jnp.array([x, y, yaw]), None

    pose, _ = jax.lax.scan(step, pose, None, length=3000)
    assert float(jnp.linalg.norm(pose[:2] - goal[:2])) < 0.05
    assert np.isfinite(float(pose[2]))


def test_controllers_batched_vmap():
    pts, mask = course()
    states = jnp.array(
        [[0.0, -1.0, 0.3, 1.0], [0.0, 1.0, -0.2, 2.0], [1.0, 0.0, 0.0, 0.5]]
    )
    accel, steer, idx = jax.vmap(
        lambda s: pure_pursuit_control(s, pts, mask, 3.0)
    )(states)
    assert accel.shape == (3,)
    assert np.all(np.isfinite(np.asarray(steer)))
