"""Tier-1 path-tracking controllers: PID, Pure Pursuit, Stanley, LQR steer,
rear-wheel feedback, move-to-pose.

Reference: crates/rust_robotics_control/src/ — pid_controller.rs (config
:6-18: kp/ki/kd/dt + anti-windup + output clamp), pure_pursuit.rs (rear-axle
geometry :26-46, Lf = k·v + Lfc, δ = atan2(2 L sin α / Lf, 1) :131-148,
defaults k=0.1 Lfc=2.0 L=2.9 :82-90), stanley_controller.rs (front-axle
cross-track, δ = θe + atan2(k·e, v), defaults k=0.5 :78-85),
lqr_steer_control.rs (4-state error model + DARE iteration, defaults
:80-90), rear_wheel_feedback.rs (kth=1.0, ke=0.5 :77-86), move_to_pose.rs
(ρ/α/β polar controller, gains 9/15/−3 :24-34).

TPU-native: every controller is a pure function over arrays — paths are
padded [N, 2] + mask; index searches are masked argmins; whole closed-loop
sims run under `lax.scan` and batch over leading dims (the reference's
ControllerArena comparison becomes one vmapped program).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from rust_robotics_tpu.core.angles import normalize_angle

BIG = 1e18


# ---------------------------------------------------------------------------
# Vehicle kinematics (pure_pursuit.rs:26-46)
# ---------------------------------------------------------------------------

def bicycle_kinematics(state, accel, steer, dt, wheelbase):
    """state [..., 4] = [x, y, yaw, v]; bicycle update (:41-47)."""
    x, y, yaw, v = state[..., 0], state[..., 1], state[..., 2], state[..., 3]
    x = x + v * jnp.cos(yaw) * dt
    y = y + v * jnp.sin(yaw) * dt
    yaw = yaw + v / wheelbase * jnp.tan(steer) * dt
    v = v + accel * dt
    return jnp.stack([x, y, yaw, v], axis=-1)


def rear_axle(state, wheelbase):
    """Rear-axle position (:27-28)."""
    x, y, yaw = state[..., 0], state[..., 1], state[..., 2]
    return jnp.stack(
        [x - wheelbase / 2.0 * jnp.cos(yaw), y - wheelbase / 2.0 * jnp.sin(yaw)],
        axis=-1,
    )


def _masked_nearest(query_xy, points, mask):
    """Index of nearest valid path point."""
    d2 = jnp.sum((points - query_xy[..., None, :]) ** 2, axis=-1)
    d2 = jnp.where(mask > 0, d2, BIG)
    return jnp.argmin(d2, axis=-1)


def path_yaws(points, mask):
    """Per-point tangent yaw (stanley_controller.rs:137-151): forward
    difference, last valid repeats previous."""
    diffs = points[..., 1:, :] - points[..., :-1, :]
    yaw = jnp.arctan2(diffs[..., 1], diffs[..., 0])
    return jnp.concatenate([yaw, yaw[..., -1:]], axis=-1)


# ---------------------------------------------------------------------------
# PID (pid_controller.rs)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class PIDConfig:
    kp: float = 1.0
    ki: float = 0.0
    kd: float = 0.0
    dt: float = 0.1
    max_integral: float = 10.0
    max_output: float = 10.0


def pid_reset(shape=(), dtype=jnp.float32):
    """(integral, prev_error) state."""
    return jnp.zeros(shape, dtype), jnp.zeros(shape, dtype)


def pid_step(state, error, cfg: PIDConfig):
    """One PID update with anti-windup + output clamp (pid_controller.rs)."""
    integral, prev = state
    integral = jnp.clip(
        integral + error * cfg.dt, -cfg.max_integral, cfg.max_integral
    )
    deriv = (error - prev) / cfg.dt
    out = cfg.kp * error + cfg.ki * integral + cfg.kd * deriv
    out = jnp.clip(out, -cfg.max_output, cfg.max_output)
    return (integral, error), out


# ---------------------------------------------------------------------------
# Pure Pursuit (pure_pursuit.rs)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class PurePursuitConfig:
    look_ahead_gain: float = 0.1
    look_ahead_distance: float = 2.0
    wheelbase: float = 2.9
    kp: float = 1.0
    goal_threshold: float = 2.0


def pure_pursuit_control(state, points, mask, target_speed,
                         cfg: PurePursuitConfig = PurePursuitConfig()):
    """(accel, steer, target_idx): δ = atan2(2 L sin α / Lf, 1)
    (pure_pursuit.rs:131-148); accel = kp (v_target − v) (:195)."""
    rear = rear_axle(state, cfg.wheelbase)
    lf = cfg.look_ahead_gain * state[..., 3] + cfg.look_ahead_distance
    # target: first valid point at arc distance >= Lf beyond the nearest
    near = _masked_nearest(rear, points, mask)
    d = jnp.linalg.norm(points - rear[..., None, :], axis=-1)
    n = points.shape[-2]
    ahead = jnp.arange(n) >= near[..., None]
    candidate = (d >= lf[..., None]) & ahead & (mask > 0)
    # first candidate index, else last valid
    idx = jnp.argmax(candidate, axis=-1)
    any_c = jnp.any(candidate, axis=-1)
    last_valid = n - 1 - jnp.argmax(jnp.flip(mask > 0, axis=-1), axis=-1)
    target = jnp.where(any_c, idx, last_valid)
    tp = jnp.take_along_axis(points, target[..., None, None], axis=-2)[..., 0, :]
    alpha = jnp.arctan2(tp[..., 1] - rear[..., 1], tp[..., 0] - rear[..., 0]) - state[..., 2]
    steer = jnp.arctan2(2.0 * cfg.wheelbase * jnp.sin(alpha) / lf, 1.0)
    accel = cfg.kp * (target_speed - state[..., 3])
    return accel, steer, target


# ---------------------------------------------------------------------------
# Stanley (stanley_controller.rs)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class StanleyConfig:
    k: float = 0.5
    wheelbase: float = 2.9
    kp: float = 1.0
    goal_threshold: float = 3.0


def stanley_control(state, points, mask, target_speed,
                    cfg: StanleyConfig = StanleyConfig()):
    """Front-axle cross-track law δ = θe + atan2(k·e, v)."""
    x, y, yaw, v = state[..., 0], state[..., 1], state[..., 2], state[..., 3]
    fx = x + cfg.wheelbase * jnp.cos(yaw)
    fy = y + cfg.wheelbase * jnp.sin(yaw)
    front = jnp.stack([fx, fy], axis=-1)
    idx = _masked_nearest(front, points, mask)
    yaws = path_yaws(points, mask)
    tp = jnp.take_along_axis(points, idx[..., None, None], axis=-2)[..., 0, :]
    pyaw = jnp.take_along_axis(yaws, idx[..., None], axis=-1)[..., 0]
    # signed cross-track error: projection of front-axle offset onto the
    # path-normal (+90° from heading)
    dx, dy = fx - tp[..., 0], fy - tp[..., 1]
    e = dx * jnp.cos(yaw + jnp.pi / 2) + dy * jnp.sin(yaw + jnp.pi / 2)
    theta_e = normalize_angle(pyaw - yaw)
    steer = theta_e + jnp.arctan2(cfg.k * -e, v)
    accel = cfg.kp * (target_speed - v)
    return accel, steer, idx


# ---------------------------------------------------------------------------
# LQR steer (lqr_steer_control.rs)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class LQRSteerConfig:
    wheelbase: float = 0.5
    max_steer: float = 0.7853981633974483
    kp: float = 1.0
    q_diag: tuple = (1.0, 1.0, 1.0, 1.0)
    r: float = 1.0
    dt: float = 0.1
    goal_threshold: float = 0.3
    dare_iterations: int = 150
    dare_tolerance: float = 0.01


def solve_dare(a, b, q, r, iterations=150, tol=0.01):
    """Discrete algebraic Riccati by fixed-point iteration (the reference's
    solve_dare loop)."""

    def body(carry):
        x, it, done = carry
        xn = (
            a.T @ x @ a
            - a.T @ x @ b @ jnp.linalg.inv(r + b.T @ x @ b) @ b.T @ x @ a
            + q
        )
        done = jnp.max(jnp.abs(xn - x)) < tol
        return xn, it + 1, done

    def cond(carry):
        _, it, done = carry
        return (~done) & (it < iterations)

    x, _, _ = jax.lax.while_loop(cond, body, (q, 0, jnp.asarray(False)))
    return x


def path_curvatures(points, mask):
    """Finite-difference curvature per path point."""
    d1 = jnp.gradient(points, axis=-2)
    d2 = jnp.gradient(d1, axis=-2)
    num = d1[..., 0] * d2[..., 1] - d1[..., 1] * d2[..., 0]
    den = jnp.clip((d1[..., 0] ** 2 + d1[..., 1] ** 2) ** 1.5, 1e-9, None)
    return num / den


def lqr_steer_control(state, points, mask, target_speed, prev_error,
                      prev_theta_error,
                      cfg: LQRSteerConfig = LQRSteerConfig()):
    """LQR on the 4-state lateral error model [e, ė, θe, θ̇e]
    (lqr_steer_control.rs): feedback + curvature feedforward. Returns
    (accel, steer, (e, θe)) — errors are threaded as controller state."""
    x, y, yaw, v = state[..., 0], state[..., 1], state[..., 2], state[..., 3]
    pos = jnp.stack([x, y], axis=-1)
    idx = _masked_nearest(pos, points, mask)
    yaws = path_yaws(points, mask)
    ks = path_curvatures(points, mask)
    tp = jnp.take_along_axis(points, idx[..., None, None], axis=-2)[..., 0, :]
    pyaw = jnp.take_along_axis(yaws, idx[..., None], axis=-1)[..., 0]
    k = jnp.take_along_axis(ks, idx[..., None], axis=-1)[..., 0]
    dx, dy = x - tp[..., 0], y - tp[..., 1]
    # lateral offset in the PATH frame, positive = vehicle left of path
    e = -jnp.sin(pyaw) * dx + jnp.cos(pyaw) * dy
    theta_e = normalize_angle(yaw - pyaw)

    dt = cfg.dt
    a = jnp.array(
        [
            [1.0, dt, 0.0, 0.0],
            [0.0, 0.0, 1.0, 0.0],  # filled with v below
            [0.0, 0.0, 1.0, dt],
            [0.0, 0.0, 0.0, 0.0],
        ]
    )
    # single-instance law (vmap for batches): v enters A and B
    a = a.at[1, 2].set(v)
    b = jnp.zeros((4, 1)).at[3, 0].set(v / cfg.wheelbase)
    q = jnp.diag(jnp.asarray(cfg.q_diag))
    r = jnp.asarray([[cfg.r]])
    p = solve_dare(a, b, q, r, cfg.dare_iterations, cfg.dare_tolerance)
    k_gain = jnp.linalg.inv(r + b.T @ p @ b) @ b.T @ p @ a  # [1, 4]
    xvec = jnp.stack(
        [e, (e - prev_error) / dt, theta_e, (theta_e - prev_theta_error) / dt],
        axis=-1,
    )
    ff = jnp.arctan2(cfg.wheelbase * k, 1.0)
    fb = normalize_angle(-(k_gain @ xvec[..., None])[..., 0, 0])
    steer = jnp.clip(ff + fb, -cfg.max_steer, cfg.max_steer)
    accel = cfg.kp * (target_speed - v)
    return accel, steer, (e, theta_e)


# ---------------------------------------------------------------------------
# Rear-wheel feedback (rear_wheel_feedback.rs)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class RearWheelFeedbackConfig:
    kth: float = 1.0
    ke: float = 0.5
    wheelbase: float = 2.9
    kp: float = 1.0
    goal_threshold: float = 0.5
    max_steer: float = 0.7853981633974483


def rear_wheel_feedback_control(state, points, mask, target_speed,
                                cfg: RearWheelFeedbackConfig = RearWheelFeedbackConfig()):
    """ω = v·κ·cos(θe)/(1−κe) − kth·|v|·θe − ke·v·sin(θe)·e/θe;
    δ = atan(L·ω/v)."""
    x, y, yaw, v = state[..., 0], state[..., 1], state[..., 2], state[..., 3]
    pos = jnp.stack([x, y], axis=-1)
    idx = _masked_nearest(pos, points, mask)
    yaws = path_yaws(points, mask)
    ks = path_curvatures(points, mask)
    tp = jnp.take_along_axis(points, idx[..., None, None], axis=-2)[..., 0, :]
    pyaw = jnp.take_along_axis(yaws, idx[..., None], axis=-1)[..., 0]
    k = jnp.take_along_axis(ks, idx[..., None], axis=-1)[..., 0]
    dx, dy = x - tp[..., 0], y - tp[..., 1]
    # lateral offset in the PATH frame, positive = vehicle left of path
    e = -jnp.sin(pyaw) * dx + jnp.cos(pyaw) * dy
    theta_e = normalize_angle(yaw - pyaw)
    safe_th = jnp.where(jnp.abs(theta_e) < 1e-9, 1.0, theta_e)
    sin_term = jnp.where(
        jnp.abs(theta_e) < 1e-9,
        v * e,  # limit of v·sin(θe)·e/θe
        v * jnp.sin(safe_th) * e / safe_th,
    )
    omega = (
        v * k * jnp.cos(theta_e) / jnp.clip(1.0 - k * e, 1e-9, None)
        - cfg.kth * jnp.abs(v) * theta_e
        - cfg.ke * sin_term
    )
    steer = jnp.clip(
        jnp.arctan2(cfg.wheelbase * omega, jnp.clip(jnp.abs(v), 1e-9, None)),
        -cfg.max_steer,
        cfg.max_steer,
    )
    accel = cfg.kp * (target_speed - v)
    return accel, steer, idx


# ---------------------------------------------------------------------------
# Move to pose (move_to_pose.rs)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class MoveToPoseConfig:
    kp_rho: float = 9.0
    kp_alpha: float = 15.0
    kp_beta: float = -3.0
    dt: float = 0.01
    goal_tolerance: float = 0.001
    yaw_tolerance: float = 0.05
    max_steps: int = 10_000


def move_to_pose_control(pose, goal_pose, cfg: MoveToPoseConfig = MoveToPoseConfig()):
    """Polar ρ/α/β law (move_to_pose.rs; gains 9/15/−3): returns (v, ω)."""
    dx = goal_pose[..., 0] - pose[..., 0]
    dy = goal_pose[..., 1] - pose[..., 1]
    rho = jnp.sqrt(dx * dx + dy * dy)
    alpha = normalize_angle(jnp.arctan2(dy, dx) - pose[..., 2])
    beta = normalize_angle(goal_pose[..., 2] - pose[..., 2] - alpha)
    v = cfg.kp_rho * rho
    w = cfg.kp_alpha * alpha + cfg.kp_beta * beta
    # drive backwards when the target is behind (PythonRobotics variant)
    backwards = jnp.abs(alpha) > jnp.pi / 2
    v = jnp.where(backwards, -v, v)
    return v, w
