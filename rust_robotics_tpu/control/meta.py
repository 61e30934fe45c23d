"""Meta control: performance-gated controller switching + LQR speed+steer.

Reference (crates/rust_robotics_control/src/): meta_control.rs (484:
mode selection between trackers based on running error statistics),
lqr_speed_steer_control.rs (938: joint 5-state LQR over lateral error AND
speed error).

TPU-native: both candidate controllers evaluate every step; the selector is
a hysteresis latch on exponentially-averaged cross-track error (branchless
compute-both-select, like filters/extra.adaptive_step).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from rust_robotics_tpu.core.angles import normalize_angle
from rust_robotics_tpu.control.trackers import (
    _masked_nearest,
    path_curvatures,
    path_yaws,
    solve_dare,
)


@dataclasses.dataclass(frozen=True)
class MetaControlConfig:
    error_alpha: float = 0.1       # EMA smoothing of |cross-track|
    switch_high: float = 0.8       # primary→fallback threshold
    switch_low: float = 0.3        # fallback→primary threshold


def meta_select(use_fallback, ema_error, abs_error,
                cfg: MetaControlConfig = MetaControlConfig()):
    """Update the EMA and the hysteresis latch; returns
    (use_fallback', ema')."""
    ema = (1.0 - cfg.error_alpha) * ema_error + cfg.error_alpha * abs_error
    nxt = jnp.where(
        ema > cfg.switch_high, True,
        jnp.where(ema < cfg.switch_low, False, use_fallback),
    )
    return nxt, ema


def meta_control_step(state, points, mask, target_speed, use_fallback,
                      ema_error, primary_fn, fallback_fn,
                      cfg: MetaControlConfig = MetaControlConfig()):
    """Evaluate both controllers, select by latch, update statistics.
    primary_fn/fallback_fn: state -> (accel, steer, aux). Returns
    (accel, steer, use_fallback', ema')."""
    a1, s1, _ = primary_fn(state)
    a2, s2, _ = fallback_fn(state)
    accel = jnp.where(use_fallback, a2, a1)
    steer = jnp.where(use_fallback, s2, s1)
    idx = _masked_nearest(state[..., :2], points, mask)
    tp = jnp.take_along_axis(points, idx[..., None, None], axis=-2)[..., 0, :]
    err = jnp.linalg.norm(state[..., :2] - tp, axis=-1)
    nxt, ema = meta_select(use_fallback, ema_error, err, cfg)
    return accel, steer, nxt, ema


# ---------------------------------------------------------------------------
# LQR speed + steer (lqr_speed_steer_control.rs)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class LQRSpeedSteerConfig:
    wheelbase: float = 0.5
    max_steer: float = 0.7853981633974483
    q_diag: tuple = (1.0, 1.0, 1.0, 1.0, 0.5)
    r_diag: tuple = (1.0, 1.0)
    dt: float = 0.1
    dare_iterations: int = 150
    dare_tolerance: float = 0.01


def lqr_speed_steer_control(state, points, mask, speed_profile, prev_error,
                            prev_theta_error,
                            cfg: LQRSpeedSteerConfig = LQRSpeedSteerConfig()):
    """Joint 5-state LQR [e, ė, θe, θ̇e, v_err] → [δ, a]
    (lqr_speed_steer_control.rs): the 4-state lateral model of
    lqr_steer_control plus a speed-error channel driven by acceleration.
    Returns (accel, steer, (e, θe))."""
    x, y, yaw, v = state[..., 0], state[..., 1], state[..., 2], state[..., 3]
    pos = jnp.stack([x, y], axis=-1)
    idx = _masked_nearest(pos, points, mask)
    yaws = path_yaws(points, mask)
    ks = path_curvatures(points, mask)
    tp = jnp.take_along_axis(points, idx[..., None, None], axis=-2)[..., 0, :]
    pyaw = jnp.take_along_axis(yaws, idx[..., None], axis=-1)[..., 0]
    k = jnp.take_along_axis(ks, idx[..., None], axis=-1)[..., 0]
    sp = jnp.take_along_axis(speed_profile, idx[..., None], axis=-1)[..., 0]
    dx, dy = x - tp[..., 0], y - tp[..., 1]
    e = -jnp.sin(pyaw) * dx + jnp.cos(pyaw) * dy
    theta_e = normalize_angle(yaw - pyaw)
    v_err = v - sp

    dt = cfg.dt
    a = jnp.zeros((5, 5))
    a = a.at[0, 0].set(1.0).at[0, 1].set(dt)
    a = a.at[1, 2].set(v)
    a = a.at[2, 2].set(1.0).at[2, 3].set(dt)
    a = a.at[4, 4].set(1.0)
    b = jnp.zeros((5, 2))
    b = b.at[3, 0].set(v / cfg.wheelbase)
    b = b.at[4, 1].set(dt)
    q = jnp.diag(jnp.asarray(cfg.q_diag))
    r = jnp.diag(jnp.asarray(cfg.r_diag))
    p = solve_dare(a, b, q, r, cfg.dare_iterations, cfg.dare_tolerance)
    k_gain = jnp.linalg.solve(r + b.T @ p @ b, b.T @ p @ a)  # [2, 5]
    xvec = jnp.stack(
        [e, (e - prev_error) / dt, theta_e,
         (theta_e - prev_theta_error) / dt, v_err],
        axis=-1,
    )
    u = -(k_gain @ xvec[..., None])[..., 0]
    ff = jnp.arctan2(cfg.wheelbase * k, 1.0)
    steer = jnp.clip(ff + normalize_angle(u[..., 0]), -cfg.max_steer, cfg.max_steer)
    accel = u[..., 1]
    return accel, steer, (e, theta_e)
