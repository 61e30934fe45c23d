"""Bias-aware IMU preintegration + factor zoo + trajectory optimization.

Reference: slam/src/imu_preintegration.rs — `PreintegratedImuMeasurement::
integrate` (:180-240: bias-corrected sample, Δp/Δv/ΔR update, 9×9 error
covariance [rot, pos, vel] with transition/noise Jacobians, 9×6 bias
Jacobian recursion B ← A·B − N), lever-arm `ImuExtrinsics::transform` (:73:
centripetal + tangential terms, matching MathematicalRobotics transformIMU),
`NavState` predict with first-order bias correction (:258-280), nav-state
encode/retract (tangent rotation + position + velocity, right perturbation,
:922-968), factor zoo: BiasPrior (:314), BiasBetween (:346), NavStatePrior
(:376), PositionVelocity (:435), ImuFactor (:582 residual: ΔR-corrected
rotation log + frame-local position/velocity errors), and
`optimize_imu_trajectory` (:799).

TPU-native: integration over N samples is ONE `lax.scan` (vmappable over
windows — the time-axis parallel unit for SP sharding); all factors are
homogeneous blocks on the shared NLLS engine with autodiff Jacobians
through the nav-state retraction (reproducing the reference's analytic
left-Jacobian forms to machine precision).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from rust_robotics_tpu.core.lie import skew, so3_exp, so3_log
from rust_robotics_tpu.core.types import pytree_dataclass
from rust_robotics_tpu.nlls import (
    FactorBlock,
    Problem,
    SolverConfig,
    VariableGroup,
    solve,
)

GRAVITY = jnp.array([0.0, 0.0, -9.81])


@pytree_dataclass
class Preintegrated:
    """Mirror of PreintegratedImuMeasurement (imu_preintegration.rs:152)."""

    delta_rotation: Any  # [3, 3]
    delta_position: Any  # [3]
    delta_velocity: Any  # [3]
    delta_time: Any  # scalar
    covariance: Any  # [9, 9]
    bias_jacobian: Any  # [9, 6]
    lin_bias: Any  # [6] = [accel(3), gyro(3)] linearization point


def transform_imu(accel, gyro, gyro_dot, rotation_bs, translation_bs):
    """Sensor→body with lever-arm terms (imu_preintegration.rs:73-90)."""
    w = rotation_bs @ gyro
    wdot = rotation_bs @ gyro_dot
    a = (
        rotation_bs @ accel
        - skew(w) @ skew(w) @ translation_bs
        + skew(translation_bs) @ wdot
    )
    return a, w


def preintegrate(accels, gyros, dts, lin_bias, accel_sigma, gyro_sigma):
    """Integrate N body-frame samples (imu_preintegration.rs:180-240).

    accels/gyros [N, 3]; dts [N]; lin_bias [6]. Returns Preintegrated.
    """
    f = accels.dtype
    eye3 = jnp.eye(3, dtype=f)
    meas_cov = jnp.zeros((6, 6), f)
    meas_cov = meas_cov.at[:3, :3].set(eye3 * accel_sigma**2)
    meas_cov = meas_cov.at[3:, 3:].set(eye3 * gyro_sigma**2)

    def step(carry, sample):
        rot, dp, dv, dt_total, cov, bjac = carry
        a_raw, w_raw, dt = sample
        a = a_raw - lin_bias[:3]
        w = w_raw - lin_bias[3:]
        ra = rot @ a
        hdt2 = 0.5 * dt * dt
        dp = dp + dv * dt + ra * hdt2
        dv = dv + ra * dt
        new_rot = rot @ so3_exp(w * dt)

        trans = jnp.eye(9, dtype=f)
        trans = trans.at[0:3, 0:3].set(so3_exp(-w * dt))
        trans = trans.at[3:6, 0:3].set(-rot @ skew(a) * hdt2)
        trans = trans.at[3:6, 6:9].set(eye3 * dt)
        trans = trans.at[6:9, 0:3].set(-rot @ skew(a) * dt)

        njac = jnp.zeros((9, 6), f)
        njac = njac.at[0:3, 3:6].set(eye3 * dt)
        njac = njac.at[3:6, 0:3].set(rot * hdt2)
        njac = njac.at[6:9, 0:3].set(rot * dt)

        cov = trans @ cov @ trans.T + njac @ meas_cov @ njac.T
        bjac = trans @ bjac - njac
        return (new_rot, dp, dv, dt_total + dt, cov, bjac), None

    init = (
        jnp.eye(3, dtype=f),
        jnp.zeros(3, f),
        jnp.zeros(3, f),
        jnp.zeros((), f),
        jnp.zeros((9, 9), f),
        jnp.zeros((9, 6), f),
    )
    (rot, dp, dv, dt_total, cov, bjac), _ = jax.lax.scan(
        step, init, (accels, gyros, dts)
    )
    return Preintegrated(rot, dp, dv, dt_total, cov, bjac, lin_bias)


def corrected_delta(pre: Preintegrated, bias):
    """First-order bias correction (imu_preintegration.rs:276-287)."""
    db = bias - pre.lin_bias
    corr = pre.bias_jacobian @ db
    rot = pre.delta_rotation @ so3_exp(corr[0:3])
    dp = pre.delta_position + corr[3:6]
    dv = pre.delta_velocity + corr[6:9]
    return rot, dp, dv


def predict_nav_state(pre: Preintegrated, nav, bias, gravity=GRAVITY):
    """NavState::predict (:258-272). nav = [rot_tangent(3), pos(3), vel(3)]."""
    rot_i = so3_exp(nav[0:3])
    drot, dp, dv = corrected_delta(pre, bias)
    dt = pre.delta_time
    rot = rot_i @ drot
    pos = nav[3:6] + nav[6:9] * dt + gravity * (0.5 * dt * dt) + rot_i @ dp
    vel = nav[6:9] + gravity * dt + rot_i @ dv
    return jnp.concatenate([so3_log(rot), pos, vel])


def nav_retract(value, delta):
    """Right-perturbation retraction (:952-968)."""
    rot = so3_exp(value[0:3]) @ so3_exp(delta[0:3])
    return jnp.concatenate(
        [so3_log(rot), value[3:6] + delta[3:6], value[6:9] + delta[6:9]]
    )


def imu_factor_residual(nav_i, nav_j, bias, meas):
    """ImuFactor residual (:630-656). `meas` = dict of stacked preintegrated
    fields + gravity."""
    pre = Preintegrated(
        meas["delta_rotation"], meas["delta_position"], meas["delta_velocity"],
        meas["delta_time"], None, meas["bias_jacobian"], meas["lin_bias"],
    )
    drot, dp, dv = corrected_delta(pre, bias)
    rot_i = so3_exp(nav_i[0:3])
    rot_j = so3_exp(nav_j[0:3])
    dt = pre.delta_time
    g = meas["gravity"]
    r_rot = so3_log(drot.T @ rot_i.T @ rot_j)
    r_pos = rot_i.T @ (
        nav_j[3:6] - nav_i[3:6] - nav_i[6:9] * dt - g * (0.5 * dt * dt)
    ) - dp
    r_vel = rot_i.T @ (nav_j[6:9] - nav_i[6:9] - g * dt) - dv
    return jnp.concatenate([r_rot, r_pos, r_vel])


def nav_prior_residual(nav, meas):
    """NavStatePrior (:376): full 9-DOF anchor with rotation on the
    manifold."""
    rot = so3_exp(nav[0:3])
    rot_prior = so3_exp(meas[0:3])
    return jnp.concatenate(
        [so3_log(rot_prior.T @ rot), nav[3:6] - meas[3:6], nav[6:9] - meas[6:9]]
    )


def position_velocity_residual(nav, meas):
    """PositionVelocity factor (:435): observes pos+vel (6-dim)."""
    return jnp.concatenate([nav[3:6] - meas[0:3], nav[6:9] - meas[3:6]])


def bias_prior_residual(bias, meas):
    return bias - meas


def bias_between_residual(bias_i, bias_j, meas):
    """BiasBetween random-walk factor (:346)."""
    return bias_j - bias_i - meas


def optimize_imu_trajectory(
    nav_states, biases, preints: Preintegrated, gravity=GRAVITY,
    nav_prior=None, nav_prior_info=None,
    bias_prior=None, bias_prior_info=None,
    bias_between_info=None,
    posvel_meas=None, posvel_indices=None, posvel_info=None,
    config: SolverConfig | None = None,
):
    """Mirror of `optimize_imu_trajectory` (imu_preintegration.rs:799):
    jointly refine N nav states + N biases under consecutive IMU factors,
    priors, bias random walk, and optional position/velocity measurements.

    nav_states [N, 9]; biases [N, 6]; `preints` stacked with leading N−1.
    Returns (nav_states, biases, summary).
    """
    n = nav_states.shape[0]
    f = nav_states.dtype
    nav_group = VariableGroup("nav", jnp.asarray(nav_states), retract=nav_retract)
    bias_group = VariableGroup("bias", jnp.asarray(biases))

    reg = preints.covariance + 1e-12 * jnp.eye(9, dtype=f)
    info = jnp.linalg.inv(reg)
    imu_meas = {
        "delta_rotation": preints.delta_rotation,
        "delta_position": preints.delta_position,
        "delta_velocity": preints.delta_velocity,
        "delta_time": preints.delta_time,
        "bias_jacobian": preints.bias_jacobian,
        "lin_bias": preints.lin_bias,
        "gravity": jnp.broadcast_to(gravity, (n - 1, 3)),
    }
    idx = jnp.stack(
        [jnp.arange(n - 1), jnp.arange(1, n), jnp.arange(n - 1)], axis=-1
    ).astype(jnp.int32)
    factors = [
        FactorBlock(
            "imu", imu_factor_residual, ("nav", "nav", "bias"), idx,
            measurement=imu_meas, information=info,
        )
    ]
    if nav_prior is not None:
        factors.append(
            FactorBlock(
                "nav_prior", nav_prior_residual, ("nav",),
                jnp.array([[0]], jnp.int32),
                measurement=jnp.asarray(nav_prior)[None],
                information=None if nav_prior_info is None else jnp.asarray(nav_prior_info)[None],
            )
        )
    if bias_prior is not None:
        factors.append(
            FactorBlock(
                "bias_prior", bias_prior_residual, ("bias",),
                jnp.array([[0]], jnp.int32),
                measurement=jnp.asarray(bias_prior)[None],
                information=None if bias_prior_info is None else jnp.asarray(bias_prior_info)[None],
            )
        )
    if bias_between_info is not None and n > 1:
        bidx = jnp.stack([jnp.arange(n - 1), jnp.arange(1, n)], axis=-1).astype(jnp.int32)
        factors.append(
            FactorBlock(
                "bias_between", bias_between_residual, ("bias", "bias"), bidx,
                measurement=jnp.zeros((n - 1, 6), f),
                information=jnp.broadcast_to(
                    jnp.asarray(bias_between_info), (n - 1, 6, 6)
                ),
            )
        )
    if posvel_meas is not None:
        pidx = jnp.asarray(posvel_indices, jnp.int32)[:, None]
        factors.append(
            FactorBlock(
                "posvel", position_velocity_residual, ("nav",), pidx,
                measurement=jnp.asarray(posvel_meas),
                information=None if posvel_info is None else jnp.asarray(posvel_info),
            )
        )
    prob = Problem((nav_group, bias_group), tuple(factors))
    solved, summary = solve(prob, config or SolverConfig())
    return solved.group("nav").values, solved.group("bias").values, summary
