"""IMU preintegration tests: analytic deltas, prediction consistency,
bias-aware trajectory optimization (imu_preintegration.rs contract)."""

import jax
import jax.numpy as jnp
import numpy as np

from rust_robotics_tpu.core.lie import so3_exp, so3_log
from rust_robotics_tpu.slam.imu import (
    GRAVITY,
    Preintegrated,
    corrected_delta,
    optimize_imu_trajectory,
    predict_nav_state,
    preintegrate,
    transform_imu,
)

SIGMA_A, SIGMA_G = 0.01, 0.001


def test_pure_rotation_delta():
    n = 100
    dt = 0.01
    w = jnp.array([0.0, 0.0, 0.5])
    pre = preintegrate(
        jnp.zeros((n, 3)), jnp.broadcast_to(w, (n, 3)), jnp.full((n,), dt),
        jnp.zeros(6), SIGMA_A, SIGMA_G,
    )
    expected = so3_exp(w * n * dt)
    np.testing.assert_allclose(pre.delta_rotation, expected, atol=1e-9)
    np.testing.assert_allclose(float(pre.delta_time), 1.0, atol=1e-12)


def test_pure_acceleration_delta():
    n = 100
    dt = 0.01
    a = jnp.array([1.0, 0.0, 0.0])
    pre = preintegrate(
        jnp.broadcast_to(a, (n, 3)), jnp.zeros((n, 3)), jnp.full((n,), dt),
        jnp.zeros(6), SIGMA_A, SIGMA_G,
    )
    t = n * dt
    np.testing.assert_allclose(pre.delta_velocity, a * t, atol=1e-9)
    # discrete sum: Σ v dt + ½ a dt² = ½ a t² + O(dt)
    np.testing.assert_allclose(pre.delta_position, 0.5 * a * t**2, atol=1e-2)


def test_stationary_predict_under_gravity():
    """A stationary IMU measures +9.81 up; prediction must stay in place."""
    n = 200
    dt = 0.005
    accel = jnp.broadcast_to(-GRAVITY, (n, 3))  # [0, 0, +9.81]
    pre = preintegrate(
        accel, jnp.zeros((n, 3)), jnp.full((n,), dt), jnp.zeros(6),
        SIGMA_A, SIGMA_G,
    )
    nav0 = jnp.zeros(9)
    nav1 = predict_nav_state(pre, nav0, jnp.zeros(6))
    np.testing.assert_allclose(np.asarray(nav1), 0.0, atol=1e-9)


def test_bias_correction_first_order():
    n = 50
    dt = 0.01
    accel = jnp.broadcast_to(jnp.array([0.3, -0.2, 9.81]), (n, 3))
    gyro = jnp.broadcast_to(jnp.array([0.05, 0.02, -0.04]), (n, 3))
    true_bias = jnp.array([0.02, -0.01, 0.015, 0.002, -0.001, 0.003])

    # integrate at zero linearization bias with biased measurements
    pre = preintegrate(accel + true_bias[None, :3] * 0, gyro, jnp.full((n,), dt),
                       jnp.zeros(6), SIGMA_A, SIGMA_G)
    pre_biased = preintegrate(
        accel + true_bias[None, :3], gyro + true_bias[None, 3:],
        jnp.full((n,), dt), jnp.zeros(6), SIGMA_A, SIGMA_G,
    )
    # correcting the biased preintegration with the true bias should
    # approximately recover the unbiased deltas (first order)
    rot_c, dp_c, dv_c = corrected_delta(pre_biased, true_bias)
    np.testing.assert_allclose(dp_c, pre.delta_position, atol=5e-4)
    np.testing.assert_allclose(dv_c, pre.delta_velocity, atol=5e-4)
    np.testing.assert_allclose(
        so3_log(rot_c), so3_log(pre.delta_rotation), atol=5e-4
    )


def test_lever_arm_transform():
    # sensor at lever arm r x̂ rotating at w about z reads centripetal
    # −w²r x̂; the transform removes it: a zero sensor reading implies the
    # body frame accelerates +w²r x̂ (imu_preintegration.rs:73-90)
    accel = jnp.array([0.0, 0.0, 0.0])
    gyro = jnp.array([0.0, 0.0, 2.0])
    a_b, w_b = transform_imu(
        accel, gyro, jnp.zeros(3), jnp.eye(3), jnp.array([0.5, 0.0, 0.0])
    )
    np.testing.assert_allclose(w_b, gyro, atol=1e-12)
    np.testing.assert_allclose(a_b, [2.0**2 * 0.5, 0.0, 0.0], atol=1e-12)
    # and a sensor reading of exactly −w²r x̂ maps to zero body acceleration
    a_b2, _ = transform_imu(
        jnp.array([-2.0, 0.0, 0.0]), gyro, jnp.zeros(3), jnp.eye(3),
        jnp.array([0.5, 0.0, 0.0]),
    )
    np.testing.assert_allclose(a_b2, 0.0, atol=1e-12)


def simulate_trajectory(steps=5, samples=20, dt=0.01):
    """Piecewise-constant body accel/gyro; returns truth nav states and
    per-interval preintegrations (noise-free)."""
    rng = np.random.default_rng(0)
    nav = jnp.zeros(9)
    navs = [nav]
    pres = []
    for k in range(steps):
        a_w = jnp.asarray(rng.uniform(-0.5, 0.5, 3))
        w_b = jnp.asarray(rng.uniform(-0.3, 0.3, 3))
        # body-frame specific force per sample
        accels, gyros = [], []
        cur = nav
        for s in range(samples):
            rot = so3_exp(cur[0:3])
            accels.append(rot.T @ (a_w - GRAVITY))
            gyros.append(w_b)
            # integrate truth (same discretization as preintegration)
            pos = cur[3:6] + cur[6:9] * dt + 0.5 * a_w * dt * dt
            vel = cur[6:9] + a_w * dt
            rot2 = rot @ so3_exp(w_b * dt)
            cur = jnp.concatenate([so3_log(rot2), pos, vel])
        pre = preintegrate(
            jnp.stack(accels), jnp.stack(gyros), jnp.full((samples,), dt),
            jnp.zeros(6), SIGMA_A, SIGMA_G,
        )
        pres.append(pre)
        nav = cur
        navs.append(nav)
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *pres)
    return jnp.stack(navs), stacked


def test_predict_matches_truth_integration():
    navs, pres = simulate_trajectory()
    for k in range(navs.shape[0] - 1):
        pre_k = jax.tree.map(lambda a: a[k], pres)
        pred = predict_nav_state(pre_k, navs[k], jnp.zeros(6))
        np.testing.assert_allclose(pred[3:], navs[k + 1][3:], atol=5e-3)
        np.testing.assert_allclose(
            so3_exp(pred[0:3]), so3_exp(navs[k + 1][0:3]), atol=1e-6
        )


def test_optimize_imu_trajectory_recovers_states():
    navs, pres = simulate_trajectory()
    n = navs.shape[0]
    rng = np.random.default_rng(1)
    noisy = navs + 0.05 * jnp.asarray(rng.standard_normal(navs.shape))
    noisy = noisy.at[0].set(navs[0])
    biases = jnp.zeros((n, 6))
    posvel = jnp.concatenate([navs[:, 3:6], navs[:, 6:9]], axis=-1)
    opt_navs, opt_biases, summary = optimize_imu_trajectory(
        noisy, biases, pres,
        nav_prior=navs[0], nav_prior_info=1e6 * jnp.eye(9),
        bias_prior=jnp.zeros(6), bias_prior_info=1e4 * jnp.eye(6),
        bias_between_info=1e6 * jnp.eye(6),
        posvel_meas=posvel, posvel_indices=jnp.arange(n),
        posvel_info=jnp.broadcast_to(1e2 * jnp.eye(6), (n, 6, 6)),
    )
    assert summary.final_cost < summary.initial_cost
    err = np.asarray(opt_navs[:, 3:6] - navs[:, 3:6])
    assert np.abs(err).max() < 0.02, np.abs(err).max()
