"""Kalman-family tests.

Strategy mirrors the reference's (SURVEY.md §4): cross-implementation golden
checks (an independent NumPy f64 EKF stands in for the Rust reference, which
cannot be executed in this image — no cargo), analytic-vs-autodiff Jacobians,
tracking-accuracy behavior checks, and batch/vmap consistency.
"""

import jax
import jax.numpy as jnp
import numpy as np

from rust_robotics_tpu.core.types import GaussianBelief
from rust_robotics_tpu.demos.ekf_localization import (
    default_ekf_noise,
    run_ekf_localization_demo,
)
from rust_robotics_tpu.filters.kalman import (
    ckf_step,
    ekf_step,
    enkf_step,
    ensemble_statistics,
    iekf_step,
    information_step,
    ukf_step,
    unicycle_position_model,
)
from rust_robotics_tpu.models.motion import (
    unicycle_jacobian,
    unicycle_jacobian_autodiff,
)

DT = 0.1


def numpy_ekf_reference(steps=330):
    """Straight NumPy transcription of the reference demo semantics
    (render_gif_ekf_localization.rs:35-76 + ekf.rs:248-278), f64."""

    def noise(k, scale, phase):
        return scale * np.sin(0.13 * k + phase) + 0.5 * scale * np.cos(
            0.07 * k + 1.3 * phase
        )

    q = np.diag([0.01, 0.01, np.deg2rad(1.0) ** 2, 0.01])
    r = np.eye(2)
    h = np.array([[1.0, 0, 0, 0], [0, 1.0, 0, 0]])
    state = np.array([10.0, 0.0, np.pi / 2, 0.0])
    cov = np.eye(4)
    truth = state.copy()
    v_true, w_true = 1.0, 0.1
    est = []
    for k in range(steps):
        truth[0] += v_true * np.cos(truth[2]) * DT
        truth[1] += v_true * np.sin(truth[2]) * DT
        truth[2] += w_true * DT
        u = np.array([v_true + noise(k, 0.12, 0.2), w_true + noise(k, 0.04, 1.0)])
        z = np.array([truth[0] + noise(k, 0.6, 2.0), truth[1] + noise(k, 0.6, 2.7)])
        # predict
        yaw = state[2]
        x_pred = np.array(
            [
                state[0] + DT * u[0] * np.cos(yaw),
                state[1] + DT * u[0] * np.sin(yaw),
                state[2] + DT * u[1],
                u[0],
            ]
        )
        f = np.eye(4)
        f[0, 2] = -DT * u[0] * np.sin(x_pred[2])
        f[1, 2] = DT * u[0] * np.cos(x_pred[2])
        f[3, 3] = 0.0
        p_pred = f @ cov @ f.T + q
        # update
        y = z - h @ x_pred
        s = h @ p_pred @ h.T + r
        kgain = p_pred @ h.T @ np.linalg.inv(s)
        state = x_pred + kgain @ y
        cov = (np.eye(4) - kgain @ h) @ p_pred
        est.append(state.copy())
    return np.array(est)


def test_unicycle_jacobian_matches_autodiff():
    s = jnp.array([1.0, 2.0, 0.7, 1.3])
    u = jnp.array([1.1, 0.2])
    np.testing.assert_allclose(
        unicycle_jacobian(s, u, DT), unicycle_jacobian_autodiff(s, u, DT), atol=1e-14
    )


def test_ekf_demo_matches_numpy_reference():
    trace = run_ekf_localization_demo(steps=330)
    golden = numpy_ekf_reference(steps=330)
    np.testing.assert_allclose(np.asarray(trace["estimate"]), golden, atol=1e-9)


def test_ekf_demo_batched_consistent():
    single = run_ekf_localization_demo(steps=50, noise_phase_offset=0.0)
    batched = run_ekf_localization_demo(
        steps=50, noise_phase_offset=jnp.array([0.0, 0.5, 1.0])
    )
    assert batched["estimate"].shape == (3, 50, 4)
    np.testing.assert_allclose(
        batched["estimate"][0], single["estimate"], atol=1e-12
    )
    other = run_ekf_localization_demo(steps=50, noise_phase_offset=0.5)
    np.testing.assert_allclose(batched["estimate"][1], other["estimate"], atol=1e-12)


def _tracking_rmse(filter_step, **kwargs):
    trace = run_ekf_localization_demo(steps=330, filter_step=filter_step, **kwargs)
    err = np.asarray(trace["estimate"][..., :2] - trace["truth"][..., :2])
    return float(np.sqrt(np.mean(err**2)))


def test_all_gaussian_filters_track_circle():
    # behavior check (reference inline-test style): every filter stays close
    # to truth under the demo noise; sigma-point filters agree with EKF on
    # this mildly nonlinear problem.
    rmse_ekf = _tracking_rmse(ekf_step)
    rmse_iekf = _tracking_rmse(lambda *a, **k: iekf_step(*a, **k))
    rmse_ukf = _tracking_rmse(ukf_step)
    rmse_ckf = _tracking_rmse(ckf_step)
    for rmse in (rmse_ekf, rmse_iekf, rmse_ukf, rmse_ckf):
        assert rmse < 0.5, rmse
    assert abs(rmse_ukf - rmse_ekf) < 0.05
    assert abs(rmse_ckf - rmse_ekf) < 0.05
    assert abs(rmse_iekf - rmse_ekf) < 0.05


def test_information_filter_matches_ekf_single_sensor():
    q, r = default_ekf_noise()
    model = unicycle_position_model()
    belief = GaussianBelief(jnp.array([10.0, 0.0, jnp.pi / 2, 0.0]), jnp.eye(4))
    z = jnp.array([10.1, 0.2])
    u = jnp.array([1.0, 0.1])
    via_ekf = ekf_step(belief, z, u, DT, q, r, model)
    via_if = information_step(belief, z[None, :], u, DT, q, r, model)
    np.testing.assert_allclose(via_if.mean, via_ekf.mean, atol=1e-10)
    np.testing.assert_allclose(via_if.cov, via_ekf.cov, atol=1e-10)


def test_information_filter_two_sensors_tightens():
    q, r = default_ekf_noise()
    belief = GaussianBelief(jnp.array([10.0, 0.0, jnp.pi / 2, 0.0]), jnp.eye(4))
    z = jnp.array([10.1, 0.2])
    u = jnp.array([1.0, 0.1])
    one = information_step(belief, z[None, :], u, DT, q, r)
    two = information_step(belief, jnp.stack([z, z]), u, DT, q, r)
    assert float(jnp.trace(two.cov)) < float(jnp.trace(one.cov))


def test_enkf_tracks_circle():
    q, r = default_ekf_noise()
    q_chol = jnp.linalg.cholesky(q)
    r_chol = jnp.linalg.cholesky(r)
    model = unicycle_position_model()
    key = jax.random.PRNGKey(7)
    e = 64
    ens = jnp.array([10.0, 0.0, jnp.pi / 2, 0.0]) + 0.1 * jax.random.normal(
        key, (e, 4)
    )

    def noise(k, scale, phase):
        return scale * jnp.sin(0.13 * k + phase) + 0.5 * scale * jnp.cos(
            0.07 * k + 1.3 * phase
        )

    truth = jnp.array([10.0, 0.0, jnp.pi / 2, 0.0])
    keys = jax.random.split(jax.random.PRNGKey(3), 330)

    def step(carry, inp):
        truth, ens = carry
        k, kk = inp
        x = truth[0] + jnp.cos(truth[2]) * DT
        y = truth[1] + jnp.sin(truth[2]) * DT
        yaw = truth[2] + 0.1 * DT
        truth = jnp.array([x, y, yaw, 1.0])
        u = jnp.array([1.0 + noise(k, 0.12, 0.2), 0.1 + noise(k, 0.04, 1.0)])
        z = jnp.array([x + noise(k, 0.6, 2.0), y + noise(k, 0.6, 2.7)])
        ens = enkf_step(ens, z, u, DT, q_chol, r_chol, kk, model)
        return (truth, ens), (truth, ensemble_statistics(ens).mean)

    (_, _), (truths, means) = jax.lax.scan(
        step, (truth, ens), (jnp.arange(330, dtype=jnp.float64), keys)
    )
    rmse = float(jnp.sqrt(jnp.mean((means[:, :2] - truths[:, :2]) ** 2)))
    assert rmse < 0.6, rmse


def test_ekf_differentiable_through_rollout():
    # end-to-end differentiability: grad of final position error w.r.t. the
    # process noise diagonal exists and is finite (new TPU-side capability,
    # absent in the reference — SURVEY.md §7.3 item 7).
    model = unicycle_position_model()

    def loss(q_diag):
        q = jnp.diag(q_diag)
        r = jnp.eye(2)
        belief = GaussianBelief(
            jnp.array([10.0, 0.0, jnp.pi / 2, 0.0]), jnp.eye(4)
        )

        def step(b, k):
            z = jnp.array([10.0, 0.1 * k])
            u = jnp.array([1.0, 0.1])
            b = ekf_step(b, z, u, DT, q, r, model)
            return b, None

        b, _ = jax.lax.scan(step, belief, jnp.arange(20.0))
        return jnp.sum(b.mean[:2] ** 2)

    g = jax.grad(loss)(jnp.array([0.01, 0.01, 0.001, 0.01]))
    assert np.all(np.isfinite(np.asarray(g)))
    assert float(jnp.linalg.norm(g)) > 0
