"""Complementary / histogram / SR-UKF / adaptive filter tests."""

import jax
import jax.numpy as jnp
import numpy as np

from rust_robotics_tpu.core.types import GaussianBelief
from rust_robotics_tpu.demos.ekf_localization import default_ekf_noise
from rust_robotics_tpu.filters.extra import (
    AdaptiveConfig,
    HistogramConfig,
    adaptive_step,
    complementary_step,
    histogram_estimate,
    histogram_init,
    histogram_predict,
    histogram_update_ranges,
    sr_ukf_step,
)
from rust_robotics_tpu.filters.kalman import ukf_step


def test_complementary_blend():
    state = jnp.array([0.0, 0.0, 0.0, 1.0])
    z = jnp.array([1.0, 1.0])
    out = complementary_step(state, z, jnp.array([1.0, 0.0]), 0.1, alpha=0.5)
    # prediction moves x to 0.1; blend with z=(1,1) at 0.5
    np.testing.assert_allclose(out[:2], [0.55, 0.5], atol=1e-12)
    pure_pred = complementary_step(state, z, jnp.array([1.0, 0.0]), 0.1, alpha=1.0)
    np.testing.assert_allclose(pure_pred[:2], [0.1, 0.0], atol=1e-12)


def test_histogram_filter_localizes():
    cfg = HistogramConfig()
    landmarks = jnp.array([[5.0, 5.0], [-5.0, 5.0], [0.0, -5.0]])
    truth = np.array([2.0, 1.0])
    belief = histogram_init(cfg)
    rng = np.random.default_rng(0)
    for _ in range(10):
        d = np.linalg.norm(np.asarray(landmarks) - truth, axis=-1)
        z = jnp.asarray(d + 0.1 * rng.standard_normal(3))
        belief = histogram_update_ranges(belief, z, landmarks, cfg)
        belief = histogram_predict(belief, jnp.zeros(2), cfg)
    est = np.asarray(histogram_estimate(belief, cfg))
    assert np.linalg.norm(est - truth) < 0.5, est


def test_histogram_predict_shifts():
    cfg = HistogramConfig(motion_noise_kernel=1)
    belief = jnp.zeros((cfg.width, cfg.height)).at[40, 40].set(1.0)
    moved = histogram_predict(belief, jnp.array([1.0, -0.5]), cfg)
    idx = np.unravel_index(np.argmax(np.asarray(moved)), moved.shape)
    assert idx == (42, 39)


def test_sr_ukf_matches_ukf():
    q, r = default_ekf_noise()
    belief = GaussianBelief(jnp.array([10.0, 0.0, jnp.pi / 2, 0.0]), jnp.eye(4))
    z = jnp.array([10.1, 0.2])
    u = jnp.array([1.0, 0.1])
    ref = ukf_step(belief, z, u, 0.1, q, r)
    mean, sqrt_cov = sr_ukf_step(
        belief.mean, jnp.linalg.cholesky(belief.cov), z, u, 0.1,
        jnp.linalg.cholesky(q), jnp.linalg.cholesky(r),
    )
    np.testing.assert_allclose(mean, ref.mean, atol=1e-8)
    np.testing.assert_allclose(sqrt_cov @ sqrt_cov.T, ref.cov, atol=1e-8)


def test_sr_ukf_long_run_stays_pd():
    q, r = default_ekf_noise()
    qc, rc = jnp.linalg.cholesky(q), jnp.linalg.cholesky(r)
    mean = jnp.array([10.0, 0.0, jnp.pi / 2, 0.0])
    s = jnp.eye(4)

    def step(carry, k):
        mean, s = carry
        z = mean[:2] + 0.1 * jnp.sin(k)
        mean, s = sr_ukf_step(mean, s, z, jnp.array([1.0, 0.1]), 0.1, qc, rc)
        return (mean, s), jnp.diagonal(s)

    (_, _), diags = jax.lax.scan(step, (mean, s), jnp.arange(300.0))
    assert np.all(np.isfinite(np.asarray(diags)))
    assert np.all(np.asarray(diags) > 0)  # factor stays PD


def test_adaptive_switches_on_large_innovation():
    q, r = default_ekf_noise()
    belief = GaussianBelief(jnp.array([0.0, 0.0, 0.0, 0.0]), jnp.eye(4))
    u = jnp.array([1.0, 0.0])
    use_ckf = jnp.asarray(False)
    # consistent measurement: stays EKF
    b1, use1, nis1 = adaptive_step(belief, use_ckf, jnp.array([0.1, 0.0]), u, 0.1, q, r)
    assert not bool(use1)
    # wild measurement: switches to CKF
    b2, use2, nis2 = adaptive_step(belief, use_ckf, jnp.array([50.0, -30.0]), u, 0.1, q, r)
    assert bool(use2)
    assert float(nis2) > float(nis1)
