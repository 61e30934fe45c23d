"""Remaining localizer family: complementary, histogram, square-root UKF,
adaptive EKF/CKF.

Reference (crates/rust_robotics_localization/src/):
- complementary_filter.rs — α-blend of prediction and measurement
  (α=0.98 default, :25-40; α=1 pure prediction).
- histogram_filter.rs — grid-based Bayes over a 2D grid with RFID landmark
  range likelihoods (432 LoC; own GridMap).
- square_root_ukf.rs — propagates Cholesky factors with manual 4×4/2×2
  Cholesky + rank-1 updates (:114-407).
- adaptive_filter.rs — NIS χ² test switches EKF↔CKF (:26-170).

TPU-native: the histogram filter is a pure raster program (motion = shift
+ diffusion convolution; measurement = elementwise likelihood product);
SR-UKF uses QR on the stacked weighted deviations (the numerically stable
TPU form of the reference's sequence of rank-1 updates); the adaptive
filter computes BOTH candidate filters batched and selects per-element
(branchless — on TPU compute-both-and-select beats divergent control flow).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from rust_robotics_tpu.core.types import GaussianBelief
from rust_robotics_tpu.filters.kalman import (
    ckf_step,
    ekf_step_with_innovation,
    ukf_weights,
    unicycle_position_model,
)
from rust_robotics_tpu.ops.smallmat import cholesky_small, solve_spd_small


# ---------------------------------------------------------------------------
# Complementary filter (complementary_filter.rs)
# ---------------------------------------------------------------------------

def complementary_step(state, measurement, control, dt, alpha=0.98,
                       model=None):
    """x ← α·f(x, u) + (1−α)·z_lift, where z_lift replaces the measured
    components (position) of the prediction (complementary_filter.rs)."""
    model = model or unicycle_position_model()
    pred = model.propagate(state, control, dt)
    blended_xy = alpha * pred[..., :2] + (1.0 - alpha) * measurement
    return jnp.concatenate([blended_xy, pred[..., 2:]], axis=-1)


# ---------------------------------------------------------------------------
# Histogram filter (histogram_filter.rs)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class HistogramConfig:
    min_x: float = -10.0
    min_y: float = -10.0
    resolution: float = 0.5
    width: int = 80
    height: int = 80
    motion_noise_kernel: int = 3  # odd; discrete diffusion width
    range_sigma: float = 1.0


def histogram_init(cfg: HistogramConfig, dtype=jnp.float32):
    """Uniform belief raster [W, H]."""
    p = jnp.ones((cfg.width, cfg.height), dtype)
    return p / jnp.sum(p)


def histogram_predict(belief, du_xy, cfg: HistogramConfig):
    """Shift the raster by the (rounded) motion and diffuse with a small
    box kernel (histogram_filter.rs motion update)."""
    shift = jnp.round(jnp.asarray(du_xy) / cfg.resolution).astype(jnp.int32)
    rolled = jnp.roll(belief, (shift[0], shift[1]), axis=(0, 1))
    k = cfg.motion_noise_kernel
    kernel = jnp.ones((k, k), belief.dtype) / (k * k)
    out = jax.scipy.signal.convolve2d(rolled, kernel, mode="same")
    return out / jnp.clip(jnp.sum(out), 1e-30, None)


def histogram_update_ranges(belief, observed_ranges, landmarks,
                            cfg: HistogramConfig):
    """Multiply per-cell Gaussian range likelihoods to each landmark
    (histogram_filter.rs RFID observation update)."""
    xs = cfg.min_x + cfg.resolution * (jnp.arange(cfg.width) + 0.5)
    ys = cfg.min_y + cfg.resolution * (jnp.arange(cfg.height) + 0.5)
    cx = xs[:, None, None]
    cy = ys[None, :, None]
    d = jnp.sqrt(
        (cx - landmarks[:, 0]) ** 2 + (cy - landmarks[:, 1]) ** 2
    )  # [W, H, L]
    ll = -0.5 * ((d - observed_ranges) / cfg.range_sigma) ** 2
    belief = belief * jnp.exp(jnp.sum(ll, axis=-1))
    return belief / jnp.clip(jnp.sum(belief), 1e-30, None)


def histogram_estimate(belief, cfg: HistogramConfig):
    """Probability-weighted mean position."""
    xs = cfg.min_x + cfg.resolution * (jnp.arange(cfg.width) + 0.5)
    ys = cfg.min_y + cfg.resolution * (jnp.arange(cfg.height) + 0.5)
    px = jnp.sum(belief, axis=1)
    py = jnp.sum(belief, axis=0)
    return jnp.stack([jnp.sum(px * xs), jnp.sum(py * ys)])


# ---------------------------------------------------------------------------
# Square-root UKF (square_root_ukf.rs)
# ---------------------------------------------------------------------------

def _qr_sqrt(weighted_dev, noise_chol):
    """Upper-triangular sqrt factor of Σ wᵢ dᵢdᵢᵀ + N via QR of the stacked
    [dev; cholᵀ] matrix (the stable aggregate of the reference's rank-1
    update sequence, square_root_ukf.rs:114-407)."""
    stacked = jnp.concatenate([weighted_dev, noise_chol.T], axis=-2)
    r = jnp.linalg.qr(stacked, mode="r")
    return r  # upper triangular, S = rᵀ r


def _sqrt_factor(wc, dev, noise_chol):
    """Sqrt factor of Σᵢ wc_i d_i d_iᵀ + N. The center weight wc[0] is
    negative for the standard α: QR covers the positive-weight points and
    the center term applies as a signed rank-1 re-factorization (the
    reference's cholupdate/downdate pair)."""
    w_pos = jnp.sqrt(wc[1:])[..., :, None]
    r = _qr_sqrt(w_pos * dev[..., 1:, :], noise_chol)
    s = jnp.swapaxes(r, -1, -2) @ r
    v = dev[..., 0, :]
    s = s + wc[0] * v[..., :, None] * v[..., None, :]
    n = s.shape[-1]
    s = 0.5 * (s + jnp.swapaxes(s, -1, -2)) + 1e-14 * jnp.eye(n, dtype=s.dtype)
    return cholesky_small(s)  # lower factor


def sr_ukf_step(mean, sqrt_cov, measurement, control, dt, q_chol, r_chol,
                model=None, alpha=1e-3, beta=2.0, kappa=0.0):
    """Square-root UKF step carrying the Cholesky factor of P.

    mean [..., n]; sqrt_cov [..., n, n] LOWER factor (P = L Lᵀ). Returns
    (mean, sqrt_cov) — never forms P, so positive-definiteness cannot be
    lost to round-off (the motivation of square_root_ukf.rs).
    """
    model = model or unicycle_position_model()
    n = mean.shape[-1]
    wm, wc, gamma = ukf_weights(n, alpha, beta, kappa, dtype=mean.dtype)
    # sigma points from the carried factor directly
    offsets = gamma * jnp.swapaxes(sqrt_cov, -1, -2)
    center = mean[..., None, :]
    sig = jnp.concatenate([center, center + offsets, center - offsets], axis=-2)
    sig_prop = model.propagate(sig, control[..., None, :], dt)
    x_pred = jnp.einsum("i,...in->...n", wm, sig_prop)
    dev = sig_prop - x_pred[..., None, :]
    s_pred = _sqrt_factor(wc, dev, q_chol)  # lower, [n, n]

    # measurement update with re-drawn sigma points from s_pred
    offsets_u = gamma * jnp.swapaxes(s_pred, -1, -2)
    center = x_pred[..., None, :]
    sig_u = jnp.concatenate(
        [center, center + offsets_u, center - offsets_u], axis=-2
    )
    z_sig = model.observe(sig_u)
    z_pred = jnp.einsum("i,...ik->...k", wm, z_sig)
    dz = z_sig - z_pred[..., None, :]
    s_z_l = _sqrt_factor(wc, dz, r_chol)
    dxu = sig_u - x_pred[..., None, :]
    pxz = jnp.einsum("i,...in,...ik->...nk", wc, dxu, dz)
    s_z = s_z_l @ jnp.swapaxes(s_z_l, -1, -2)
    k_gain = jnp.swapaxes(solve_spd_small(s_z, jnp.swapaxes(pxz, -1, -2)), -1, -2)
    y = measurement - z_pred
    new_mean = x_pred + (k_gain @ y[..., None])[..., 0]
    # posterior factor via signed re-factorization of P⁻ − K S_z Kᵀ
    p_pred = s_pred @ jnp.swapaxes(s_pred, -1, -2)
    p_new = p_pred - k_gain @ s_z @ jnp.swapaxes(k_gain, -1, -2)
    new_sqrt = cholesky_small(
        0.5 * (p_new + jnp.swapaxes(p_new, -1, -2))
        + 1e-12 * jnp.eye(n, dtype=mean.dtype)
    )
    return new_mean, new_sqrt


# ---------------------------------------------------------------------------
# Adaptive EKF/CKF (adaptive_filter.rs:26-170)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class AdaptiveConfig:
    nis_upper: float = 9.21  # χ²(2) 99% — switch to CKF above
    nis_lower: float = 4.61  # χ²(2) 90% — switch back to EKF below


def adaptive_step(belief, use_ckf, measurement, control, dt, q, r,
                  model=None, cfg: AdaptiveConfig = AdaptiveConfig()):
    """Run EKF with innovation NIS; hysteresis-switch to CKF when NIS is
    high (adaptive_filter.rs): returns (belief, use_ckf_next, nis).

    Branchless: both filters evaluate, selection is a where — the TPU
    version of the reference's enum switch.
    """
    model = model or unicycle_position_model()
    ekf_belief, y, s = ekf_step_with_innovation(
        belief, measurement, control, dt, q, r, model
    )
    nis = jnp.einsum(
        "...i,...i->...", y, solve_spd_small(s, y[..., None])[..., 0]
    )
    ckf_belief = ckf_step(belief, measurement, control, dt, q, r, model)
    sel = use_ckf[..., None] if use_ckf.ndim < ekf_belief.mean.ndim else use_ckf
    mean = jnp.where(sel, ckf_belief.mean, ekf_belief.mean)
    cov = jnp.where(
        sel[..., None] if sel.ndim < ekf_belief.cov.ndim else sel,
        ckf_belief.cov,
        ekf_belief.cov,
    )
    next_use = jnp.where(
        nis > cfg.nis_upper,
        True,
        jnp.where(nis < cfg.nis_lower, False, use_ckf),
    )
    return GaussianBelief(mean, cov), next_use, nis
