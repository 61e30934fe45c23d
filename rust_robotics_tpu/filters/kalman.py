"""Batched Kalman-filter family over a shared Gaussian belief.

Reference surface (crates/rust_robotics_localization/):
- EKF predict/update: ekf.rs:248-278 (predict FPFᵀ+Q; update via S⁻¹, gain
  K, covariance (I-KH)P).
- Iterated EKF: iterated_ekf.rs (re-linearize the update to convergence).
- UKF: unscented_kalman_filter.rs:172-190 (λ = α²(n+κ)−n weights; Cholesky
  sigma points :322-341; predict/update :443-541). Defaults α=0.001, β=2,
  κ=0 (:44-50).
- CKF: cubature_kalman_filter.rs:33-368 (3rd-degree spherical-radial rule,
  2n equally-weighted cubature points, no tuning parameters).
- Information filter: information_filter.rs (inverse-covariance dual with
  additive multi-sensor updates).
- Ensemble KF: ensemble_kalman_filter.rs (stochastic ensemble statistics).

TPU-native design: every filter is a pure function over `GaussianBelief`
pytrees whose leaves carry arbitrary leading batch dims — one call steps B
independent filters. All linear algebra is expressed on trailing (n×n) dims
so XLA batches it; n is tiny (4 for the demo problem) so the batched path is
VPU-bound elementwise/matmul fusion, which is exactly what the ≥10⁶
updates/s/chip target needs. Gains use `solve` on the innovation covariance
rather than an explicit inverse (same math as the reference's `try_inverse`,
better conditioned).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp

from rust_robotics_tpu.core.types import GaussianBelief
from rust_robotics_tpu.models.motion import unicycle_jacobian, unicycle_propagate
from rust_robotics_tpu.models.observation import position_jacobian, position_observe
from rust_robotics_tpu.ops.smallmat import (
    cholesky_small,
    inv_spd_small,
    solve_spd_small,
)


@dataclasses.dataclass(frozen=True)
class StateSpaceModel:
    """Static bundle of model callables (trace-time constants).

    propagate(state, control, dt) -> state'         [..., n]
    propagate_jacobian(state, control, dt) -> F     [..., n, n]
    observe(state) -> z_pred                        [..., k]
    observe_jacobian(state) -> H                    [..., k, n]

    `propagate_jacobian`/`observe_jacobian` may be None, in which case
    autodiff Jacobians are derived from the nonlinear maps.
    """

    propagate: Callable[..., Any]
    observe: Callable[..., Any]
    propagate_jacobian: Callable[..., Any] | None = None
    observe_jacobian: Callable[..., Any] | None = None

    def motion_jac(self, state, control, dt):
        if self.propagate_jacobian is not None:
            return self.propagate_jacobian(state, control, dt)
        flat = state.reshape((-1, state.shape[-1]))
        uflat = jnp.broadcast_to(control, state.shape[:-1] + control.shape[-1:])
        uflat = uflat.reshape((-1, control.shape[-1]))
        jac = jax.vmap(lambda s, u: jax.jacobian(self.propagate)(s, u, dt))(flat, uflat)
        return jac.reshape(state.shape + state.shape[-1:])

    def obs_jac(self, state):
        if self.observe_jacobian is not None:
            return self.observe_jacobian(state)
        flat = state.reshape((-1, state.shape[-1]))
        jac = jax.vmap(jax.jacobian(self.observe))(flat)
        return jac.reshape(state.shape[:-1] + jac.shape[-2:])


def unicycle_position_model() -> StateSpaceModel:
    """The reference's shared demo problem (ekf.rs:17-24, :203-245)."""
    return StateSpaceModel(
        propagate=unicycle_propagate,
        observe=position_observe,
        propagate_jacobian=unicycle_jacobian,
        observe_jacobian=position_jacobian,
    )


def _mT(a):
    return jnp.swapaxes(a, -1, -2)


def _sym_solve(s, b):
    """Solve s @ x = b for SPD s on trailing dims (batched). Closed-form for
    n <= 4 — generic linalg.solve on tiny batched matrices is catastrophic
    on TPU (minutes of compile, scalar-bound run)."""
    return solve_spd_small(s, b)


# ---------------------------------------------------------------------------
# EKF (ekf.rs:248-278)
# ---------------------------------------------------------------------------

def ekf_predict(belief: GaussianBelief, control, dt, q, model: StateSpaceModel):
    """Predict: x⁺ = f(x, u); P⁺ = F P Fᵀ + Q (Jacobian at predicted state,
    matching ekf.rs:318-321)."""
    x_pred = model.propagate(belief.mean, control, dt)
    f = model.motion_jac(x_pred, control, dt)
    p_pred = f @ belief.cov @ _mT(f) + q
    return GaussianBelief(x_pred, p_pred)


def ekf_update(belief: GaussianBelief, measurement, r, model: StateSpaceModel):
    """Update: y = z − h(x); S = H P Hᵀ + R; K = P Hᵀ S⁻¹;
    x ← x + K y; P ← (I − K H) P. (ekf.rs:255-276)."""
    h = model.obs_jac(belief.mean)
    z_pred = model.observe(belief.mean)
    y = measurement - z_pred
    pht = belief.cov @ _mT(h)
    s = h @ pht + r
    k = _mT(_sym_solve(s, _mT(pht)))
    mean = belief.mean + (k @ y[..., None])[..., 0]
    n = belief.mean.shape[-1]
    eye = jnp.eye(n, dtype=belief.cov.dtype)
    cov = (eye - k @ h) @ belief.cov
    return GaussianBelief(mean, cov)


def ekf_step(belief, measurement, control, dt, q, r, model=None):
    """Full estimate step (predict + update), the reference `estimate()`
    (ekf.rs:248). Batched over leading dims of every argument."""
    model = model or unicycle_position_model()
    pred = ekf_predict(belief, control, dt, q, model)
    return ekf_update(pred, measurement, r, model)


def ekf_step_with_innovation(belief, measurement, control, dt, q, r, model=None):
    """EKF step that also returns the innovation y and its covariance S —
    the sufficient statistics for the innovation likelihood (used by the
    adaptive NIS filter, adaptive_filter.rs:26-170, and by gradient-based
    noise identification)."""
    model = model or unicycle_position_model()
    pred = ekf_predict(belief, control, dt, q, model)
    h = model.obs_jac(pred.mean)
    y = measurement - model.observe(pred.mean)
    pht = pred.cov @ _mT(h)
    s = h @ pht + r
    k = _mT(_sym_solve(s, _mT(pht)))
    mean = pred.mean + (k @ y[..., None])[..., 0]
    n = pred.mean.shape[-1]
    cov = (jnp.eye(n, dtype=pred.cov.dtype) - k @ h) @ pred.cov
    return GaussianBelief(mean, cov), y, s


# ---------------------------------------------------------------------------
# Iterated EKF (iterated_ekf.rs)
# ---------------------------------------------------------------------------

def iekf_step(belief, measurement, control, dt, q, r, model=None, iterations: int = 5):
    """EKF with an iterated (Gauss-Newton) measurement update: re-linearize
    h around the running iterate (iterated_ekf.rs). Fixed iteration count for
    static shapes; the reference's convergence tolerance becomes an upper
    bound on iterations."""
    model = model or unicycle_position_model()
    pred = ekf_predict(belief, control, dt, q, model)
    x0, p = pred.mean, pred.cov

    def body(_, x):
        h = model.obs_jac(x)
        z_pred = model.observe(x)
        y = measurement - z_pred - (h @ (x0 - x)[..., None])[..., 0]
        pht = p @ _mT(h)
        s = h @ pht + r
        k = _mT(_sym_solve(s, _mT(pht)))
        return x0 + (k @ y[..., None])[..., 0]

    x = jax.lax.fori_loop(0, iterations, body, x0)
    h = model.obs_jac(x)
    pht = p @ _mT(h)
    s = h @ pht + r
    k = _mT(_sym_solve(s, _mT(pht)))
    n = x.shape[-1]
    cov = (jnp.eye(n, dtype=p.dtype) - k @ h) @ p
    return GaussianBelief(x, cov)


# ---------------------------------------------------------------------------
# UKF (unscented_kalman_filter.rs)
# ---------------------------------------------------------------------------

def ukf_weights(n: int, alpha=1e-3, beta=2.0, kappa=0.0, dtype=jnp.float32):
    """Sigma weights (unscented_kalman_filter.rs:172-190)."""
    lam = alpha**2 * (n + kappa) - n
    scale = n + lam
    wm = jnp.full((2 * n + 1,), 1.0 / (2.0 * scale), dtype=dtype)
    wc = wm
    wm = wm.at[0].set(lam / scale)
    wc = wc.at[0].set(lam / scale + (1.0 - alpha**2 + beta))
    gamma = jnp.sqrt(jnp.asarray(scale, dtype=dtype))
    return wm, wc, gamma


def _sigma_points(mean, cov, gamma):
    """2n+1 sigma points via Cholesky of P (ukf :322-341). [..., 2n+1, n]."""
    n = mean.shape[-1]
    chol = cholesky_small(cov)  # lower
    offsets = gamma * _mT(chol)  # rows are gamma * column_i(L)
    center = mean[..., None, :]
    return jnp.concatenate(
        [center, center + offsets, center - offsets], axis=-2
    )


def ukf_step(belief, measurement, control, dt, q, r, model=None,
             alpha=1e-3, beta=2.0, kappa=0.0):
    """Full UKF predict + update (ukf :443-541), batched."""
    model = model or unicycle_position_model()
    n = belief.mean.shape[-1]
    wm, wc, gamma = ukf_weights(n, alpha, beta, kappa, dtype=belief.mean.dtype)

    # Predict
    sig = _sigma_points(belief.mean, belief.cov, gamma)
    sig_prop = model.propagate(sig, control[..., None, :], dt)
    x_pred = jnp.einsum("i,...in->...n", wm, sig_prop)
    dx = sig_prop - x_pred[..., None, :]
    p_pred = jnp.einsum("i,...in,...im->...nm", wc, dx, dx) + q

    # Update: redraw sigma points around the predicted belief (matches the
    # reference, which re-generates sigma points for the update pass).
    sig_u = _sigma_points(x_pred, p_pred, gamma)
    z_sig = model.observe(sig_u)
    z_pred = jnp.einsum("i,...ik->...k", wm, z_sig)
    dz = z_sig - z_pred[..., None, :]
    s = jnp.einsum("i,...ik,...il->...kl", wc, dz, dz) + r
    dxu = sig_u - x_pred[..., None, :]
    pxz = jnp.einsum("i,...in,...ik->...nk", wc, dxu, dz)
    k_gain = _mT(_sym_solve(s, _mT(pxz)))
    y = measurement - z_pred
    mean = x_pred + (k_gain @ y[..., None])[..., 0]
    cov = p_pred - k_gain @ s @ _mT(k_gain)
    return GaussianBelief(mean, cov)


# ---------------------------------------------------------------------------
# CKF (cubature_kalman_filter.rs:33-368)
# ---------------------------------------------------------------------------

def ckf_step(belief, measurement, control, dt, q, r, model=None):
    """Cubature KF: 2n equally-weighted points at ±√n·L columns; zero tuning
    parameters (cubature_kalman_filter.rs:176-182)."""
    model = model or unicycle_position_model()
    n = belief.mean.shape[-1]
    sqrt_n = jnp.sqrt(jnp.asarray(float(n), dtype=belief.mean.dtype))

    def cubature(mean, cov):
        chol = cholesky_small(cov)
        offsets = sqrt_n * _mT(chol)
        center = mean[..., None, :]
        return jnp.concatenate([center + offsets, center - offsets], axis=-2)

    # Predict
    pts = cubature(belief.mean, belief.cov)
    pts_prop = model.propagate(pts, control[..., None, :], dt)
    x_pred = jnp.mean(pts_prop, axis=-2)
    dx = pts_prop - x_pred[..., None, :]
    p_pred = jnp.einsum("...in,...im->...nm", dx, dx) / (2 * n) + q

    # Update
    pts_u = cubature(x_pred, p_pred)
    z_pts = model.observe(pts_u)
    z_pred = jnp.mean(z_pts, axis=-2)
    dz = z_pts - z_pred[..., None, :]
    s = jnp.einsum("...ik,...il->...kl", dz, dz) / (2 * n) + r
    dxu = pts_u - x_pred[..., None, :]
    pxz = jnp.einsum("...in,...ik->...nk", dxu, dz) / (2 * n)
    k_gain = _mT(_sym_solve(s, _mT(pxz)))
    y = measurement - z_pred
    mean = x_pred + (k_gain @ y[..., None])[..., 0]
    cov = p_pred - k_gain @ s @ _mT(k_gain)
    return GaussianBelief(mean, cov)


# ---------------------------------------------------------------------------
# Information filter (information_filter.rs)
# ---------------------------------------------------------------------------

def information_step(belief, measurements, control, dt, q, r, model=None):
    """Information-form update: Λ ← Λ_pred + Σ_s Hᵀ R⁻¹ H, additive over a
    stacked sensor axis (information_filter.rs multi-sensor update).

    `measurements` has shape [..., S, k] for S sensors (S may be 1).
    """
    model = model or unicycle_position_model()
    pred = ekf_predict(belief, control, dt, q, model)
    lam = inv_spd_small(pred.cov)
    eta = (lam @ pred.mean[..., None])[..., 0]
    h = model.obs_jac(pred.mean)
    z_pred = model.observe(pred.mean)
    r_inv = inv_spd_small(r)
    ht_rinv = _mT(h) @ r_inv

    def add_sensor(carry, z):
        lam_c, eta_c = carry
        y = z - z_pred + (h @ pred.mean[..., None])[..., 0]
        lam_c = lam_c + ht_rinv @ h
        eta_c = eta_c + (ht_rinv @ y[..., None])[..., 0]
        return (lam_c, eta_c), None

    zs = jnp.moveaxis(measurements, -2, 0)
    (lam, eta), _ = jax.lax.scan(add_sensor, (lam, eta), zs)
    cov = inv_spd_small(lam)
    mean = (cov @ eta[..., None])[..., 0]
    return GaussianBelief(mean, cov)


# ---------------------------------------------------------------------------
# Ensemble KF (ensemble_kalman_filter.rs)
# ---------------------------------------------------------------------------

def enkf_step(ensemble, measurement, control, dt, q_chol, r_chol, key, model=None):
    """Stochastic EnKF over an ensemble [..., E, n]: propagate members with
    sampled process noise, update with perturbed observations using ensemble
    cross-covariances (ensemble_kalman_filter.rs).

    Returns the updated ensemble (mean/cov are derived statistics).
    """
    model = model or unicycle_position_model()
    e = ensemble.shape[-2]
    k_proc, k_obs = jax.random.split(key)
    w = jax.random.normal(k_proc, ensemble.shape, dtype=ensemble.dtype)
    prop = model.propagate(ensemble, control[..., None, :], dt)
    prop = prop + jnp.einsum("...en,nm->...em", w, _mT(q_chol))
    z_pred = model.observe(prop)
    v = jax.random.normal(
        k_obs, z_pred.shape, dtype=ensemble.dtype
    )
    z_perturbed = measurement[..., None, :] + jnp.einsum(
        "...ek,kl->...el", v, _mT(r_chol)
    )
    x_mean = jnp.mean(prop, axis=-2, keepdims=True)
    z_mean = jnp.mean(z_pred, axis=-2, keepdims=True)
    dx = prop - x_mean
    dz = z_pred - z_mean
    pxz = jnp.einsum("...en,...ek->...nk", dx, dz) / (e - 1)
    pzz = jnp.einsum("...ek,...el->...kl", dz, dz) / (e - 1) + r_chol @ _mT(r_chol)
    k_gain = _mT(_sym_solve(pzz, _mT(pxz)))
    innov = z_perturbed - z_pred
    return prop + jnp.einsum("...nk,...ek->...en", k_gain, innov)


def ensemble_statistics(ensemble):
    """Ensemble [..., E, n] -> GaussianBelief (mean + sample covariance)."""
    e = ensemble.shape[-2]
    mean = jnp.mean(ensemble, axis=-2)
    d = ensemble - mean[..., None, :]
    cov = jnp.einsum("...en,...em->...nm", d, d) / (e - 1)
    return GaussianBelief(mean, cov)
