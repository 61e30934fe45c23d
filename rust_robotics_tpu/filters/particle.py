"""Batched particle filter / Monte-Carlo localization.

Reference surface (crates/rust_robotics_localization/):
- particle_filter.rs:26-495 — per-particle noisy unicycle prediction
  (:280-296), range-to-landmark Gaussian likelihood weighting (:310-336,
  gauss_likelihood :480), N_eff-triggered resampling (:337-345, :416-425),
  cumulative-weight resampling (:442-478; the reference draws i.i.d.
  uniforms, i.e. *multinomial* despite its "systematic" name — SURVEY.md
  §2.3 note). Weighted mean/covariance estimates (:385-410).
- monte_carlo_localization.rs:29-330 — MCL with KLD-sampling adaptive
  particle counts (:322).

TPU-native design: particles are a struct-of-arrays pytree
[..., P, state_dim] with normalized weights [..., P]; every op is pure and
batched over leading dims (B filter banks × P particles in one program).
Resampling is a vectorized inverse-CDF: cumulative weights + searchsorted —
O(P log P) with no host sync, vmappable, and shardable over the particle
axis. True systematic resampling (single stratified uniform) is the default;
`multinomial_resample` reproduces the reference's i.i.d. draw behavior.
KLD adaptivity (MCL) becomes an *active-particle mask* over a fixed
capacity, keeping shapes static (SURVEY.md §7.3 item 3).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from rust_robotics_tpu.core.types import GaussianBelief, pytree_dataclass
from rust_robotics_tpu.models.motion import unicycle_propagate


@pytree_dataclass
class ParticleBelief:
    """states [..., P, n]; weights [..., P] (normalized, sum to 1)."""

    states: Any
    weights: Any

    @property
    def num_particles(self) -> int:
        return self.states.shape[-2]


def init_particles(key, mean, spread, num_particles, weights_dtype=None):
    """Gaussian cloud around `mean` [..., n] with per-dim std `spread`."""
    n = mean.shape[-1]
    noise = jax.random.normal(
        key, mean.shape[:-1] + (num_particles, n), dtype=mean.dtype
    )
    states = mean[..., None, :] + noise * spread
    w = jnp.full(mean.shape[:-1] + (num_particles,), 1.0 / num_particles,
                 dtype=weights_dtype or mean.dtype)
    return ParticleBelief(states, w)


def pf_predict(belief, control, dt, control_noise_std, key):
    """Per-particle prediction with noisy control (particle_filter.rs:280-296):
    each particle draws its own (v, omega) perturbation, then unicycle-steps.
    `control_noise_std` is [2] (std of v and yaw-rate noise)."""
    p = belief.num_particles
    noise = jax.random.normal(
        key, belief.states.shape[:-1] + (2,), dtype=belief.states.dtype
    )
    u = control[..., None, :] + noise * control_noise_std
    states = unicycle_propagate(belief.states, u, dt)
    return ParticleBelief(states, belief.weights)


def gauss_likelihood(x, sigma):
    """1/sqrt(2π σ²) · exp(−x²/(2σ²)) (particle_filter.rs:480)."""
    coeff = 1.0 / jnp.sqrt(2.0 * jnp.pi * sigma**2)
    return coeff * jnp.exp(-(x**2) / (2.0 * sigma**2))


def pf_update_ranges(belief, observed_ranges, landmarks, range_noise,
                     landmark_mask=None):
    """Weight update from range observations to known landmarks
    (particle_filter.rs:310-336): w_i = Π_l N(d_obs_l − d_pred_il; σ).

    observed_ranges [..., L]; landmarks [L, 2]; optional landmark_mask [..., L]
    marks which landmarks are observed this step (fixed L capacity).
    Computed in log space, then normalized (reference multiplies raw
    densities then normalizes — identical result, better conditioned).
    """
    d = belief.states[..., :, None, :2] - landmarks  # [..., P, L, 2]
    d_pred = jnp.linalg.norm(d, axis=-1)  # [..., P, L]
    diff = observed_ranges[..., None, :] - d_pred
    log_lik = (
        -(diff**2) / (2.0 * range_noise**2)
        - 0.5 * jnp.log(2.0 * jnp.pi * range_noise**2)
    )
    if landmark_mask is not None:
        log_lik = log_lik * landmark_mask[..., None, :]
    log_w = jnp.log(jnp.clip(belief.weights, 1e-300, None)) + jnp.sum(
        log_lik, axis=-1
    )
    log_w = log_w - jax.scipy.special.logsumexp(log_w, axis=-1, keepdims=True)
    return ParticleBelief(belief.states, jnp.exp(log_w))


def effective_particles(weights):
    """N_eff = 1 / Σ w² (particle_filter.rs:416-425)."""
    return 1.0 / jnp.clip(jnp.sum(weights**2, axis=-1), 1e-300, None)


def systematic_resample(key, weights):
    """True systematic (stratified single-uniform) resampling.

    positions_i = (i + u)/P with one u ~ U[0,1); indices via inverse CDF.
    Returns parent indices [..., P]. Fully vectorized: cumsum + searchsorted,
    no host sync, vmapped over leading batch dims.
    """
    p = weights.shape[-1]
    u = jax.random.uniform(key, weights.shape[:-1] + (1,), dtype=weights.dtype)
    positions = (jnp.arange(p, dtype=weights.dtype) + u) / p
    cum = jnp.cumsum(weights, axis=-1)
    cum = cum / cum[..., -1:]  # guard against round-off
    find = lambda c, pos: jnp.searchsorted(c, pos, side="left")
    for _ in range(weights.ndim - 1):
        find = jax.vmap(find)
    return jnp.clip(find(cum, positions), 0, p - 1)


def multinomial_resample(key, weights):
    """The reference's actual scheme (particle_filter.rs:442-478): P i.i.d.
    uniforms through the inverse CDF."""
    p = weights.shape[-1]
    u = jax.random.uniform(key, weights.shape[:-1] + (p,), dtype=weights.dtype)
    cum = jnp.cumsum(weights, axis=-1)
    cum = cum / cum[..., -1:]
    find = lambda c, pos: jnp.searchsorted(c, pos, side="left")
    for _ in range(weights.ndim - 1):
        find = jax.vmap(find)
    return jnp.clip(find(cum, u), 0, p - 1)


def resample_if_needed(belief, key, threshold_frac=0.5, method=systematic_resample):
    """Resample when N_eff < threshold_frac · P (particle_filter.rs:337-345).

    Branchless: always computes parent indices, then selects between the
    resampled and original cloud per batch element — on TPU this is cheaper
    than divergent control flow and keeps the op batched.
    """
    p = belief.num_particles
    n_eff = effective_particles(belief.weights)
    need = n_eff < threshold_frac * p
    idx = method(key, belief.weights)
    resampled = jnp.take_along_axis(
        belief.states, idx[..., None], axis=-2
    )
    uniform = jnp.full_like(belief.weights, 1.0 / p)
    states = jnp.where(need[..., None, None], resampled, belief.states)
    weights = jnp.where(need[..., None], uniform, belief.weights)
    return ParticleBelief(states, weights)


def pf_estimate(belief):
    """Weighted mean + covariance (particle_filter.rs:385-410)."""
    mean = jnp.einsum("...p,...pn->...n", belief.weights, belief.states)
    d = belief.states - mean[..., None, :]
    cov = jnp.einsum("...p,...pn,...pm->...nm", belief.weights, d, d)
    return GaussianBelief(mean, cov)


def pf_step(belief, control, observed_ranges, landmarks, dt, key,
            control_noise_std, range_noise, resample_threshold=0.5,
            method=systematic_resample, landmark_mask=None):
    """Full step: predict → weight → maybe-resample → estimate
    (particle_filter.rs try_step :468-478). Returns (belief, GaussianBelief)."""
    k_pred, k_res = jax.random.split(key)
    belief = pf_predict(belief, control, dt, control_noise_std, k_pred)
    belief = pf_update_ranges(
        belief, observed_ranges, landmarks, range_noise, landmark_mask
    )
    belief = resample_if_needed(belief, k_res, resample_threshold, method)
    return belief, pf_estimate(belief)


# ---------------------------------------------------------------------------
# KLD-adaptive MCL (monte_carlo_localization.rs:29-330)
# ---------------------------------------------------------------------------

def kld_required_particles(states, active_mask, grid_res, kld_epsilon=0.05,
                           kld_z=2.326, max_particles=None):
    """KLD-sampling bound on the particle count (:322): with k occupied bins,
    n ≥ (k−1)/(2ε) · (1 − 2/(9(k−1)) + sqrt(2/(9(k−1))) z)³.

    Bin occupancy is estimated over a hashed (x, y, yaw) grid with fixed
    resolution; `active_mask` selects live particles (static-capacity
    version of the reference's growing particle vector).
    """
    xy = states[..., :2]
    yaw = states[..., 2]
    cells = jnp.concatenate(
        [jnp.floor(xy / grid_res[0]), jnp.floor(yaw[..., None] / grid_res[1])],
        axis=-1,
    ).astype(jnp.int64)
    # hash bins; count distinct among active particles via sort
    h = (
        cells[..., 0] * 73856093
        ^ cells[..., 1] * 19349663
        ^ cells[..., 2] * 83492791
    )
    big = jnp.iinfo(jnp.int64).max
    h = jnp.where(active_mask, h, big)
    hs = jnp.sort(h, axis=-1)
    distinct = jnp.sum(
        (hs[..., 1:] != hs[..., :-1]) & (hs[..., 1:] != big), axis=-1
    ) + jnp.any(active_mask, axis=-1).astype(jnp.int64)
    k = jnp.maximum(distinct, 2).astype(states.dtype)
    km1 = k - 1.0
    term = 1.0 - 2.0 / (9.0 * km1) + jnp.sqrt(2.0 / (9.0 * km1)) * kld_z
    n = km1 / (2.0 * kld_epsilon) * term**3
    n = jnp.ceil(n).astype(jnp.int32)
    # k ≤ 1 occupied bin → the caller's min_particles floor applies
    # (monte_carlo_localization.rs:368-370 returns min_particles there)
    n = jnp.where(distinct <= 1, 1, n)
    if max_particles is not None:
        n = jnp.clip(n, 1, max_particles)
    return n


def mcl_step(belief, active_mask, control, observed_ranges, landmarks, dt, key,
             control_noise_std, range_noise, grid_res=(0.5, 0.2617993877991494),
             kld_epsilon=0.05, kld_z=2.326, min_particles=64):
    """MCL step with KLD-adaptive *active count* over fixed capacity.

    The reference reallocates its particle vector to the KLD bound
    (monte_carlo_localization.rs:322); here capacity P is static and the KLD
    bound masks how many slots are live — resampling always fills all P
    slots but only the first `n_active` carry weight.
    Returns (belief, active_mask, estimate, n_active).
    """
    p = belief.num_particles
    k_pred, k_res = jax.random.split(key)
    belief = pf_predict(belief, control, dt, control_noise_std, k_pred)
    belief = pf_update_ranges(belief, observed_ranges, landmarks, range_noise)
    # weight only active slots
    w = jnp.where(active_mask, belief.weights, 0.0)
    w = w / jnp.clip(jnp.sum(w, axis=-1, keepdims=True), 1e-300, None)
    belief = ParticleBelief(belief.states, w)

    n_req = kld_required_particles(
        belief.states, active_mask, grid_res, kld_epsilon, kld_z, p
    )
    n_active = jnp.clip(n_req, min_particles, p)

    idx = systematic_resample(k_res, belief.weights)
    states = jnp.take_along_axis(belief.states, idx[..., None], axis=-2)
    slot = jnp.arange(p)
    new_mask = slot < n_active[..., None] if n_active.ndim else slot < n_active
    wts = jnp.where(new_mask, 1.0, 0.0)
    wts = wts / jnp.sum(wts, axis=-1, keepdims=True)
    new_belief = ParticleBelief(states, wts.astype(belief.weights.dtype))
    return new_belief, new_mask, pf_estimate(new_belief), n_active


def resample_if_needed_pallas(belief, key, threshold_frac=0.5):
    """resample_if_needed on the fused Pallas kernel
    (ops/resample_pallas.py): normalization, N_eff, the stratified
    inverse-CDF search, and the particle gather run in one VMEM-resident
    kernel (MXU prefix sum + one-hot gather matmul). Semantics match
    `resample_if_needed(..., method=systematic_resample)` up to an
    off-by-one index at CDF boundaries (~5e-5 of draws at P=1024, a
    statistically equivalent stratified draw).

    belief.states must be [B, P, n] (one leading batch dim)."""
    from rust_robotics_tpu.ops.resample_pallas import (
        systematic_resample_gather)

    b, p, n = belief.states.shape
    u = jax.random.uniform(key, (b,), belief.weights.dtype)
    states_dp = jnp.swapaxes(belief.states, -1, -2)  # [B, n, P]
    new_dp, _, neff = systematic_resample_gather(
        belief.weights, u, states_dp)
    need = neff < threshold_frac * p
    states = jnp.where(need[:, None, None],
                       jnp.swapaxes(new_dp, -1, -2), belief.states)
    uniform = jnp.full_like(belief.weights, 1.0 / p)
    weights = jnp.where(need[:, None], uniform, belief.weights)
    return ParticleBelief(states, weights)
