"""FastSLAM 1.0 / 2.0: particles with per-landmark 2×2 EKFs.

Reference: slam/src/fastslam1.rs — particles carry pose + per-landmark
mean/cov (:27-66), noisy motion sampling (:123-137), landmark EKF update
(:140-184), weight ∝ innovation Gaussian, N_eff resampling at N/1.5
(:18, :186-236), `fastslam_update` (:237), best-particle extraction (:269),
known landmark correspondence (observations carry lm_id, :277-300);
fastslam2.rs folds the latest observation into the proposal.

TPU-native: the whole filter is a struct-of-arrays pytree — poses [P, 3],
landmark means [P, L, 2], covs [P, L, 2, 2], seen [P, L] — and every update
is batched over particles (and over worlds with vmap): the [P, L, 2, 2]
batched closed-form 2×2 EKF update is the "per-particle landmark EKFs
sharded over the mesh" workload of BASELINE.json.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from rust_robotics_tpu.core.angles import normalize_angle
from rust_robotics_tpu.core.types import pytree_dataclass
from rust_robotics_tpu.filters.particle import systematic_resample
from rust_robotics_tpu.ops.smallmat import det_small, inv_spd_small

RESAMPLE_FRACTION = 1.0 / 1.5  # NTH = N/1.5 (fastslam1.rs:18)


@pytree_dataclass
class FastSLAMParticles:
    poses: Any  # [P, 3]
    weights: Any  # [P]
    lm_mean: Any  # [P, L, 2]
    lm_cov: Any  # [P, L, 2, 2]
    lm_seen: Any  # [P, L] bool

    @property
    def num_particles(self) -> int:
        return self.poses.shape[-3] if self.poses.ndim > 2 else self.poses.shape[0]


def init_fastslam(num_particles: int, num_landmarks: int, dtype=jnp.float64):
    p, l = num_particles, num_landmarks
    return FastSLAMParticles(
        poses=jnp.zeros((p, 3), dtype),
        weights=jnp.full((p,), 1.0 / p, dtype),
        lm_mean=jnp.zeros((p, l, 2), dtype),
        lm_cov=jnp.broadcast_to(jnp.eye(2, dtype=dtype), (p, l, 2, 2)),
        lm_seen=jnp.zeros((p, l), dtype=bool),
    )


def predict_particles(particles, u, dt, control_noise_chol, key):
    """Noisy motion sampling per particle (fastslam1.rs:123-137)."""
    p = particles.poses.shape[0]
    noise = jax.random.normal(key, (p, 2), particles.poses.dtype)
    un = u + noise @ control_noise_chol.T
    x, y, yaw = particles.poses[:, 0], particles.poses[:, 1], particles.poses[:, 2]
    poses = jnp.stack(
        [
            x + un[:, 0] * dt * jnp.cos(yaw),
            y + un[:, 0] * dt * jnp.sin(yaw),
            normalize_angle(yaw + un[:, 1] * dt),
        ],
        axis=-1,
    )
    return FastSLAMParticles(
        poses, particles.weights, particles.lm_mean, particles.lm_cov,
        particles.lm_seen,
    )


def _observe_jacobian(poses, lm):
    """z_pred, H (w.r.t. landmark) for all particles: poses [P,3], lm [P,2].
    (fastslam1.rs:92-111)."""
    d = lm - poses[:, :2]
    q = jnp.clip(jnp.sum(d * d, axis=-1), 1e-12, None)
    sq = jnp.sqrt(q)
    z_pred = jnp.stack(
        [sq, normalize_angle(jnp.arctan2(d[:, 1], d[:, 0]) - poses[:, 2])],
        axis=-1,
    )
    h = jnp.stack(
        [
            jnp.stack([d[:, 0] / sq, d[:, 1] / sq], axis=-1),
            jnp.stack([-d[:, 1] / q, d[:, 0] / q], axis=-1),
        ],
        axis=-2,
    )  # [P, 2, 2]
    return z_pred, h


def update_with_observation(particles, z, lm_id, r_obs):
    """Fold one known-correspondence observation z = [range, bearing]
    (fastslam1.rs:140-184): unseen → initialize landmark; seen → 2×2 EKF
    update + weight multiply."""
    poses = particles.poses
    p = poses.shape[0]
    seen = particles.lm_seen[:, lm_id]

    # initialization branch (computed for all, selected by mask)
    lx = poses[:, 0] + z[0] * jnp.cos(poses[:, 2] + z[1])
    ly = poses[:, 1] + z[0] * jnp.sin(poses[:, 2] + z[1])
    init_mean = jnp.stack([lx, ly], axis=-1)
    _, h0 = _observe_jacobian(poses, init_mean)
    h0_inv = inv_spd_small(h0)  # general 2x2 inverse via adjugate
    init_cov = h0_inv @ r_obs @ jnp.swapaxes(h0_inv, -1, -2)

    # update branch
    lm = particles.lm_mean[:, lm_id]
    z_pred, h = _observe_jacobian(poses, lm)
    y = jnp.stack(
        [z[0] - z_pred[:, 0], normalize_angle(z[1] - z_pred[:, 1])], axis=-1
    )
    cov = particles.lm_cov[:, lm_id]
    s = h @ cov @ jnp.swapaxes(h, -1, -2) + r_obs
    s_inv = inv_spd_small(s)
    k = cov @ jnp.swapaxes(h, -1, -2) @ s_inv
    upd_mean = lm + (k @ y[..., None])[..., 0]
    upd_cov = (jnp.eye(2, dtype=cov.dtype) - k @ h) @ cov
    # weight: innovation likelihood
    md = jnp.einsum("pi,pij,pj->p", y, s_inv, y)
    norm = 2.0 * jnp.pi * jnp.sqrt(jnp.clip(det_small(s), 1e-30, None))
    lik = jnp.exp(-0.5 * md) / norm

    sel = seen[:, None]
    new_mean = jnp.where(sel, upd_mean, init_mean)
    new_cov = jnp.where(sel[..., None], upd_cov, init_cov)
    weights = jnp.where(seen, particles.weights * lik, particles.weights)

    return FastSLAMParticles(
        poses,
        weights,
        particles.lm_mean.at[:, lm_id].set(new_mean),
        particles.lm_cov.at[:, lm_id].set(new_cov),
        particles.lm_seen.at[:, lm_id].set(True),
    )


def normalize_and_resample(particles, key):
    """Normalize weights; systematic resample when N_eff < N/1.5
    (fastslam1.rs:186-236)."""
    p = particles.poses.shape[0]
    w = particles.weights
    w = w / jnp.clip(jnp.sum(w), 1e-300, None)
    neff = 1.0 / jnp.clip(jnp.sum(w * w), 1e-300, None)
    need = neff < p * RESAMPLE_FRACTION
    idx = systematic_resample(key, w)
    uniform = jnp.full_like(w, 1.0 / p)

    def pick(a, resampled_axis=0):
        return jnp.where(
            need,
            jnp.take(a, idx, axis=0).reshape(a.shape),
            a,
        )

    return FastSLAMParticles(
        pick(particles.poses),
        jnp.where(need, uniform, w),
        pick(particles.lm_mean),
        pick(particles.lm_cov),
        pick(particles.lm_seen),
    )


def fastslam1_step(particles, u, observations, obs_mask, dt,
                   control_noise_chol, r_obs, key):
    """Full FastSLAM 1.0 step (fastslam_update, fastslam1.rs:237):
    observations [O, 3] rows = (range, bearing, lm_id); obs_mask [O]."""
    k_pred, k_res = jax.random.split(key)
    particles = predict_particles(particles, u, dt, control_noise_chol, k_pred)

    def fold(ps, zm):
        z3, m = zm
        lm_id = z3[2].astype(jnp.int32)

        def upd(p_):
            return update_with_observation(p_, z3[:2], lm_id, r_obs)

        return jax.lax.cond(m, upd, lambda p_: p_, ps), None

    particles, _ = jax.lax.scan(fold, particles, (observations, obs_mask))
    return normalize_and_resample(particles, k_res)


def estimate(particles):
    """Weighted pose estimate + best particle (fastslam1.rs:269)."""
    w = particles.weights / jnp.clip(jnp.sum(particles.weights), 1e-300, None)
    mean_xy = jnp.einsum("p,pi->i", w, particles.poses[:, :2])
    yaw = jnp.arctan2(
        jnp.einsum("p,p->", w, jnp.sin(particles.poses[:, 2])),
        jnp.einsum("p,p->", w, jnp.cos(particles.poses[:, 2])),
    )
    best = jnp.argmax(particles.weights)
    return jnp.concatenate([mean_xy, yaw[None]]), best


# ---------------------------------------------------------------------------
# FastSLAM 2.0 (fastslam2.rs)
# ---------------------------------------------------------------------------

def _observe_pose_jacobian(poses, lm):
    """H wrt pose [P, 2, 3] for range-bearing to landmark lm [P, 2]."""
    d = lm - poses[:, :2]
    q = jnp.clip(jnp.sum(d * d, axis=-1), 1e-12, None)
    sq = jnp.sqrt(q)
    h = jnp.stack(
        [
            jnp.stack([-d[:, 0] / sq, -d[:, 1] / sq, jnp.zeros_like(sq)], axis=-1),
            jnp.stack([d[:, 1] / q, -d[:, 0] / q, -jnp.ones_like(q)], axis=-1),
        ],
        axis=-2,
    )
    return h


def fastslam2_step(particles, u, observations, obs_mask, dt,
                   control_noise_chol, r_obs, key):
    """Full FastSLAM 2.0 step (fastslam2.rs): the pose proposal conditions
    on ALL current observations of already-seen landmarks — accumulate the
    information form (Λ, η) over observations at the motion-prior mean,
    sample the pose ONCE from N(μ_prior + Ση, Σ), then run the standard
    landmark EKFs/weights. Sequential per-observation resampling (the naive
    reading) injects extra diffusion; this is the consistent form."""
    from rust_robotics_tpu.ops.smallmat import inv_spd_small

    k_samp, k_res = jax.random.split(key)
    poses = particles.poses
    p = poses.shape[0]

    # motion-prior mean (noise enters through the proposal covariance)
    x, y_, yaw = poses[:, 0], poses[:, 1], poses[:, 2]
    prior_mean = jnp.stack(
        [
            x + u[0] * dt * jnp.cos(yaw),
            y_ + u[0] * dt * jnp.sin(yaw),
            normalize_angle(yaw + u[1] * dt),
        ],
        axis=-1,
    )
    pose_cov = control_noise_chol @ control_noise_chol.T
    prior_cov = jnp.diag(
        jnp.array(
            [pose_cov[0, 0] * dt * dt + 1e-6,
             pose_cov[0, 0] * dt * dt + 1e-6,
             pose_cov[1, 1] * dt * dt + 1e-6]
        )
    ).astype(poses.dtype)
    prior_inv = jnp.linalg.inv(prior_cov)

    def accumulate(carry, zm):
        lam, eta = carry
        z3, m = zm
        lm_id = z3[2].astype(jnp.int32)
        seen = particles.lm_seen[:, lm_id]
        lm = particles.lm_mean[:, lm_id]
        lm_cov = particles.lm_cov[:, lm_id]
        z_pred, h_lm = _observe_jacobian(prior_mean, lm)
        h_pose = _observe_pose_jacobian(prior_mean, lm)
        yv = jnp.stack(
            [z3[0] - z_pred[:, 0], normalize_angle(z3[1] - z_pred[:, 1])],
            axis=-1,
        )
        s = h_lm @ lm_cov @ jnp.swapaxes(h_lm, -1, -2) + r_obs
        s_inv = inv_spd_small(s)
        use = (m & seen)[:, None]
        lam = lam + jnp.where(
            use[..., None],
            jnp.einsum("pji,pjk,pkl->pil", h_pose, s_inv, h_pose),
            0.0,
        )
        eta = eta + jnp.where(
            use, jnp.einsum("pji,pjk,pk->pi", h_pose, s_inv, yv), 0.0
        )
        return (lam, eta), None

    lam0 = jnp.zeros((p, 3, 3), poses.dtype)
    eta0 = jnp.zeros((p, 3), poses.dtype)
    (lam, eta), _ = jax.lax.scan(accumulate, (lam0, eta0), (observations, obs_mask))

    sigma = jnp.linalg.inv(lam + prior_inv)
    mu = prior_mean + jnp.einsum("pij,pj->pi", sigma, eta)
    chol = jnp.linalg.cholesky(
        0.5 * (sigma + jnp.swapaxes(sigma, -1, -2))
        + 1e-12 * jnp.eye(3, dtype=poses.dtype)
    )
    noise = jax.random.normal(k_samp, (p, 3), poses.dtype)
    sampled = mu + jnp.einsum("pij,pj->pi", chol, noise)
    sampled = sampled.at[:, 2].set(normalize_angle(sampled[:, 2]))
    particles = FastSLAMParticles(
        sampled, particles.weights, particles.lm_mean, particles.lm_cov,
        particles.lm_seen,
    )

    def fold(ps, zm):
        z3, m = zm
        lm_id = z3[2].astype(jnp.int32)

        def upd(p_):
            return update_with_observation(p_, z3[:2], lm_id, r_obs)

        return jax.lax.cond(m, upd, lambda p_: p_, ps), None

    particles, _ = jax.lax.scan(fold, particles, (observations, obs_mask))
    return normalize_and_resample(particles, k_res)
