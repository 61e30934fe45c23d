"""Data-parallel particle workloads over the mesh.

Two sharding shapes (SURVEY.md §2.12 DP row + BASELINE.json "per-particle
landmark EKFs sharded over the mesh"):

1. `make_pf_banks_step` — B INDEPENDENT particle-filter banks sharded over
   the `data` axis. Embarrassingly parallel (zero collectives); per-bank
   PRNG keys make the sharded run bitwise-identical to the single-device
   vmap oracle regardless of the shard layout.

2. `make_fastslam_sharded_step` — ONE FastSLAM filter whose PARTICLE axis
   is sharded over the mesh. Prediction and the per-landmark 2×2 EKF
   updates are purely local; weight normalization / N_eff are psums; the
   global systematic resample gathers shard weight sums, computes the
   global inverse-CDF for this shard's slot range, and fetches parents via
   all_gather of the particle pytree (the one genuinely collective step —
   it only pays off when the [P, L, ...] landmark tables dominate, which is
   exactly the FastSLAM regime).

Both are pinned against single-device oracles in tests/test_sharded.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from rust_robotics_tpu.filters.particle import (
    ParticleBelief,
    pf_estimate,
    pf_predict,
    pf_update_ranges,
    systematic_resample,
)
from rust_robotics_tpu.slam.fastslam import (
    RESAMPLE_FRACTION,
    FastSLAMParticles,
    predict_particles,
    update_with_observation,
)

try:
    from jax import shard_map as _shard_map
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map as _shard_map


# ---------------------------------------------------------------------------
# 1. Independent PF banks over the data axis
# ---------------------------------------------------------------------------

def pf_bank_step(belief, control, observed_ranges, landmarks, key,
                 dt, control_noise_std, range_noise, resample_threshold=0.5):
    """One bank's predict → weight → maybe-resample → estimate, with the
    bank's own PRNG key (particle_filter.rs try_step :468-478)."""
    k_pred, k_res = jax.random.split(key)
    belief = pf_predict(belief, control, dt, control_noise_std, k_pred)
    belief = pf_update_ranges(belief, observed_ranges, landmarks, range_noise)
    p = belief.num_particles
    n_eff = 1.0 / jnp.clip(jnp.sum(belief.weights**2, axis=-1), 1e-300, None)
    need = n_eff < resample_threshold * p
    idx = systematic_resample(k_res, belief.weights)
    resampled = jnp.take_along_axis(belief.states, idx[..., None], axis=-2)
    states = jnp.where(need, resampled, belief.states)
    weights = jnp.where(need, jnp.full_like(belief.weights, 1.0 / p),
                        belief.weights)
    belief = ParticleBelief(states, weights)
    return belief, pf_estimate(belief)


def make_pf_banks_step(mesh: Mesh, dt, control_noise_std, range_noise,
                       resample_threshold=0.5, axis_name="data"):
    """Jitted shard_map: B banks split over `axis_name`, landmarks
    replicated. Args: (belief [B,P,n]/[B,P], controls [B,2], ranges [B,L],
    landmarks [L,2], keys [B] PRNG keys). Bitwise-matches
    `jax.vmap(pf_bank_step)` because each bank consumes only its own key."""
    cns = jnp.asarray(control_noise_std)

    def local(belief, controls, ranges, landmarks, keys):
        step = functools.partial(
            pf_bank_step, dt=dt, control_noise_std=cns,
            range_noise=range_noise, resample_threshold=resample_threshold)
        return jax.vmap(step, in_axes=(0, 0, 0, None, 0))(
            belief, controls, ranges, landmarks, keys)

    return jax.jit(_shard_map(
        local, mesh=mesh,
        in_specs=(P(axis_name), P(axis_name), P(axis_name), P(), P(axis_name)),
        out_specs=P(axis_name),
    ))


# ---------------------------------------------------------------------------
# 2. One FastSLAM filter, particle axis sharded
# ---------------------------------------------------------------------------

def _global_systematic_indices(w_local, u, axis_name):
    """Parent indices (GLOBAL) for this shard's slot range under the exact
    global systematic resample: one shared uniform u, positions
    (i + u) / P_total, inverse-CDF over the device-order-concatenated
    weights. Matches filters.particle.systematic_resample on the gathered
    weight vector exactly."""
    p_local = w_local.shape[0]
    rank = jax.lax.axis_index(axis_name)
    w_all = jax.lax.all_gather(w_local, axis_name)  # [S, P_local]
    s = w_all.shape[0]
    w_flat = w_all.reshape(s * p_local)
    cum = jnp.cumsum(w_flat)
    cum = cum / cum[-1]
    pos = (rank * p_local + jnp.arange(p_local, dtype=w_local.dtype) + u) \
        / (s * p_local)
    idx = jnp.searchsorted(cum, pos, side="left")
    return jnp.clip(idx, 0, s * p_local - 1)


def make_fastslam_sharded_step(mesh: Mesh, dt, control_noise_chol, r_obs,
                               axis_name="data"):
    """Jitted shard_map FastSLAM 1.0 step with the particle axis sharded.

    Args: (particles FastSLAMParticles with leading P sharded,
    u [2], observations [O,3], obs_mask [O], key_data uint32[2] shared).
    Collectives: psum for weight-sum/N_eff, all_gather for the resample
    parent fetch. Matches `slam.fastslam.fastslam1_step` up to per-particle
    prediction noise (the sharded step draws per-particle noise from
    counter-based per-slot keys so draws are layout-independent; pass the
    same scheme to the oracle via `fastslam_banks_oracle_step`)."""
    chol = jnp.asarray(control_noise_chol)
    robs = jnp.asarray(r_obs)

    def local(particles, u, observations, obs_mask, key_data, slot0):
        p_local = particles.poses.shape[0]
        rank = jax.lax.axis_index(axis_name)
        key = jax.random.wrap_key_data(key_data)
        k_pred, k_res = jax.random.split(key)

        # layout-independent per-slot prediction noise: fold the GLOBAL
        # slot id into the key so shard count doesn't change the draws
        slots = slot0 + rank * p_local + jnp.arange(p_local)
        keys = jax.vmap(jax.random.fold_in, (None, 0))(k_pred, slots)
        noise = jax.vmap(
            lambda k: jax.random.normal(k, (2,), particles.poses.dtype)
        )(keys)
        un = u + noise @ chol.T
        x, y, yaw = (particles.poses[:, 0], particles.poses[:, 1],
                     particles.poses[:, 2])
        from rust_robotics_tpu.core.angles import normalize_angle
        poses = jnp.stack(
            [x + un[:, 0] * dt * jnp.cos(yaw),
             y + un[:, 0] * dt * jnp.sin(yaw),
             normalize_angle(yaw + un[:, 1] * dt)], axis=-1)
        particles = FastSLAMParticles(
            poses, particles.weights, particles.lm_mean, particles.lm_cov,
            particles.lm_seen)

        # landmark EKF updates: purely local over the particle shard
        def fold(ps, zm):
            z3, m = zm
            lm_id = z3[2].astype(jnp.int32)
            return jax.lax.cond(
                m,
                lambda p_: update_with_observation(p_, z3[:2], lm_id, robs),
                lambda p_: p_,
                ps,
            ), None

        particles, _ = jax.lax.scan(fold, particles, (observations, obs_mask))

        # global normalize + N_eff (psum), then exact global resample
        wsum = jax.lax.psum(jnp.sum(particles.weights), axis_name)
        w = particles.weights / jnp.clip(wsum, 1e-300, None)
        neff = 1.0 / jnp.clip(
            jax.lax.psum(jnp.sum(w * w), axis_name), 1e-300, None)
        p_total = jax.lax.psum(jnp.asarray(p_local, w.dtype), axis_name)
        need = neff < p_total * RESAMPLE_FRACTION

        uu = jax.random.uniform(k_res, (), w.dtype)
        idx = _global_systematic_indices(w, uu, axis_name)

        def gather_parents(a):
            a_all = jax.lax.all_gather(a, axis_name)  # [S, P_local, ...]
            a_flat = a_all.reshape((-1,) + a.shape[1:])
            return jnp.where(need, a_flat[idx], a)

        uniform = jnp.full_like(w, 1.0 / p_total)
        return FastSLAMParticles(
            gather_parents(particles.poses),
            jnp.where(need, uniform, w),
            gather_parents(particles.lm_mean),
            gather_parents(particles.lm_cov),
            gather_parents(particles.lm_seen),
        )

    return jax.jit(_shard_map(
        local, mesh=mesh,
        in_specs=(P(axis_name), P(), P(), P(), P(), P()),
        out_specs=P(axis_name),
    ))


def fastslam_oracle_step(particles, u, observations, obs_mask, key_data,
                         dt, control_noise_chol, r_obs, slot0=0):
    """Single-device oracle with the SAME counter-based noise scheme as
    `make_fastslam_sharded_step` (so sharded == oracle exactly)."""
    chol = jnp.asarray(control_noise_chol)
    robs = jnp.asarray(r_obs)
    p = particles.poses.shape[0]
    key = jax.random.wrap_key_data(key_data)
    k_pred, k_res = jax.random.split(key)
    slots = slot0 + jnp.arange(p)
    keys = jax.vmap(jax.random.fold_in, (None, 0))(k_pred, slots)
    noise = jax.vmap(
        lambda k: jax.random.normal(k, (2,), particles.poses.dtype))(keys)
    un = u + noise @ chol.T
    from rust_robotics_tpu.core.angles import normalize_angle
    x, y, yaw = (particles.poses[:, 0], particles.poses[:, 1],
                 particles.poses[:, 2])
    poses = jnp.stack(
        [x + un[:, 0] * dt * jnp.cos(yaw),
         y + un[:, 0] * dt * jnp.sin(yaw),
         normalize_angle(yaw + un[:, 1] * dt)], axis=-1)
    particles = FastSLAMParticles(
        poses, particles.weights, particles.lm_mean, particles.lm_cov,
        particles.lm_seen)

    def fold(ps, zm):
        z3, m = zm
        lm_id = z3[2].astype(jnp.int32)
        return jax.lax.cond(
            m,
            lambda p_: update_with_observation(p_, z3[:2], lm_id, robs),
            lambda p_: p_,
            ps,
        ), None

    particles, _ = jax.lax.scan(fold, particles, (observations, obs_mask))

    w = particles.weights / jnp.clip(jnp.sum(particles.weights), 1e-300, None)
    neff = 1.0 / jnp.clip(jnp.sum(w * w), 1e-300, None)
    need = neff < p * RESAMPLE_FRACTION
    uu = jax.random.uniform(k_res, (), w.dtype)
    pos = (jnp.arange(p, dtype=w.dtype) + uu) / p
    cum = jnp.cumsum(w)
    cum = cum / cum[-1]
    idx = jnp.clip(jnp.searchsorted(cum, pos, side="left"), 0, p - 1)

    def pick(a):
        return jnp.where(need, a[idx], a)

    uniform = jnp.full_like(w, 1.0 / p)
    return FastSLAMParticles(
        pick(particles.poses), jnp.where(need, uniform, w),
        pick(particles.lm_mean), pick(particles.lm_cov),
        pick(particles.lm_seen),
    )
