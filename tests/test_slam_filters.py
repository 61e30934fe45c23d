"""EKF-SLAM + FastSLAM behavior tests (reference sim shape: circle drive,
range-bearing landmarks — ekf_slam.rs:514-539, fastslam1.rs:277-300)."""

import jax
import jax.numpy as jnp
import numpy as np

from rust_robotics_tpu.core.angles import normalize_angle
from rust_robotics_tpu.slam.ekf_slam import (
    EKFSLAMBelief,
    ekf_slam_step,
    init_ekf_slam,
    motion_model,
)
from rust_robotics_tpu.slam.fastslam import (
    estimate,
    fastslam1_step,
    init_fastslam,
)

LANDMARKS = np.array([[10.0, -2.0], [15.0, 10.0], [3.0, 15.0], [-5.0, 20.0]])
DT = 0.1


def observations_from(pose, rng, max_range=20.0, r_noise=0.05, b_noise=0.01):
    d = LANDMARKS - pose[:2]
    rngs = np.linalg.norm(d, axis=-1)
    bearings = np.arctan2(d[:, 1], d[:, 0]) - pose[2]
    bearings = (bearings + np.pi) % (2 * np.pi) - np.pi
    obs = []
    for i in range(len(LANDMARKS)):
        if rngs[i] <= max_range:
            obs.append(
                [
                    rngs[i] + r_noise * rng.standard_normal(),
                    bearings[i] + b_noise * rng.standard_normal(),
                    i,
                ]
            )
    return np.array(obs)


def simulate(step_fn, steps=200, seed=0):
    rng = np.random.default_rng(seed)
    truth = np.zeros(3)
    u = np.array([1.0, 0.1])
    for k in range(steps):
        truth[0] += u[0] * DT * np.cos(truth[2])
        truth[1] += u[0] * DT * np.sin(truth[2])
        truth[2] = (truth[2] + u[1] * DT + np.pi) % (2 * np.pi) - np.pi
        obs = observations_from(truth, rng)
        step_fn(k, u, obs)
    return truth


def test_ekf_slam_tracks_and_maps():
    belief = init_ekf_slam(capacity=8)
    q = jnp.diag(jnp.array([0.2, (5 * jnp.pi / 180) ** 2]))  # ekf_slam.rs Q_SIM
    r = jnp.diag(jnp.array([0.05, 0.01]) ** 2 * 25)
    state = {"b": belief}

    @jax.jit
    def jit_step(b, u, obs, mask):
        return ekf_slam_step(b, u, obs, mask, DT, q, r)

    def step(k, u, obs):
        o = jnp.zeros((4, 2))
        m = jnp.zeros((4,), dtype=bool)
        if len(obs):
            o = o.at[: len(obs)].set(jnp.asarray(obs[:, :2]))
            m = m.at[: len(obs)].set(True)
        state["b"] = jit_step(state["b"], jnp.asarray(u), o, m)

    truth = simulate(step)
    b = state["b"]
    # pose error bounded
    pose = np.asarray(b.mean[:3])
    assert np.linalg.norm(pose[:2] - truth[:2]) < 1.5, (pose, truth)
    # association kept the landmark count at 4 (no spurious landmarks)
    assert int(b.n_lm) == 4
    # each mapped landmark is near a true one
    lms = np.asarray(b.mean[3 : 3 + 8]).reshape(4, 2)
    for lm in lms:
        assert np.min(np.linalg.norm(LANDMARKS - lm, axis=-1)) < 1.0, lm


def test_fastslam1_tracks_and_maps():
    particles = init_fastslam(num_particles=100, num_landmarks=4)
    chol = jnp.diag(jnp.array([0.3, 0.0305]) ** 0.5)  # fastslam1.rs R_SIM-ish
    r = jnp.diag(jnp.array([0.1, 0.05]))
    keys = jax.random.split(jax.random.PRNGKey(0), 300)
    state = {"p": particles}

    @jax.jit
    def jit_step(p, u, obs, mask, key):
        return fastslam1_step(p, u, obs, mask, DT, chol, r, key)

    def step(k, u, obs):
        o = jnp.zeros((4, 3))
        m = jnp.zeros((4,), dtype=bool)
        if len(obs):
            o = o.at[: len(obs)].set(jnp.asarray(obs))
            m = m.at[: len(obs)].set(True)
        state["p"] = jit_step(state["p"], jnp.asarray(u), o, m, keys[k])

    truth = simulate(step)
    pose, best = estimate(state["p"])
    pose = np.asarray(pose)
    assert np.linalg.norm(pose[:2] - truth[:2]) < 1.5, (pose, truth)
    # best particle's landmarks near truth
    lm = np.asarray(state["p"].lm_mean[int(best)])
    for i in range(4):
        assert np.linalg.norm(lm[i] - LANDMARKS[i]) < 1.0, (i, lm[i])
    assert bool(jnp.all(state["p"].lm_seen[int(best)]))


def test_fastslam_weights_finite_and_normalized():
    particles = init_fastslam(num_particles=50, num_landmarks=2)
    chol = 0.1 * jnp.eye(2)
    r = jnp.diag(jnp.array([0.1, 0.05]))
    obs = jnp.array([[5.0, 0.3, 0.0], [7.0, -0.5, 1.0]])
    mask = jnp.array([True, True])
    p2 = fastslam1_step(
        particles, jnp.array([1.0, 0.1]), obs, mask, DT, chol, r,
        jax.random.PRNGKey(1),
    )
    w = np.asarray(p2.weights)
    assert np.all(np.isfinite(w))
    np.testing.assert_allclose(w.sum(), 1.0, atol=1e-9)
