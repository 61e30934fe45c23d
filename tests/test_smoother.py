"""Temporally-parallel Kalman filter/smoother: associative scan ==
sequential golden; smoothing beats filtering; EKF smoothing on the shared
unicycle problem; time-axis sharding compiles on the virtual mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from rust_robotics_tpu.filters.smoother import (
    ekf_smooth_unicycle,
    parallel_kalman_filter,
    parallel_rts_smoother,
    sequential_kalman_filter,
    sequential_rts_smoother,
)


def _make_system(key, t=64, n=4, m=2):
    k1, k2, k3 = jax.random.split(key, 3)
    # stable random time-varying system
    fs = jnp.eye(n) + 0.05 * jax.random.normal(k1, (t, n, n))
    qs = jnp.broadcast_to(0.01 * jnp.eye(n), (t, n, n))
    h = jax.random.normal(k2, (m, n))
    r = 0.1 * jnp.eye(m)
    cs = 0.1 * jax.random.normal(k3, (t, n))
    return fs, qs, h, r, cs


def _simulate(key, fs, qs, h, r, cs, m0):
    t, n, _ = fs.shape
    ks = jax.random.split(key, 2 * t)
    x = m0
    xs, zs = [], []
    for k in range(t):
        w = jnp.sqrt(0.01) * jax.random.normal(ks[2 * k], (n,))
        x = fs[k] @ x + cs[k] + w
        v = jnp.sqrt(0.1) * jax.random.normal(ks[2 * k + 1], (h.shape[0],))
        zs.append(h @ x + v)
        xs.append(x)
    return jnp.stack(xs), jnp.stack(zs)


def test_parallel_filter_matches_sequential():
    key = jax.random.PRNGKey(0)
    fs, qs, h, r, cs = _make_system(key)
    m0 = jnp.zeros(4)
    p0 = jnp.eye(4)
    truth, zs = _simulate(jax.random.PRNGKey(1), fs, qs, h, r, cs, m0)
    mp, pp = parallel_kalman_filter(fs, qs, h, r, zs, m0, p0, cs)
    ms, ps = sequential_kalman_filter(fs, qs, h, r, zs, m0, p0, cs)
    np.testing.assert_allclose(np.asarray(mp), np.asarray(ms), atol=1e-8)
    np.testing.assert_allclose(np.asarray(pp), np.asarray(ps), atol=1e-8)


def test_parallel_smoother_matches_sequential_and_improves():
    key = jax.random.PRNGKey(2)
    fs, qs, h, r, cs = _make_system(key, t=96)
    m0 = jnp.zeros(4)
    p0 = jnp.eye(4)
    truth, zs = _simulate(jax.random.PRNGKey(3), fs, qs, h, r, cs, m0)
    gs, ls, mf, pf = parallel_rts_smoother(fs, qs, h, r, zs, m0, p0, cs)
    gss, lss, _, _ = sequential_rts_smoother(fs, qs, h, r, zs, m0, p0, cs)
    np.testing.assert_allclose(np.asarray(gs), np.asarray(gss), atol=1e-7)
    np.testing.assert_allclose(np.asarray(ls), np.asarray(lss), atol=1e-7)
    # smoothing strictly improves over filtering on interior states
    e_filt = float(jnp.mean(jnp.sum((mf - truth) ** 2, -1)))
    e_smooth = float(jnp.mean(jnp.sum((gs - truth) ** 2, -1)))
    assert e_smooth < e_filt
    # smoothed covariances are no larger (trace) than filtered
    assert float(jnp.mean(jax.vmap(jnp.trace)(ls))) <= float(
        jnp.mean(jax.vmap(jnp.trace)(pf))) + 1e-9


def test_ekf_smoothing_unicycle_improves_rmse():
    from rust_robotics_tpu.models.motion import unicycle_propagate

    dt = 0.1
    t = 120
    key = jax.random.PRNGKey(4)
    ks = jax.random.split(key, t)
    us = jnp.stack([jnp.full((t,), 1.0), 0.2 * jnp.sin(
        0.1 * jnp.arange(t))], -1)
    x = jnp.zeros(4)
    xs, zs = [], []
    for k in range(t):
        x = unicycle_propagate(x, us[k], dt)
        z = x[:2] + 0.3 * jax.random.normal(ks[k], (2,))
        xs.append(x)
        zs.append(z)
    truth = jnp.stack(xs)
    zs = jnp.stack(zs)
    q = jnp.diag(jnp.array([0.05, 0.05, 0.01, 0.1])) ** 2
    r = jnp.diag(jnp.array([0.3, 0.3])) ** 2
    out = ekf_smooth_unicycle(zs, us, dt, q, r, jnp.zeros(4), jnp.eye(4))
    e_filt = float(jnp.sqrt(jnp.mean(jnp.sum(
        (out["filtered_means"][:, :2] - truth[:, :2]) ** 2, -1))))
    e_smooth = float(jnp.sqrt(jnp.mean(jnp.sum(
        (out["smoothed_means"][:, :2] - truth[:, :2]) ** 2, -1))))
    assert np.isfinite(e_smooth)
    assert e_smooth < e_filt


def test_smoother_shards_over_time_axis():
    """The associative scan partitions over a time-sharded mesh axis —
    the SP design of SURVEY §2.12 — and matches the unsharded result."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devs = np.array(jax.devices()[:8]).reshape(8)
    mesh = Mesh(devs, ("time",))
    fs, qs, h, r, cs = _make_system(jax.random.PRNGKey(5), t=128)
    m0 = jnp.zeros(4)
    p0 = jnp.eye(4)
    _, zs = _simulate(jax.random.PRNGKey(6), fs, qs, h, r, cs, m0)
    ref, _ = parallel_kalman_filter(fs, qs, h, r, zs, m0, p0, cs)
    sh = NamedSharding(mesh, P("time"))
    fs_s = jax.device_put(fs, sh)
    qs_s = jax.device_put(qs, sh)
    zs_s = jax.device_put(zs, sh)
    cs_s = jax.device_put(cs, sh)
    out, _ = jax.jit(parallel_kalman_filter)(fs_s, qs_s, h, r, zs_s, m0,
                                             p0, cs_s)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-8)
