"""Ring-halo sequence-parallel scan odometry (parallel/sharded_scan.py)
vs the unsharded oracle — the SP/CP capability of SURVEY.md §2.12
(correlative_scan_matching.rs:55 processes scans sequentially; here the
time axis is sharded with a ppermute halo)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rust_robotics_tpu.parallel.mesh import make_mesh
from rust_robotics_tpu.parallel.sharded_scan import (
    compose_trajectory,
    make_sharded_scan_odometry,
    scan_odometry_serial,
    se2_compose,
    shard_scans,
)


def _make_scans(t=16, m=96, dtype=jnp.float32):
    """Deterministic scan sequence: a fixed point cloud observed from a
    slowly moving SE(2) trajectory (gallery-style sinusoid motion)."""
    key = jax.random.PRNGKey(7)
    world = 4.0 * jax.random.uniform(key, (m, 2), dtype=dtype) - 2.0
    steps = jnp.arange(t, dtype=dtype)
    xs = 0.05 * steps
    ys = 0.02 * jnp.sin(0.3 * steps)
    yaws = 0.03 * steps

    def view(x, y, yaw):
        c, s = jnp.cos(yaw), jnp.sin(yaw)
        rot_t = jnp.array([[c, s], [-s, c]], dtype=dtype)
        return (world - jnp.array([x, y], dtype=dtype)) @ rot_t.T

    return jax.vmap(view)(xs, ys, yaws)


def test_se2_compose_associative():
    key = jax.random.PRNGKey(0)
    a, b, c = 0.3 * jax.random.normal(key, (3, 3), dtype=jnp.float64)
    left = se2_compose(se2_compose(a, b), c)
    right = se2_compose(a, se2_compose(b, c))
    np.testing.assert_allclose(np.asarray(left), np.asarray(right),
                               atol=1e-12)


def test_compose_trajectory_matches_sequential():
    key = jax.random.PRNGKey(1)
    rel = 0.1 * jax.random.normal(key, (9, 3), dtype=jnp.float64)
    absolute = np.asarray(compose_trajectory(rel))
    acc = np.asarray(rel[0])
    np.testing.assert_allclose(absolute[0], acc, atol=1e-12)
    for i in range(1, 9):
        acc = np.asarray(se2_compose(jnp.asarray(acc), rel[i]))
        np.testing.assert_allclose(absolute[i], acc, atol=1e-12)


def test_sharded_scan_odometry_matches_oracle():
    """8-way time-sharded run == unsharded vmap oracle to f64 round-off:
    the halo exchange feeds each boundary pair exactly the scan the serial
    path uses (differences are only XLA reduction-order reassociation in
    the per-pair ICP normal equations)."""
    mesh = make_mesh(8, data_axis=8, axis_names=("data", "model"))
    scans = _make_scans(t=16, dtype=jnp.float64)
    rel_oracle, abs_oracle = scan_odometry_serial(scans, iterations=8)
    run = make_sharded_scan_odometry(mesh, iterations=8)
    rel, absolute = run(shard_scans(mesh, scans))
    np.testing.assert_allclose(np.asarray(rel), np.asarray(rel_oracle),
                               atol=1e-12)
    np.testing.assert_allclose(np.asarray(absolute),
                               np.asarray(abs_oracle), atol=1e-12)


def test_sharded_scan_odometry_recovers_motion():
    """The composed trajectory tracks the true simulated motion."""
    scans = _make_scans(t=16, m=128)
    _, absolute = scan_odometry_serial(scans, iterations=25)
    final = np.asarray(absolute[-1])
    # truth at t=15: x=0.75, y=0.02*sin(4.5), yaw=0.45
    assert abs(final[0] - 0.75) < 0.02, final
    assert abs(final[2] - 0.45) < 0.02, final
