"""Elastic bands, DMP, PSO, LQR planner, Bug2 tests."""

import jax
import jax.numpy as jnp
import numpy as np

from rust_robotics_tpu.planning.reactive import (
    bug2_plan,
    dmp_fit,
    dmp_rollout,
    elastic_band_optimize,
    lqr_plan,
    pso_minimize,
)


def test_elastic_band_pushes_off_obstacle():
    xs = jnp.linspace(0.0, 10.0, 21)
    pts = jnp.stack([xs, jnp.zeros_like(xs)], axis=-1)
    obstacles = jnp.array([[5.0, 0.0]])
    radii = jnp.array([1.0])
    out = elastic_band_optimize(pts, obstacles, radii)
    d = np.linalg.norm(np.asarray(out) - [5.0, 0.0], axis=-1)
    assert d.min() > 0.8  # pushed away from the obstacle
    np.testing.assert_allclose(np.asarray(out[0]), [0, 0], atol=1e-9)
    np.testing.assert_allclose(np.asarray(out[-1]), [10, 0], atol=1e-9)


def test_dmp_reproduces_demo():
    dt = 0.01
    t = jnp.arange(0, 1.0, dt)
    demo = jnp.stack([jnp.sin(2 * jnp.pi * t), t**2], axis=-1)
    w, (y0, g) = dmp_fit(demo, dt)
    roll = dmp_rollout(w, y0, g, len(t), dt)
    # converges to the goal and roughly follows the shape
    np.testing.assert_allclose(np.asarray(roll[-1]), np.asarray(demo[-1]), atol=0.08)
    err = np.abs(np.asarray(roll) - np.asarray(demo)).mean()
    assert err < 0.12, err


def test_pso_finds_minimum():
    obj = lambda x: jnp.sum((x - jnp.array([2.0, -3.0])) ** 2, axis=-1)
    best, val = pso_minimize(jax.random.PRNGKey(0), obj, dim=2)
    np.testing.assert_allclose(np.asarray(best), [2.0, -3.0], atol=0.05)
    assert float(val) < 1e-2


def test_lqr_plan_reaches_goal():
    traj = lqr_plan(jnp.array([0.0, 0.0]), jnp.array([6.0, -4.0]), steps=120)
    np.testing.assert_allclose(np.asarray(traj[-1]), [6.0, -4.0], atol=0.1)


def test_bug2_detours_wall():
    blocked = np.zeros((30, 30), dtype=bool)
    blocked[14:16, 0:22] = True
    path, reached = bug2_plan(blocked, (2, 10), (28, 10))
    assert reached
    for x, y in path:
        assert not blocked[x, y]
    assert len(path) > 30  # had to go around
