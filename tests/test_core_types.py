"""Core type tests (reference: core/src/types.rs:460-537 inline tests)."""

import jax
import jax.numpy as jnp
import numpy as np

from rust_robotics_tpu.core import normalize_angle
from rust_robotics_tpu.core.types import GridSpec2D, Path2D, Pose2D, State2D


def test_normalize_angle_range():
    thetas = jnp.linspace(-20.0, 20.0, 1001)
    wrapped = normalize_angle(thetas)
    assert np.all(wrapped > -np.pi - 1e-12)
    assert np.all(wrapped <= np.pi + 1e-12)
    np.testing.assert_allclose(jnp.cos(wrapped), jnp.cos(thetas), atol=1e-12)
    np.testing.assert_allclose(jnp.sin(wrapped), jnp.sin(thetas), atol=1e-12)


def test_pose2d_pytree():
    p = Pose2D(jnp.ones(4), jnp.zeros(4), jnp.full(4, 4.0))
    p2 = jax.tree.map(lambda a: a * 2, p)
    assert isinstance(p2, Pose2D)
    n = p.normalized()
    np.testing.assert_allclose(n.yaw, 4.0 - 2 * np.pi)


def test_state2d_array_roundtrip():
    s = State2D(jnp.array(1.0), jnp.array(2.0), jnp.array(0.5), jnp.array(3.0))
    np.testing.assert_allclose(State2D.from_array(s.as_array()).as_array(), s.as_array())


def test_path2d_total_length_masked():
    pts = jnp.array([[0.0, 0.0], [3.0, 4.0], [3.0, 4.0], [100.0, 100.0]])
    mask = jnp.array([1.0, 1.0, 1.0, 0.0])
    path = Path2D(pts, mask)
    np.testing.assert_allclose(path.total_length(), 5.0)
    assert int(path.num_valid()) == 3


def test_gridspec_world_index_roundtrip():
    g = GridSpec2D(min_x=-5.0, min_y=-5.0, resolution=0.5, width=20, height=20)
    idx = g.world_to_index(jnp.array([[0.0, 0.0], [-4.9, 4.9]]))
    assert idx.shape == (2, 2)
    centers = g.index_to_world(idx)
    idx2 = g.world_to_index(centers)
    np.testing.assert_array_equal(idx, idx2)
    assert bool(jnp.all(g.in_bounds(idx)))
    assert not bool(g.in_bounds(jnp.array([20, 0])))
