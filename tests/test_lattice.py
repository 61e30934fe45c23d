"""State lattice / MPTG / clothoid tests."""

import jax.numpy as jnp
import numpy as np
import pytest

from rust_robotics_tpu.core.angles import normalize_angle
from rust_robotics_tpu.planning.lattice import (
    clothoid_path,
    generate_lookup_table,
    integrate_curvature_poly,
    optimize_trajectory,
    state_lattice_plan,
)


def test_straight_integration():
    poses = integrate_curvature_poly(jnp.array([5.0, 0.0, 0.0]), 0.0)
    np.testing.assert_allclose(np.asarray(poses[-1]), [5.0, 0.0, 0.0], atol=1e-9)


@pytest.mark.parametrize(
    "target",
    [
        (5.0, 0.0, 0.0),
        (4.0, 2.0, 0.5),
        (6.0, -1.5, -0.4),
        (3.0, 1.0, 1.0),
    ],
)
def test_boundary_value_solver(target):
    p, err = optimize_trajectory(jnp.asarray(target))
    assert float(err) < 1e-3, (target, float(err))
    end = integrate_curvature_poly(p, 0.0)[-1]
    np.testing.assert_allclose(np.asarray(end[:2]), target[:2], atol=2e-3)
    assert abs(float(normalize_angle(end[2] - target[2]))) < 2e-3


def test_lookup_table_generation():
    params, errs, targets = generate_lookup_table(
        [4.0, 6.0], [-1.0, 0.0, 1.0], [-0.3, 0.0, 0.3]
    )
    assert params.shape == (18, 3)
    assert float(jnp.median(errs)) < 1e-3
    assert (np.asarray(params)[:, 0] > 0).all()


def test_state_lattice_avoids_obstacle():
    obstacles = jnp.array([[4.0, 0.0]])
    radii = jnp.array([0.6])
    poses, params, cost = state_lattice_plan(
        jnp.array([8.0, 0.0, 0.0]), obstacles, radii, lateral_spread=4.0
    )
    assert np.isfinite(float(cost))
    d = np.linalg.norm(np.asarray(poses)[:, :2] - [4.0, 0.0], axis=-1)
    assert d.min() > 0.6
    # and the straight-through candidate (d=0) was correctly rejected:
    # the winner carries a lateral detour
    assert np.abs(np.asarray(poses)[:, 1]).max() > 0.5


def test_clothoid_reaches_pose_with_linear_curvature():
    target = (5.0, 2.0, 0.6)
    poses, p, err = clothoid_path(jnp.asarray(target))
    assert float(err) < 5e-3
    end = np.asarray(poses[-1])
    np.testing.assert_allclose(end[:2], target[:2], atol=5e-3)
    # curvature is (near-)linear: yaw is (near-)quadratic in arc index
    yaws = np.unwrap(np.asarray(poses)[:, 2])
    coeffs = np.polyfit(np.arange(len(yaws)), yaws, 2)
    resid = yaws - np.polyval(coeffs, np.arange(len(yaws)))
    assert np.abs(resid).max() < 1e-6
