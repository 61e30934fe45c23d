"""Lie-group algebraic identity tests.

Models the reference's inline round-trip tests (core/src/lie.rs #[cfg(test)]):
exp/log round trips, inverse composition, adjoint consistency — plus
batch/vmap and differentiability checks that are new TPU-side requirements.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rust_robotics_tpu.core import lie

KEY = jax.random.PRNGKey(0)


def rand(shape, scale=1.0, key=KEY):
    return scale * jax.random.normal(key, shape, dtype=jnp.float64)


class TestSO2:
    def test_exp_log_roundtrip(self):
        thetas = jnp.linspace(-3.0, 3.0, 25)
        recovered = lie.so2_log(lie.so2_exp(thetas))
        np.testing.assert_allclose(recovered, thetas, atol=1e-12)

    def test_rotation_orthonormal(self):
        r = lie.so2_exp(jnp.array(0.7))
        np.testing.assert_allclose(r @ r.T, jnp.eye(2), atol=1e-12)


class TestSO3:
    def test_exp_log_roundtrip(self):
        phi = rand((64, 3), scale=0.8)
        recovered = lie.so3_log(lie.so3_exp(phi))
        np.testing.assert_allclose(recovered, phi, atol=1e-9)

    def test_exp_log_roundtrip_small_angle(self):
        phi = rand((16, 3), scale=1e-7)
        recovered = lie.so3_log(lie.so3_exp(phi))
        np.testing.assert_allclose(recovered, phi, atol=1e-12)

    def test_exp_log_near_pi(self):
        axis = jnp.array([1.0, -2.0, 0.5])
        axis = axis / jnp.linalg.norm(axis)
        phi = axis * (jnp.pi - 1e-6)
        recovered = lie.so3_log(lie.so3_exp(phi))
        np.testing.assert_allclose(recovered, phi, atol=1e-4)

    def test_skew_unskew(self):
        v = rand((8, 3))
        np.testing.assert_allclose(lie.unskew(lie.skew(v)), v, atol=0)

    def test_left_jacobian_inverse(self):
        phi = rand((32, 3))
        j = lie.so3_left_jacobian(phi)
        j_inv = lie.so3_left_jacobian_inverse(phi)
        eye = jnp.broadcast_to(jnp.eye(3), j.shape)
        np.testing.assert_allclose(j @ j_inv, eye, atol=1e-9)

    def test_left_jacobian_small_angle(self):
        phi = rand((8, 3), scale=1e-8)
        j = lie.so3_left_jacobian(phi)
        j_inv = lie.so3_left_jacobian_inverse(phi)
        eye = jnp.broadcast_to(jnp.eye(3), j.shape)
        np.testing.assert_allclose(j @ j_inv, eye, atol=1e-12)

    def test_exp_grad_finite_at_zero(self):
        g = jax.jacobian(lie.so3_exp)(jnp.zeros(3))
        assert np.all(np.isfinite(g))


class TestSE2:
    def test_exp_log_roundtrip(self):
        xi = rand((64, 3))
        recovered = lie.se2_log(lie.se2_exp(xi))
        np.testing.assert_allclose(recovered, xi, atol=1e-10)

    def test_inverse(self):
        xi = rand((16, 3))
        m = lie.se2_exp(xi)
        eye = jnp.broadcast_to(jnp.eye(3), m.shape)
        np.testing.assert_allclose(m @ lie.se2_inverse(m), eye, atol=1e-12)

    def test_adjoint_identity(self):
        # Ad(T) xi == log(T exp(xi) T^-1) for small xi
        t = lie.se2_exp(jnp.array([0.5, -0.2, 0.9]))
        xi = jnp.array([1e-3, 2e-3, -1.5e-3])
        lhs = lie.se2_adjoint(t) @ xi
        rhs = lie.se2_log(t @ lie.se2_exp(xi) @ lie.se2_inverse(t))
        np.testing.assert_allclose(lhs, rhs, atol=1e-8)

    def test_pose_conversion(self):
        m = lie.se2_from_pose(jnp.array(1.0), jnp.array(2.0), jnp.array(0.3))
        x, y, yaw = lie.se2_to_pose(m)
        np.testing.assert_allclose([x, y, yaw], [1.0, 2.0, 0.3], atol=1e-15)


class TestSE3:
    def test_exp_log_roundtrip(self):
        xi = rand((64, 6))
        # keep rotation magnitude below pi — log returns the wrapped
        # representative, so |phi| >= pi cannot round-trip by construction
        xi = xi.at[:, 3:].multiply(0.5)
        recovered = lie.se3_log(lie.se3_exp(xi))
        np.testing.assert_allclose(recovered, xi, atol=1e-9)

    def test_exp_log_roundtrip_small(self):
        xi = rand((8, 6), scale=1e-8)
        recovered = lie.se3_log(lie.se3_exp(xi))
        np.testing.assert_allclose(recovered, xi, atol=1e-13)

    def test_inverse(self):
        m = lie.se3_exp(rand((16, 6)))
        eye = jnp.broadcast_to(jnp.eye(4), m.shape)
        np.testing.assert_allclose(m @ lie.se3_inverse(m), eye, atol=1e-12)

    def test_adjoint_identity(self):
        t = lie.se3_exp(jnp.array([0.5, -0.2, 0.9, 0.3, -0.4, 0.2]))
        xi = 1e-3 * jnp.array([1.0, 2.0, -1.5, 0.5, -0.25, 0.75])
        lhs = lie.se3_adjoint(t) @ xi
        rhs = lie.se3_log(t @ lie.se3_exp(xi) @ lie.se3_inverse(t))
        np.testing.assert_allclose(lhs, rhs, atol=1e-8)

    def test_jit_and_vmap(self):
        xi = rand((4, 6))
        direct = lie.se3_exp(xi)
        jitted = jax.jit(jax.vmap(lie.se3_exp))(xi)
        np.testing.assert_allclose(direct, jitted, atol=1e-15)
