"""Pallas fused-EKF kernel parity vs the generic jnp path (interpret mode
on CPU; the real TPU lowering runs in bench.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from rust_robotics_tpu.ops.ekf_pallas import ekf_scan_lanes, ekf_scan_reference

Q = (0.01, 0.01, 3e-4, 0.01)
R = (1.0, 1.0)


def make_inputs(t=20, b=256, dtype=jnp.float32):
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    zs = 0.3 * jax.random.normal(k1, (t, 2, b), dtype)
    us = jnp.stack(
        [
            1.0 + 0.1 * jax.random.normal(k2, (t, b), dtype),
            0.1 * jnp.ones((t, b), dtype),
        ],
        axis=1,
    )
    mean0 = jnp.zeros((4, b), dtype)
    cov0 = jnp.broadcast_to(jnp.eye(4, dtype=dtype).reshape(16, 1), (16, b))
    return zs, us, mean0, cov0


def test_pallas_ekf_matches_reference_f32():
    zs, us, mean0, cov0 = make_inputs()
    got_m, got_p = ekf_scan_lanes(
        zs, us, mean0, cov0, 0.1, Q, R, tile=128, interpret=True
    )
    ref_m, ref_p = ekf_scan_reference(zs, us, mean0, cov0, 0.1, Q, R)
    np.testing.assert_allclose(got_m, ref_m, atol=2e-5)
    np.testing.assert_allclose(got_p, ref_p, atol=2e-5)


def test_pallas_ekf_f64_tight():
    zs, us, mean0, cov0 = make_inputs(dtype=jnp.float64)
    got_m, got_p = ekf_scan_lanes(
        zs, us, mean0, cov0, 0.1, Q, R, tile=128, interpret=True
    )
    ref_m, ref_p = ekf_scan_reference(zs, us, mean0, cov0, 0.1, Q, R)
    np.testing.assert_allclose(got_m, ref_m, atol=1e-12)
    np.testing.assert_allclose(got_p, ref_p, atol=1e-12)
