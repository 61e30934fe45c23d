"""Closed-form small-matrix op tests vs generic linalg."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rust_robotics_tpu.ops.smallmat import (
    cholesky_small,
    det_small,
    inv_spd_small,
    solve_spd_small,
)


def spd(key, b, n):
    a = jax.random.normal(key, (b, n, n), dtype=jnp.float64)
    return a @ jnp.swapaxes(a, -1, -2) + n * jnp.eye(n)


@pytest.mark.parametrize("n", [1, 2, 3, 4])
def test_inv_spd(n):
    m = spd(jax.random.PRNGKey(n), 16, n)
    np.testing.assert_allclose(
        inv_spd_small(m), jnp.linalg.inv(m), rtol=1e-9, atol=1e-11
    )


@pytest.mark.parametrize("n", [1, 2, 3])
def test_det(n):
    m = spd(jax.random.PRNGKey(n), 16, n)
    np.testing.assert_allclose(det_small(m), jnp.linalg.det(m), rtol=1e-10)


@pytest.mark.parametrize("n", [2, 3, 4])
def test_cholesky(n):
    m = spd(jax.random.PRNGKey(10 + n), 16, n)
    np.testing.assert_allclose(
        cholesky_small(m), jnp.linalg.cholesky(m), rtol=1e-9, atol=1e-11
    )


def test_solve():
    m = spd(jax.random.PRNGKey(42), 8, 4)
    b = jax.random.normal(jax.random.PRNGKey(1), (8, 4, 3), dtype=jnp.float64)
    np.testing.assert_allclose(
        solve_spd_small(m, b), jnp.linalg.solve(m, b), rtol=1e-8, atol=1e-10
    )
