"""Gaussian-process occupancy/terrain regression.

Reference: crates/rust_robotics_mapping/src/gaussian_process.rs (193 LoC):
RBF kernel GP regression with predictive mean + variance.

TPU-native: the kernel matrix is one MXU matmul; the solve is a Cholesky on
[N, N] (generic linalg is fine here — N is the training set size, not a
tiny batched matrix).
"""

import jax.numpy as jnp


def rbf_kernel(a, b, length_scale=1.0, signal_var=1.0):
    """k(a, b) = σ² exp(−|a−b|²/(2ℓ²)); a [N, d], b [M, d] -> [N, M]."""
    d2 = (
        jnp.sum(a**2, axis=-1, keepdims=True)
        + jnp.sum(b**2, axis=-1)
        - 2.0 * a @ b.T
    )
    return signal_var * jnp.exp(-0.5 * d2 / length_scale**2)


def gp_regression(train_x, train_y, query_x, length_scale=1.0,
                  signal_var=1.0, noise_var=1e-2):
    """Predictive (mean [M], variance [M]) at query_x."""
    k = rbf_kernel(train_x, train_x, length_scale, signal_var)
    k = k + noise_var * jnp.eye(train_x.shape[0], dtype=k.dtype)
    l = jnp.linalg.cholesky(k)
    alpha = jnp.linalg.solve(l.T, jnp.linalg.solve(l, train_y))
    ks = rbf_kernel(train_x, query_x, length_scale, signal_var)  # [N, M]
    mean = ks.T @ alpha
    v = jnp.linalg.solve(l, ks)
    var = signal_var - jnp.sum(v * v, axis=0)
    return mean, jnp.clip(var, 0.0, None)
