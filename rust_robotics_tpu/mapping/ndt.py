"""Normal Distributions Transform (NDT) grid.

Reference: crates/rust_robotics_mapping/src/ndt.rs — bucket scan points into
grid cells; per cell store mean + covariance of its points (`NDTGrid`/
`NDTMap`, ~300 LoC).

TPU-native: bucketing is a segment-sum over flat cell ids — means and
second moments accumulate in one scatter-add pass; covariance = E[xxᵀ] −
μμᵀ with a minimum-point mask. Static [W·H] cell capacity.
"""

import jax
import jax.numpy as jnp


def ndt_grid(points, min_xy, resolution, width, height, min_points=3):
    """points [N, 2] -> (mean [W, H, 2], cov [W, H, 2, 2], count [W, H],
    valid [W, H])."""
    rel = (points - jnp.asarray(min_xy)) / resolution
    idx = jnp.floor(rel).astype(jnp.int32)
    ix = jnp.clip(idx[:, 0], 0, width - 1)
    iy = jnp.clip(idx[:, 1], 0, height - 1)
    flat = ix * height + iy
    n_cells = width * height

    count = jax.ops.segment_sum(jnp.ones_like(flat, jnp.float32), flat, n_cells)
    s1 = jax.ops.segment_sum(points, flat, n_cells)  # [C, 2]
    s2 = jax.ops.segment_sum(
        points[:, :, None] * points[:, None, :], flat, n_cells
    )  # [C, 2, 2]
    denom = jnp.clip(count, 1.0, None)
    mean = s1 / denom[:, None]
    cov = s2 / denom[:, None, None] - mean[:, :, None] * mean[:, None, :]
    valid = count >= min_points
    return (
        mean.reshape(width, height, 2),
        cov.reshape(width, height, 2, 2),
        count.reshape(width, height),
        valid.reshape(width, height),
    )


def ndt_score(query_points, mean, cov, valid, min_xy, resolution, eps=1e-3):
    """NDT matching score of query points against the grid: Σ exp(−½ dᵀΣ⁻¹d)
    for the containing cell (ndt.rs scoring)."""
    from rust_robotics_tpu.ops.smallmat import inv_spd_small

    w, h = valid.shape
    rel = (query_points - jnp.asarray(min_xy)) / resolution
    idx = jnp.floor(rel).astype(jnp.int32)
    ix = jnp.clip(idx[:, 0], 0, w - 1)
    iy = jnp.clip(idx[:, 1], 0, h - 1)
    mu = mean[ix, iy]
    sig = cov[ix, iy] + eps * jnp.eye(2)
    d = query_points - mu
    m = jnp.einsum("ni,nij,nj->n", d, inv_spd_small(sig), d)
    ok = valid[ix, iy]
    return jnp.sum(jnp.where(ok, jnp.exp(-0.5 * m), 0.0))
