"""Gaussian grid map: distance-based occupancy likelihood raster.

Reference: crates/rust_robotics_mapping/src/gaussian_grid_map.rs:30-93 —
per cell, probability = 1 − Φ(d_min; 0, σ)·... (normal CDF of the distance
to the nearest obstacle point). One batched distance-matrix min + CDF.
"""

import jax.numpy as jnp
from jax.scipy.stats import norm


def gaussian_grid_map(ox, oy, resolution, std_dev, extend=10.0):
    """Returns (prob [W, H], min_x, min_y). Cell value =
    1 − normal_cdf(d_nearest, 0, σ) (gaussian_grid_map.rs:30-68)."""
    ox = jnp.asarray(ox)
    oy = jnp.asarray(oy)
    min_x = jnp.min(ox) - extend
    min_y = jnp.min(oy) - extend
    max_x = jnp.max(ox) + extend
    max_y = jnp.max(oy) + extend
    w = jnp.int32(jnp.round((max_x - min_x) / resolution))
    h = jnp.int32(jnp.round((max_y - min_y) / resolution))
    # static shapes for jit: host-side sizing
    w = int(w)
    h = int(h)
    xs = min_x + resolution * jnp.arange(w)
    ys = min_y + resolution * jnp.arange(h)
    cx = xs[:, None, None]
    cy = ys[None, :, None]
    d = jnp.sqrt((cx - ox) ** 2 + (cy - oy) ** 2)  # [W, H, N]
    d_min = jnp.min(d, axis=-1)
    prob = 1.0 - norm.cdf(d_min, 0.0, std_dev)
    return prob, min_x, min_y
