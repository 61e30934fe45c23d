"""Euclidean distance transforms (UDF/SDF).

Reference: crates/rust_robotics_mapping/src/distance_map.rs — Felzenszwalb
1D lower-envelope passes (dt_1d :15) composed row/column → exact squared
EDT; `compute_udf` (:63) and signed `compute_sdf` (:113, outside positive).

TPU-native: the sequential lower-envelope scan is replaced by the dense
min-plus form of the same 1D transform — d[i] = min_j ((i−j)² + f[j]) — an
[n, n] broadcast-min that XLA fuses and batches over all rows at once.
Exact (same result as Felzenszwalb), O(n²) work but fully parallel, which
on TPU beats the O(n) sequential scan by orders of magnitude at raster
sizes. Separability gives the exact 2D transform in two passes.
"""

from __future__ import annotations

import jax.numpy as jnp

_BIG = 1e12


def _dt_1d_dense(f):
    """Exact 1D squared distance transform along the last axis.
    f [..., n] -> d [..., n] with d[i] = min_j ((i−j)² + f[j])."""
    n = f.shape[-1]
    i = jnp.arange(n)
    cost = (i[:, None] - i[None, :]).astype(f.dtype) ** 2  # [n, n]
    return jnp.min(f[..., None, :] + cost, axis=-1)


def squared_edt(obstacles):
    """Exact squared EDT of a bool raster [..., W, H] (cell units)."""
    f = jnp.where(obstacles, 0.0, _BIG)
    f = _dt_1d_dense(f)  # along H
    f = jnp.swapaxes(_dt_1d_dense(jnp.swapaxes(f, -1, -2)), -1, -2)  # along W
    return f


def compute_udf(obstacles):
    """Unsigned distance field (distance_map.rs:63): 0 on obstacle cells."""
    return jnp.sqrt(jnp.clip(squared_edt(obstacles), 0.0, None))


def compute_sdf(obstacles):
    """Signed distance field (distance_map.rs:113): positive outside
    obstacles, negative inside (distance to the complement)."""
    outside = compute_udf(obstacles)
    inside = compute_udf(~obstacles)
    return jnp.where(obstacles, -inside, outside)
