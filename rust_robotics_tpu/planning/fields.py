"""Potential field navigation + flow fields + coverage planners.

Reference (crates/rust_robotics_planning/src/): potential_field.rs (231 LoC:
attractive + repulsive raster, gradient descent with oscillation detection),
flow_field.rs (587: goal-distance integration field + descent, multi-agent
capable), grid_based_sweep_cpp.rs (782: boustrophedon sweep),
wavefront_cpp.rs (495: distance-transform coverage), coverage_planning.rs.

TPU-native: potential/flow fields ARE rasters — attractive/repulsive terms
evaluate dense [W, H]; descent is the wavefront extract_path machinery;
boustrophedon sweeping is a per-column mask scan.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from rust_robotics_tpu.planning.wavefront import extract_path, wavefront_costs


def potential_field(free, goal_idx, obstacle_gain=100.0, attract_gain=5.0,
                    repulse_radius=5.0):
    """Attractive (distance-to-goal) + repulsive (1/d to obstacles within
    radius) potential raster (potential_field.rs). Returns [W, H] float."""
    from rust_robotics_tpu.mapping.distance import compute_udf

    w, h = free.shape
    gx = jax.lax.broadcasted_iota(jnp.int32, (w, h), 0)
    gy = jax.lax.broadcasted_iota(jnp.int32, (w, h), 1)
    f = jnp.result_type(float)
    d_goal = jnp.sqrt(
        (gx - goal_idx[0]).astype(f) ** 2 + (gy - goal_idx[1]).astype(f) ** 2
    )
    attract = 0.5 * attract_gain * d_goal
    d_obs = compute_udf(~free)
    near = d_obs <= repulse_radius
    safe = jnp.clip(d_obs, 0.3, None)
    repulse = jnp.where(
        near, 0.5 * obstacle_gain * (1.0 / safe - 1.0 / repulse_radius) ** 2, 0.0
    )
    return attract + repulse


def descend_field(field, free, start_idx, max_len=1024):
    """Greedy 8-neighbor descent over an arbitrary potential raster."""
    return extract_path(field, free, start_idx, max_len=max_len)


def flow_field(free, goals):
    """Goal-distance integration field (flow_field.rs): the wavefront
    cost-to-go is exactly the integration field; descent directions follow
    its gradient. Batched over multiple agents by sharing ONE field."""
    return wavefront_costs(free, goals)


def boustrophedon_sweep(free, col_axis: int = 0):
    """Boustrophedon coverage order (grid_based_sweep_cpp.rs): visit free
    cells column-by-column, alternating direction. Returns (cells [N, 2]
    int ordering, mask [N]) with N = W·H capacity."""
    blocked = ~free
    w, h = free.shape
    cols = jnp.arange(w)
    rows = jnp.arange(h)

    def column(ci):
        order = jnp.where(ci % 2 == 0, rows, h - 1 - rows)
        cells = jnp.stack([jnp.full((h,), ci), order], axis=-1)
        valid = free[ci, order]
        return cells, valid

    cells, valid = jax.vmap(column)(cols)
    return cells.reshape(-1, 2), valid.reshape(-1)


def coverage_ratio(visited_mask, free):
    """Fraction of free cells covered (coverage acceptance metric)."""
    free_count = jnp.sum(free)
    return jnp.sum(visited_mask & free) / jnp.clip(free_count, 1, None)
