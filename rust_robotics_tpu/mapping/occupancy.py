"""Occupancy-grid mapping: log-odds updates with ray casting.

Reference: crates/rust_robotics_mapping/src/occupancy_grid_map.rs (log-odds
config :8-37: occ +0.85, free −0.4, clamp ±5), lidar_to_grid_map.rs
(Bresenham free-space carving per beam), ray_casting_grid_map.rs
(free/occupied/unknown per-beam rasters).

TPU-native inversion: Bresenham's incremental integer walk is replaced by
*parametric ray marching* — every beam is sampled at S uniform points up to
its hit distance and the visited cells get a scatter-add of free/occupied
log-odds. All beams march in parallel ([B, S] gather/scatter); duplicate
visits within one beam are deduped by cell so each beam contributes at most
one update per cell (matching the one-visit-per-cell Bresenham contract).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class OccupancyGridConfig:
    """occupancy_grid_map.rs:8-37."""

    prior_log_odds: float = 0.0
    occupied_log_odds: float = 0.85
    free_log_odds: float = -0.4
    max_log_odds: float = 5.0
    min_log_odds: float = -5.0


def _cells_along_rays(origin, endpoints, spec, samples):
    """[B, S] flat cell indices marching each ray origin->endpoint, plus a
    dedupe mask (first visit of each cell within the ray)."""
    t = jnp.linspace(0.0, 1.0, samples)[None, :, None]  # [1, S, 1]
    pts = origin[None, None, :] + t * (endpoints[:, None, :] - origin[None, None, :])
    idx = jnp.floor(
        (pts - jnp.array([spec.min_x, spec.min_y])) / spec.resolution
    ).astype(jnp.int32)
    ix = jnp.clip(idx[..., 0], 0, spec.width - 1)
    iy = jnp.clip(idx[..., 1], 0, spec.height - 1)
    flat = ix * spec.height + iy
    first = jnp.concatenate(
        [jnp.ones_like(flat[:, :1], dtype=bool), flat[:, 1:] != flat[:, :-1]],
        axis=1,
    )
    return flat, first


def raycast_update(log_odds, origin, endpoints, spec, hit_mask=None,
                   cfg: OccupancyGridConfig = OccupancyGridConfig(),
                   samples: int = 256):
    """One scan update: carve free cells along each beam, mark the endpoint
    cell occupied (lidar_to_grid_map.rs + occupancy_grid_map.rs semantics).

    log_odds [W, H]; origin [2]; endpoints [B, 2]; hit_mask [B] marks beams
    that ended on an obstacle (max-range beams only carve free space).
    """
    w, h = log_odds.shape
    flat, first = _cells_along_rays(origin, endpoints, spec, samples)
    # free updates exclude the final cell of hit beams
    end_flat = flat[:, -1]
    is_end = flat == end_flat[:, None]
    free_updates = first & ~is_end
    delta = jnp.zeros((w * h,), dtype=log_odds.dtype)
    delta = delta.at[flat.ravel()].add(
        jnp.where(free_updates, cfg.free_log_odds, 0.0).ravel()
    )
    occ = cfg.occupied_log_odds if hit_mask is None else jnp.where(
        hit_mask, cfg.occupied_log_odds, 0.0
    )
    delta = delta.at[end_flat].add(occ)
    out = log_odds + delta.reshape(w, h)
    return jnp.clip(out, cfg.min_log_odds, cfg.max_log_odds)


def lidar_to_grid(origin, angles, ranges, spec, max_range=None,
                  cfg: OccupancyGridConfig = OccupancyGridConfig(),
                  samples: int = 256):
    """Build a log-odds grid from one polar scan (lidar_to_grid_map.rs):
    returns [W, H] log odds. Beams at max_range carve free space only."""
    endpoints = origin + jnp.stack(
        [ranges * jnp.cos(angles), ranges * jnp.sin(angles)], axis=-1
    )
    hit = None if max_range is None else ranges < max_range
    grid0 = jnp.full((spec.width, spec.height), cfg.prior_log_odds)
    return raycast_update(grid0, origin, endpoints, spec, hit, cfg, samples)


def occupancy_probability(log_odds):
    """p = 1 − 1/(1+exp(l))."""
    return 1.0 - 1.0 / (1.0 + jnp.exp(log_odds))
