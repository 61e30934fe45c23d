"""Occupancy grid construction for grid planners.

Reference: crates/rust_robotics_planning/src/grid.rs — GridMap::try_new
(:71-122) builds a bool occupancy raster from obstacle *points* with
robot-radius inflation (cell blocked iff some point lies within
robot_radius of the cell's world position); world<->index uses `.round()`
(:136-158) and grid positions are `index*resolution + min` (cell corners,
not centers).

TPU-native inversion: the reference's triple loop (cells × points with early
break) becomes one batched distance computation — a [cells × points] squared
-distance matrix evaluated in tiles (MXU-friendly: |c-p|² = |c|² + |p|² -
2c·p), reduced with min over points. O(W·H·N) FLOPs but completely dense and
fused — the TPU analog of "native code" for this op.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from rust_robotics_tpu.core.types import pytree_dataclass


@pytree_dataclass
class GridMap:
    """blocked: [W, H] bool raster indexed [ix, iy] (True = obstacle), plus
    static geometry carried as arrays (min_x/min_y/resolution scalars)."""

    blocked: Any
    min_x: Any
    min_y: Any
    resolution: Any

    @property
    def x_width(self) -> int:
        return self.blocked.shape[-2]

    @property
    def y_width(self) -> int:
        return self.blocked.shape[-1]

    def world_to_index(self, xy):
        """`grid.rs:136`: round((p - min) / resolution)."""
        origin = jnp.stack([self.min_x, self.min_y], axis=-1)
        return jnp.round((xy - origin) / self.resolution).astype(jnp.int32)

    def index_to_world(self, idx):
        """`grid.rs:152`: index * resolution + min."""
        origin = jnp.stack([self.min_x, self.min_y], axis=-1)
        return idx.astype(origin.dtype) * self.resolution + origin

    def free(self):
        return ~self.blocked


def grid_from_raster(blocked, min_x=0.0, min_y=0.0, resolution=1.0):
    blocked = jnp.asarray(blocked, dtype=bool)
    f = jnp.result_type(float)
    return GridMap(
        blocked,
        jnp.asarray(min_x, dtype=f),
        jnp.asarray(min_y, dtype=f),
        jnp.asarray(resolution, dtype=f),
    )


def grid_from_obstacle_points(ox, oy, resolution, robot_radius, tile=4096):
    """Build an inflated occupancy grid from obstacle points — the exact
    contract of GridMap::try_new (grid.rs:71-122): extents are rounded mins/
    maxes of the points; widths are round((max-min)/res); a cell at world
    position (ix*res+min_x, iy*res+min_y) is blocked iff min distance to any
    point is <= robot_radius.

    Host-side sizing (Python floats) + device-side distance min-reduction.
    """
    ox = jnp.asarray(ox)
    oy = jnp.asarray(oy)
    f = jnp.result_type(float)
    min_x = float(round(float(jnp.min(ox))))
    min_y = float(round(float(jnp.min(oy))))
    max_x = float(round(float(jnp.max(ox))))
    max_y = float(round(float(jnp.max(oy))))
    x_width = int(round((max_x - min_x) / resolution))
    y_width = int(round((max_y - min_y) / resolution))
    if x_width <= 0 or y_width <= 0:
        raise ValueError("obstacles must span a non-zero 2D area")

    pts = jnp.stack([ox, oy], axis=-1).astype(f)
    xs = min_x + resolution * jnp.arange(x_width, dtype=f)
    ys = min_y + resolution * jnp.arange(y_width, dtype=f)
    cells = jnp.stack(
        [
            jnp.repeat(xs, y_width),
            jnp.tile(ys, x_width),
        ],
        axis=-1,
    )  # [W*H, 2]

    r2 = jnp.asarray(robot_radius, dtype=f) ** 2

    def blocked_tile(c):
        d2 = (
            jnp.sum(c**2, axis=-1, keepdims=True)
            + jnp.sum(pts**2, axis=-1)
            - 2.0 * c @ pts.T
        )
        return jnp.min(d2, axis=-1) <= r2

    n = cells.shape[0]
    pad = (-n) % tile
    cells_p = jnp.pad(cells, ((0, pad), (0, 0)))
    out = jax.lax.map(blocked_tile, cells_p.reshape(-1, tile, 2))
    blocked = out.reshape(-1)[:n].reshape(x_width, y_width)
    return GridMap(
        blocked,
        jnp.asarray(min_x, dtype=f),
        jnp.asarray(min_y, dtype=f),
        jnp.asarray(resolution, dtype=f),
    )
