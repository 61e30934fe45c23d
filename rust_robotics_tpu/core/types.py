"""Core value types as JAX pytrees (struct-of-arrays batches).

Reference surface: crates/rust_robotics_core/src/types.rs (Point2D:17,
Pose2D:90, State2D:141, ControlInput:189, Path2D:219, Obstacles:344,
Covariance2D/4D:407-421). The TPU-native inversion (SURVEY.md §7.1): instead
of one object per instance with `&mut self` stepping, every type here is an
immutable pytree whose leaves carry arbitrary leading batch dimensions, so a
"filter" is `step(belief[B], u[B], z[B]) -> belief[B]` under jit/vmap/
shard_map.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from rust_robotics_tpu.core.angles import normalize_angle


def pytree_dataclass(cls):
    """Register a frozen dataclass as a JAX pytree (all fields are leaves)."""
    cls = dataclasses.dataclass(frozen=True)(cls)
    fields = [f.name for f in dataclasses.fields(cls)]
    jax.tree_util.register_dataclass(cls, data_fields=fields, meta_fields=[])
    return cls


def static_dataclass(cls):
    """A frozen dataclass holding static (trace-time) configuration only."""
    return dataclasses.dataclass(frozen=True)(cls)


@pytree_dataclass
class Pose2D:
    """SE(2) pose. `types.rs:90`. Leaves: [..., ] scalars (batchable)."""

    x: Any
    y: Any
    yaw: Any

    def normalized(self) -> "Pose2D":
        return Pose2D(self.x, self.y, normalize_angle(self.yaw))

    def as_array(self):
        return jnp.stack([self.x, self.y, self.yaw], axis=-1)

    @staticmethod
    def from_array(a) -> "Pose2D":
        return Pose2D(a[..., 0], a[..., 1], a[..., 2])


@pytree_dataclass
class State2D:
    """Unicycle state [x, y, yaw, v]. `types.rs:141`."""

    x: Any
    y: Any
    yaw: Any
    v: Any

    def as_array(self):
        return jnp.stack([self.x, self.y, self.yaw, self.v], axis=-1)

    @staticmethod
    def from_array(a) -> "State2D":
        return State2D(a[..., 0], a[..., 1], a[..., 2], a[..., 3])


@pytree_dataclass
class GaussianBelief:
    """Batched Gaussian state belief: mean [..., n], covariance [..., n, n].

    The shared belief type of the whole Kalman family (EKF/IEKF/UKF/CKF/
    SR-UKF/EnKF consume and produce it), replacing the per-filter structs of
    the reference (`ekf.rs:84-90` state+covariance members).
    """

    mean: Any
    cov: Any

    @property
    def dim(self) -> int:
        return self.mean.shape[-1]


@pytree_dataclass
class Path2D:
    """Padded waypoint path: points [..., N, 2] + valid mask [..., N].

    Reference `Path2D` (`types.rs:219`) grows a Vec; here capacity is static
    and `mask` marks live waypoints so shapes stay XLA-friendly.
    """

    points: Any
    mask: Any

    def total_length(self):
        """Arc length over valid consecutive segments. `types.rs` total_length."""
        deltas = self.points[..., 1:, :] - self.points[..., :-1, :]
        seg = jnp.linalg.norm(deltas, axis=-1)
        valid = self.mask[..., 1:] * self.mask[..., :-1]
        return jnp.sum(seg * valid, axis=-1)

    def num_valid(self):
        return jnp.sum(self.mask.astype(jnp.int32), axis=-1)


@static_dataclass
class GridSpec2D:
    """Static occupancy-grid geometry (world<->index math).

    Mirrors the coordinate contract of the reference GridMap
    (`rust_robotics_planning/src/grid.rs:136-175`): cell index i maps to world
    x = min_x + (i + 0.5) * resolution (cell centers).
    """

    min_x: float
    min_y: float
    resolution: float
    width: int
    height: int

    @property
    def max_x(self) -> float:
        return self.min_x + self.width * self.resolution

    @property
    def max_y(self) -> float:
        return self.min_y + self.height * self.resolution

    def world_to_index(self, xy):
        """World coords [..., 2] -> integer cell indices [..., 2] (ix, iy)."""
        rel = (xy - jnp.array([self.min_x, self.min_y], dtype=xy.dtype)) / self.resolution
        return jnp.floor(rel).astype(jnp.int32)

    def index_to_world(self, idx):
        """Cell indices [..., 2] -> world coords of cell centers [..., 2]."""
        base = jnp.array([self.min_x, self.min_y])
        return base + (idx.astype(jnp.float32) + 0.5) * self.resolution

    def in_bounds(self, idx):
        ix, iy = idx[..., 0], idx[..., 1]
        return (ix >= 0) & (ix < self.width) & (iy >= 0) & (iy < self.height)
