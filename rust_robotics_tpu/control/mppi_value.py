"""MPPI terminal-value machinery: value grids, tracks, replay learning.

Reference: crates/rust_robotics_control/src/mppi.rs —
`MppiTerminalValueGrid2D` (:362, bilinear-interpolated value raster with
clamped out-of-bounds queries, `from_goal_distance` :386,
`update_cell_toward` :464), `MppiWaypointTrack2D` (:505, polyline
projection/progress + `terminal_value_grid` :605 mixing remaining-progress
and lateral error), `MppiTerminalValueUpdater2D` (:672, TD-style update of
visited cells toward discounted cost-to-go, `discounted_cost_to_go` :1506),
`MppiTerminalValueReplayBuffer2D` (:715, FIFO rollout replay), and the
value-augmented terminal cost in the controller (`terminal_value_cost`
:1114).

TPU-native design: the grid is a plain [W, H] array inside a pytree so
value lookup is a batched gather + bilinear blend over all K rollout
endpoints at once; track projection is a vmapped segment-projection argmin;
the replay buffer is a fixed-capacity masked ring (no realloc — shapes stay
static under jit); the per-rollout cell update keeps the reference's
sequential visit order with a `lax.scan` so duplicate-cell visits compose
identically. A wavefront cost-to-go field (planning/wavefront.py) plugs in
directly as an obstacle-aware terminal value — the composition the
reference builds by hand with `from_goal_distance`.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from rust_robotics_tpu.core.types import pytree_dataclass


# ---------------------------------------------------------------------------
# terminal value grid
# ---------------------------------------------------------------------------

@pytree_dataclass
class TerminalValueGrid:
    """MppiTerminalValueGrid2D analog (mppi.rs:362-493)."""

    origin: Any      # [2]
    resolution: Any  # scalar
    values: Any      # [W, H]


def grid_from_goal_distance(width, height, origin, resolution, goal,
                            dtype=None):
    """Euclidean goal-distance value grid (mppi.rs:386-410)."""
    f = dtype or jnp.result_type(float)
    origin = jnp.asarray(origin, f)
    goal = jnp.asarray(goal, f)
    gx = origin[0] + jnp.arange(width, dtype=f) * resolution
    gy = origin[1] + jnp.arange(height, dtype=f) * resolution
    d = jnp.hypot(gx[:, None] - goal[0], gy[None, :] - goal[1])
    return TerminalValueGrid(origin, jnp.asarray(resolution, f), d)


def grid_value_at(grid: TerminalValueGrid, xy):
    """Bilinear value lookup with edge clamping (mppi.rs:416-435).
    xy [..., 2] → [...]."""
    w, h = grid.values.shape
    g = (xy - grid.origin) / grid.resolution
    gx = jnp.clip(g[..., 0], 0.0, w - 1.0)
    gy = jnp.clip(g[..., 1], 0.0, h - 1.0)
    x0 = jnp.floor(gx).astype(jnp.int32)
    y0 = jnp.floor(gy).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, w - 1)
    y1 = jnp.minimum(y0 + 1, h - 1)
    tx = gx - x0
    ty = gy - y0
    v00 = grid.values[x0, y0]
    v10 = grid.values[x1, y0]
    v01 = grid.values[x0, y1]
    v11 = grid.values[x1, y1]
    return ((v00 * (1 - tx) + v10 * tx) * (1 - ty)
            + (v01 * (1 - tx) + v11 * tx) * ty)


def nearest_cell_indices(grid: TerminalValueGrid, xy):
    """Rounded, clamped cell index (mppi.rs:445-453). xy [..., 2] →
    [..., 2] int32."""
    w, h = grid.values.shape
    g = jnp.round((xy - grid.origin) / grid.resolution)
    return jnp.stack(
        [jnp.clip(g[..., 0], 0, w - 1), jnp.clip(g[..., 1], 0, h - 1)],
        axis=-1,
    ).astype(jnp.int32)


# ---------------------------------------------------------------------------
# waypoint track
# ---------------------------------------------------------------------------

@pytree_dataclass
class WaypointTrack:
    """MppiWaypointTrack2D analog (mppi.rs:505-643)."""

    waypoints: Any           # [N, 2]
    cumulative_lengths: Any  # [N]


def make_track(waypoints):
    w = jnp.asarray(waypoints, jnp.result_type(float))
    seg = jnp.linalg.norm(jnp.diff(w, axis=0), axis=-1)
    cum = jnp.concatenate([jnp.zeros((1,), w.dtype), jnp.cumsum(seg)])
    return WaypointTrack(w, cum)


def track_total_length(track: WaypointTrack):
    return track.cumulative_lengths[-1]


def track_project(track: WaypointTrack, xy):
    """Project xy [..., 2] onto the polyline: returns (progress [...],
    lateral_error [...], closest [..., 2]) — mppi.rs:563-598."""
    a = track.waypoints[:-1]           # [S, 2]
    b = track.waypoints[1:]
    ab = b - a
    seg_len2 = jnp.maximum(jnp.sum(ab * ab, axis=-1), 1e-30)
    ap = xy[..., None, :] - a          # [..., S, 2]
    t = jnp.clip(jnp.sum(ap * ab, axis=-1) / seg_len2, 0.0, 1.0)
    closest = a + t[..., None] * ab    # [..., S, 2]
    d = jnp.linalg.norm(xy[..., None, :] - closest, axis=-1)
    best = jnp.argmin(d, axis=-1)      # first minimum, like the scan loop
    bt = jnp.take_along_axis(t, best[..., None], axis=-1)[..., 0]
    lateral = jnp.take_along_axis(d, best[..., None], axis=-1)[..., 0]
    seg_len = jnp.sqrt(seg_len2)
    progress = (track.cumulative_lengths[best]
                + bt * seg_len[best])
    closest_pt = jnp.take_along_axis(
        closest, best[..., None, None], axis=-2)[..., 0, :]
    return progress, lateral, closest_pt


def track_remaining_distance(track: WaypointTrack, xy):
    progress, _, _ = track_project(track, xy)
    return jnp.maximum(track_total_length(track) - progress, 0.0)


def track_terminal_value_grid(track: WaypointTrack, width, height, origin,
                              resolution, progress_weight=1.0,
                              lateral_weight=1.0):
    """Progress/lateral terminal value raster (mppi.rs:605-642)."""
    f = track.waypoints.dtype
    origin = jnp.asarray(origin, f)
    gx = origin[0] + jnp.arange(width, dtype=f) * resolution
    gy = origin[1] + jnp.arange(height, dtype=f) * resolution
    pts = jnp.stack(jnp.meshgrid(gx, gy, indexing="ij"), axis=-1)
    progress, lateral, _ = track_project(track, pts)
    remaining = jnp.maximum(track_total_length(track) - progress, 0.0)
    values = progress_weight * remaining + lateral_weight * lateral
    return TerminalValueGrid(origin, jnp.asarray(resolution, f), values)


# ---------------------------------------------------------------------------
# TD-style learning from rollouts
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class ValueUpdateConfig:
    """MppiTerminalValueUpdateConfig2D defaults (mppi.rs:652-658)."""

    learning_rate: float = 0.25
    discount: float = 0.98

    def validate(self):
        if not (0.0 < self.learning_rate <= 1.0):
            raise ValueError("learning_rate must be in (0, 1]")
        if not (0.0 <= self.discount <= 1.0):
            raise ValueError("discount must be in [0, 1]")


def discounted_cost_to_go(stage_costs, discount):
    """v[i] = c[i] + γ·v[i+1], v[last] = c[last] (mppi.rs:1506-1514).
    Reverse associative scan — O(log H) depth on device."""
    rev = jnp.flip(stage_costs, axis=-1)

    def step(carry, c):
        v = c + discount * carry
        return v, v

    _, vals = jax.lax.scan(step, jnp.zeros((), stage_costs.dtype), rev)
    return jnp.flip(vals, axis=-1)


def update_grid_from_rollout(grid: TerminalValueGrid, states, stage_costs,
                             cfg: ValueUpdateConfig = ValueUpdateConfig(),
                             valid=None):
    """One rollout's TD update of visited cells (mppi.rs:682-713).

    states [H, n] (positions in [..., :2]), stage_costs [H]. Visits update
    sequentially (scan) so repeated cells compose exactly like the
    reference. Returns (grid', report dict).
    """
    targets = discounted_cost_to_go(stage_costs, cfg.discount)
    cells = nearest_cell_indices(grid, states[..., :2])
    if valid is None:
        valid = jnp.ones(stage_costs.shape, bool)

    def visit(values, inp):
        cell, target, ok = inp
        old = values[cell[0], cell[1]]
        new = jnp.maximum(old + cfg.learning_rate * (target - old), 0.0)
        new = jnp.where(ok, new, old)
        delta = jnp.abs(new - old)
        return values.at[cell[0], cell[1]].set(new), delta

    values, deltas = jax.lax.scan(
        visit, grid.values, (cells, targets, valid))
    count = jnp.maximum(jnp.sum(valid), 1)
    report = {
        "updates": jnp.sum(valid),
        "mean_abs_delta": jnp.sum(deltas) / count,
        "max_abs_delta": jnp.max(deltas),
        "start_target": targets[0],
        "terminal_target": targets[-1],
    }
    return TerminalValueGrid(grid.origin, grid.resolution, values), report


# ---------------------------------------------------------------------------
# replay buffer (fixed-capacity masked ring)
# ---------------------------------------------------------------------------

@pytree_dataclass
class ReplayBuffer:
    """MppiTerminalValueReplayBuffer2D analog (mppi.rs:715-793) as a
    fixed-capacity ring: no realloc, static shapes under jit."""

    states: Any       # [C, H, n]
    stage_costs: Any  # [C, H]
    count: Any        # scalar int32 (≤ C)
    head: Any         # scalar int32 — next write slot


def make_replay_buffer(capacity, horizon, state_dim, dtype=None):
    f = dtype or jnp.result_type(float)
    if capacity <= 0:
        raise ValueError("replay capacity must be positive")
    return ReplayBuffer(
        states=jnp.zeros((capacity, horizon, state_dim), f),
        stage_costs=jnp.zeros((capacity, horizon), f),
        count=jnp.zeros((), jnp.int32),
        head=jnp.zeros((), jnp.int32),
    )


def replay_push(buf: ReplayBuffer, states, stage_costs):
    """FIFO push: overwrite the oldest slot when full (mppi.rs:754-761)."""
    c = buf.states.shape[0]
    return ReplayBuffer(
        states=buf.states.at[buf.head].set(states),
        stage_costs=buf.stage_costs.at[buf.head].set(stage_costs),
        count=jnp.minimum(buf.count + 1, c),
        head=(buf.head + 1) % c,
    )


def replay_update_grid(buf: ReplayBuffer, grid: TerminalValueGrid,
                       cfg: ValueUpdateConfig = ValueUpdateConfig()):
    """Replay every stored rollout oldest-first (mppi.rs:763-793)."""
    c = buf.states.shape[0]
    # oldest slot = head - count (mod C); iterate count slots from there
    order = (buf.head - buf.count + jnp.arange(c)) % c
    live = jnp.arange(c) < buf.count

    def do(values, inp):
        slot, ok = inp
        g = TerminalValueGrid(grid.origin, grid.resolution, values)
        g2, rep = update_grid_from_rollout(
            g, buf.states[slot], buf.stage_costs[slot], cfg,
            valid=jnp.broadcast_to(ok, buf.stage_costs[slot].shape))
        return g2.values, (rep["mean_abs_delta"], rep["max_abs_delta"], ok)

    values, (means, maxs, oks) = jax.lax.scan(do, grid.values, (order, live))
    n = jnp.maximum(buf.count, 1)
    report = {
        "rollouts": buf.count,
        "mean_abs_delta": jnp.sum(jnp.where(oks, means, 0.0)) / n,
        "max_abs_delta": jnp.max(jnp.where(oks, maxs, 0.0)),
    }
    return TerminalValueGrid(grid.origin, grid.resolution, values), report


# ---------------------------------------------------------------------------
# value-augmented MPPI terminal cost
# ---------------------------------------------------------------------------

def make_value_terminal_cost(grid: TerminalValueGrid, weight=1.0,
                             base_terminal=None):
    """terminal_value_cost analog (mppi.rs:1114-1122): adds the
    interpolated grid value at the rollout endpoint to an optional base
    terminal cost. Batched over rollout endpoints."""

    def terminal(state):
        v = weight * grid_value_at(grid, state[..., :2])
        if base_terminal is not None:
            v = v + base_terminal(state)
        return v

    return terminal
