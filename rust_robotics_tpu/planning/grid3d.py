"""3D voxel grid planning: 6/26-connected wavefront relaxation.

Reference: crates/rust_robotics_planning/src/grid_a_star_3d.rs (A* over a
voxel grid with 6- or 26-connected motion, BinaryHeap + HashMap closed set).

TPU-native shape: the same min-plus stencil as `planning/wavefront.py`
lifted to 3 axes — each sweep is 6 (or 26) shifted adds + a min reduction
over a [W, H, D] raster, batched over a leading query axis by vmap. Path
extraction is greedy steepest descent (a scan), as in 2D.
"""

from __future__ import annotations

import functools
import itertools
import math

import jax
import jax.numpy as jnp

__all__ = ["wavefront_costs_3d", "extract_path_3d", "plan_grid_3d"]


def _motions_3d(connectivity: int):
    if connectivity == 6:
        deltas = [
            (1, 0, 0), (-1, 0, 0), (0, 1, 0), (0, -1, 0), (0, 0, 1),
            (0, 0, -1),
        ]
    else:  # 26-connected
        deltas = [
            d for d in itertools.product((-1, 0, 1), repeat=3)
            if d != (0, 0, 0)
        ]
    return tuple(
        (dx, dy, dz, math.sqrt(dx * dx + dy * dy + dz * dz))
        for dx, dy, dz in deltas
    )


def _shift3(a, dx, dy, dz, fill):
    w, h, d = a.shape[-3], a.shape[-2], a.shape[-1]
    pad = [(0, 0)] * (a.ndim - 3) + [(1, 1)] * 3
    p = jnp.pad(a, pad, constant_values=fill)
    p = jax.lax.slice_in_dim(p, 1 + dx, 1 + dx + w, axis=-3)
    p = jax.lax.slice_in_dim(p, 1 + dy, 1 + dy + h, axis=-2)
    return jax.lax.slice_in_dim(p, 1 + dz, 1 + dz + d, axis=-1)


@functools.partial(
    jax.jit, static_argnames=("connectivity", "max_iters", "block")
)
def wavefront_costs_3d(free, goals, connectivity: int = 26,
                       max_iters: int | None = None, block: int = 8):
    """Optimal cost-to-go over a [W, H, D] voxel raster (grid_a_star_3d.rs
    cost parity: Euclidean step costs 1/√2/√3). Both move endpoints must be
    free (the reference's 3D model has no corner rule)."""
    motions = _motions_3d(connectivity)
    f = jnp.result_type(float)
    free = jnp.asarray(free, bool)
    big = jnp.asarray(jnp.finfo(f).max / 4, f)
    d0 = jnp.where(goals & free, jnp.zeros((), f), big)
    if max_iters is None:
        max_iters = free.shape[-3] * free.shape[-2] * free.shape[-1]

    masks = [free & _shift3(free, dx, dy, dz, False)
             for dx, dy, dz, _ in motions]

    def sweep(d):
        best = d
        for (dx, dy, dz, c), m in zip(motions, masks):
            cand = _shift3(d, dx, dy, dz, big) + jnp.asarray(c, f)
            best = jnp.minimum(best, jnp.where(m, cand, big))
        return best

    def body(carry):
        d, _, it = carry
        new = d
        for _ in range(block):
            new = sweep(new)
        return new, jnp.any(new < d), it + block

    def cond(carry):
        _, changed, it = carry
        return changed & (it < max_iters)

    d, _, _ = jax.lax.while_loop(cond, body, (d0, jnp.asarray(True), 0))
    return jnp.where(d >= big, jnp.inf, d)


@functools.partial(jax.jit, static_argnames=("max_len", "connectivity"))
def extract_path_3d(costs, free, start_idx, max_len: int = 512,
                    connectivity: int = 26):
    """Greedy steepest descent down the 3D cost field; returns
    (indices [L, 3], mask [L], path_cost)."""
    motions = _motions_3d(connectivity)
    f = costs.dtype
    big = jnp.asarray(jnp.finfo(f).max / 4, f)
    d = jnp.where(jnp.isinf(costs), big, costs)
    w, h, dd = free.shape
    masks = jnp.stack([
        free & _shift3(free, dx, dy, dz, False) for dx, dy, dz, _ in motions
    ])
    deltas = jnp.array([(dx, dy, dz) for dx, dy, dz, _ in motions],
                       jnp.int32)
    step_costs = jnp.array([c for *_, c in motions], f)

    def step(carry, _):
        pos, done = carry
        here = d[pos[0], pos[1], pos[2]]
        at_goal = here <= 0.0
        nbrs = pos + deltas
        nx = jnp.clip(nbrs[:, 0], 0, w - 1)
        ny = jnp.clip(nbrs[:, 1], 0, h - 1)
        nz = jnp.clip(nbrs[:, 2], 0, dd - 1)
        valid = masks[:, pos[0], pos[1], pos[2]]
        cand = jnp.where(valid, step_costs + d[nx, ny, nz], big)
        best = jnp.argmin(cand)
        descends = d[nx[best], ny[best], nz[best]] < here
        move = (~done) & (~at_goal) & (here < big) & descends
        new_pos = jnp.where(move, nbrs[best], pos)
        return (new_pos, done | at_goal | (~move)), (new_pos, move)

    start = jnp.asarray(start_idx, jnp.int32)
    (_, _), (positions, moved) = jax.lax.scan(
        step, (start, jnp.asarray(False)), None, length=max_len - 1
    )
    idx = jnp.concatenate([start[None], positions], axis=0)
    mask = jnp.concatenate([jnp.array([True]), moved], axis=0)
    return idx, mask, costs[start[0], start[1], start[2]]


def plan_grid_3d(free, start_idx, goal_idx, connectivity: int = 26,
                 max_len: int = 512):
    """Single-query 3D plan: wavefront from the goal voxel, descend from the
    start. Returns (indices [L, 3], mask, cost)."""
    w, h, d = free.shape
    gx = jax.lax.broadcasted_iota(jnp.int32, (w, h, d), 0)
    gy = jax.lax.broadcasted_iota(jnp.int32, (w, h, d), 1)
    gz = jax.lax.broadcasted_iota(jnp.int32, (w, h, d), 2)
    goal_idx = jnp.asarray(goal_idx)
    goals = (gx == goal_idx[0]) & (gy == goal_idx[1]) & (gz == goal_idx[2])
    costs = wavefront_costs_3d(free, goals, connectivity=connectivity)
    return extract_path_3d(costs, jnp.asarray(free, bool),
                           start_idx, max_len=max_len,
                           connectivity=connectivity)
