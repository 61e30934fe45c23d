"""Grid planning as batched wavefront (min-plus stencil) relaxation.

Reference surface: the ~25 heap-based best-first grid planners of
crates/rust_robotics_planning (A* a_star.rs:93-235, Dijkstra dijkstra.rs,
BFS/DFS/greedy/fringe/..., 8-connected motion model grid.rs:29-44 with
no-corner-cutting diagonal rule grid.rs:206-236).

TPU-native inversion (SURVEY.md §7.1): a BinaryHeap + HashMap expansion loop
is control-flow hostile on an accelerator, so search is reformulated as
iterated Bellman-Ford relaxation over the occupancy raster: the cost-to-go
field D satisfies D = min(D, shift_d(D) + c_d) over the 8 motion directions;
iterating to fixpoint yields exactly the Dijkstra/A* optimal costs (min-plus
algebra is idempotent — convergence is monotone). Each iteration is 8
shifted adds + a min reduction: pure VPU work, fused by XLA, batched over a
leading query axis (the "grid cells relaxed/s" metric of BASELINE.md).

Parity contract: expansion order is not part of the reference's observable
contract; *path cost and feasibility* are (SURVEY.md §7.1). The fixpoint D
equals A*'s g-cost at every reachable cell, so path costs match the
reference planners exactly; MovingAI `.scen` octile optima double as golden
values.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from rust_robotics_tpu.core.types import Path2D

SQRT2 = 1.4142135623730951

# 8-connected motion model, matching grid.rs:29-44 ordering
MOTIONS_8 = (
    (1, 0, 1.0),
    (0, 1, 1.0),
    (-1, 0, 1.0),
    (0, -1, 1.0),
    (-1, -1, SQRT2),
    (-1, 1, SQRT2),
    (1, -1, SQRT2),
    (1, 1, SQRT2),
)
MOTIONS_4 = ((1, 0, 1.0), (0, 1, 1.0), (-1, 0, 1.0), (0, -1, 1.0))

_INF = jnp.inf


def _shift(a, dx, dy, fill):
    """shifted[x, y] = a[x+dx, y+dy], out-of-bounds -> fill. Static dx/dy."""
    w, h = a.shape[-2], a.shape[-1]
    pad = [(0, 0)] * (a.ndim - 2) + [(1, 1), (1, 1)]
    padded = jnp.pad(a, pad, constant_values=fill)
    return jax.lax.slice_in_dim(
        jax.lax.slice_in_dim(padded, 1 + dx, 1 + dx + w, axis=-2),
        1 + dy,
        1 + dy + h,
        axis=-1,
    )


def _incoming_masks(free, motions, corner_cutting):
    """allowed[d][x,y]: may cell (x,y) be relaxed from neighbor (x+dx,y+dy)?

    Encodes grid.rs:206-236 `is_valid_step` for the *incoming* move
    (x+dx,y+dy) -> (x,y): both endpoints free; a diagonal move additionally
    requires the two orthogonal side cells free (no corner cutting) unless
    `corner_cutting` is True.
    """
    masks = []
    for dx, dy, _ in motions:
        m = free & _shift(free, dx, dy, False)
        if dx != 0 and dy != 0 and not corner_cutting:
            m = m & _shift(free, dx, 0, False) & _shift(free, 0, dy, False)
        masks.append(m)
    return masks


def goal_raster(shape, goal_idx):
    """One-hot goal raster [W, H] (or batched [..., W, H] for goal_idx
    [..., 2])."""
    w, h = shape
    gx = jax.lax.broadcasted_iota(jnp.int32, (w, h), 0)
    gy = jax.lax.broadcasted_iota(jnp.int32, (w, h), 1)
    return (gx == goal_idx[..., 0:1, None]) & (gy == goal_idx[..., 1:2, None]) if goal_idx.ndim > 1 else (
        (gx == goal_idx[0]) & (gy == goal_idx[1])
    )


@functools.partial(
    jax.jit, static_argnames=("connectivity", "corner_cutting", "max_iters", "block")
)
def wavefront_costs(
    free,
    goals,
    connectivity: int = 8,
    corner_cutting: bool = False,
    max_iters: int | None = None,
    diag_cost: float = SQRT2,
    block: int = 8,
):
    """Optimal cost-to-go D [..., W, H] from every cell to the nearest goal.

    free:  [..., W, H] bool traversability raster.
    goals: [..., W, H] bool goal cells (sources of the wavefront).

    Runs `block` relaxation sweeps between convergence checks (checking
    every sweep would force a device sync per step inside while_loop; a
    blocked check keeps the loop body big and fused). Converged when a full
    block changes nothing.
    """
    motions = MOTIONS_8 if connectivity == 8 else MOTIONS_4
    motions = tuple(
        (dx, dy, diag_cost if (dx != 0 and dy != 0) else c) for dx, dy, c in motions
    )
    f = jnp.result_type(float)
    free = jnp.asarray(free, dtype=bool)
    masks = _incoming_masks(free, motions, corner_cutting)
    big = jnp.asarray(jnp.finfo(f).max / 4, dtype=f)
    d0 = jnp.where(goals & free, jnp.zeros((), f), big)
    w, h = free.shape[-2], free.shape[-1]
    if max_iters is None:
        max_iters = w * h  # worst-case path length bound

    def sweep(d):
        best = d
        for (dx, dy, c), m in zip(motions, masks):
            cand = _shift(d, dx, dy, big) + jnp.asarray(c, f)
            best = jnp.minimum(best, jnp.where(m, cand, big))
        return best

    def body(carry):
        d, _, it = carry
        new = d
        for _ in range(block):
            new = sweep(new)
        changed = jnp.any(new < d)
        return new, changed, it + block

    def cond(carry):
        _, changed, it = carry
        return changed & (it < max_iters)

    d, _, _ = jax.lax.while_loop(cond, body, (d0, jnp.asarray(True), 0))
    return jnp.where(d >= big, jnp.asarray(_INF, f), d)


@functools.partial(jax.jit, static_argnames=("max_len", "connectivity", "corner_cutting"))
def extract_path(costs, free, start_idx, max_len: int = 1024,
                 connectivity: int = 8, corner_cutting: bool = False,
                 diag_cost: float = SQRT2):
    """Greedy steepest-descent walk down the cost-to-go field.

    Replaces the reference's parent-chain back-walk (a_star.rs:207-223): the
    optimal successor of cell c is argmin_d (step_cost_d + D[c+d]); a
    `lax.scan` of `max_len` steps emits a padded index path + mask. Returns
    (indices [L, 2], mask [L], path_cost).
    """
    motions = MOTIONS_8 if connectivity == 8 else MOTIONS_4
    motions = tuple(
        (dx, dy, diag_cost if (dx != 0 and dy != 0) else c) for dx, dy, c in motions
    )
    f = costs.dtype
    big = jnp.asarray(jnp.finfo(f).max / 4, dtype=f)
    d = jnp.where(jnp.isinf(costs), big, costs)
    w, h = free.shape[-2], free.shape[-1]
    # outgoing validity: move c -> c+(dx,dy) valid iff incoming mask of the
    # reverse direction holds at c+(dx,dy); recompute directly:
    out_masks = []
    for dx, dy, _ in motions:
        m = free & _shift(free, dx, dy, False)
        if dx != 0 and dy != 0 and not corner_cutting:
            m = m & _shift(free, dx, 0, False) & _shift(free, 0, dy, False)
        out_masks.append(m)  # m[x,y]: step (x,y)->(x+dx,y+dy) allowed

    deltas = jnp.array([(dx, dy) for dx, dy, _ in motions], dtype=jnp.int32)
    step_costs = jnp.array([c for _, _, c in motions], dtype=f)
    masks = jnp.stack(out_masks)  # [D, W, H]

    def step(carry, _):
        pos, done = carry
        here = d[pos[0], pos[1]]
        at_goal = here <= 0.0
        reachable = here < big
        nbrs = pos + deltas  # [D, 2]
        nx = jnp.clip(nbrs[:, 0], 0, w - 1)
        ny = jnp.clip(nbrs[:, 1], 0, h - 1)
        valid = masks[:, pos[0], pos[1]]
        cand = jnp.where(valid, step_costs + d[nx, ny], big)
        best = jnp.argmin(cand)
        descends = d[nx[best], ny[best]] < here
        move = (~done) & (~at_goal) & reachable & descends
        new_pos = jnp.where(move, nbrs[best], pos)
        new_done = done | at_goal | (~move)
        return (new_pos, new_done), (new_pos, move)

    start = jnp.asarray(start_idx, dtype=jnp.int32)
    (_, _), (positions, moved) = jax.lax.scan(
        step, (start, jnp.asarray(False)), None, length=max_len - 1
    )
    idx = jnp.concatenate([start[None], positions], axis=0)
    mask = jnp.concatenate([jnp.array([True]), moved], axis=0)
    return idx, mask, costs[start[0], start[1]]


def plan_grid(grid, start_xy, goal_xy, connectivity=8, corner_cutting=False,
              max_len=2048, max_iters=None):
    """End-to-end single-query plan on a GridMap: world coords in, Path2D out.

    The TPU equivalent of `AStarPlanner::plan(start, goal)` (a_star.rs:165):
    wavefront from the goal, then descend from the start. Returns
    (Path2D, cost). Path includes start and goal cells, start first —
    matching the reference's start→goal ordering.
    """
    free = grid.free()
    s_idx = grid.world_to_index(jnp.asarray(start_xy))
    g_idx = grid.world_to_index(jnp.asarray(goal_xy))
    goals = goal_raster(free.shape, g_idx)
    costs = wavefront_costs(
        free, goals, connectivity=connectivity, corner_cutting=corner_cutting,
        max_iters=max_iters,
    )
    idx, mask, cost = extract_path(
        costs, free, s_idx, max_len=max_len, connectivity=connectivity,
        corner_cutting=corner_cutting,
    )
    pts = grid.index_to_world(idx)
    return Path2D(pts, mask.astype(pts.dtype)), cost
