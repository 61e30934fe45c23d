"""Jump Point Search with real jump rules, as JPS+ distance tables.

Reference surface: crates/rust_robotics_planning/src/jps.rs (Harabor &
Grastien 2011 online graph pruning; jump/forced-neighbor rules under the
no-corner-cutting diagonal convention of grid.rs:206-236, the same
convention `planning/wavefront.py` encodes).

TPU-native inversion: the reference's recursive `jump()` + BinaryHeap is
replaced by the JPS+ formulation (Harabor & Grastien 2014 "Improving Jump
Point Search"): per-direction *jump distance tables* computed as eight
directional `lax.scan` sweeps (each O(W) steps over an [H]-vector carry —
pure VPU work), followed by min-plus relaxation over the induced sparse
jump graph (≤ 8 successors per cell, scatter-min). The jump graph
preserves optimal grid distances, so costs match the wavefront/A* optimum
exactly while relaxing orders of magnitude fewer edges — the same
node-expansion win the reference's JPS demonstrates on its 512×512
benchmark maps (jps.rs module docs).

Strict-grid jump rules implemented (no corner cutting ⇒ diagonal moves
have no forced neighbors; see jump-point pruning for strict grids):
- cardinal travel d, perpendicular p: cell x is a jump point iff
  free(x+p) ∧ blocked(x−d+p) — the side wall just ended, so the
  alternative route around x is unavailable;
- straight jumps stop at jump points or the goal;
- diagonal jumps stop where either component cardinal jump terminates
  (at a jump point or the goal), stepping only through corner-legal
  diagonal moves.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from rust_robotics_tpu.planning.wavefront import SQRT2, _shift

__all__ = ["jump_point_mask", "jump_distances", "jps_costs", "jps_plan"]

_BIG = 1e9


def jump_point_mask(free, dx, dy):
    """Cells with a forced neighbor for cardinal travel (dx, dy)
    (jps.rs forced-neighbor rule, strict-grid form)."""
    assert (dx == 0) != (dy == 0), "cardinal directions only"
    perps = ((dy, dx), (-dy, -dx))
    m = jnp.zeros_like(free)
    for px, py in perps:
        side_open = _shift(free, px, py, False)
        behind_side_blocked = ~_shift(free, px - dx, py - dy, False)
        m = m | (side_open & behind_side_blocked)
    return m & free


def _dir_scan(vstep, snext, dx, dy):
    """dist[x,y] = #steps along (dx,dy) until a stop cell, else BIG.

    vstep[x,y]: the step (x,y)->(x+dx,y+dy) is legal.
    snext[x,y]: the cell (x+dx,y+dy) is a stop cell.
    Recurrence dist = vstep ? (snext ? 1 : 1 + dist∘shift) : BIG — one
    lax.scan along the x-axis with the y-offset folded into the carry.
    """
    if dx == 0:  # canonicalize: scan axis is always axis 0
        return _dir_scan(vstep.T, snext.T, dy, dx).T
    flip = dx > 0
    v = jnp.flip(vstep, 0) if flip else vstep
    s = jnp.flip(snext, 0) if flip else snext
    h = v.shape[1]
    f = jnp.result_type(float)

    def shift_row(row):
        if dy == 0:
            return row
        if dy > 0:
            return jnp.concatenate([row[dy:], jnp.full((dy,), _BIG, f)])
        return jnp.concatenate([jnp.full((-dy,), _BIG, f), row[:dy]])

    def step(carry, xs):
        vr, sr = xs
        nxt = shift_row(carry)
        d = jnp.where(vr, jnp.where(sr, 1.0, 1.0 + nxt), _BIG)
        d = jnp.minimum(d, _BIG)
        return d, d

    init = jnp.full((h,), _BIG, f)
    _, dist = jax.lax.scan(step, init, (v, s))
    return jnp.flip(dist, 0) if flip else dist


@functools.partial(jax.jit, static_argnames=())
def jump_distances(free, goal_mask):
    """All eight JPS+ jump-distance tables for one query.

    Returns dict {(dx, dy): dist [W,H]} where dist is the number of steps
    to the segment's stop cell (jump point / goal), BIG if the ray hits a
    wall first. Goal-aware: the goal is a stop cell for every direction
    (jps.rs jump(): `if node == goal { return Some(node) }`).
    """
    free = jnp.asarray(free, bool)
    cardinals = ((1, 0), (-1, 0), (0, 1), (0, -1))
    dist = {}
    for dx, dy in cardinals:
        vstep = free & _shift(free, dx, dy, False)
        stop = jump_point_mask(free, dx, dy) | goal_mask
        snext = _shift(stop, dx, dy, False)
        dist[(dx, dy)] = _dir_scan(vstep, snext, dx, dy)
    for dx in (-1, 1):
        for dy in (-1, 1):
            vstep = (free & _shift(free, dx, dy, False)
                     & _shift(free, dx, 0, False)
                     & _shift(free, 0, dy, False))
            # stop where a component straight jump terminates, or goal
            stop = ((dist[(dx, 0)] < _BIG) | (dist[(0, dy)] < _BIG)
                    | goal_mask)
            snext = _shift(stop, dx, dy, False)
            dist[(dx, dy)] = _dir_scan(vstep, snext, dx, dy)
    return dist


@jax.jit
def _jump_graph(free, start_idx, goal_idx):
    """Destination indices + edge costs of the jump graph, [8, W, H]."""
    free = jnp.asarray(free, bool)
    w, h = free.shape
    f = jnp.result_type(float)
    gx = jax.lax.broadcasted_iota(jnp.int32, (w, h), 0)
    gy = jax.lax.broadcasted_iota(jnp.int32, (w, h), 1)
    goal_mask = (gx == goal_idx[0]) & (gy == goal_idx[1])
    dists = jump_distances(free, goal_mask)
    dirs = list(dists.keys())
    steps = jnp.stack([dists[d] for d in dirs])
    costs_per = jnp.asarray([1.0 if 0 in d else SQRT2 for d in dirs], f)
    ddx = jnp.asarray([d[0] for d in dirs], jnp.int32)
    ddy = jnp.asarray([d[1] for d in dirs], jnp.int32)
    valid = steps < _BIG
    si = steps.astype(jnp.int32)
    tx = jnp.where(valid, gx[None] + si * ddx[:, None, None], 0)
    ty = jnp.where(valid, gy[None] + si * ddy[:, None, None], 0)
    edge_cost = jnp.where(valid, steps * costs_per[:, None, None],
                          jnp.inf).astype(f)
    d0 = jnp.full((w, h), jnp.inf, f).at[start_idx[0], start_idx[1]].set(0.0)
    return tx, ty, edge_cost, jnp.sum(valid), d0


@jax.jit
def _sweep(d, tx, ty, edge_cost):
    cand = d[None] + edge_cost  # [8, W, H]
    nd = d.at[tx.ravel(), ty.ravel()].min(cand.ravel())
    return nd, jnp.any(nd < d)


def jps_costs(free, start_idx, goal_idx, max_sweeps: int = 4096):
    """Optimal start->goal cost via min-plus relaxation of the jump graph.

    Returns (cost, costs [W,H] over jump-graph cells, stats dict with
    jump_edges / cell_edges / sweeps). costs is +inf off the jump graph —
    cost parity with `wavefront_costs` holds at the goal (and at every
    jump point on some optimal path).

    The per-sweep scatter-min is jitted; the convergence loop runs
    host-side (sweeps = optimal-path hop count, typically tens — a
    device-side while_loop around a scatter is a known slow-compile
    pattern on TPU and buys nothing here).
    """
    free = jnp.asarray(free, bool)
    w, h = free.shape
    tx, ty, edge_cost, jump_edges, d = _jump_graph(free, start_idx,
                                                   goal_idx)
    sweeps = 0
    for _ in range(max_sweeps):
        d, changed = _sweep(d, tx, ty, edge_cost)
        sweeps += 1
        if not bool(changed):
            break
    stats = {
        "jump_edges": jump_edges,
        "cell_edges": jnp.asarray(8 * w * h),
        "sweeps": jnp.asarray(sweeps),
    }
    return d[goal_idx[0], goal_idx[1]], d, stats


def jps_plan(free, start, goal):
    """Cost + stats convenience wrapper (jps.rs `JPSPlanner::plan`
    observable contract: feasibility + octile-optimal path cost)."""
    start_idx = jnp.asarray(start, jnp.int32)
    goal_idx = jnp.asarray(goal, jnp.int32)
    cost, costs, stats = jps_costs(jnp.asarray(free, bool), start_idx,
                                   goal_idx)
    import numpy as np

    found = bool(np.isfinite(float(cost)))
    return {
        "found": found,
        "cost": float(cost),
        "jump_edges": int(stats["jump_edges"]),
        "cell_edges": int(stats["cell_edges"]),
        "edge_fraction": float(stats["jump_edges"])
        / float(stats["cell_edges"]),
        "sweeps": int(stats["sweeps"]),
    }
