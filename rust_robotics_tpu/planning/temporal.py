"""Temporal planning: time-expanded wavefront (SIPP-family capability).

Reference: crates/rust_robotics_planning/src/ — sipp.rs (742 LoC,
safe-interval path planning around moving obstacles),
time_based_path_planning.rs (918), conformal_sipp.rs (639: conformal-
prediction obstacle inflation with calibration), hierarchical_mapf.rs,
stl_cbs.rs (multi-agent coordination).

TPU-native inversion: SIPP's per-cell safe-interval lists are pointer-heavy
and sequential; instead the search runs on the *time-expanded raster*
D[t, x, y] — arrival-time cost-to-start relaxed forward in time against a
per-step dynamic obstacle mask [T, W, H]. Wait-in-place is an edge; every
timestep relaxes all cells at once. Multi-agent prioritized planning
reserves each planned trajectory in the obstacle tensor (the classic
decoupled MAPF scheme the reference's CBS variants refine).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

BIG = 1e18

# 8-connected + wait
_MOVES = ((0, 0, 1.0), (1, 0, 1.0), (-1, 0, 1.0), (0, 1, 1.0), (0, -1, 1.0),
          (1, 1, 1.4142135623730951), (1, -1, 1.4142135623730951),
          (-1, 1, 1.4142135623730951), (-1, -1, 1.4142135623730951))


def _shift(a, dx, dy, fill):
    w, h = a.shape[-2], a.shape[-1]
    padded = jnp.pad(a, ((1, 1), (1, 1)), constant_values=fill)
    return padded[1 + dx : 1 + dx + w, 1 + dy : 1 + dy + h]


@functools.partial(jax.jit, static_argnames=())
def time_expanded_costs(free_t, start_idx):
    """Earliest-arrival cost field.

    free_t [T, W, H]: traversability per timestep (dynamic obstacles carved
    out). Returns D [T, W, H]: minimal path cost to be AT cell (x, y) at
    time t, starting from start_idx at t=0 (∞ where unreachable/blocked).
    """
    t_max, w, h = free_t.shape
    f = jnp.result_type(float)
    d0 = jnp.full((w, h), BIG, dtype=f).at[start_idx[0], start_idx[1]].set(0.0)
    d0 = jnp.where(free_t[0], d0, BIG)

    def step(d_prev, free_now):
        best = jnp.full_like(d_prev, BIG)
        for dx, dy, c in _MOVES:
            cand = _shift(d_prev, dx, dy, BIG) + c
            best = jnp.minimum(best, cand)
        return jnp.where(free_now, best, BIG), jnp.where(free_now, best, BIG)

    _, ds = jax.lax.scan(step, d0, free_t[1:])
    return jnp.concatenate([d0[None], ds], axis=0)


def earliest_arrival(costs, goal_idx):
    """(t*, cost) of the earliest affordable arrival at the goal cell."""
    series = costs[:, goal_idx[0], goal_idx[1]]
    reachable = series < BIG
    t_star = jnp.argmax(reachable)
    found = jnp.any(reachable)
    return jnp.where(found, t_star, -1), jnp.where(found, series[t_star], jnp.inf)


def extract_time_path(costs, goal_idx, t_arrival):
    """Backtrack the time-expanded field; returns cells [T, 2] (position at
    every timestep up to t_arrival, then frozen at the goal)."""
    import numpy as np

    d = np.asarray(costs)
    t_max = d.shape[0]
    cur = (int(goal_idx[0]), int(goal_idx[1]))
    out = [cur] * t_max
    w, h = d.shape[1:]
    for t in range(int(t_arrival), 0, -1):
        best, best_val = cur, np.inf
        for dx, dy, c in _MOVES:
            px, py = cur[0] - dx, cur[1] - dy
            if 0 <= px < w and 0 <= py < h:
                val = d[t - 1, px, py] + c
                if val < best_val and abs(val - d[t, cur[0], cur[1]]) < 1e-9:
                    best, best_val = (px, py), val
        # fall back to min-predecessor when exact cost match fails
        if best_val == np.inf:
            for dx, dy, c in _MOVES:
                px, py = cur[0] - dx, cur[1] - dy
                if 0 <= px < w and 0 <= py < h and d[t - 1, px, py] + c < best_val:
                    best, best_val = (px, py), d[t - 1, px, py] + c
        cur = best
        out[t - 1] = cur
    for t in range(int(t_arrival), t_max):
        out[t] = (int(goal_idx[0]), int(goal_idx[1]))
    return np.array(out)


def moving_obstacle_mask(static_free, obstacle_trajs, t_max, radius=0):
    """[T, W, H] traversability with moving obstacles carved out.

    obstacle_trajs [A, T, 2] integer cells per timestep.
    """
    w, h = static_free.shape
    gx = jax.lax.broadcasted_iota(jnp.int32, (w, h), 0)
    gy = jax.lax.broadcasted_iota(jnp.int32, (w, h), 1)

    def at_time(t):
        cells = obstacle_trajs[:, t]  # [A, 2]
        hit = jnp.zeros((w, h), dtype=bool)
        d2 = (gx[None] - cells[:, 0, None, None]) ** 2 + (
            gy[None] - cells[:, 1, None, None]
        ) ** 2
        hit = jnp.any(d2 <= radius * radius, axis=0)
        return static_free & ~hit

    return jax.vmap(at_time)(jnp.arange(t_max))


def prioritized_multi_agent(static_free, starts, goals, t_max, radius=0):
    """Decoupled prioritized MAPF: plan agents in order, reserving each
    trajectory (incl. a one-cell separation radius) in the shared dynamic
    obstacle tensor. Returns (paths [A, T, 2], arrivals [A])."""
    import numpy as np

    free_t = np.asarray(
        jnp.broadcast_to(static_free, (t_max,) + static_free.shape)
    ).copy()
    paths, arrivals = [], []
    for a in range(len(starts)):
        costs = time_expanded_costs(jnp.asarray(free_t), jnp.asarray(starts[a]))
        t_arr, cost = earliest_arrival(costs, jnp.asarray(goals[a]))
        t_arr = int(t_arr)
        if t_arr < 0:
            paths.append(np.tile(np.asarray(starts[a]), (t_max, 1)))
            arrivals.append(-1)
            continue
        path = extract_time_path(costs, goals[a], t_arr)
        paths.append(path)
        arrivals.append(t_arr)
        for t in range(t_max):
            x, y = path[t]
            free_t[t, x, y] = False  # vertex reservation
            if t + 1 < t_max:
                free_t[t + 1, x, y] = False  # swap-conflict guard
    return np.stack(paths), np.asarray(arrivals)
