"""Incremental / anytime / bounded grid search on the wavefront engine:
D* / D* Lite / LPA* repair, ARA* anytime schedule, IDA* / fringe
threshold deepening, beam-limited relaxation.

Reference: crates/rust_robotics_planning/src/ — d_star.rs, d_star_lite.rs,
lpa_star.rs (incremental repair of g-values after edge-cost changes),
ara_star.rs (anytime repair with inflated heuristic, monotone cost
improvement), ida_star.rs (iterative-deepening f-bound, per-iteration
stats in plan_with_report), fringe_search.rs (threshold sweep with a cached
frontier), a_star_variants.rs (beam/dynamic/iterative variants).

TPU-native redesign (SURVEY.md §7.3 item 2): priority queues with lazy keys
don't vectorize, but every planner in this family has an *observable*
contract on the value field / returned path, not on expansion order:

- LPA*/D* Lite repair: after map edits, re-derive the exact cost field
  while reusing unaffected values. Here: a RAISE phase iteratively clears
  values whose downhill support vanished (with strictly positive step costs
  a supported chain must terminate at a goal, so clearing exactly removes
  stale values), then a LOWER phase re-relaxes from the warm field. The
  observable win matches the reference's: far fewer sweeps than a cold
  replan when edits are local.
- ARA*: anytime loop with monotone nonincreasing path cost and a final
  optimal solution; per-stage suboptimality bound reported from the
  current field vs the admissible heuristic.
- IDA*: f-bounded relaxation (cells with g + h > threshold stay pruned);
  the next threshold is the min f over pruned cells — exactly the
  reference's threshold evolution — iterated until the goal is reached.

All return lightweight stats pytrees mirroring AStarSearchStats /
IDAStarSearchStats (a_star.rs:98, ida_star.rs plan_with_report).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from rust_robotics_tpu.planning.wavefront import (
    MOTIONS_4,
    MOTIONS_8,
    SQRT2,
    _incoming_masks,
    _shift,
)

__all__ = [
    "relax_with_stats",
    "repair_costs",
    "dstar_lite_replan",
    "lpa_star_replan",
    "dstar_replan",
    "ara_star_plan",
    "ida_star_costs",
    "fringe_search_costs",
    "beam_search_costs",
    "octile_heuristic",
]


def _motions(connectivity, diag_cost=SQRT2):
    m = MOTIONS_8 if connectivity == 8 else MOTIONS_4
    return tuple(
        (dx, dy, diag_cost if (dx != 0 and dy != 0) else c) for dx, dy, c in m
    )


def octile_heuristic(shape, target_idx, connectivity: int = 8):
    """Admissible octile (8-conn) / Manhattan (4-conn) distance raster to
    `target_idx` — the reference's euclidean-weighted heuristic analog
    (a_star.rs:189), exact for unobstructed 8-connected grids."""
    w, h = shape
    f = jnp.result_type(float)
    gx = jax.lax.broadcasted_iota(jnp.int32, (w, h), 0)
    gy = jax.lax.broadcasted_iota(jnp.int32, (w, h), 1)
    dx = jnp.abs(gx - target_idx[0]).astype(f)
    dy = jnp.abs(gy - target_idx[1]).astype(f)
    if connectivity == 8:
        return jnp.maximum(dx, dy) + (SQRT2 - 1.0) * jnp.minimum(dx, dy)
    return dx + dy


@functools.partial(
    jax.jit, static_argnames=("connectivity", "corner_cutting", "max_sweeps", "block")
)
def relax_with_stats(d0, free, sources, connectivity: int = 8,
                     corner_cutting: bool = False, max_sweeps: int | None = None,
                     block: int = 8):
    """Min-plus relaxation from a warm-start field `d0`; sources are pinned
    to 0. Returns (costs, sweeps_used) — the sweep count is the stats hook
    the incremental planners report."""
    motions = _motions(connectivity)
    f = jnp.result_type(float)
    free = jnp.asarray(free, bool)
    masks = _incoming_masks(free, motions, corner_cutting)
    big = jnp.asarray(jnp.finfo(f).max / 4, f)
    d0 = jnp.where(jnp.isinf(d0), big, jnp.asarray(d0, f))
    d0 = jnp.where(sources & free, jnp.zeros((), f), d0)
    w, h = free.shape[-2], free.shape[-1]
    if max_sweeps is None:
        max_sweeps = w * h

    def sweep(d):
        best = d
        for (dx, dy, c), m in zip(motions, masks):
            cand = _shift(d, dx, dy, big) + jnp.asarray(c, f)
            best = jnp.minimum(best, jnp.where(m, cand, big))
        return jnp.where(sources & free, jnp.zeros((), f), best)

    def body(carry):
        d, _, it = carry
        new = d
        for _ in range(block):
            new = sweep(new)
        return new, jnp.any(new < d), it + block

    def cond(carry):
        _, changed, it = carry
        return changed & (it < max_sweeps)

    d, _, sweeps = jax.lax.while_loop(cond, body, (d0, jnp.asarray(True), 0))
    return jnp.where(d >= big, jnp.inf, d), sweeps


@functools.partial(
    jax.jit, static_argnames=("connectivity", "corner_cutting", "max_sweeps")
)
def repair_costs(d_prev, free_new, sources, connectivity: int = 8,
                 corner_cutting: bool = False, max_sweeps: int | None = None,
                 tol: float = 1e-6):
    """Incremental repair of a cost field after map edits (d_star_lite.rs /
    lpa_star.rs contract).

    RAISE: iteratively clear cells whose value lost its downhill support —
    value must equal min over valid incoming neighbors of (nbr + step cost)
    or be a source. LOWER: re-relax from the surviving warm values.
    Returns (costs, raise_sweeps, lower_sweeps)."""
    motions = _motions(connectivity)
    f = jnp.result_type(float)
    free = jnp.asarray(free_new, bool)
    masks = _incoming_masks(free, motions, corner_cutting)
    big = jnp.asarray(jnp.finfo(f).max / 4, f)
    d0 = jnp.where(jnp.isinf(d_prev) | ~free, big, jnp.asarray(d_prev, f))
    d0 = jnp.where(sources & free, jnp.zeros((), f), d0)
    w, h = free.shape[-2], free.shape[-1]
    if max_sweeps is None:
        max_sweeps = w * h

    def support(d):
        best = jnp.full_like(d, big)
        for (dx, dy, c), m in zip(motions, masks):
            cand = _shift(d, dx, dy, big) + jnp.asarray(c, f)
            best = jnp.minimum(best, jnp.where(m, cand, big))
        return best

    def raise_body(carry):
        d, _, it = carry
        supported = (sources & free) | (d >= big) | (
            jnp.abs(d - support(d)) <= tol
        )
        new = jnp.where(supported, d, big)
        return new, jnp.any(new > d), it + 1

    def raise_cond(carry):
        _, changed, it = carry
        return changed & (it < max_sweeps)

    d, _, raise_sweeps = jax.lax.while_loop(
        raise_cond, raise_body, (d0, jnp.asarray(True), 0)
    )
    d = jnp.where(d >= big, jnp.inf, d)
    d, lower_sweeps = relax_with_stats(
        d, free, sources, connectivity=connectivity,
        corner_cutting=corner_cutting, max_sweeps=max_sweeps,
    )
    return d, raise_sweeps, lower_sweeps


def dstar_lite_replan(d_prev, free_new, goals, **kw):
    """D* Lite (d_star_lite.rs): goal-rooted cost-to-go repaired after map
    edits (robot replans toward a fixed goal as the map updates)."""
    return repair_costs(d_prev, free_new, goals, **kw)


def lpa_star_replan(d_prev, free_new, starts, **kw):
    """LPA* (lpa_star.rs): start-rooted g-value repair — the same min-plus
    repair with the start as source (the engine is direction-symmetric)."""
    return repair_costs(d_prev, free_new, starts, **kw)


def dstar_replan(d_prev, free_new, goals, **kw):
    """Original D* (d_star.rs): RAISE/LOWER wave repair — the two phases of
    `repair_costs` are precisely D*'s RAISE and LOWER states."""
    return repair_costs(d_prev, free_new, goals, **kw)


@functools.partial(
    jax.jit,
    static_argnames=("connectivity", "corner_cutting", "stages",
                     "sweeps_per_stage"),
)
def ara_star_plan(free, start_idx, goal_idx, connectivity: int = 8,
                  corner_cutting: bool = False, stages: int = 4,
                  sweeps_per_stage: int = 16):
    """ARA* (ara_star.rs): anytime schedule with monotone improvement.

    Each stage spends a bounded relaxation budget and records the current
    start-cell cost and its suboptimality bound ε = cost / h(start)
    (h admissible ⇒ ε ≥ true ratio). Final stage relaxes to convergence, so
    the last answer is optimal — the reference's ε→1 schedule. Returns
    (costs, per-stage costs [stages+1], per-stage bounds [stages+1])."""
    f = jnp.result_type(float)
    free = jnp.asarray(free, bool)
    w, h = free.shape
    gx = jax.lax.broadcasted_iota(jnp.int32, (w, h), 0)
    gy = jax.lax.broadcasted_iota(jnp.int32, (w, h), 1)
    goals = (gx == goal_idx[0]) & (gy == goal_idx[1])
    hstart = octile_heuristic((w, h), goal_idx, connectivity)[
        start_idx[0], start_idx[1]
    ]
    d = jnp.full((w, h), jnp.inf, f)

    stage_costs = []
    stage_bounds = []
    for s in range(stages):
        d, _ = relax_with_stats(
            d, free, goals, connectivity=connectivity,
            corner_cutting=corner_cutting, max_sweeps=sweeps_per_stage,
        )
        c = d[start_idx[0], start_idx[1]]
        stage_costs.append(c)
        stage_bounds.append(c / jnp.maximum(hstart, 1e-9))
    # final: to convergence (ε = 1)
    d, _ = relax_with_stats(
        d, free, goals, connectivity=connectivity,
        corner_cutting=corner_cutting,
    )
    c = d[start_idx[0], start_idx[1]]
    stage_costs.append(c)
    stage_bounds.append(jnp.ones((), f))
    return d, jnp.stack(stage_costs), jnp.stack(stage_bounds)


@functools.partial(
    jax.jit,
    static_argnames=("connectivity", "corner_cutting", "max_deepenings"),
)
def ida_star_costs(free, start_idx, goal_idx, connectivity: int = 8,
                   corner_cutting: bool = False, max_deepenings: int = 64):
    """IDA* (ida_star.rs plan_with_report): start-rooted g-field relaxed
    under an f = g + h ≤ threshold bound; when the goal stays unreachable
    the threshold deepens to the minimum f among pruned cells (the exact
    IDA* threshold evolution), until the goal is reached.

    Returns (g_field, path_cost, stats) with stats = dict(deepenings,
    final_threshold, expanded_cells) mirroring IDAStarSearchStats."""
    f = jnp.result_type(float)
    free = jnp.asarray(free, bool)
    w, hh = free.shape
    gx = jax.lax.broadcasted_iota(jnp.int32, (w, hh), 0)
    gy = jax.lax.broadcasted_iota(jnp.int32, (w, hh), 1)
    starts = (gx == start_idx[0]) & (gy == start_idx[1])
    hmap = octile_heuristic((w, hh), goal_idx, connectivity)
    big = jnp.asarray(jnp.finfo(f).max / 4, f)
    motions = _motions(connectivity)
    masks = _incoming_masks(free, motions, corner_cutting)

    t0 = hmap[start_idx[0], start_idx[1]]

    def bounded_relax(threshold):
        """Relax g with cells pruned where g + h > threshold; returns
        (g, min f over pruned candidates)."""
        d0 = jnp.where(starts & free, jnp.zeros((), f), big)

        def sweep(d):
            best = d
            for (dx, dy, c), m in zip(motions, masks):
                cand = _shift(d, dx, dy, big) + jnp.asarray(c, f)
                best = jnp.minimum(best, jnp.where(m, cand, big))
            return best

        def body(carry):
            d, _, pruned_min = carry
            cand = sweep(d)
            fval = cand + hmap
            ok = fval <= threshold
            over = ~ok & (cand < big)
            # pruned candidates have f strictly > threshold, so the next
            # threshold strictly increases — guaranteed deepening progress
            pruned_min = jnp.minimum(
                pruned_min, jnp.min(jnp.where(over, fval, big))
            )
            new = jnp.minimum(d, jnp.where(ok, cand, big))
            return new, jnp.any(new < d), pruned_min

        def cond(carry):
            _, changed, _ = carry
            return changed

        d, _, pruned_min = jax.lax.while_loop(
            cond, body, (d0, jnp.asarray(True), big)
        )
        return d, pruned_min

    def deepen(carry):
        threshold, _, _, k = carry
        d, pruned_min = bounded_relax(threshold)
        found = d[goal_idx[0], goal_idx[1]] < big
        next_t = jnp.where(found, threshold, pruned_min)
        return next_t, d, found, k + 1

    def cond(carry):
        threshold, _, found, k = carry
        return (~found) & (k < max_deepenings) & (threshold < big)

    threshold, d, found, k = jax.lax.while_loop(
        cond, deepen,
        (t0, jnp.full((w, hh), big, f), jnp.asarray(False), 0),
    )
    cost = jnp.where(found, d[goal_idx[0], goal_idx[1]], jnp.inf)
    stats = {
        "deepenings": k,
        "final_threshold": threshold,
        "expanded_cells": jnp.sum(d < big),
    }
    return jnp.where(d >= big, jnp.inf, d), cost, stats


def fringe_search_costs(free, start_idx, goal_idx, **kw):
    """Fringe search (fringe_search.rs): IDA* with a cached frontier — the
    raster field *is* the cache, so the bounded-deepening engine is shared;
    exposed under the reference's name with the same stats."""
    return ida_star_costs(free, start_idx, goal_idx, **kw)


@functools.partial(
    jax.jit,
    static_argnames=("connectivity", "corner_cutting", "beam_width",
                     "max_sweeps"),
)
def beam_search_costs(free, goals, heuristic, beam_width: int = 64,
                      connectivity: int = 8, corner_cutting: bool = False,
                      max_sweeps: int | None = None):
    """Beam-limited relaxation (a_star_variants.rs beam variant): per sweep
    only the `beam_width` cells with the best f = g + h among *newly
    improved* cells commit their update. Possibly suboptimal (cost ≥
    optimal, = for wide beams) — exactly beam search's contract.

    Returns (costs, sweeps)."""
    motions = _motions(connectivity)
    f = jnp.result_type(float)
    free = jnp.asarray(free, bool)
    masks = _incoming_masks(free, motions, corner_cutting)
    big = jnp.asarray(jnp.finfo(f).max / 4, f)
    d0 = jnp.where(goals & free, jnp.zeros((), f), big)
    w, h = free.shape
    if max_sweeps is None:
        max_sweeps = w * h

    def body(carry):
        d, _, it = carry
        best = d
        for (dx, dy, c), m in zip(motions, masks):
            cand = _shift(d, dx, dy, big) + jnp.asarray(c, f)
            best = jnp.minimum(best, jnp.where(m, cand, big))
        improved = best < d
        fval = jnp.where(improved, best + heuristic, big)
        # keep only the beam_width best improvements this sweep
        flat = fval.reshape(-1)
        kth = jax.lax.top_k(-flat, beam_width)[0][-1]
        keep = improved & (fval <= -kth)
        new = jnp.where(keep, best, d)
        return new, jnp.any(new < d), it + 1

    def cond(carry):
        _, changed, it = carry
        return changed & (it < max_sweeps)

    d, _, sweeps = jax.lax.while_loop(cond, body, (d0, jnp.asarray(True), 0))
    return jnp.where(d >= big, jnp.inf, d), sweeps
