"""Traversal-risk graph planning + adaptive movable-obstacle (NAMO) costmaps.

Reference: crates/rust_robotics_planning/src/ —
traversal_risk_graph.rs: per-cell risk channels (traversability/stability/
exposure), elevation→risk conversion (central-difference slope ×
slope_risk_scale, max-|Δz| roughness × roughness_risk_scale, both clamped
to max_risk, optional blocking step height :149-189), Gaussian risk
smoothing preserving blocked topology (:189), Euclidean clearance map
(:256), linear low-clearance exposure risk (1 − c/c_min)·scale (:580),
blocked-cell inflation (:328), and a planner minimizing
distance_weight·d + risk_weight·½(risk_from + risk_to)·d (:917-922) with a
risk-weight sweep helper (:427).
adaptive_costmap_namo.rs: cells labeled Free/Unknown/Static/Movable with
costs; stuck observations (commanded ≥ stuck_command_speed and actual <
ratio·commanded) raise movable cost toward lethal, progress (odom_delta ≥
progress_distance) decays it back toward the initial cost (:158-190);
conversion to traversal-risk cells for planning.

TPU-native shape: risk channels are [W, H] rasters; every construction op
is a stencil/conv; the planner is the min-plus wavefront with per-edge
costs distance·(dw + rw·½(r + shift(r))) — and the reference's
`sweep_traversal_risk_weights` becomes a single vmap over the weight axis
(all sweeps relax in one batched program).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from rust_robotics_tpu.mapping.distance import compute_udf
from rust_robotics_tpu.planning.wavefront import MOTIONS_4, MOTIONS_8, _shift

__all__ = [
    "RiskChannels",
    "terrain_risk_from_elevation",
    "smooth_terrain_risk",
    "clearance_map",
    "add_clearance_exposure_risk",
    "inflate_blocked_cells",
    "combined_cell_risk",
    "risk_wavefront_costs",
    "extract_risk_path",
    "plan_risk_path",
    "sweep_risk_weights",
    "NamoConfig",
    "namo_new",
    "namo_set_state",
    "namo_update_movable",
    "namo_to_risk",
    "NAMO_FREE",
    "NAMO_UNKNOWN",
    "NAMO_STATIC",
    "NAMO_MOVABLE",
]

BIG_FRAC = 4.0


def _big(f):
    return jnp.asarray(jnp.finfo(f).max / BIG_FRAC, f)


@dataclasses.dataclass(frozen=True)
class RiskChannels:
    """TerrainRiskCell grid as struct-of-rasters."""

    blocked: "jax.Array"  # [W, H] bool
    traversability: "jax.Array"  # [W, H]
    stability: "jax.Array"
    exposure: "jax.Array"


jax.tree_util.register_pytree_node(
    RiskChannels,
    lambda r: ((r.blocked, r.traversability, r.stability, r.exposure), None),
    lambda _, c: RiskChannels(*c),
)


def terrain_risk_from_elevation(elevation, cell_size: float = 1.0,
                                slope_risk_scale: float = 8.0,
                                roughness_risk_scale: float = 10.0,
                                max_risk: float = 10.0,
                                blocking_step_height: float | None = None):
    """terrain_risk_from_elevation_map (traversal_risk_graph.rs:149):
    slope = ‖central-difference ∇z‖ (clamped-index borders), roughness =
    max |z − z_nbr| over the 8-neighborhood."""
    z = jnp.asarray(elevation, jnp.result_type(float))
    w, h = z.shape

    def grad(axis):
        nxt = jnp.roll(z, -1, axis)
        prv = jnp.roll(z, 1, axis)
        idx = jnp.arange(z.shape[axis])
        n = z.shape[axis]
        # clamp at borders: prev=index-1 floored at 0, next capped at n-1
        nxt_i = jnp.minimum(idx + 1, n - 1)
        prv_i = jnp.maximum(idx - 1, 0)
        take = lambda a, i: jnp.take(a, i, axis=axis)
        dz = take(z, nxt_i) - take(z, prv_i)
        dist = (nxt_i - prv_i).astype(z.dtype) * cell_size
        dist = jnp.where(dist == 0, 1.0, dist)
        del nxt, prv
        shape = [1, 1]
        shape[axis] = -1
        return dz / dist.reshape(shape)

    slope = jnp.hypot(grad(0), grad(1))
    rough = jnp.zeros_like(z)
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            if dx == 0 and dy == 0:
                continue
            nbr = _shift(z, dx, dy, jnp.nan)
            diff = jnp.abs(z - nbr)
            rough = jnp.maximum(rough, jnp.where(jnp.isnan(nbr), 0.0, diff))
    trav = jnp.minimum(slope * slope_risk_scale, max_risk)
    stab = jnp.minimum(rough * roughness_risk_scale, max_risk)
    blocked = (
        rough >= blocking_step_height
        if blocking_step_height is not None
        else jnp.zeros((w, h), bool)
    )
    return RiskChannels(blocked, trav, stab, jnp.zeros_like(z))


def smooth_terrain_risk(risk: RiskChannels, radius_cells: int = 1,
                        iterations: int = 1, sigma_cells: float = 1.0,
                        smooth_blocked_cells: bool = False):
    """Gaussian-disc smoothing (traversal_risk_graph.rs:189): blocked cells
    stay blocked; unless smooth_blocked_cells they keep their values but
    still contribute to neighbors. Border-normalized (conv of weights)."""
    r = radius_cells
    offs = [(dx, dy) for dx in range(-r, r + 1) for dy in range(-r, r + 1)
            if dx * dx + dy * dy <= r * r]
    wts = [float(jnp.exp(-(dx * dx + dy * dy) /
                         (2.0 * sigma_cells * sigma_cells)))
           for dx, dy in offs]

    def smooth_one(a):
        num = jnp.zeros_like(a)
        den = jnp.zeros_like(a)
        for (dx, dy), wt in zip(offs, wts):
            v = _shift(a, dx, dy, jnp.nan)
            ok = ~jnp.isnan(v)
            num = num + jnp.where(ok, wt * v, 0.0)
            den = den + jnp.where(ok, wt, 0.0)
        return num / den

    chans = (risk.traversability, risk.stability, risk.exposure)
    for _ in range(iterations):
        sm = tuple(smooth_one(c) for c in chans)
        if not smooth_blocked_cells:
            sm = tuple(jnp.where(risk.blocked, c, s)
                       for c, s in zip(chans, sm))
        chans = sm
    return RiskChannels(risk.blocked, *chans)


def clearance_map(blocked, cell_size: float = 1.0):
    """Exact Euclidean clearance to the nearest blocked cell (the 2-pass
    dense EDT of mapping/distance.py); ∞ when nothing is blocked."""
    blocked = jnp.asarray(blocked, bool)
    d = compute_udf(blocked) * cell_size
    return jnp.where(jnp.any(blocked), d, jnp.inf)


def add_clearance_exposure_risk(risk: RiskChannels, cell_size: float = 1.0,
                                minimum_clearance: float = 2.0,
                                risk_scale: float = 5.0,
                                max_risk: float = 10.0,
                                additive: bool = True):
    """Low-clearance exposure (traversal_risk_graph.rs:296,:580):
    (1 − clearance/c_min)·scale below c_min, clamped to max_risk; blocked
    cells keep their exposure."""
    c = clearance_map(risk.blocked, cell_size)
    extra = jnp.where(
        jnp.isfinite(c) & (c < minimum_clearance),
        (1.0 - c / minimum_clearance) * risk_scale,
        0.0,
    )
    extra = jnp.minimum(extra, max_risk)
    new = jnp.minimum(risk.exposure + extra, max_risk) if additive else extra
    new = jnp.where(risk.blocked, risk.exposure, new)
    return RiskChannels(risk.blocked, risk.traversability, risk.stability,
                        new)


def inflate_blocked_cells(blocked, radius_cells: int):
    """Circular-footprint inflation via the EDT (traversal_risk_graph.rs:372)."""
    d = compute_udf(jnp.asarray(blocked, bool))
    return jnp.asarray(blocked, bool) | (d <= radius_cells)


def combined_cell_risk(risk: RiskChannels, traversability_weight=1.0,
                       stability_weight=1.0, exposure_weight=1.0):
    """cell_risk (traversal_risk_graph.rs:910): weighted channel sum."""
    return (traversability_weight * risk.traversability
            + stability_weight * risk.stability
            + exposure_weight * risk.exposure)


@functools.partial(
    jax.jit, static_argnames=("allow_diagonal", "max_iters", "block")
)
def risk_wavefront_costs(free, cell_risk, goals, distance_weight=1.0,
                         risk_weight=1.0, allow_diagonal: bool = True,
                         max_iters: int | None = None, block: int = 8):
    """Cost-to-go under edge cost d·(dw + rw·½(r_from + r_to))
    (traversal_risk_graph.rs:917-922) — the weighted min-plus stencil.
    `distance_weight`/`risk_weight` may carry a leading batch axis (the
    weight-sweep runs as one batched relaxation)."""
    motions = MOTIONS_8 if allow_diagonal else MOTIONS_4
    f = jnp.result_type(float)
    free = jnp.asarray(free, bool)
    risk = jnp.asarray(cell_risk, f)
    dw = jnp.asarray(distance_weight, f)
    rw = jnp.asarray(risk_weight, f)
    batched = dw.ndim > 0 or rw.ndim > 0
    if batched:
        dw = jnp.reshape(dw, (-1, 1, 1))
        rw = jnp.reshape(rw, (-1, 1, 1))
    big = _big(f)
    d0 = jnp.where(goals & free, jnp.zeros((), f), big)
    if batched:
        d0 = jnp.broadcast_to(d0, (max(dw.shape[0], rw.shape[0]),) + d0.shape)
    w, h = free.shape
    if max_iters is None:
        max_iters = w * h

    masks, edge_risks = [], []
    for dx, dy, c in motions:
        m = free & _shift(free, dx, dy, False)
        rr = 0.5 * (risk + _shift(risk, dx, dy, 0.0))
        masks.append(m)
        edge_risks.append(rr)

    def sweep(d):
        best = d
        for (dx, dy, c), m, rr in zip(motions, masks, edge_risks):
            step = c * (dw + rw * rr)
            cand = _shift(d, dx, dy, big) + step
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


def extract_risk_path(costs, free, cell_risk, start_idx, distance_weight=1.0,
                      risk_weight=1.0, allow_diagonal: bool = True,
                      max_len: int = 1024):
    """Greedy descent consistent with the risk edge costs; returns
    (indices [L, 2], mask, total_cost)."""
    motions = MOTIONS_8 if allow_diagonal else MOTIONS_4
    f = costs.dtype
    big = _big(f)
    d = jnp.where(jnp.isinf(costs), big, costs)
    risk = jnp.asarray(cell_risk, f)
    w, h = free.shape
    masks = jnp.stack([
        free & _shift(free, dx, dy, False) for dx, dy, _ in motions
    ])
    deltas = jnp.array([(dx, dy) for dx, dy, _ in motions], jnp.int32)
    base = jnp.array([c for *_, c in motions], f)

    def step(carry, _):
        pos, done = carry
        here = d[pos[0], pos[1]]
        at_goal = here <= 0.0
        nbrs = pos + deltas
        nx = jnp.clip(nbrs[:, 0], 0, w - 1)
        ny = jnp.clip(nbrs[:, 1], 0, h - 1)
        valid = masks[:, pos[0], pos[1]]
        er = 0.5 * (risk[pos[0], pos[1]] + risk[nx, ny])
        stepc = base * (distance_weight + risk_weight * er)
        cand = jnp.where(valid, stepc + d[nx, ny], big)
        best = jnp.argmin(cand)
        descends = d[nx[best], ny[best]] < here
        move = (~done) & (~at_goal) & (here < big) & descends
        new_pos = jnp.where(move, nbrs[best], pos)
        return (new_pos, done | at_goal | (~move)), (new_pos, move)

    start = jnp.asarray(start_idx, jnp.int32)
    (_, _), (positions, moved) = jax.lax.scan(
        step, (start, jnp.asarray(False)), None, length=max_len - 1
    )
    idx = jnp.concatenate([start[None], positions], axis=0)
    mask = jnp.concatenate([jnp.array([True]), moved], axis=0)
    return idx, mask, costs[start[0], start[1]]


def plan_risk_path(risk: RiskChannels, start_idx, goal_idx,
                   distance_weight=1.0, risk_weight=1.0,
                   traversability_weight=1.0, stability_weight=1.0,
                   exposure_weight=1.0, allow_diagonal=True):
    """TraversalRiskGraphPlanner::plan equivalent: min distance+risk path.
    Returns (indices, mask, cost)."""
    free = ~risk.blocked
    cr = combined_cell_risk(risk, traversability_weight, stability_weight,
                            exposure_weight)
    w, h = free.shape
    gx = jax.lax.broadcasted_iota(jnp.int32, (w, h), 0)
    gy = jax.lax.broadcasted_iota(jnp.int32, (w, h), 1)
    goals = (gx == goal_idx[0]) & (gy == goal_idx[1])
    costs = risk_wavefront_costs(free, cr, goals, distance_weight,
                                 risk_weight, allow_diagonal=allow_diagonal)
    return extract_risk_path(costs, free, cr, start_idx, distance_weight,
                             risk_weight, allow_diagonal=allow_diagonal)


def sweep_risk_weights(risk: RiskChannels, start_idx, goal_idx, risk_weights,
                       allow_diagonal=True, **channel_weights):
    """sweep_traversal_risk_weights (traversal_risk_graph.rs:427): the same
    query under several risk weights — ONE batched relaxation (the weight
    axis is a vmap axis, not a loop). Returns a list of dicts
    {risk_weight, cost, path_idx, path_mask}."""
    free = ~risk.blocked
    cr = combined_cell_risk(risk, **channel_weights)
    w, h = free.shape
    gx = jax.lax.broadcasted_iota(jnp.int32, (w, h), 0)
    gy = jax.lax.broadcasted_iota(jnp.int32, (w, h), 1)
    goals = (gx == goal_idx[0]) & (gy == goal_idx[1])
    rw = jnp.asarray(risk_weights)
    costs = risk_wavefront_costs(free, cr, goals, 1.0, rw,
                                 allow_diagonal=allow_diagonal)
    out = []
    for k in range(rw.shape[0]):
        idx, mask, cost = extract_risk_path(
            costs[k], free, cr, start_idx, 1.0, float(rw[k]),
            allow_diagonal=allow_diagonal,
        )
        out.append({
            "risk_weight": float(rw[k]),
            "cost": cost,
            "path_idx": idx,
            "path_mask": mask,
        })
    return out


# ---------------------------------------------------------------------------
# adaptive movable-obstacle costmap (adaptive_costmap_namo.rs)

NAMO_FREE, NAMO_UNKNOWN, NAMO_STATIC, NAMO_MOVABLE = 0, 1, 2, 3


@dataclasses.dataclass(frozen=True)
class NamoConfig:
    """AdaptiveCostmapNamoConfig defaults (adaptive_costmap_namo.rs:54)."""

    unknown_cost: float = 25.0
    movable_initial_cost: float = 20.0
    movable_cost_increment: float = 30.0
    movable_cost_decrement: float = 15.0
    static_obstacle_cost: float = 100.0
    lethal_cost: float = 100.0
    stuck_command_speed: float = 0.05
    stuck_actual_speed_ratio: float = 0.2
    progress_distance: float = 0.05


def namo_new(width: int, height: int):
    """All-free costmap: (states [W, H] int32, costs [W, H])."""
    return (jnp.zeros((width, height), jnp.int32),
            jnp.zeros((width, height), jnp.result_type(float)))


def namo_set_state(costmap, cells, state: int, cfg: NamoConfig = NamoConfig()):
    """Label cells (array [K, 2]) with a semantic state and its initial
    cost (set_cell_state)."""
    states, costs = costmap
    cells = jnp.asarray(cells)
    cost = {
        NAMO_FREE: 0.0,
        NAMO_UNKNOWN: cfg.unknown_cost,
        NAMO_STATIC: cfg.static_obstacle_cost,
        NAMO_MOVABLE: cfg.movable_initial_cost,
    }[state]
    states = states.at[cells[:, 0], cells[:, 1]].set(state)
    costs = costs.at[cells[:, 0], cells[:, 1]].set(cost)
    return states, costs


def namo_update_movable(costmap, movable_cells, commanded_speed, actual_speed,
                        odom_delta, cfg: NamoConfig = NamoConfig()):
    """update_movable_costs (adaptive_costmap_namo.rs:158): stuck
    observations push movable cost toward lethal; progress decays it toward
    the initial cost. Returns (costmap, n_changed)."""
    states, costs = costmap
    stuck = (commanded_speed >= cfg.stuck_command_speed) & (
        actual_speed < cfg.stuck_actual_speed_ratio * commanded_speed
    )
    progressing = odom_delta >= cfg.progress_distance
    cells = jnp.asarray(movable_cells)
    sel = states[cells[:, 0], cells[:, 1]] == NAMO_MOVABLE
    old = costs[cells[:, 0], cells[:, 1]]
    up = jnp.minimum(old + cfg.movable_cost_increment, cfg.lethal_cost)
    down = jnp.maximum(old - cfg.movable_cost_decrement,
                       cfg.movable_initial_cost)
    new = jnp.where(stuck, up, jnp.where(progressing, down, old))
    new = jnp.where(sel, new, old)
    costs = costs.at[cells[:, 0], cells[:, 1]].set(new)
    changed = jnp.sum(sel & (jnp.abs(new - old) > 1e-9))
    return (states, costs), changed


def namo_to_risk(costmap, block_lethal_movable: bool = True,
                 cfg: NamoConfig = NamoConfig()):
    """to_traversal_risk_cells: static obstacles are blocked; movable cells
    at lethal cost are blocked when block_lethal_movable; otherwise the
    adapted cost becomes traversability risk."""
    states, costs = costmap
    blocked = states == NAMO_STATIC
    if block_lethal_movable:
        blocked = blocked | (
            (states == NAMO_MOVABLE) & (costs >= cfg.lethal_cost - 1e-9)
        )
    trav = jnp.where(blocked, 0.0, costs)
    z = jnp.zeros_like(trav)
    return RiskChannels(blocked, trav, z, z)
