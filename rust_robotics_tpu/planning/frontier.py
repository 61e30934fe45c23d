"""Frontier-based long-range navigation (exploration past the local map).

Reference: crates/rust_robotics_planning/src/frontier_navigator.rs —
Long Range Navigator-lite: occlusion-aware sensing reveals cells only along
clear lines of sight within sensor range (obstacles cast unknown shadows);
*frontiers* are known-free cells bordering unknown space; each frontier is
scored by an affordance combining goal progress, known-free travel cost,
direct line of sight, and information gain (bordering unknown count); the
local handoff follows the gradient of a Dijkstra field over the known-free
map for a bounded step budget before re-sensing. Deterministic for a fixed
world.

TPU-native shape: sensing is one batched LOS tensor ([W·H rays × S samples]
against the truth raster — no per-ray loop), frontier detection is a
4-neighbor stencil, travel cost is the min-plus wavefront, and the
affordance scores for ALL frontiers evaluate in one fused program. Only
the episode loop (sense → pick → drive) is host-side, as the map genuinely
mutates between episodes.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from rust_robotics_tpu.planning.wavefront import wavefront_costs

__all__ = ["FrontierNavConfig", "sense_reveal", "find_frontiers",
           "score_frontiers", "frontier_navigate"]

UNKNOWN, FREE, OCCUPIED = 0, 1, 2


@dataclasses.dataclass(frozen=True)
class FrontierNavConfig:
    """frontier_navigator.rs config surface."""

    sensor_range: float = 6.0
    los_samples: int = 24
    step_budget: int = 6
    max_episodes: int = 200
    w_progress: float = 1.0
    w_travel: float = 0.3
    w_los: float = 2.0
    w_gain: float = 0.5


@functools.partial(jax.jit, static_argnames=("los_samples",))
def sense_reveal(known, truth_blocked, pos, sensor_range,
                 los_samples: int = 24):
    """Occlusion-aware reveal: every cell within `sensor_range` whose
    sight line from `pos` crosses no blocked cell becomes known (blocked
    cells are revealed as OCCUPIED when their own interior ray is clear).
    One batched [W, H, S] ray tensor."""
    w, h = truth_blocked.shape
    gx = jax.lax.broadcasted_iota(jnp.int32, (w, h), 0).astype(float)
    gy = jax.lax.broadcasted_iota(jnp.int32, (w, h), 1).astype(float)
    px, py = pos[0].astype(float), pos[1].astype(float)
    dist = jnp.hypot(gx - px, gy - py)
    in_range = dist <= sensor_range
    t = jnp.linspace(0.0, 1.0, los_samples)[:-1]  # interior samples
    rx = px + t[None, None, :] * (gx[..., None] - px)
    ry = py + t[None, None, :] * (gy[..., None] - py)
    ix = jnp.clip(jnp.round(rx).astype(jnp.int32), 0, w - 1)
    iy = jnp.clip(jnp.round(ry).astype(jnp.int32), 0, h - 1)
    hit = truth_blocked[ix, iy]
    # a sample "blocks" unless it's the target cell itself
    is_self = (ix == jnp.round(gx[..., None]).astype(jnp.int32)) & (
        iy == jnp.round(gy[..., None]).astype(jnp.int32)
    )
    clear = ~jnp.any(hit & ~is_self, axis=-1)
    visible = in_range & clear
    state = jnp.where(truth_blocked, OCCUPIED, FREE)
    return jnp.where(visible & (known == UNKNOWN), state, known), visible


def _shift(a, dx, dy, fill):
    w, h = a.shape
    p = jnp.pad(a, ((1, 1), (1, 1)), constant_values=fill)
    return p[1 + dx: 1 + dx + w, 1 + dy: 1 + dy + h]


@jax.jit
def find_frontiers(known):
    """Known-free cells 4-adjacent to unknown space."""
    unk = known == UNKNOWN
    near_unk = (_shift(unk, 1, 0, False) | _shift(unk, -1, 0, False)
                | _shift(unk, 0, 1, False) | _shift(unk, 0, -1, False))
    return (known == FREE) & near_unk


def score_frontiers(known, frontiers, travel_costs, visible, pos, goal,
                    cfg: FrontierNavConfig):
    """Affordance per frontier cell (frontier_navigator.rs scoring): goal
    progress − travel cost + LOS bonus + unknown-information gain."""
    w, h = known.shape
    gx = jax.lax.broadcasted_iota(jnp.int32, (w, h), 0).astype(float)
    gy = jax.lax.broadcasted_iota(jnp.int32, (w, h), 1).astype(float)
    d_goal = jnp.hypot(gx - goal[0], gy - goal[1])
    d_pos_goal = jnp.hypot(pos[0].astype(float) - goal[0],
                           pos[1].astype(float) - goal[1])
    progress = d_pos_goal - d_goal
    unk = (known == UNKNOWN).astype(float)
    gain = sum(_shift(unk, dx, dy, 0.0)
               for dx in (-1, 0, 1) for dy in (-1, 0, 1))
    travel = jnp.where(jnp.isfinite(travel_costs), travel_costs, 1e9)
    score = (cfg.w_progress * progress - cfg.w_travel * travel
             + cfg.w_los * visible.astype(float) + cfg.w_gain * gain)
    return jnp.where(frontiers & jnp.isfinite(travel_costs), score, -jnp.inf)


def frontier_navigate(truth_blocked, start, goal,
                      cfg: FrontierNavConfig = FrontierNavConfig()):
    """Full exploration loop: sense → (goal reachable over known-free?
    drive there) → else drive toward the best frontier for `step_budget`
    cells → repeat. Returns dict(trajectory [K, 2], reached, episodes,
    revealed_fraction, frontiers_chosen)."""
    truth_blocked = jnp.asarray(truth_blocked, bool)
    w, h = truth_blocked.shape
    known = jnp.full((w, h), UNKNOWN, jnp.int32)
    pos = jnp.asarray(start, jnp.int32)
    goal = jnp.asarray(goal, jnp.int32)
    traj = [tuple(np.asarray(pos))]
    chosen = []
    reached = False

    def descent_steps(costs, pos, budget):
        """Walk down the cost field for at most `budget` cells."""
        d = np.asarray(costs)
        p = np.asarray(pos).copy()
        out = []
        moves = [(1, 0, 1.0), (0, 1, 1.0), (-1, 0, 1.0), (0, -1, 1.0),
                 (1, 1, 2**0.5), (1, -1, 2**0.5), (-1, 1, 2**0.5),
                 (-1, -1, 2**0.5)]
        for _ in range(budget):
            if d[p[0], p[1]] <= 0:
                break
            best, bv = None, d[p[0], p[1]]
            for dx, dy, _c in moves:
                q = (p[0] + dx, p[1] + dy)
                if 0 <= q[0] < d.shape[0] and 0 <= q[1] < d.shape[1] and \
                        d[q] < bv:
                    best, bv = q, d[q]
            if best is None:
                break
            p = np.asarray(best)
            out.append(tuple(p))
        return p, out

    episodes = 0
    for episodes in range(1, cfg.max_episodes + 1):
        known, visible = sense_reveal(known, truth_blocked, pos,
                                      cfg.sensor_range, cfg.los_samples)
        known_free = known == FREE
        # distance field over known-free space from the CURRENT position
        src = jnp.zeros((w, h), bool).at[pos[0], pos[1]].set(True)
        costs = wavefront_costs(known_free, src)
        if bool(jnp.isfinite(costs[goal[0], goal[1]])):
            # goal visible and reachable: drive all the way
            gsrc = jnp.zeros((w, h), bool).at[goal[0], goal[1]].set(True)
            gcosts = wavefront_costs(known_free, gsrc)
            p, steps = descent_steps(gcosts, pos, 10 * (w + h))
            traj.extend(steps)
            pos = jnp.asarray(p)
            reached = bool((np.asarray(pos) == np.asarray(goal)).all())
            break
        frontiers = find_frontiers(known)
        scores = score_frontiers(known, frontiers, costs, visible, pos,
                                 goal.astype(float), cfg)
        if not bool(jnp.any(jnp.isfinite(scores) & (scores > -jnp.inf))):
            break  # nothing reachable left to explore
        best = int(jnp.argmax(scores.reshape(-1)))
        target = (best // h, best % h)
        chosen.append(target)
        tsrc = jnp.zeros((w, h), bool).at[target[0], target[1]].set(True)
        tcosts = wavefront_costs(known_free, tsrc)
        p, steps = descent_steps(tcosts, pos, cfg.step_budget)
        if not steps:
            break  # stuck
        traj.extend(steps)
        pos = jnp.asarray(p)

    revealed = float(jnp.mean((known != UNKNOWN).astype(float)))
    return {
        "trajectory": np.asarray(traj),
        "reached": reached,
        "episodes": episodes,
        "revealed_fraction": revealed,
        "frontiers_chosen": np.asarray(chosen) if chosen else
        np.zeros((0, 2), int),
    }
