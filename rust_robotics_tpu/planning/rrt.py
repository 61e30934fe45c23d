"""RRT family: RRT, RRT*, informed RRT* — fixed-capacity batched trees.

Reference: crates/rust_robotics_planning/src/ — rrt.rs (`RRTPlanner::
planning` :156: grow a Vec tree with parent indices, steer by expand_dis,
goal-sample rate, obstacle circles), rrt_star.rs (choose-parent within
connect radius + rewiring :82), informed_rrt_star.rs (ellipsoidal sampling
after first solution).

TPU-native inversion (SURVEY.md §7.3 item 3): the dynamically grown Vec
becomes a fixed-capacity node array [N, 2] + parent indices + costs + an
active mask, and the whole grow loop is one `lax.fori_loop`: each iteration
computes nearest/near sets against ALL nodes in parallel (masked argmin over
the capacity axis — the batched NN the reference does with a linear scan).
Collision checks sample S points per edge against all obstacle circles at
once. vmap over a leading axis runs a *forest* of independent trees
(restarts / multi-query) in one program.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from rust_robotics_tpu.core.types import pytree_dataclass

BIG = 1e18


@dataclasses.dataclass(frozen=True)
class RRTConfig:
    """rrt.rs / rrt_star.rs config surface."""

    expand_dis: float = 0.5
    goal_sample_rate: float = 0.1
    max_nodes: int = 512
    connect_radius: float = 1.5  # RRT* near radius
    edge_checks: int = 10
    area_min: tuple = (-2.0, -2.0)
    area_max: tuple = (12.0, 12.0)
    goal_threshold: float = 0.5


@pytree_dataclass
class Tree:
    nodes: Any  # [N, 2]
    parents: Any  # [N]
    costs: Any  # [N]
    active: Any  # [N] bool
    count: Any  # scalar


def _edge_collision_free(p0, p1, obstacles, radii, checks):
    """True if the segment p0→p1 clears all obstacle circles; S samples."""
    t = jnp.linspace(0.0, 1.0, checks)[:, None]
    pts = p0[None, :] + t * (p1 - p0)[None, :]
    d = jnp.linalg.norm(pts[:, None, :] - obstacles[None, :, :], axis=-1)
    return jnp.all(d > radii[None, :])


def rrt_plan(key, start, goal, obstacles, radii,
             cfg: RRTConfig = RRTConfig(), star: bool = False):
    """Grow an RRT / RRT* tree; returns (Tree, best_goal_node, best_cost).

    The best node within goal_threshold of the goal (by cost) is the
    solution anchor; walk parents to extract the path
    (`extract_rrt_path`).
    """
    n = cfg.max_nodes
    f = jnp.result_type(float)
    start = jnp.asarray(start, f)
    goal = jnp.asarray(goal, f)
    lo = jnp.asarray(cfg.area_min, f)
    hi = jnp.asarray(cfg.area_max, f)

    tree = Tree(
        nodes=jnp.zeros((n, 2), f).at[0].set(start),
        parents=jnp.full((n,), -1, jnp.int32),
        costs=jnp.full((n,), BIG).at[0].set(0.0),
        active=jnp.zeros((n,), bool).at[0].set(True),
        count=jnp.asarray(1),
    )
    keys = jax.random.split(key, n)

    def body(i, tree):
        k1, k2 = jax.random.split(keys[i])
        # goal-biased sampling (rrt.rs goal_sample_rate)
        u = jax.random.uniform(k1, (3,))
        sample = jnp.where(
            u[0] < cfg.goal_sample_rate,
            goal,
            lo + u[1:] * (hi - lo),
        )
        d = jnp.linalg.norm(tree.nodes - sample, axis=-1)
        d = jnp.where(tree.active, d, BIG)
        nearest = jnp.argmin(d)
        direction = sample - tree.nodes[nearest]
        dist = jnp.clip(jnp.linalg.norm(direction), 1e-9, None)
        step = jnp.minimum(dist, cfg.expand_dis)
        new_pt = tree.nodes[nearest] + direction / dist * step

        ok = _edge_collision_free(
            tree.nodes[nearest], new_pt, obstacles, radii, cfg.edge_checks
        )
        idx = tree.count

        if star:
            # choose parent among near set; rewire (rrt_star.rs:82)
            dn = jnp.linalg.norm(tree.nodes - new_pt, axis=-1)
            near = tree.active & (dn <= cfg.connect_radius)
            free_to = jax.vmap(
                lambda p: _edge_collision_free(
                    p, new_pt, obstacles, radii, cfg.edge_checks
                )
            )(tree.nodes)
            cand_cost = jnp.where(
                near & free_to, tree.costs + dn, BIG
            )
            parent = jnp.argmin(cand_cost)
            new_cost = cand_cost[parent]
            ok = ok & (new_cost < BIG)
            parent = jnp.where(ok, parent, nearest)
            new_cost = jnp.where(ok, new_cost, BIG)
        else:
            parent = nearest
            new_cost = tree.costs[nearest] + step

        nodes = tree.nodes.at[idx].set(jnp.where(ok, new_pt, tree.nodes[idx]))
        parents = tree.parents.at[idx].set(
            jnp.where(ok, parent.astype(jnp.int32), -1)
        )
        costs = tree.costs.at[idx].set(jnp.where(ok, new_cost, BIG))
        active = tree.active.at[idx].set(ok)
        count = tree.count + jnp.where(ok, 1, 0)
        tree = Tree(nodes, parents, costs, active, count)

        if star:
            # rewire neighbors through the new node
            dn = jnp.linalg.norm(tree.nodes - new_pt, axis=-1)
            through = new_cost + dn
            near = tree.active & (dn <= cfg.connect_radius)
            free_to = jax.vmap(
                lambda p: _edge_collision_free(
                    new_pt, p, obstacles, radii, cfg.edge_checks
                )
            )(tree.nodes)
            better = ok & near & free_to & (through < tree.costs)
            parents = jnp.where(
                better, idx.astype(jnp.int32), tree.parents
            )
            costs = jnp.where(better, through, tree.costs)
            tree = Tree(tree.nodes, parents, costs, tree.active, tree.count)
        return tree

    tree = jax.lax.fori_loop(0, n - 1, body, tree)
    dg = jnp.linalg.norm(tree.nodes - goal, axis=-1)
    at_goal = tree.active & (dg <= cfg.goal_threshold)
    total = jnp.where(at_goal, tree.costs + dg, BIG)
    best = jnp.argmin(total)
    return tree, best, total[best]


def extract_rrt_path(tree: Tree, node, max_len: int = 256):
    """Walk parent links from `node` to the root; returns (points [L, 2],
    mask [L]) with the root last."""

    def step(carry, _):
        cur, done = carry
        nxt = tree.parents[cur]
        new_done = done | (nxt < 0)
        out = jnp.where(done, -1, cur)
        return (jnp.where(new_done, cur, nxt), new_done), out

    (_, _), idxs = jax.lax.scan(
        step, (node.astype(jnp.int32), jnp.asarray(False)), None, length=max_len
    )
    mask = idxs >= 0
    pts = tree.nodes[jnp.clip(idxs, 0, None)]
    return pts, mask
