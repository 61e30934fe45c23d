"""Geometric sampling-planner variants: Informed RRT*, RRT-Connect,
bidirectional RRT, RRG, FMT*, BIT*, Sobol-driven RRT, stochastic shortcutting.

Reference: crates/rust_robotics_planning/src/ —
informed_rrt_star.rs (ellipsoidal sampling after first solution),
rrt_connect.rs / bidirectional_rrt.rs (dual trees, greedy connect),
rrg.rs (keep all near edges, query the graph),
fmt_star.rs (single batch of samples, optimal expansion over the r-disk graph),
batch_informed_rrt_star.rs (BIT*: batches of informed samples over an
implicit edge graph), rrt_sobol.rs (low-discrepancy Sobol sampling),
rrt_path_smoothing.rs (random shortcutting of a planned path).

TPU-native inversion (SURVEY.md §7.1/§7.3): trees and sample sets are
fixed-capacity arrays with active masks. Graph-based planners (RRG, FMT*,
BIT*) drop the mutable priority queue entirely: with all candidate edges
materialized as a masked [N, N] cost matrix, the optimal cost-to-come is the
min-plus fixpoint D = min(D, min_j D_j + W_ji) — iterated dense relaxation
that XLA maps onto the MXU — and is *exactly* the cost FMT*/RRG return for
the same graph. Collision checks for all N² edges batch into one
[N², S, M] distance tensor.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from rust_robotics_tpu.planning.rrt import (
    BIG,
    RRTConfig,
    Tree,
    _edge_collision_free,
)

__all__ = [
    "informed_rrt_star_plan",
    "rrt_connect_plan",
    "rrg_plan",
    "fmt_star_plan",
    "bit_star_plan",
    "sobol_sequence_2d",
    "rrt_sobol_plan",
    "shortcut_path",
    "graph_shortest_path",
    "extract_graph_path",
]


# ---------------------------------------------------------------------------
# informed sampling (informed_rrt_star.rs: prolate hyperspheroid)


def sample_informed(key, start, goal, c_best, lo, hi):
    """Uniform sample from the 2D ellipse {x : |x-s| + |x-g| <= c_best};
    falls back to the whole area when no solution exists yet (c_best >= BIG).
    """
    f = jnp.result_type(float)
    start = jnp.asarray(start, f)
    goal = jnp.asarray(goal, f)
    c_min = jnp.linalg.norm(goal - start)
    center = 0.5 * (start + goal)
    theta = jnp.arctan2(goal[1] - start[1], goal[0] - start[0])
    c, s = jnp.cos(theta), jnp.sin(theta)
    rot = jnp.array([[c, -s], [s, c]])
    have = c_best < BIG / 2
    cb = jnp.where(have, jnp.maximum(c_best, c_min + 1e-9), c_min + 1.0)
    r1 = cb / 2.0
    r2 = jnp.sqrt(jnp.clip(cb**2 - c_min**2, 1e-18, None)) / 2.0

    k1, k2 = jax.random.split(key)
    # uniform in unit disk
    u = jax.random.uniform(k1, (2,))
    r = jnp.sqrt(u[0])
    ang = 2 * jnp.pi * u[1]
    ball = jnp.array([r * jnp.cos(ang), r * jnp.sin(ang)])
    ell = center + rot @ (jnp.array([r1, r2]) * ball)
    ell = jnp.clip(ell, lo, hi)

    box = lo + jax.random.uniform(k2, (2,)) * (hi - lo)
    return jnp.where(have, ell, box)


def informed_rrt_star_plan(key, start, goal, obstacles, radii,
                           cfg: RRTConfig = RRTConfig()):
    """Informed RRT* (informed_rrt_star.rs): RRT* whose sampling domain
    shrinks to the solution ellipse once a first path is found.

    Returns (Tree, best_goal_node, best_cost). Same tree layout as
    `rrt_plan`, so `extract_rrt_path` applies.
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

    def best_solution_cost(tree):
        dg = jnp.linalg.norm(tree.nodes - goal, axis=-1)
        at_goal = tree.active & (dg <= cfg.goal_threshold)
        return jnp.min(jnp.where(at_goal, tree.costs + dg, BIG))

    def body(i, tree):
        k1, k2 = jax.random.split(keys[i])
        c_best = best_solution_cost(tree)
        u = jax.random.uniform(k1, ())
        sample = jnp.where(
            u < cfg.goal_sample_rate,
            goal,
            sample_informed(k2, start, goal, c_best, lo, hi),
        )
        d = jnp.where(tree.active, jnp.linalg.norm(tree.nodes - sample, axis=-1), BIG)
        nearest = jnp.argmin(d)
        direction = sample - tree.nodes[nearest]
        dist = jnp.clip(jnp.linalg.norm(direction), 1e-9, None)
        new_pt = tree.nodes[nearest] + direction / dist * jnp.minimum(dist, cfg.expand_dis)
        ok = _edge_collision_free(
            tree.nodes[nearest], new_pt, obstacles, radii, cfg.edge_checks
        )
        idx = tree.count

        # choose parent in near set (rrt_star.rs:82)
        dn = jnp.linalg.norm(tree.nodes - new_pt, axis=-1)
        near = tree.active & (dn <= cfg.connect_radius)
        free_to = jax.vmap(
            lambda p: _edge_collision_free(p, new_pt, obstacles, radii, cfg.edge_checks)
        )(tree.nodes)
        cand = jnp.where(near & free_to, tree.costs + dn, BIG)
        parent = jnp.argmin(cand)
        new_cost = cand[parent]
        ok = ok & (new_cost < BIG)

        nodes = tree.nodes.at[idx].set(jnp.where(ok, new_pt, tree.nodes[idx]))
        parents = tree.parents.at[idx].set(
            jnp.where(ok, parent.astype(jnp.int32), -1)
        )
        costs = tree.costs.at[idx].set(jnp.where(ok, new_cost, BIG))
        active = tree.active.at[idx].set(ok)
        count = tree.count + jnp.where(ok, 1, 0)
        tree = Tree(nodes, parents, costs, active, count)

        # rewire through the new node
        through = new_cost + dn
        better = ok & near & free_to & (through < tree.costs)
        return Tree(
            tree.nodes,
            jnp.where(better, idx.astype(jnp.int32), tree.parents),
            jnp.where(better, through, tree.costs),
            tree.active,
            tree.count,
        )

    tree = jax.lax.fori_loop(0, n - 1, body, tree)
    dg = jnp.linalg.norm(tree.nodes - goal, axis=-1)
    at_goal = tree.active & (dg <= cfg.goal_threshold)
    total = jnp.where(at_goal, tree.costs + dg, BIG)
    best = jnp.argmin(total)
    return tree, best, total[best]


# ---------------------------------------------------------------------------
# dual-tree planners (rrt_connect.rs / bidirectional_rrt.rs)


def rrt_connect_plan(key, start, goal, obstacles, radii,
                     cfg: RRTConfig = RRTConfig(), greedy_connect: bool = True):
    """RRT-Connect (rrt_connect.rs): two trees rooted at start/goal.

    Each iteration extends the active tree toward a sample, then the other
    tree repeatedly extends toward the new node (the CONNECT heuristic;
    `greedy_connect=False` gives plain bidirectional RRT, one extend per
    side — bidirectional_rrt.rs). Trees live in one [2, N, ·] array; the
    iteration parity selects which grows. Returns (trees, link, cost) where
    trees is a Tree pytree with leading axis 2, and link = (node in tree 0,
    node in tree 1, joined) is the meeting edge.
    """
    n = cfg.max_nodes
    f = jnp.result_type(float)
    start = jnp.asarray(start, f)
    goal = jnp.asarray(goal, f)
    lo = jnp.asarray(cfg.area_min, f)
    hi = jnp.asarray(cfg.area_max, f)

    roots = jnp.stack([start, goal])
    trees = Tree(
        nodes=jnp.zeros((2, n, 2), f).at[:, 0].set(roots),
        parents=jnp.full((2, n), -1, jnp.int32),
        costs=jnp.full((2, n), BIG).at[:, 0].set(0.0),
        active=jnp.zeros((2, n), bool).at[:, 0].set(True),
        count=jnp.asarray([1, 1]),
    )
    keys = jax.random.split(key, n)
    # best link found: (node_a, node_b, gap)
    link0 = (jnp.asarray(0), jnp.asarray(0), jnp.asarray(BIG, f))

    def extend(trees, t, target):
        """One EXTEND of tree t toward target; returns (trees, new_idx, ok)."""
        nodes = trees.nodes[t]
        d = jnp.where(trees.active[t], jnp.linalg.norm(nodes - target, axis=-1), BIG)
        nearest = jnp.argmin(d)
        direction = target - nodes[nearest]
        dist = jnp.clip(jnp.linalg.norm(direction), 1e-9, None)
        new_pt = nodes[nearest] + direction / dist * jnp.minimum(dist, cfg.expand_dis)
        ok = _edge_collision_free(nodes[nearest], new_pt, obstacles, radii, cfg.edge_checks)
        full = trees.count[t] >= n
        ok = ok & ~full
        idx = jnp.minimum(trees.count[t], n - 1)
        trees = Tree(
            trees.nodes.at[t, idx].set(jnp.where(ok, new_pt, trees.nodes[t, idx])),
            trees.parents.at[t, idx].set(
                jnp.where(ok, nearest.astype(jnp.int32), trees.parents[t, idx])
            ),
            trees.costs.at[t, idx].set(
                jnp.where(ok, trees.costs[t, nearest] + jnp.minimum(dist, cfg.expand_dis),
                          trees.costs[t, idx])
            ),
            trees.active.at[t, idx].set(trees.active[t, idx] | ok),
            trees.count.at[t].add(jnp.where(ok, 1, 0)),
        )
        return trees, idx, ok

    connect_steps = 8 if greedy_connect else 1

    def body(i, carry):
        trees, link = carry
        t = i % 2  # growing tree this round
        o = 1 - t
        u = jax.random.uniform(keys[i], (2,))
        sample = lo + u * (hi - lo)
        trees, idx_t, ok_t = extend(trees, t, sample)
        new_pt = trees.nodes[t, idx_t]

        # CONNECT: other tree marches toward new_pt
        def conn_body(_, c):
            trees, idx_o, ok_prev = c
            trees2, idx2, ok2 = extend(trees, o, new_pt)
            cont = ok_prev & ok2
            trees = jax.tree.map(
                lambda a, b: jnp.where(cont, b, a), trees, trees2
            )
            return trees, jnp.where(cont, idx2, idx_o), cont

        trees, idx_o, _ = jax.lax.fori_loop(
            0, connect_steps, conn_body, (trees, jnp.asarray(0), ok_t)
        )
        # does the frontier of o reach new_pt?
        gap = jnp.linalg.norm(trees.nodes[o, idx_o] - new_pt)
        joined_now = (
            ok_t
            & trees.active[o, idx_o]
            & (gap <= cfg.expand_dis)
            & _edge_collision_free(
                trees.nodes[o, idx_o], new_pt, obstacles, radii, cfg.edge_checks
            )
        )
        total = (
            trees.costs[t, idx_t] + trees.costs[o, idx_o] + gap
        )
        better = joined_now & (total < link[2])
        node_a = jnp.where(t == 0, idx_t, idx_o)
        node_b = jnp.where(t == 0, idx_o, idx_t)
        link = (
            jnp.where(better, node_a, link[0]),
            jnp.where(better, node_b, link[1]),
            jnp.where(better, total, link[2]),
        )
        return trees, link

    trees, link = jax.lax.fori_loop(0, n - 1, body, (trees, link0))
    return trees, link, link[2]


def bidirectional_rrt_plan(key, start, goal, obstacles, radii,
                           cfg: RRTConfig = RRTConfig()):
    """Bidirectional RRT (bidirectional_rrt.rs): RRT-Connect without the
    greedy connect loop."""
    return rrt_connect_plan(key, start, goal, obstacles, radii, cfg,
                            greedy_connect=False)


# ---------------------------------------------------------------------------
# graph planners: min-plus relaxation over r-disk graphs


def _edge_cost_matrix(nodes, active, radius, obstacles, radii, checks):
    """Masked symmetric [N, N] edge-cost matrix of the r-disk graph:
    finite where both endpoints active, within radius, and collision-free."""
    n = nodes.shape[0]
    diff = nodes[:, None, :] - nodes[None, :, :]
    dist = jnp.linalg.norm(diff, axis=-1)
    pair_ok = active[:, None] & active[None, :] & (dist <= radius)
    pair_ok = pair_ok & ~jnp.eye(n, dtype=bool)

    # all edges' collision checks in one tensor: [N, N, S, M]
    t = jnp.linspace(0.0, 1.0, checks)
    pts = nodes[:, None, None, :] + t[None, None, :, None] * (-diff)[:, :, None, :]
    d = jnp.linalg.norm(pts[:, :, :, None, :] - obstacles[None, None, None, :, :], axis=-1)
    free = jnp.all(d > radii[None, None, None, :], axis=(-2, -1))
    return jnp.where(pair_ok & free, dist, BIG)


def graph_shortest_path(w, src, iters: int | None = None):
    """Single-source shortest-path costs over a dense masked cost matrix
    via iterated min-plus relaxation D_i = min(D_i, min_j D_j + w[j, i]).

    This is Bellman-Ford reformulated as a dense min-plus matvec —
    the same fixpoint FMT*/Dijkstra reach with a heap (SURVEY.md §7.1);
    `iters` defaults to N (worst-case path length).
    """
    n = w.shape[0]
    if iters is None:
        iters = n
    d0 = jnp.full((n,), BIG, w.dtype).at[src].set(0.0)

    def body(carry):
        d, _, it = carry
        new = jnp.minimum(d, jnp.min(d[:, None] + w, axis=0))
        return new, jnp.any(new < d), it + 1

    def cond(carry):
        _, changed, it = carry
        return changed & (it < iters)

    d, _, _ = jax.lax.while_loop(cond, body, (d0, jnp.asarray(True), 0))
    return d


def extract_graph_path(w, costs, src, dst, max_len: int = 128):
    """Walk dst→src by greedy predecessor descent: pred(i) = argmin_j
    costs_j + w[j,i]. Returns (indices [L], mask [L]) ordered src→dst."""

    def step(carry, _):
        cur, done = carry
        pred = jnp.argmin(costs + w[:, cur])
        at_src = cur == src
        out = jnp.where(done, -1, cur)
        new_done = done | at_src
        return (jnp.where(new_done, cur, pred), new_done), out

    (_, _), idxs = jax.lax.scan(
        step, (jnp.asarray(dst), jnp.asarray(False)), None, length=max_len
    )
    mask = idxs >= 0
    # reverse so src comes first; padding compacts to the tail
    order = jnp.argsort(jnp.where(mask, -jnp.arange(max_len), max_len))
    return jnp.where(mask, idxs, 0)[order], mask[order]


@dataclasses.dataclass(frozen=True)
class GraphPlannerConfig:
    """fmt_star.rs / rrg.rs / batch_informed_rrt_star.rs surface."""

    num_samples: int = 256
    connect_radius: float = 1.5
    edge_checks: int = 8
    area_min: tuple = (-2.0, -2.0)
    area_max: tuple = (12.0, 12.0)
    batches: int = 4  # BIT* only
    batch_size: int = 64  # BIT* only


def _free_samples(key, n, lo, hi, obstacles, radii):
    pts = lo + jax.random.uniform(key, (n, 2)) * (hi - lo)
    d = jnp.linalg.norm(pts[:, None, :] - obstacles[None, :, :], axis=-1)
    return pts, jnp.all(d > radii[None, :], axis=-1)


def fmt_star_plan(key, start, goal, obstacles, radii,
                  cfg: GraphPlannerConfig = GraphPlannerConfig()):
    """FMT* (fmt_star.rs): one batch of free-space samples + start/goal,
    optimal cost-to-come over the r-disk graph.

    The reference expands lazily in cost order with a heap; the min-plus
    fixpoint returns identical costs on the same graph, so path cost parity
    holds by construction. Returns (nodes, path_idx, path_mask, cost).
    """
    f = jnp.result_type(float)
    lo = jnp.asarray(cfg.area_min, f)
    hi = jnp.asarray(cfg.area_max, f)
    pts, free = _free_samples(key, cfg.num_samples, lo, hi, obstacles, radii)
    nodes = jnp.concatenate([jnp.asarray(start, f)[None], jnp.asarray(goal, f)[None], pts])
    active = jnp.concatenate([jnp.array([True, True]), free])
    w = _edge_cost_matrix(nodes, active, cfg.connect_radius, obstacles, radii,
                          cfg.edge_checks)
    costs = graph_shortest_path(w, 0)
    idx, mask = extract_graph_path(w, costs, 0, 1)
    return nodes, idx, mask, costs[1]


def rrg_plan(key, start, goal, obstacles, radii,
             cfg: RRTConfig = RRTConfig()):
    """RRG (rrg.rs): grow an RRT but keep *all* collision-free near edges.

    TPU shape: grow node positions with the standard steer loop, then
    materialize the r-disk edge matrix over the accepted nodes and answer
    queries by min-plus relaxation (the graph, not the tree, is RRG's
    product). Returns (nodes, path_idx, path_mask, cost)."""
    from rust_robotics_tpu.planning.rrt import rrt_plan

    tree, _, _ = rrt_plan(key, start, goal, obstacles, radii, cfg, star=False)
    f = tree.nodes.dtype
    nodes = jnp.concatenate([tree.nodes, jnp.asarray(goal, f)[None]])
    active = jnp.concatenate([tree.active, jnp.array([True])])
    w = _edge_cost_matrix(nodes, active, cfg.connect_radius, obstacles, radii,
                          cfg.edge_checks)
    costs = graph_shortest_path(w, 0)
    g = nodes.shape[0] - 1
    idx, mask = extract_graph_path(w, costs, 0, g)
    return nodes, idx, mask, costs[g]


def bit_star_plan(key, start, goal, obstacles, radii,
                  cfg: GraphPlannerConfig = GraphPlannerConfig()):
    """BIT* (batch_informed_rrt_star.rs): anytime batches of informed
    samples over an implicit edge graph.

    Capacity = 2 + batches·batch_size nodes. Each batch activates
    `batch_size` new samples drawn from the current solution ellipse
    (whole area before a first solution), rebuilds the masked edge matrix,
    and re-relaxes — cost is monotone nonincreasing across batches, the
    observable BIT* contract. Returns (nodes, path_idx, path_mask, cost,
    per-batch costs)."""
    f = jnp.result_type(float)
    lo = jnp.asarray(cfg.area_min, f)
    hi = jnp.asarray(cfg.area_max, f)
    start = jnp.asarray(start, f)
    goal = jnp.asarray(goal, f)
    cap = 2 + cfg.batches * cfg.batch_size
    nodes0 = jnp.zeros((cap, 2), f).at[0].set(start).at[1].set(goal)
    active0 = jnp.zeros((cap,), bool).at[:2].set(True)
    bkeys = jax.random.split(key, cfg.batches)

    def batch(carry, xs):
        bk, bi = xs
        nodes, active, c_best = carry
        ks = jax.random.split(bk, cfg.batch_size)
        new = jax.vmap(
            lambda k: sample_informed(k, start, goal, c_best, lo, hi)
        )(ks)
        d = jnp.linalg.norm(new[:, None, :] - obstacles[None, :, :], axis=-1)
        ok = jnp.all(d > radii[None, :], axis=-1)
        slot = 2 + bi * cfg.batch_size + jnp.arange(cfg.batch_size)
        nodes = nodes.at[slot].set(new)
        active = active.at[slot].set(ok)
        w = _edge_cost_matrix(nodes, active, cfg.connect_radius, obstacles,
                              radii, cfg.edge_checks)
        costs = graph_shortest_path(w, 0)
        c_best = jnp.minimum(c_best, costs[1])
        return (nodes, active, c_best), c_best

    (nodes, active, c_best), history = jax.lax.scan(
        batch, (nodes0, active0, jnp.asarray(BIG, f)),
        (bkeys, jnp.arange(cfg.batches)),
    )
    w = _edge_cost_matrix(nodes, active, cfg.connect_radius, obstacles, radii,
                          cfg.edge_checks)
    costs = graph_shortest_path(w, 0)
    idx, mask = extract_graph_path(w, costs, 0, 1)
    return nodes, idx, mask, costs[1], history


# ---------------------------------------------------------------------------
# low-discrepancy sampling (rrt_sobol.rs)


@functools.partial(jax.jit, static_argnames=("n",))
def sobol_sequence_2d(n: int):
    """First n points of the 2D Sobol sequence in [0,1)².

    Dim 0 is van der Corput base 2; dim 1 uses the degree-1 primitive
    polynomial x+1 with initial direction number m1=1 (the standard
    Sobol dimension 2). Pure bit arithmetic over 32-bit lanes — exactly
    reproducible, no RNG state (rrt_sobol.rs uses the same construction).
    """
    bits = 30
    idx = jnp.arange(1, n + 1, dtype=jnp.uint32)

    # direction numbers
    v0 = jnp.uint32(1) << (bits - 1 - jnp.arange(bits, dtype=jnp.uint32))
    # dim 2: recurrence v_k = v_{k-1} ^ (v_{k-1} >> 1), seeded m=1
    def dim2_dirs():
        def body(carry, _):
            v = carry
            nv = v ^ (v >> 1)
            return nv, v
        # v_1 = 1<<(bits-1); recurrence for s=1, a=0: v_k = v_{k-1}>>1 ^ v_{k-1}
        _, vs = jax.lax.scan(body, jnp.uint32(1 << (bits - 1)), None, length=bits)
        return vs

    v1 = dim2_dirs()

    def xor_reduce(a):
        return jax.lax.reduce(a, jnp.uint32(0), jax.lax.bitwise_xor, (0,))

    def point(i):
        g = i ^ (i >> 1)  # Gray code
        b = ((g >> jnp.arange(bits, dtype=jnp.uint32)) & 1).astype(bool)
        x0 = xor_reduce(jnp.where(b, v0, jnp.uint32(0)))
        x1 = xor_reduce(jnp.where(b, v1, jnp.uint32(0)))
        scale = jnp.asarray(1.0 / (1 << bits), jnp.result_type(float))
        return jnp.stack([x0.astype(jnp.result_type(float)) * scale,
                          x1.astype(jnp.result_type(float)) * scale])

    return jax.vmap(point)(idx)


def rrt_sobol_plan(start, goal, obstacles, radii,
                   cfg: RRTConfig = RRTConfig(), star: bool = False):
    """RRT driven by the deterministic Sobol sequence (rrt_sobol.rs):
    identical grow loop, low-discrepancy samples instead of uniform draws,
    goal bias every round(1/goal_sample_rate) samples. Fully deterministic —
    no PRNG key. Returns (Tree, best, cost)."""
    n = cfg.max_nodes
    f = jnp.result_type(float)
    start = jnp.asarray(start, f)
    goal = jnp.asarray(goal, f)
    lo = jnp.asarray(cfg.area_min, f)
    hi = jnp.asarray(cfg.area_max, f)
    sob = sobol_sequence_2d(n)
    period = max(int(round(1.0 / max(cfg.goal_sample_rate, 1e-9))), 1)

    tree = Tree(
        nodes=jnp.zeros((n, 2), f).at[0].set(start),
        parents=jnp.full((n,), -1, jnp.int32),
        costs=jnp.full((n,), BIG).at[0].set(0.0),
        active=jnp.zeros((n,), bool).at[0].set(True),
        count=jnp.asarray(1),
    )

    def body(i, tree):
        sample = jnp.where((i % period) == 0, goal, lo + sob[i] * (hi - lo))
        d = jnp.where(tree.active, jnp.linalg.norm(tree.nodes - sample, axis=-1), BIG)
        nearest = jnp.argmin(d)
        direction = sample - tree.nodes[nearest]
        dist = jnp.clip(jnp.linalg.norm(direction), 1e-9, None)
        step = jnp.minimum(dist, cfg.expand_dis)
        new_pt = tree.nodes[nearest] + direction / dist * step
        ok = _edge_collision_free(tree.nodes[nearest], new_pt, obstacles, radii,
                                  cfg.edge_checks)
        idx = tree.count
        if star:
            dn = jnp.linalg.norm(tree.nodes - new_pt, axis=-1)
            near = tree.active & (dn <= cfg.connect_radius)
            free_to = jax.vmap(
                lambda p: _edge_collision_free(p, new_pt, obstacles, radii,
                                               cfg.edge_checks)
            )(tree.nodes)
            cand = jnp.where(near & free_to, tree.costs + dn, BIG)
            parent = jnp.argmin(cand)
            new_cost = cand[parent]
            ok = ok & (new_cost < BIG)
        else:
            parent = nearest
            new_cost = tree.costs[nearest] + step
        tree = Tree(
            tree.nodes.at[idx].set(jnp.where(ok, new_pt, tree.nodes[idx])),
            tree.parents.at[idx].set(jnp.where(ok, parent.astype(jnp.int32), -1)),
            tree.costs.at[idx].set(jnp.where(ok, new_cost, BIG)),
            tree.active.at[idx].set(ok),
            tree.count + jnp.where(ok, 1, 0),
        )
        return tree

    tree = jax.lax.fori_loop(0, n - 1, body, tree)
    dg = jnp.linalg.norm(tree.nodes - goal, axis=-1)
    at_goal = tree.active & (dg <= cfg.goal_threshold)
    total = jnp.where(at_goal, tree.costs + dg, BIG)
    best = jnp.argmin(total)
    return tree, best, total[best]


# ---------------------------------------------------------------------------
# stochastic shortcutting (rrt_path_smoothing.rs)


def shortcut_path(key, pts, mask, obstacles, radii, iters: int = 64,
                  edge_checks: int = 16):
    """Random shortcutting of a padded path (rrt_path_smoothing.rs): draw
    (i, j), and if the straight segment pts[i]→pts[j] is collision-free,
    drop the interior waypoints. Padded representation: points stay in
    place, the keep-mask shrinks; callers compact with the mask.

    Returns (pts, new_mask, new_length)."""
    n = pts.shape[0]
    f = pts.dtype
    valid_count = jnp.sum(mask)
    ar = jnp.arange(n)

    def body(carry, k):
        keep = carry
        k1, k2 = jax.random.split(k)
        # sample two *kept* indices i < j
        u = jax.random.uniform(k1, (2,))
        kept_positions = jnp.where(keep, ar, -1)
        nk = jnp.sum(keep)
        r = jnp.floor(u * nk).astype(jnp.int32)
        r = jnp.sort(r)
        # map rank -> index among kept
        order = jnp.argsort(jnp.where(keep, ar, n + ar))
        i, j = order[r[0]], order[r[1]]
        ok = (j > i + 1) & _edge_collision_free(
            pts[i], pts[j], obstacles, radii, edge_checks
        )
        interior = (ar > i) & (ar < j)
        return jnp.where(ok & interior, False, keep), None

    keys = jax.random.split(key, iters)
    keep, _ = jax.lax.scan(body, mask.astype(bool), keys)
    seg = jnp.linalg.norm(jnp.diff(pts, axis=0), axis=-1)
    # length over kept points only: consecutive kept pairs
    def path_length(keep):
        idx = jnp.where(keep, ar, n)
        order = jnp.sort(idx)
        p = pts[jnp.clip(order, 0, n - 1)]
        ok = (order[:-1] < n) & (order[1:] < n)
        return jnp.sum(jnp.where(ok, jnp.linalg.norm(p[1:] - p[:-1], axis=-1), 0.0))

    del seg, valid_count
    return pts, keep, path_length(keep)
