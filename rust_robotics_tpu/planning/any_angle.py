"""Any-angle planners: corner-visibility optimum + Theta*-style wavefront.

Reference surface:
- theta_star.rs:1-507 / lazy_theta_star.rs:1-548 /
  enhanced_lazy_theta_star.rs:1-609 — any-angle grid planners whose parent
  pointers may skip to any LOS-visible ancestor (the "path-2" vertex rule).
- anya.rs:1-463 — the reference's *optimality baseline*: exact any-angle
  shortest paths via visibility-graph Dijkstra (run on tractable grids,
  tests/any_angle_optimality_gap.rs:1-20).
- tests/any_angle_movingai_comparison.rs / any_angle_statistical_test.rs —
  the 5-family MovingAI statistical experiments behind README.md:402-409.

TPU-native design (not a heap translation):

1. `visibility_costs` — the exact any-angle optimum. Taut shortest
   any-angle paths only turn at *convex obstacle corners*, so the optimum
   is a shortest path in the visibility graph over corners + start + goal.
   Corner extraction is a stencil; the corner-pair LOS matrix is one big
   batched sampled-segment probe ([C, C, S] → VPU); the single-source
   solve is iterated dense min-plus relaxation (Bellman) over the [C, C]
   adjacency — a batched matrix-min-plus product that maps straight onto
   the TPU, batched over scenario (start, goal) pairs. This planner IS the
   visibility optimum (0% gap by construction, verified against a
   host-side Dijkstra in tests).

2. `theta_wavefront_costs` — a Theta*-equivalent LOS-relaxed wavefront:
   the octile wavefront recursion (wavefront.py) extended with Theta*'s
   path-2 rule evaluated synchronously: a cell may connect straight to its
   neighbor's any-angle parent when LOS holds. Each sweep is 8 shifted
   min-plus updates + 8 raster-wide batched LOS probes; fixpoint g is
   order-independent and never worse than sequential Theta* (which commits
   to one expansion order).

The fast "lazy" variant (octile wavefront + optimal LOS shortcutting =
the reference's A*+optimize_path, README.md:408) lives in smoothing.py.
"""

from __future__ import annotations

import functools
import heapq
import math

import jax
import jax.numpy as jnp
import numpy as np

from rust_robotics_tpu.planning.smoothing import line_of_sight_free
from rust_robotics_tpu.planning.wavefront import SQRT2, _shift

BIG = 1e18


# --------------------------------------------------------------------------
# corner extraction
# --------------------------------------------------------------------------

def corner_mask(free):
    """Convex-corner raster: free cells diagonal to a blocked cell whose two
    adjacent orthogonal cells are free (the taut-turn vertices of any-angle
    shortest paths; the same corner rule as a_star_variants.rs:349-405 and
    anya.rs's visibility vertices)."""
    free = jnp.asarray(free, bool)
    blocked = ~free
    out = jnp.zeros_like(free)
    for dx in (-1, 1):
        for dy in (-1, 1):
            diag = _shift(blocked, dx, dy, True)
            side_x = _shift(blocked, dx, 0, True)
            side_y = _shift(blocked, 0, dy, True)
            out = out | (diag & ~side_x & ~side_y)
    return out & free


def corner_points(free):
    """[C, 2] float cell-center coordinates of the convex corners (host)."""
    m = np.asarray(corner_mask(free))
    xy = np.argwhere(m).astype(np.float64) + 0.5
    return xy


def corner_vertices(free, eps: float = 1e-3):
    """[C, 2] ε-offset lattice corner vertices of the blocked region.

    Continuous-space shortest paths among the blocked cells (treated as
    unit squares) turn exactly at convex corners of the blocked region —
    lattice points where exactly ONE of the four surrounding cells is
    blocked (anya.rs:208-216 documents the same geometry; its grid-LOS
    variant falls back to all free cells instead). Each vertex is nudged
    by ε diagonally away from its blocked cell so sampled-LOS segments
    pass strictly outside the obstacle; path lengths are within O(ε) of
    the true continuous optimum.
    """
    blocked = np.asarray(~jnp.asarray(free, bool))
    w, h = blocked.shape
    pad = np.pad(blocked, 1, constant_values=False)  # outside counts free
    # cell (vx+sx, vy+sy) for sx,sy in {-1,0} surrounds lattice vertex (vx,vy)
    cells = {
        (sx, sy): pad[1 + sx: w + 2 + sx, 1 + sy: h + 2 + sy]
        for sx in (-1, 0) for sy in (-1, 0)
    }  # each [w+1, h+1] — blocked flag of the quadrant cell
    count = sum(c.astype(np.int8) for c in cells.values())
    out = []
    for (sx, sy), c in cells.items():
        sel = (count == 1) & c
        vx, vy = np.nonzero(sel)
        # offset away from the blocked cell: its center is at
        # (vx + sx + .5, vy + sy + .5); away = -sign(center - vertex)
        ox = -np.sign(sx + 0.5) * eps
        oy = -np.sign(sy + 0.5) * eps
        out.append(np.stack([vx + ox, vy + oy], -1))
    if not out:
        return np.zeros((0, 2))
    return np.concatenate(out, 0)


# --------------------------------------------------------------------------
# batched LOS matrix
# --------------------------------------------------------------------------

def visibility_matrix(points, blocked, samples: int = 256, tile: int = 512):
    """Pairwise LOS between cell-center points over a blocked raster.

    points [N, 2] → bool [N, N]. Computed in row tiles so the [tile, N, S]
    probe tensor stays in memory; each tile is one vmapped
    `line_of_sight_free` (pure gather + reduce — VPU work).
    """
    points = jnp.asarray(points)
    n = points.shape[0]
    blocked = jnp.asarray(blocked, bool)

    @functools.partial(jax.jit, static_argnames=())
    def _tile(rows):
        return jax.vmap(
            lambda p: line_of_sight_free(
                jnp.broadcast_to(p, points.shape), points, blocked,
                0.0, 0.0, 1.0, samples,
            )
        )(rows)

    out = np.zeros((n, n), bool)
    for i in range(0, n, tile):
        out[i:i + tile] = np.asarray(_tile(points[i:i + tile]))
    return jnp.asarray(out)


# --------------------------------------------------------------------------
# exact any-angle optimum (visibility min-plus)
# --------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("samples", "max_hops"))
def _visibility_solve(corners, vis, blocked, starts, goals,
                      samples: int = 256, max_hops: int = 128):
    """Batched single-source min-plus over the corner visibility graph.

    corners [C, 2], vis [C, C] bool (precomputed corner-corner LOS),
    starts/goals [B, 2] cell-center coordinates. Returns lengths [B]
    (inf when unreachable within max_hops corner turns).
    """
    f = jnp.result_type(float)
    corners = corners.astype(f)
    c = corners.shape[0]
    if c == 0:  # obstacle-free map: only the direct segment exists
        def direct_only(start, goal):
            vis = line_of_sight_free(start, goal, blocked, 0.0, 0.0, 1.0,
                                     samples)
            return jnp.where(vis, jnp.linalg.norm(goal - start), jnp.inf)
        return jax.vmap(direct_only)(starts.astype(f), goals.astype(f))
    d_cc = jnp.linalg.norm(corners[:, None] - corners[None, :], axis=-1)
    adj = jnp.where(vis, d_cc, BIG)
    adj = jnp.where(jnp.eye(c, dtype=bool), 0.0, adj)

    def per_scenario(start, goal):
        direct = line_of_sight_free(start, goal, blocked, 0.0, 0.0, 1.0,
                                    samples)
        s_vis = line_of_sight_free(
            jnp.broadcast_to(start, corners.shape), corners, blocked,
            0.0, 0.0, 1.0, samples)
        g_vis = line_of_sight_free(
            jnp.broadcast_to(goal, corners.shape), corners, blocked,
            0.0, 0.0, 1.0, samples)
        d_s = jnp.where(s_vis, jnp.linalg.norm(corners - start, axis=-1), BIG)
        d_g = jnp.where(g_vis, jnp.linalg.norm(corners - goal, axis=-1), BIG)

        def body(carry):
            dist, _, hops = carry
            new = jnp.min(dist[:, None] + adj, axis=0)
            new = jnp.minimum(dist, new)
            return new, jnp.any(new < dist - 1e-12), hops + 1

        def cond(carry):
            _, changed, hops = carry
            return changed & (hops < max_hops)

        dist, _, _ = jax.lax.while_loop(cond, body,
                                        (d_s, jnp.asarray(True), 0))
        best = jnp.min(dist + d_g)
        best = jnp.minimum(
            best, jnp.where(direct, jnp.linalg.norm(goal - start), BIG))
        return jnp.where(best >= BIG, jnp.inf, best)

    return jax.vmap(per_scenario)(starts.astype(f), goals.astype(f))


class VisibilityPlanner:
    """Exact any-angle planner over a free raster (anya.rs capability,
    continuous-LOS semantics).

    Precomputes the ε-offset corner vertices + their LOS matrix once per
    map; `lengths` solves a batch of (start, goal) scenarios in one jitted
    call. `samples` defaults to 2 probes per cell of the longest possible
    segment so a 1-cell wall can never be jumped.
    """

    def __init__(self, free, samples: int | None = None, tile: int = 128,
                 eps: float = 1e-3):
        self.free = jnp.asarray(free, bool)
        self.blocked = ~self.free
        if samples is None:
            samples = 2 * max(self.free.shape) + 4
        self.samples = samples
        self.corners = jnp.asarray(corner_vertices(self.free, eps=eps))
        self.vis = visibility_matrix(
            self.corners, self.blocked, samples=samples, tile=tile)

    def lengths(self, starts, goals, max_hops: int = 128):
        """Optimal any-angle lengths [B] for cell-index starts/goals
        [B, 2] (converted to cell centers)."""
        starts = jnp.asarray(starts, jnp.result_type(float)) + 0.5
        goals = jnp.asarray(goals, jnp.result_type(float)) + 0.5
        return _visibility_solve(
            self.corners, self.vis, self.blocked, starts, goals,
            samples=self.samples, max_hops=max_hops)

    def path(self, start, goal, max_hops: int = 128):
        """Single-scenario path [K, 2] via host-side predecessor walk
        (small-C reconstruction; lengths are the batched TPU surface)."""
        start = np.asarray(start, np.float64) + 0.5
        goal = np.asarray(goal, np.float64) + 0.5
        corners = np.asarray(self.corners)
        vis = np.asarray(self.vis)
        blocked = np.asarray(self.blocked)
        pts = np.concatenate([start[None], corners, goal[None]])
        n = len(pts)
        svis = np.asarray(line_of_sight_free(
            jnp.broadcast_to(jnp.asarray(start), self.corners.shape),
            self.corners, self.blocked, 0.0, 0.0, 1.0, self.samples))
        gvis = np.asarray(line_of_sight_free(
            jnp.broadcast_to(jnp.asarray(goal), self.corners.shape),
            self.corners, self.blocked, 0.0, 0.0, 1.0, self.samples))
        direct = bool(np.asarray(line_of_sight_free(
            jnp.asarray(start), jnp.asarray(goal), self.blocked,
            0.0, 0.0, 1.0, self.samples)))
        adj = {}

        def edges(i):
            if i == 0:
                nbrs = np.nonzero(svis)[0] + 1
                if direct:
                    nbrs = np.concatenate([nbrs, [n - 1]])
            elif i == n - 1:
                nbrs = np.nonzero(gvis)[0] + 1
            else:
                nbrs = np.nonzero(vis[i - 1])[0] + 1
                nbrs = nbrs[nbrs != i]
                if gvis[i - 1]:
                    nbrs = np.concatenate([nbrs, [n - 1]])
                if svis[i - 1]:
                    nbrs = np.concatenate([nbrs, [0]])
            return nbrs

        dist = np.full(n, np.inf)
        pred = np.full(n, -1, np.int64)
        dist[0] = 0.0
        heap = [(0.0, 0)]
        while heap:
            d, i = heapq.heappop(heap)
            if d > dist[i] + 1e-12:
                continue
            if i == n - 1:
                break
            for j in edges(i):
                nd = d + float(np.linalg.norm(pts[i] - pts[j]))
                if nd < dist[j] - 1e-12:
                    dist[j] = nd
                    pred[j] = i
                    heapq.heappush(heap, (nd, j))
        if not np.isfinite(dist[n - 1]):
            return None
        seq = [n - 1]
        while seq[-1] != 0:
            seq.append(int(pred[seq[-1]]))
        seq.reverse()
        return pts[seq]


def dijkstra_visibility_oracle(free, start, goal, samples: int = 256):
    """Independent host-side exact any-angle length: heap Dijkstra over the
    full visibility graph of corners + endpoints. Used by tests to certify
    `VisibilityPlanner` results (the +0.01%-of-optimum gate)."""
    planner = VisibilityPlanner(free, samples=samples)
    path = planner.path(np.asarray(start), np.asarray(goal))
    if path is None:
        return math.inf
    return float(np.sum(np.linalg.norm(np.diff(path, axis=0), axis=-1)))


# --------------------------------------------------------------------------
# Theta*-equivalent LOS-relaxed wavefront
# --------------------------------------------------------------------------

_MOTIONS = (
    (1, 0, 1.0), (0, 1, 1.0), (-1, 0, 1.0), (0, -1, 1.0),
    (-1, -1, SQRT2), (-1, 1, SQRT2), (1, -1, SQRT2), (1, 1, SQRT2),
)


@functools.partial(jax.jit, static_argnames=("iters", "samples", "block"))
def theta_wavefront_costs(free, goal_idx, iters: int = 512,
                          samples: int = 160, block: int = 4):
    """Any-angle cost field by LOS-relaxed wavefront (Theta* path-2 rule).

    free [W, H] bool; goal_idx [2] int. Returns (g [W, H], parent [W, H, 2]).
    Each sweep relaxes every cell from its 8 neighbors with BOTH rules:
      path-1: g[u] + step_cost           (parent ← u)
      path-2: g[p] + ‖p − v‖  if LOS(p, v), p = parent[u]   (parent ← p)
    Fixpoint g is order-independent Theta* (≥ the visibility optimum,
    ≤ the octile wavefront). `samples` bounds the sampled-LOS resolution —
    segments longer than `samples` cells are conservatively rejected so a
    thin wall is never jumped.
    """
    f = jnp.result_type(float)
    free = jnp.asarray(free, bool)
    w, h = free.shape
    blocked = ~free
    gx = jax.lax.broadcasted_iota(jnp.int32, (w, h), 0)
    gy = jax.lax.broadcasted_iota(jnp.int32, (w, h), 1)
    centers = jnp.stack([gx, gy], -1).astype(f) + 0.5

    goal = jnp.asarray(goal_idx, jnp.int32)
    g0 = jnp.where((gx == goal[0]) & (gy == goal[1]) & free,
                   jnp.zeros((), f), jnp.asarray(BIG, f))
    parent0 = jnp.broadcast_to(goal.astype(f) + 0.5, (w, h, 2))

    def sweep(state):
        g, parent = state
        best_g = g
        best_parent = parent
        for dx, dy, c in _MOTIONS:
            # neighbor u = (x+dx, y+dy); admissibility of the v←u move
            m = free & _shift(free, dx, dy, False)
            if dx != 0 and dy != 0:
                m = m & _shift(free, dx, 0, False) & _shift(free, 0, dy, False)
            gu = _shift(g, dx, dy, jnp.asarray(BIG, f))
            # path-1
            cand1 = jnp.where(m, gu + jnp.asarray(c, f), BIG)
            u_xy = jnp.stack(
                [(gx + dx).astype(f), (gy + dy).astype(f)], -1) + 0.5
            # path-2: parent of u
            px = _shift(parent[..., 0], dx, dy, jnp.asarray(0.0, f))
            py = _shift(parent[..., 1], dx, dy, jnp.asarray(0.0, f))
            p_xy = jnp.stack([px, py], -1)
            gp_x = jnp.clip((px - 0.5).astype(jnp.int32), 0, w - 1)
            gp_y = jnp.clip((py - 0.5).astype(jnp.int32), 0, h - 1)
            gp = g[gp_x, gp_y]
            seg = jnp.linalg.norm(p_xy - centers, axis=-1)
            los = line_of_sight_free(
                p_xy, centers, blocked, 0.0, 0.0, 1.0, samples)
            # sampled-LOS validity: keep ≥2 probes per traversed cell
            los = los & (seg <= (samples - 1) / 2)
            cand2 = jnp.where(m & los, gp + seg, BIG)

            take2 = cand2 <= cand1
            cand = jnp.where(take2, cand2, cand1)
            cand_parent = jnp.where(take2[..., None], p_xy, u_xy)
            better = cand < best_g
            best_g = jnp.where(better, cand, best_g)
            best_parent = jnp.where(better[..., None], cand_parent,
                                    best_parent)
        return best_g, best_parent

    def body(carry):
        g, parent, _, it = carry
        new_g, new_p = g, parent
        for _ in range(block):
            new_g, new_p = sweep((new_g, new_p))
        return new_g, new_p, jnp.any(new_g < g - 1e-9), it + block

    def cond(carry):
        _, _, changed, it = carry
        return changed & (it < iters)

    g, parent, _, _ = jax.lax.while_loop(
        cond, body, (g0, parent0, jnp.asarray(True), 0))
    return jnp.where(g >= BIG, jnp.asarray(jnp.inf, f), g), parent
