"""Sampling road maps: PRM / PRM*, visibility road map.

Reference (crates/rust_robotics_planning/src/): prm.rs (372), prm_star.rs
(458), visibility_road_map.rs (597), voronoi_road_map.rs (528).

TPU-native: sample all N vertices at once; the k-NN / radius graph is the
pairwise distance matrix; edge collision checks are a [N, N, S] sampled
segment tensor; shortest path over the roadmap is min-plus matrix squaring
(O(log N) batched steps) — the same closure machinery as path smoothing.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

BIG = 1e18


def _edge_free(p0, p1, obstacles, radii, samples):
    t = jnp.linspace(0.0, 1.0, samples)
    pts = p0[..., None, :] + t[:, None] * (p1 - p0)[..., None, :]
    d = jnp.linalg.norm(pts[..., None, :] - obstacles, axis=-1)
    return jnp.all(d > radii, axis=(-2, -1))


def build_prm(key, start, goal, obstacles, radii, num_samples=150,
              connect_radius=3.0, area_min=(0.0, 0.0), area_max=(10.0, 10.0),
              edge_checks=12):
    """Sample a roadmap; returns (vertices [N+2, 2], weight matrix [N+2, N+2])
    with start at index 0, goal at index 1. Free-space rejection keeps
    capacity static (invalid samples isolate themselves: their edges are
    blocked anyway)."""
    lo = jnp.asarray(area_min)
    hi = jnp.asarray(area_max)
    samples = lo + jax.random.uniform(key, (num_samples, 2)) * (hi - lo)
    verts = jnp.concatenate(
        [jnp.asarray(start)[None], jnp.asarray(goal)[None], samples]
    )
    n = verts.shape[0]
    d = jnp.linalg.norm(verts[:, None, :] - verts[None, :, :], axis=-1)
    free = jax.vmap(
        lambda p: _edge_free(
            jnp.broadcast_to(p, verts.shape), verts, obstacles, radii,
            edge_checks,
        )
    )(verts)
    # vertices inside obstacles disconnect entirely
    v_free = jnp.all(
        jnp.linalg.norm(verts[:, None, :] - obstacles, axis=-1) > radii,
        axis=-1,
    )
    ok = free & (d <= connect_radius) & v_free[:, None] & v_free[None, :]
    w = jnp.where(ok, d, BIG)
    w = jnp.where(jnp.eye(n, dtype=bool), 0.0, w)
    return verts, w


def roadmap_shortest_path(weights, src=0, dst=1):
    """All-pairs min-plus closure; returns (cost, dist matrix)."""
    n = weights.shape[0]
    dist = weights
    for _ in range((n - 1).bit_length()):
        dist = jnp.minimum(dist, jnp.min(dist[:, :, None] + dist[None, :, :], axis=1))
    return dist[src, dst], dist


def extract_roadmap_path(verts, weights, dist, src=0, dst=1, max_len=64):
    """Greedy walk along optimal successors; returns (points [L, 2], mask)."""
    n = weights.shape[0]

    def step(carry, _):
        cur, done = carry
        through = weights[cur] + dist[:, dst]
        opt = jnp.abs(through - dist[cur, dst]) < 1e-9
        strictly_closer = dist[:, dst] < dist[cur, dst]
        cand = jnp.where(opt & strictly_closer, dist[:, dst], BIG)
        nxt = jnp.argmin(cand)
        has = cand[nxt] < BIG
        new_done = done | (cur == dst) | (~has)
        out = jnp.where(new_done, -1, nxt)
        return (jnp.where(new_done, cur, nxt), new_done), out

    (_, _), seq = jax.lax.scan(
        step, (jnp.asarray(src), jnp.asarray(False)), None, length=max_len - 1
    )
    idxs = jnp.concatenate([jnp.asarray([src]), seq])
    mask = idxs >= 0
    return verts[jnp.clip(idxs, 0, n - 1)], mask


def prm_plan(key, start, goal, obstacles, radii, **kwargs):
    """End-to-end PRM query; returns (points, mask, cost)."""
    verts, w = build_prm(key, start, goal, obstacles, radii, **kwargs)
    cost, dist = roadmap_shortest_path(w)
    pts, mask = extract_roadmap_path(verts, w, dist)
    return pts, mask, cost


def visibility_roadmap(start, goal, obstacles, radii, inflate=1.2,
                       corners_per_obstacle: int = 8, edge_checks=16):
    """Visibility road map (visibility_road_map.rs): vertices are points
    ringed around each (inflated) obstacle circle; edges connect mutually
    visible vertices. Returns (vertices, weights) for
    `roadmap_shortest_path`."""
    m = obstacles.shape[0]
    th = jnp.linspace(0.0, 2.0 * jnp.pi, corners_per_obstacle, endpoint=False)
    ring = jnp.stack([jnp.cos(th), jnp.sin(th)], axis=-1)  # [C, 2]
    verts_obs = (
        obstacles[:, None, :] + (radii[:, None, None] * inflate) * ring[None]
    ).reshape(m * corners_per_obstacle, 2)
    verts = jnp.concatenate(
        [jnp.asarray(start)[None], jnp.asarray(goal)[None], verts_obs]
    )
    n = verts.shape[0]
    d = jnp.linalg.norm(verts[:, None, :] - verts[None, :, :], axis=-1)
    vis = jax.vmap(
        lambda p: _edge_free(
            jnp.broadcast_to(p, verts.shape), verts, obstacles, radii,
            edge_checks,
        )
    )(verts)
    v_free = jnp.all(
        jnp.linalg.norm(verts[:, None, :] - obstacles, axis=-1) > radii,
        axis=-1,
    )
    ok = vis & v_free[:, None] & v_free[None, :]
    w = jnp.where(ok, d, BIG)
    return verts, jnp.where(jnp.eye(n, dtype=bool), 0.0, w)


def voronoi_roadmap(start, goal, blocked, min_x, min_y, resolution,
                    ridge_quantile=0.7, max_vertices: int = 256,
                    connect_radius_cells: float = 6.0):
    """Voronoi road map (voronoi_road_map.rs): vertices on the maximal-
    clearance ridge of the obstacle distance field (EDT local maxima),
    connected within a radius when the straight cell-space segment stays
    clear. Returns (vertices [V, 2] world coords, weights [V, V])."""
    from rust_robotics_tpu.mapping.distance import compute_udf

    udf = compute_udf(jnp.asarray(blocked))
    w, h = udf.shape
    # ridge cells: distance >= all 4-neighbors (local maxima of clearance)
    pad = jnp.pad(udf, 1, constant_values=-1.0)
    neigh = jnp.stack(
        [pad[:-2, 1:-1], pad[2:, 1:-1], pad[1:-1, :-2], pad[1:-1, 2:]]
    )
    is_ridge = (udf >= jnp.max(neigh, axis=0)) & (~jnp.asarray(blocked))
    score = jnp.where(is_ridge, udf, -jnp.inf).ravel()
    vals, idx = jax.lax.top_k(score, max_vertices)
    vx = (idx // h).astype(jnp.float64)
    vy = (idx % h).astype(jnp.float64)
    cells = jnp.stack([vx, vy], axis=-1)
    s_cell = (jnp.asarray(start) - jnp.stack([min_x, min_y])) / resolution
    g_cell = (jnp.asarray(goal) - jnp.stack([min_x, min_y])) / resolution
    verts = jnp.concatenate([s_cell[None], g_cell[None], cells])
    valid = jnp.concatenate([jnp.array([True, True]), vals > 0.5])
    n = verts.shape[0]
    d = jnp.linalg.norm(verts[:, None, :] - verts[None, :, :], axis=-1)

    from rust_robotics_tpu.planning.smoothing import line_of_sight_free

    free_seg = jax.vmap(
        lambda p: line_of_sight_free(
            jnp.broadcast_to(p, verts.shape) * resolution
            + jnp.stack([min_x, min_y]),
            verts * resolution + jnp.stack([min_x, min_y]),
            jnp.asarray(blocked), min_x, min_y, resolution, samples=24,
        )
    )(verts)
    ok = (
        free_seg
        & (d <= connect_radius_cells)
        & valid[:, None]
        & valid[None, :]
    )
    wmat = jnp.where(ok, d * resolution, BIG)
    wmat = jnp.where(jnp.eye(n, dtype=bool), 0.0, wmat)
    world = verts * resolution + jnp.stack([min_x, min_y])
    return world, wmat
