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
