"""Any-angle path post-processing: line-of-sight shortcutting + relaxation.

Reference: crates/rust_robotics_planning/src/path_smoothing.rs (333 LoC) —
the "A* + optimize_path" combination that matches Theta* quality at 2.3×
the speed (README.md:408): LOS shortcutting over the grid path followed by
a relaxation pass.

TPU-native inversion: instead of the reference's greedy sequential
shortcut walk, ALL pairwise LOS checks between path vertices evaluate in
parallel (a [N, N, S] sampled visibility tensor), and the optimal shortcut
sequence is the shortest path on that visibility DAG — solved by min-plus
matrix squaring in O(log N) batched steps. Guaranteed no worse than the
greedy walk (it is the optimal shortcut for the given vertex set).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

BIG = 1e18


def line_of_sight_free(p0, p1, blocked, min_x, min_y, resolution, samples=64):
    """Segment p0→p1 [..., 2] clear of blocked raster cells (sampled)."""
    t = jnp.linspace(0.0, 1.0, samples)
    pts = p0[..., None, :] + t[:, None] * (p1 - p0)[..., None, :]
    idx = jnp.floor(
        (pts - jnp.stack([min_x, min_y])) / resolution
    ).astype(jnp.int32)
    w, h = blocked.shape[-2], blocked.shape[-1]
    ix = jnp.clip(idx[..., 0], 0, w - 1)
    iy = jnp.clip(idx[..., 1], 0, h - 1)
    return ~jnp.any(blocked[ix, iy], axis=-1)


@functools.partial(jax.jit, static_argnames=("samples",))
def shortcut_path(points, mask, blocked, min_x, min_y, resolution,
                  samples=64):
    """Optimal LOS shortcut over the path's vertex set.

    points [N, 2] padded with mask [N]. Returns (keep_mask [N], total_len):
    vertices on the optimal shortcut sequence (always includes the first
    and last valid vertex). Min-plus squaring over the visibility DAG.
    """
    n = points.shape[0]
    d = jnp.linalg.norm(points[:, None, :] - points[None, :, :], axis=-1)
    los = jax.vmap(
        lambda p: line_of_sight_free(
            jnp.broadcast_to(p, points.shape), points, blocked, min_x, min_y,
            resolution, samples,
        )
    )(points)
    valid = (mask > 0)
    upper = jnp.triu(jnp.ones((n, n), bool), 1)  # forward edges only
    w = jnp.where(los & upper & valid[:, None] & valid[None, :], d, BIG)
    w = jnp.where(jnp.eye(n, dtype=bool), 0.0, w)

    # min-plus closure (all-pairs shortest path by matrix squaring)
    def mp(a, b):
        return jnp.min(a[:, :, None] + b[None, :, :], axis=1)

    dist = w
    for _ in range(max(1, (n - 1).bit_length())):
        dist = jnp.minimum(dist, mp(dist, dist))

    last = n - 1 - jnp.argmax(jnp.flip(valid), axis=0)
    first = jnp.argmax(valid)

    # reconstruct: vertex k is on an optimal first→last path iff
    # dist[first, k] + dist[k, last] == dist[first, last]; among ties pick
    # the canonical chain greedily from `first`
    def walk(carry, _):
        cur, done = carry
        nxt_costs = jnp.where(
            (w[cur] < BIG), w[cur] + dist[:, last][jnp.arange(n)], BIG
        )
        # choose the farthest next vertex that preserves optimality
        opt = jnp.abs(nxt_costs - dist[cur, last]) < 1e-9
        idxs = jnp.arange(n)
        nxt = jnp.max(jnp.where(opt & (idxs > cur), idxs, -1))
        nxt = jnp.where(nxt < 0, last, nxt)
        new_done = done | (cur == last)
        out = jnp.where(new_done, -1, nxt)
        return (jnp.where(new_done, cur, nxt), new_done), out

    (_, _), seq = jax.lax.scan(
        walk, (first, jnp.asarray(False)), None, length=n
    )
    keep = jnp.zeros((n,), bool).at[first].set(True)
    keep = keep.at[jnp.clip(seq, 0, n - 1)].set(
        jnp.where(seq >= 0, True, keep[jnp.clip(seq, 0, n - 1)])
    )
    return keep, dist[first, last]


def relax_path(points, mask, blocked, min_x, min_y, resolution,
               iterations=20, alpha=0.25, samples=16):
    """Neighbor-average relaxation that rejects moves losing line-of-sight
    (path_smoothing.rs relax stage). Endpoints stay fixed."""
    n = points.shape[0]
    interior = (mask > 0)
    interior = interior & jnp.roll(interior, 1) & jnp.roll(interior, -1)
    interior = interior.at[0].set(False).at[n - 1].set(False)

    def body(_, pts):
        target = 0.5 * (jnp.roll(pts, 1, axis=0) + jnp.roll(pts, -1, axis=0))
        prop = pts + alpha * (target - pts)
        ok_prev = line_of_sight_free(
            jnp.roll(pts, 1, axis=0), prop, blocked, min_x, min_y, resolution,
            samples,
        )
        ok_next = line_of_sight_free(
            prop, jnp.roll(pts, -1, axis=0), blocked, min_x, min_y, resolution,
            samples,
        )
        move = interior & ok_prev & ok_next
        return jnp.where(move[:, None], prop, pts)

    return jax.lax.fori_loop(0, iterations, body, points)
