"""Line extraction (split-and-merge) and IMLS surface projection.

Reference (crates/rust_robotics_mapping/src/): line_extraction.rs (308:
split-and-merge over an ordered scan), imls.rs (130: implicit moving least
squares surface distance/projection).

TPU-native: split-and-merge's recursion becomes a fixed-depth iteration
over a breakpoint mask — every level computes ALL segment point-line
distances at once; IMLS is a weighted reduction over neighbor points.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def split_and_merge(points, max_depth: int = 8, split_threshold: float = 0.1,
                    merge_threshold: float = 0.08):
    """Ordered scan points [N, 2] -> breakpoint mask [N] (True = segment
    endpoint). Fixed-depth iterative splitting; adjacent segments whose
    joined fit stays tight are re-merged."""
    n = points.shape[0]
    breaks = jnp.zeros((n,), bool).at[0].set(True).at[n - 1].set(True)
    idx = jnp.arange(n)

    def seg_bounds(breaks):
        """For each point: indices of its segment's endpoints (running max
        of breakpoints to the left, running min to the right)."""
        left = jax.lax.associative_scan(
            jnp.maximum, jnp.where(breaks, idx, -1)
        )
        right = jax.lax.associative_scan(
            jnp.minimum, jnp.where(breaks, idx, n), reverse=True
        )
        return left, right

    def point_line_dist(p, a, b):
        ab = b - a
        denom = jnp.clip(jnp.linalg.norm(ab, axis=-1), 1e-9, None)
        cross = ab[..., 0] * (p[..., 1] - a[..., 1]) - ab[..., 1] * (
            p[..., 0] - a[..., 0]
        )
        return jnp.abs(cross) / denom

    def body(_, breaks):
        left, right = seg_bounds(breaks)
        a = points[left]
        b = points[right]
        d = point_line_dist(points, a, b)
        # mask out existing breakpoints; find per-segment max deviation
        d = jnp.where(breaks, 0.0, d)
        seg_id = left  # segment key
        seg_max = jax.ops.segment_max(d, seg_id, n)
        is_max = (d >= seg_max[seg_id] - 1e-12) & (d > split_threshold)
        # one split per segment: the first max index
        first_max = jax.ops.segment_min(
            jnp.where(is_max, idx, n), seg_id, n
        )
        new_breaks = breaks | (idx == first_max[seg_id])
        return new_breaks

    breaks = jax.lax.fori_loop(0, max_depth, body, breaks)

    # merge pass: drop interior breakpoints whose joined segment stays tight
    left, right = seg_bounds(breaks)

    def try_merge(i, brks):
        def check(b_):
            lo = jnp.max(jnp.where(brks & (idx < i), idx, -1))
            hi = jnp.min(jnp.where(brks & (idx > i), idx, n))
            a_, c_ = points[lo], points[jnp.clip(hi, 0, n - 1)]
            span = (idx >= lo) & (idx <= hi)
            d = point_line_dist(points, a_, c_)
            worst = jnp.max(jnp.where(span, d, 0.0))
            keep = worst > merge_threshold
            return b_.at[i].set(keep)

        inner = brks[i] & (i > 0) & (i < n - 1)
        return jax.lax.cond(inner, check, lambda b_: b_, brks)

    breaks = jax.lax.fori_loop(1, n - 1, try_merge, breaks)
    return breaks


def segments_from_breaks(points, breaks):
    """Host-side: list of (start_xy, end_xy) per extracted segment."""
    import numpy as np

    b = np.nonzero(np.asarray(breaks))[0]
    p = np.asarray(points)
    return [(p[b[i]], p[b[i + 1]]) for i in range(len(b) - 1)]


def imls_distance(query, points, normals, h=0.5):
    """IMLS signed distance of query [..., 2or3] to the point set
    (imls.rs): f(x) = Σ w_i (x−p_i)·n_i / Σ w_i with Gaussian weights."""
    d = query[..., None, :] - points
    r2 = jnp.sum(d * d, axis=-1)
    w = jnp.exp(-r2 / (h * h))
    num = jnp.sum(w * jnp.sum(d * normals, axis=-1), axis=-1)
    den = jnp.clip(jnp.sum(w, axis=-1), 1e-12, None)
    return num / den


def imls_project(query, points, normals, h=0.5, iterations=5):
    """Project query points onto the IMLS surface by gradient steps."""
    grad = jax.grad(lambda q: jnp.sum(imls_distance(q[None], points, normals, h)))

    def body(_, q):
        f = imls_distance(q[None], points, normals, h)[0]
        g = grad(q)
        g = g / jnp.clip(jnp.linalg.norm(g), 1e-9, None)
        return q - f * g

    return jax.lax.fori_loop(0, iterations, body, query)
