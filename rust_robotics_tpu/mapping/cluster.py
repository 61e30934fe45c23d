"""Clustering + geometric fitting over point clouds.

Reference: crates/rust_robotics_mapping/src/ — kmeans_clustering.rs (Lloyd
iterations), dbscan_clustering.rs (density labels), circle_fitting.rs
(algebraic least-squares circle), rectangle_fitting.rs (L-shape angle
search), normal_vector_estimation.rs (k-NN PCA normals),
point_cloud_sampling.rs (voxel / farthest-point / random sampling).

TPU-native: everything is distance-matrix + segment-reduce shaped; DBSCAN's
BFS becomes iterated min-label propagation over the ε-adjacency (a fixpoint
`while_loop` — label components without pointers); FPS is a `fori_loop`
with a running min-distance field.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _pairwise_sq(a, b):
    return (
        jnp.sum(a**2, axis=-1, keepdims=True)
        + jnp.sum(b**2, axis=-1)
        - 2.0 * a @ b.T
    )


# ---------------------------------------------------------------------------
# k-means (kmeans_clustering.rs)
# ---------------------------------------------------------------------------

def kmeans(points, init_centers, iterations: int = 20):
    """Lloyd iterations; returns (centers [K, d], labels [N])."""
    k = init_centers.shape[0]

    def body(_, centers):
        d2 = _pairwise_sq(points, centers)
        labels = jnp.argmin(d2, axis=-1)
        sums = jax.ops.segment_sum(points, labels, k)
        counts = jax.ops.segment_sum(jnp.ones(points.shape[0]), labels, k)
        new = sums / jnp.clip(counts[:, None], 1.0, None)
        return jnp.where(counts[:, None] > 0, new, centers)

    centers = jax.lax.fori_loop(0, iterations, body, init_centers)
    labels = jnp.argmin(_pairwise_sq(points, centers), axis=-1)
    return centers, labels


# ---------------------------------------------------------------------------
# DBSCAN (dbscan_clustering.rs)
# ---------------------------------------------------------------------------

def dbscan(points, eps, min_points):
    """Labels [N]: cluster id (smallest member index) or −1 for noise.

    Core points have ≥ min_points ε-neighbors (self included). Components
    over the core-connectivity graph form clusters; border points adopt the
    label of any core neighbor. Pointer-free min-label fixpoint.
    """
    n = points.shape[0]
    d2 = _pairwise_sq(points, points)
    adj = d2 <= eps * eps  # includes self
    degree = jnp.sum(adj, axis=-1)
    core = degree >= min_points
    # propagate labels only through core-core edges
    core_adj = adj & core[:, None] & core[None, :]
    labels = jnp.arange(n)

    def body(carry):
        lab, _ = carry
        neigh = jnp.where(core_adj, lab[None, :], n)
        new = jnp.minimum(lab, jnp.min(neigh, axis=-1))
        return new, jnp.any(new < lab)

    def cond(carry):
        _, changed = carry
        return changed

    labels = jnp.where(core, labels, n)
    labels, _ = jax.lax.while_loop(cond, body, (labels, jnp.asarray(True)))
    # border points: adopt min core-neighbor label
    border_lab = jnp.min(jnp.where(adj & core[None, :], labels[None, :], n), axis=-1)
    labels = jnp.where(core, labels, border_lab)
    return jnp.where(labels >= n, -1, labels)


# ---------------------------------------------------------------------------
# Circle fitting (circle_fitting.rs)
# ---------------------------------------------------------------------------

def fit_circle(points):
    """Algebraic (Kåsa) least-squares circle: returns (cx, cy, r)."""
    x, y = points[:, 0], points[:, 1]
    a = jnp.stack([x, y, jnp.ones_like(x)], axis=-1)
    b = x**2 + y**2
    sol, *_ = jnp.linalg.lstsq(a, b)
    cx, cy = sol[0] / 2.0, sol[1] / 2.0
    r = jnp.sqrt(jnp.clip(sol[2] + cx**2 + cy**2, 0.0, None))
    return cx, cy, r


# ---------------------------------------------------------------------------
# Rectangle (L-shape) fitting (rectangle_fitting.rs)
# ---------------------------------------------------------------------------

def fit_rectangle(points, num_angles: int = 90):
    """Search over orientations for the minimum-variance L-shape fit
    (rectangle_fitting.rs closeness criterion variant): returns
    (theta, corners [4, 2]). Vectorized over the angle grid."""
    thetas = jnp.linspace(0.0, jnp.pi / 2.0, num_angles, endpoint=False)
    c, s = jnp.cos(thetas), jnp.sin(thetas)
    # projections onto the two axes per angle: [A, N]
    e1 = points[:, 0][None, :] * c[:, None] + points[:, 1][None, :] * s[:, None]
    e2 = -points[:, 0][None, :] * s[:, None] + points[:, 1][None, :] * c[:, None]

    def closeness(proj):
        lo = jnp.min(proj, axis=-1, keepdims=True)
        hi = jnp.max(proj, axis=-1, keepdims=True)
        d = jnp.minimum(proj - lo, hi - proj)
        return -jnp.sum(jnp.clip(d, 0.01, None), axis=-1)

    score = closeness(e1) + closeness(e2)
    best = jnp.argmax(score)
    th = thetas[best]
    cb, sb = jnp.cos(th), jnp.sin(th)
    p1 = points[:, 0] * cb + points[:, 1] * sb
    p2 = -points[:, 0] * sb + points[:, 1] * cb
    lo1, hi1 = jnp.min(p1), jnp.max(p1)
    lo2, hi2 = jnp.min(p2), jnp.max(p2)
    corners_local = jnp.array(
        [[lo1, lo2], [hi1, lo2], [hi1, hi2], [lo1, hi2]]
    )
    rot = jnp.array([[cb, -sb], [sb, cb]])
    return th, corners_local @ rot.T


# ---------------------------------------------------------------------------
# Normals (normal_vector_estimation.rs)
# ---------------------------------------------------------------------------

def estimate_normals(points, k: int = 8):
    """k-NN PCA normals for 3D points [N, 3] -> unit normals [N, 3]."""
    d2 = _pairwise_sq(points, points)
    _, idx = jax.lax.top_k(-d2, k)  # [N, k] nearest (includes self)
    nbrs = points[idx]  # [N, k, 3]
    mu = jnp.mean(nbrs, axis=1, keepdims=True)
    d = nbrs - mu
    cov = jnp.einsum("nki,nkj->nij", d, d) / k
    # smallest eigenvector via eigh
    _, vecs = jnp.linalg.eigh(cov)
    return vecs[..., 0]


# ---------------------------------------------------------------------------
# Point-cloud sampling (point_cloud_sampling.rs)
# ---------------------------------------------------------------------------

def voxel_sample_mask(points, voxel_size):
    """Keep-first-per-voxel mask [N] (voxel grid sampling)."""
    cells = jnp.floor(points / voxel_size).astype(jnp.int64)
    h = cells[:, 0] * 73856093
    for j in range(1, points.shape[1]):
        h = h ^ cells[:, j] * (19349663 if j == 1 else 83492791)
    order = jnp.argsort(h)
    hs = h[order]
    first_sorted = jnp.concatenate(
        [jnp.array([True]), hs[1:] != hs[:-1]]
    )
    mask = jnp.zeros(points.shape[0], dtype=bool).at[order].set(first_sorted)
    return mask


def farthest_point_sample(points, num_samples, start: int = 0, valid=None):
    """FPS indices [num_samples] via running min-distance field. `valid`
    masks padded points out of selection (their distance is pinned -inf)."""
    n = points.shape[0]
    gate = jnp.ones((n,), bool) if valid is None else valid

    def body(i, carry):
        idx, mind = carry
        last = points[idx[i - 1]]
        d = jnp.sum((points - last) ** 2, axis=-1)
        mind = jnp.minimum(mind, d)
        nxt = jnp.argmax(jnp.where(gate, mind, -jnp.inf)).astype(jnp.int32)
        return idx.at[i].set(nxt), mind

    idx0 = jnp.zeros((num_samples,), jnp.int32).at[0].set(start)
    mind0 = jnp.full((n,), jnp.inf)
    idx, _ = jax.lax.fori_loop(1, num_samples, body, (idx0, mind0))
    return idx


def random_sample(key, points, num_samples):
    idx = jax.random.choice(key, points.shape[0], (num_samples,), replace=False)
    return idx


def poisson_disk_sample(key, points, n_points, min_distance,
                        max_iter: int, valid=None):
    """Poisson-disk (dart-throwing) subset mask [N]
    (point_cloud_sampling.rs:129 `poisson_disk_sampling`): start from a
    random point, then propose `max_iter` random candidates, accepting one
    when its distance to every already-selected point is >= min_distance
    and fewer than `n_points` are selected.

    Fixed-shape TPU form: one lax.scan over proposals carrying the
    selected mask; the min-distance test is a masked reduction over all N
    points. `valid` masks padded/dropped points out of candidacy.
    """
    n = points.shape[0]
    if valid is None:
        valid = jnp.ones((n,), bool)
    k0, kseq = jax.random.split(key)
    # first selected: a random valid index
    p0 = jnp.where(valid, 1.0, 0.0)
    first = jax.random.categorical(k0, jnp.log(p0 + 1e-30))
    sel0 = jnp.zeros((n,), bool).at[first].set(True)
    cands = jax.random.randint(kseq, (max_iter,), 0, n)

    def step(carry, cand):
        sel, count = carry
        base = points[cand]
        d = jnp.linalg.norm(points - base[None, :], axis=-1)
        dmin = jnp.min(jnp.where(sel, d, jnp.inf))
        ok = (dmin >= min_distance) & (count < n_points) & valid[cand]
        sel = sel.at[cand].set(sel[cand] | ok)
        return (sel, count + ok.astype(count.dtype)), None

    (sel, _), _ = jax.lax.scan(step, (sel0, jnp.int32(1)), cands)
    return sel
