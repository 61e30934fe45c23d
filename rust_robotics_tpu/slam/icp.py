"""ICP scan matching: point-to-point with SVD motion estimation.

Reference: slam/src/icp_matching.rs — iterative loop (:60-140, EPS=1e-4,
MAX_ITER=100): NN association (KD-tree, :164) → SVD motion estimation
(:289-340: centroid shift, W = c̃ p̃ᵀ, R = V Uᵀ, t = p̄ − R c̄) → transform
accumulation (:142-160) → convergence on error decrease < EPS; rich
`ICPResult` diagnostics (:30-50: mean/median/p90 error, 5 cm inlier ratio).

TPU-native inversion (SURVEY.md §2.9): KD-trees don't vectorize — for scan
sizes (≤10⁴ points) a tiled brute-force distance matrix (|c|²+|p|²−2c·p on
the MXU) wins. The 2D rotation solve is the closed-form polar factor
(atan2), the 3D one a Newton polar iteration — no generic SVD lowering.
The whole ICP loop is one `lax.while_loop`; batched scan *pairs* vmap over
a leading axis.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from rust_robotics_tpu.core.types import pytree_dataclass

EPS = 1e-4
MAX_ITER = 100
INLIER_DISTANCE_THRESHOLD = 0.05


@pytree_dataclass
class ICPResult:
    """Mirror of `ICPResult` (icp_matching.rs:30-50); `transform` is the
    homogeneous (d+1)×(d+1) previous-from-current matrix."""

    transform: Any
    iterations: Any
    final_error: Any
    final_error_mean: Any
    initial_error_mean: Any
    final_error_median: Any
    final_error_p90: Any
    inlier_ratio_5cm: Any
    relative_error_reduction: Any
    converged: Any


def nearest_neighbor(prev_pts, cur_pts):
    """Brute-force NN: for each current point the nearest previous point.

    prev_pts [N, d], cur_pts [M, d] -> (indices [M], distances [M]).
    Distance matrix via |c|² + |p|² − 2c·p (MXU matmul).
    """
    d2 = (
        jnp.sum(cur_pts**2, axis=-1, keepdims=True)
        + jnp.sum(prev_pts**2, axis=-1)
        - 2.0 * cur_pts @ prev_pts.T
    )
    idx = jnp.argmin(d2, axis=-1)
    dist = jnp.sqrt(jnp.clip(jnp.take_along_axis(d2, idx[:, None], axis=-1)[:, 0], 0.0, None))
    return idx, dist


def _polar_rotation_2d(w):
    """Proper-rotation polar factor of Wᵀ (closed form): the reference's
    R = V Uᵀ from SVD of W (icp_matching.rs:325-333)."""
    m = w.T
    theta = jnp.arctan2(m[1, 0] - m[0, 1], m[0, 0] + m[1, 1])
    c, s = jnp.cos(theta), jnp.sin(theta)
    return jnp.array([[c, -s], [s, c]])


def _polar_rotation_3d(w, iters=12):
    """Newton polar iteration R ← (R + R⁻ᵀ)/2 on Wᵀ (3D Kabsch without
    generic SVD)."""
    from rust_robotics_tpu.ops.smallmat import inv_spd_small

    m = w.T
    # normalize scale for convergence
    m = m / jnp.clip(jnp.sqrt(jnp.sum(m * m) / 3.0), 1e-12, None)

    def body(_, r):
        r_inv_t = inv_spd_small(r).T  # adjugate-based general 3x3 inverse
        return 0.5 * (r + r_inv_t)

    return jax.lax.fori_loop(0, iters, body, m)


def svd_motion_estimation(prev_pts, cur_pts):
    """(R, t) mapping current -> previous (icp_matching.rs:289-345):
    centroids, W = c̃ᵀ-cross-covariance, R = polar, t = p̄ − R c̄."""
    pm = jnp.mean(prev_pts, axis=0)
    cm = jnp.mean(cur_pts, axis=0)
    p_shift = prev_pts - pm
    c_shift = cur_pts - cm
    w = c_shift.T @ p_shift  # [d, d]
    if prev_pts.shape[-1] == 2:
        r = _polar_rotation_2d(w)
    else:
        r = _polar_rotation_3d(w)
    t = pm - r @ cm
    return r, t


def _percentile(x, q):
    return jnp.quantile(x, q)


def icp_matching(prev_pts, cur_pts, max_iter: int = MAX_ITER, eps: float = EPS):
    """Full ICP loop (icp_matching.rs:60-140) as one lax.while_loop.

    prev_pts [N, d], cur_pts [M, d] (d = 2 or 3). Returns ICPResult with the
    accumulated previous-from-current homogeneous transform.
    """
    d = prev_pts.shape[-1]
    f = prev_pts.dtype
    eye = jnp.eye(d + 1, dtype=f)
    big = jnp.asarray(jnp.inf, f)

    def assoc_error(cur):
        idx, dist = nearest_neighbor(prev_pts, cur)
        return idx, jnp.sum(dist)

    def cond(carry):
        cur, h, pre_err, init_err, count, done = carry
        return (~done) & (count < max_iter)

    def body(carry):
        cur, h, pre_err, init_err, count, done = carry
        count = count + 1
        idx, err = assoc_error(cur)
        init_err = jnp.where(jnp.isnan(init_err), err, init_err)
        prev_sel = prev_pts[idx]
        r, t = svd_motion_estimation(prev_sel, cur)
        new_cur = cur @ r.T + t
        d_err = pre_err - err
        diverged = d_err < 0.0
        h_step = eye.at[:d, :d].set(r).at[:d, d].set(t)
        # NOTE: the reference multiplies h_prev · h_step
        # (icp_matching.rs:142-160, inherited from PythonRobotics), which is
        # only the exact cumulative map when steps commute; we accumulate
        # h_step · h_prev so `transform` applied once to the ORIGINAL current
        # points reproduces the iterated alignment exactly.
        new_h = jnp.where(diverged, h, h_step @ h)
        new_pre = jnp.where(diverged, pre_err, err)
        new_cur = jnp.where(diverged, cur, new_cur)
        done = diverged | (d_err <= eps)
        return new_cur, new_h, new_pre, init_err, count, done

    cur0 = cur_pts
    carry = (cur0, eye, big, jnp.asarray(jnp.nan, f), jnp.asarray(0), jnp.asarray(False))
    cur, h, pre_err, init_err, count, done = jax.lax.while_loop(cond, body, carry)

    m = cur_pts.shape[0]
    point_count = max(m, 1)
    _, final_dists = nearest_neighbor(prev_pts, cur)
    final_mean = pre_err / point_count
    init_mean = init_err / point_count
    rel_red = jnp.where(
        jnp.isfinite(init_mean) & (init_mean > 0),
        jnp.clip((init_mean - final_mean) / init_mean, 0.0, None),
        0.0,
    )
    return ICPResult(
        transform=h,
        iterations=count,
        final_error=pre_err,
        final_error_mean=final_mean,
        initial_error_mean=init_mean,
        final_error_median=_percentile(final_dists, 0.5),
        final_error_p90=_percentile(final_dists, 0.9),
        inlier_ratio_5cm=jnp.mean(
            (final_dists <= INLIER_DISTANCE_THRESHOLD).astype(f)
        ),
        relative_error_reduction=rel_red,
        converged=done & (count < max_iter),
    )
