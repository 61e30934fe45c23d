"""Scan-matching family: robust ICP, point-to-line/plane geometric ICP,
correlative matching, graph-based SLAM.

Reference (crates/rust_robotics_slam/src/):
- robust_icp.rs — Gauss-Newton + Huber ICP over a KD-tree with
  `Transform2D` composition (:77, :95-110).
- geometric_icp.rs — optimizer-backed point-to-line 2D (:51) and
  point-to-plane 3D (:145) ICP on the shared factor-graph solver.
- correlative_scan_matching.rs — brute-force pose-grid search (:55).
- graph_based_slam.rs — dense pose-graph SLAM from virtual landmark
  constraints (:262).

TPU-native: NN association is the tiled distance matrix (slam/icp.py);
Huber-weighted GN steps are closed-form 3×3 solves; the correlative search
evaluates the ENTIRE (dx, dy, dθ) pose grid in one batched gather — the
textbook accelerator reformulation of its triple loop.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from rust_robotics_tpu.core.angles import normalize_angle
from rust_robotics_tpu.nlls.kernels import RobustKernel
from rust_robotics_tpu.ops.smallmat import inv_spd_small, solve_spd_small
from rust_robotics_tpu.slam.icp import nearest_neighbor


def _apply_se2(pose, pts):
    c, s = jnp.cos(pose[2]), jnp.sin(pose[2])
    rot = jnp.array([[c, -s], [s, c]])
    return pts @ rot.T + pose[:2]


def robust_icp(prev_pts, cur_pts, init_pose=None, iterations: int = 30,
               huber_delta: float = 0.5):
    """Huber-weighted GN point-to-point ICP (robust_icp.rs:95-110).

    Estimates the SE(2) pose [dx, dy, dθ] mapping current→previous.
    Returns (pose [3], final mean error).
    """
    f = prev_pts.dtype
    pose0 = jnp.zeros(3, f) if init_pose is None else jnp.asarray(init_pose, f)
    kernel = RobustKernel("huber", huber_delta)

    def body(_, pose):
        moved = _apply_se2(pose, cur_pts)
        idx, dist = nearest_neighbor(prev_pts, moved)
        target = prev_pts[idx]
        r = moved - target  # [M, 2]
        e2 = jnp.sum(r * r, axis=-1)
        _, w = kernel.evaluate(e2)
        # Jacobian of residual wrt [dx, dy, dθ]: [I, dR/dθ · p]
        c, s = jnp.cos(pose[2]), jnp.sin(pose[2])
        dp = cur_pts @ jnp.array([[-s, c], [-c, -s]])  # [M, 2] = dR/dθ p
        j = jnp.concatenate(
            [
                jnp.broadcast_to(jnp.eye(2, dtype=f), (cur_pts.shape[0], 2, 2)),
                dp[:, :, None],
            ],
            axis=-1,
        )  # [M, 2, 3]
        h = jnp.einsum("m,mri,mrj->ij", w, j, j) + 1e-9 * jnp.eye(3, dtype=f)
        g = jnp.einsum("m,mri,mr->i", w, j, r)
        delta = -jnp.linalg.solve(h, g)
        return pose.at[:2].add(delta[:2]).at[2].set(
            normalize_angle(pose[2] + delta[2])
        )

    pose = jax.lax.fori_loop(0, iterations, body, pose0)
    moved = _apply_se2(pose, cur_pts)
    _, dist = nearest_neighbor(prev_pts, moved)
    return pose, jnp.mean(dist)


def point_to_line_icp(prev_pts, cur_pts, init_pose=None, iterations: int = 30):
    """Point-to-line 2D ICP (geometric_icp.rs:51): residual n·(T p − q)
    against the local line through the two nearest previous points."""
    f = prev_pts.dtype
    pose0 = jnp.zeros(3, f) if init_pose is None else jnp.asarray(init_pose, f)

    d2 = (
        jnp.sum(prev_pts**2, axis=-1, keepdims=True)
        + jnp.sum(prev_pts**2, axis=-1)
        - 2.0 * prev_pts @ prev_pts.T
    )

    def body(_, pose):
        moved = _apply_se2(pose, cur_pts)
        # two nearest previous points per current point
        dd = (
            jnp.sum(moved**2, axis=-1, keepdims=True)
            + jnp.sum(prev_pts**2, axis=-1)
            - 2.0 * moved @ prev_pts.T
        )
        _, nn2 = jax.lax.top_k(-dd, 2)  # [M, 2]
        a = prev_pts[nn2[:, 0]]
        b = prev_pts[nn2[:, 1]]
        t = b - a
        t = t / jnp.clip(jnp.linalg.norm(t, axis=-1, keepdims=True), 1e-9, None)
        n = jnp.stack([-t[:, 1], t[:, 0]], axis=-1)  # line normal
        r = jnp.sum(n * (moved - a), axis=-1)  # [M]
        c, s = jnp.cos(pose[2]), jnp.sin(pose[2])
        dp = cur_pts @ jnp.array([[-s, c], [-c, -s]])
        j = jnp.concatenate([n, jnp.sum(n * dp, axis=-1, keepdims=True)], axis=-1)
        h = j.T @ j + 1e-9 * jnp.eye(3, dtype=f)
        g = j.T @ r
        delta = -jnp.linalg.solve(h, g)
        return pose.at[:2].add(delta[:2]).at[2].set(
            normalize_angle(pose[2] + delta[2])
        )

    pose = jax.lax.fori_loop(0, iterations, body, pose0)
    moved = _apply_se2(pose, cur_pts)
    _, dist = nearest_neighbor(prev_pts, moved)
    return pose, jnp.mean(dist)


def correlative_scan_match(scan_pts, likelihood, min_x, min_y, resolution,
                           search_xy=1.0, search_theta=0.35,
                           n_xy: int = 21, n_theta: int = 21,
                           init_pose=None):
    """Brute-force pose-grid search (correlative_scan_matching.rs:55):
    maximize the summed map likelihood of the transformed scan over a
    (dx, dy, dθ) grid. ALL candidate poses evaluate in one batched gather.

    likelihood: [W, H] raster (e.g. Gaussian-smoothed occupancy). Returns
    (best_pose [3], best_score, scores [n_theta, n_xy, n_xy]).
    """
    f = scan_pts.dtype
    p0 = jnp.zeros(3, f) if init_pose is None else jnp.asarray(init_pose, f)
    dxs = p0[0] + jnp.linspace(-search_xy, search_xy, n_xy, dtype=f)
    dys = p0[1] + jnp.linspace(-search_xy, search_xy, n_xy, dtype=f)
    dth = p0[2] + jnp.linspace(-search_theta, search_theta, n_theta, dtype=f)

    w, h = likelihood.shape

    def score_theta(th):
        c, s = jnp.cos(th), jnp.sin(th)
        rot_pts = scan_pts @ jnp.array([[c, -s], [s, c]]).T  # [N, 2]
        # [n_xy, n_xy, N, 2] positions via broadcast
        px = rot_pts[None, None, :, 0] + dxs[:, None, None]
        py = rot_pts[None, None, :, 1] + dys[None, :, None]
        ix = jnp.clip(((px - min_x) / resolution).astype(jnp.int32), 0, w - 1)
        iy = jnp.clip(((py - min_y) / resolution).astype(jnp.int32), 0, h - 1)
        return jnp.sum(likelihood[ix, iy], axis=-1)  # [n_xy, n_xy]

    scores = jax.vmap(score_theta)(dth)  # [n_theta, n_xy, n_xy]
    flat = jnp.argmax(scores)
    ti, xi, yi = jnp.unravel_index(flat, scores.shape)
    best = jnp.stack([dxs[xi], dys[yi], dth[ti]])
    return best, scores[ti, xi, yi], scores


def graph_slam_from_landmarks(pose_guesses, landmark_obs, obs_mask,
                              information_scale=10.0, max_iterations=30):
    """Graph-based SLAM from virtual landmark constraints
    (graph_based_slam.rs:262): every pair of poses observing the same
    landmark contributes a virtual relative-pose constraint derived from
    their range-bearing observations; the resulting dense SE(2) graph is
    optimized with the shared solver.

    pose_guesses [N, 3]; landmark_obs [N, L, 2] (range, bearing);
    obs_mask [N, L]. Returns (poses [N, 3], summary).
    """
    import numpy as np

    from rust_robotics_tpu.slam.pose_graph import optimize_pose_graph_2d

    n, l, _ = landmark_obs.shape
    po = np.asarray(pose_guesses)
    ob = np.asarray(landmark_obs)
    mask = np.asarray(obs_mask)

    ef, et, meas, info = [], [], [], []
    # odometry backbone from the guesses
    for i in range(n - 1):
        a, b = po[i], po[i + 1]
        c, s = np.cos(a[2]), np.sin(a[2])
        d = b[:2] - a[:2]
        meas.append([c * d[0] + s * d[1], -s * d[0] + c * d[1], b[2] - a[2]])
        ef.append(i)
        et.append(i + 1)
        info.append(np.eye(3))
    # virtual landmark constraints
    for k in range(l):
        seers = np.nonzero(mask[:, k])[0]
        for ii in range(len(seers) - 1):
            i, j = int(seers[ii]), int(seers[ii + 1])
            # landmark position as seen from each pose
            def lm_from(p, z):
                return p[:2] + z[0] * np.array(
                    [np.cos(p[2] + z[1]), np.sin(p[2] + z[1])]
                )

            li = lm_from(po[i], ob[i, k])
            lj = lm_from(po[j], ob[j, k])
            # virtual relative translation correction
            d = po[j][:2] + (li - lj) - po[i][:2]
            c, s = np.cos(po[i][2]), np.sin(po[i][2])
            meas.append(
                [c * d[0] + s * d[1], -s * d[0] + c * d[1],
                 po[j][2] - po[i][2]]
            )
            ef.append(i)
            et.append(j)
            info.append(information_scale * np.diag([1.0, 1.0, 0.1]))
    return optimize_pose_graph_2d(
        jnp.asarray(po), np.asarray(ef, np.int32), np.asarray(et, np.int32),
        jnp.asarray(np.stack(meas)), jnp.asarray(np.stack(info)),
        max_iterations=max_iterations,
    )


def point_to_plane_icp(prev_pts, prev_normals, cur_pts, init_xi=None,
                       iterations: int = 30):
    """Point-to-plane 3D ICP (geometric_icp.rs:145): minimize
    Σ (n_qᵀ (T p − q))² over SE(3); per-iteration closed-form 6×6 GN with
    NN association against the normal-equipped previous cloud.

    Returns (xi [6] se3 tangent of previous-from-current, mean distance).
    """
    from rust_robotics_tpu.core.lie import se3_exp, se3_log, skew

    f = prev_pts.dtype
    xi0 = jnp.zeros(6, f) if init_xi is None else jnp.asarray(init_xi, f)

    def body(_, xi):
        t = se3_exp(xi)
        moved = cur_pts @ t[:3, :3].T + t[:3, 3]
        idx, _ = nearest_neighbor(prev_pts, moved)
        q = prev_pts[idx]
        n = prev_normals[idx]
        r = jnp.sum(n * (moved - q), axis=-1)  # [M]
        # Jacobian wrt δξ (left perturbation): d(moved)/dδ = [I, −skew(moved)]
        j_trans = n  # [M, 3]
        j_rot = jnp.cross(moved, n)  # = −nᵀ skew(moved) transposed sign → n×p? use cross(p, n)
        j = jnp.concatenate([j_trans, j_rot], axis=-1)  # [M, 6]
        h = j.T @ j + 1e-9 * jnp.eye(6, dtype=f)
        g = j.T @ r
        delta = -jnp.linalg.solve(h, g)
        return se3_log(se3_exp(jnp.concatenate([delta[:3], delta[3:]])) @ se3_exp(xi))

    xi = jax.lax.fori_loop(0, iterations, body, xi0)
    t = se3_exp(xi)
    moved = cur_pts @ t[:3, :3].T + t[:3, 3]
    _, dist = nearest_neighbor(prev_pts, moved)
    return xi, jnp.mean(dist)
