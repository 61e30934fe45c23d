"""EKF-SLAM: joint robot + landmark state with Mahalanobis association.

Reference: slam/src/ekf_slam.rs — state [x, y, yaw, lm1x, lm1y, ...] (:51),
motion model + G/Fu Jacobians (:98-140), range-bearing innovation (:237),
Mahalanobis data association picking min distance with new-landmark
threshold (:285), known-correspondence variant (:448).

TPU-native inversion (SURVEY.md §7.3 item 3): the reference grows its state
vector per new landmark; here capacity L is static — mean [3+2L], cov
[3+2L, 3+2L], and `n_lm` is a traced counter. Association evaluates ALL
landmark innovations in parallel (a [L]-batched 2×2 solve) instead of a
sequential scan; batched over worlds with vmap.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from rust_robotics_tpu.core.angles import normalize_angle
from rust_robotics_tpu.core.types import pytree_dataclass
from rust_robotics_tpu.ops.smallmat import det_small, inv_spd_small

STATE_SIZE = 3
LM_SIZE = 2
M_DIST_TH = 4.0  # chi-square 95% for 2 DOF (ekf_slam.rs:19)


@pytree_dataclass
class EKFSLAMBelief:
    mean: Any  # [3 + 2L]
    cov: Any  # [3 + 2L, 3 + 2L]
    n_lm: Any  # scalar int

    @property
    def capacity(self) -> int:
        return (self.mean.shape[-1] - STATE_SIZE) // LM_SIZE


def init_ekf_slam(capacity: int, dtype=jnp.float64):
    n = STATE_SIZE + LM_SIZE * capacity
    mean = jnp.zeros((n,), dtype)
    cov = jnp.eye(n, dtype=dtype)
    return EKFSLAMBelief(mean, cov, jnp.asarray(0))


def motion_model(pose, u, dt):
    """ekf_slam.rs:98-104."""
    return jnp.stack(
        [
            pose[0] + u[0] * dt * jnp.cos(pose[2]),
            pose[1] + u[0] * dt * jnp.sin(pose[2]),
            normalize_angle(pose[2] + u[1] * dt),
        ]
    )


def ekf_slam_predict(belief: EKFSLAMBelief, u, dt, q_control):
    """Robot-only motion propagation; landmarks static (ekf_slam.rs:107-140):
    G = I + dG, Fu maps control noise into the pose block."""
    pose = belief.mean[:STATE_SIZE]
    yaw, v = pose[2], u[0]
    new_pose = motion_model(pose, u, dt)
    n = belief.mean.shape[0]
    g_r = jnp.array(
        [
            [1.0, 0.0, -dt * v * jnp.sin(yaw)],
            [0.0, 1.0, dt * v * jnp.cos(yaw)],
            [0.0, 0.0, 1.0],
        ],
        dtype=belief.mean.dtype,
    )
    fu = jnp.array(
        [
            [dt * jnp.cos(yaw), 0.0],
            [dt * jnp.sin(yaw), 0.0],
            [0.0, dt],
        ],
        dtype=belief.mean.dtype,
    )
    g = jnp.eye(n, dtype=belief.mean.dtype).at[:3, :3].set(g_r)
    q_big = jnp.zeros((n, n), belief.mean.dtype).at[:3, :3].set(
        fu @ q_control @ fu.T
    )
    cov = g @ belief.cov @ g.T + q_big
    mean = belief.mean.at[:STATE_SIZE].set(new_pose)
    return EKFSLAMBelief(mean, cov, belief.n_lm)


def _landmark_innovations(belief, z):
    """Innovation (y, S, H) for observation z = [range, bearing] against ALL
    capacity landmarks in parallel. Returns y [L, 2], s [L, 2, 2],
    h [L, 2, n]."""
    n = belief.mean.shape[0]
    cap = belief.capacity
    pose = belief.mean[:3]
    lms = belief.mean[3:].reshape(cap, 2)
    d = lms - pose[:2]  # [L, 2]
    q = jnp.sum(d * d, axis=-1)  # [L]
    q = jnp.clip(q, 1e-12, None)
    sq = jnp.sqrt(q)
    z_pred = jnp.stack(
        [sq, normalize_angle(jnp.arctan2(d[:, 1], d[:, 0]) - pose[2])], axis=-1
    )
    y = jnp.stack(
        [z[0] - z_pred[:, 0], normalize_angle(z[1] - z_pred[:, 1])], axis=-1
    )
    dx, dy = d[:, 0], d[:, 1]
    # H blocks (ekf_slam.rs jacob_h): d h / d [pose, lm]
    h_pose = jnp.stack(
        [
            jnp.stack([-dx / sq, -dy / sq, jnp.zeros_like(sq)], axis=-1),
            jnp.stack([dy / q, -dx / q, -jnp.ones_like(q)], axis=-1),
        ],
        axis=-2,
    )  # [L, 2, 3]
    h_lm = jnp.stack(
        [
            jnp.stack([dx / sq, dy / sq], axis=-1),
            jnp.stack([-dy / q, dx / q], axis=-1),
        ],
        axis=-2,
    )  # [L, 2, 2]
    h = jnp.zeros((cap, 2, n), belief.mean.dtype)
    h = h.at[:, :, :3].set(h_pose)
    lm_cols = 3 + 2 * jnp.arange(cap)
    rows = jnp.arange(cap)
    h = h.at[rows[:, None, None], jnp.arange(2)[None, :, None],
             (lm_cols[:, None, None] + jnp.arange(2)[None, None, :])].set(h_lm)
    s = jnp.einsum("lin,nm,ljm->lij", h, belief.cov, h)
    return y, s, h


def _add_landmark(belief, z, r_obs):
    """Initialize slot n_lm from (range, bearing) with the proper Jacobian
    covariance P_lm = G_r P_rr G_rᵀ + G_z R G_zᵀ and cross-covariance
    G_r P_r,: (ekf_slam.rs:308-360)."""
    pose = belief.mean[:3]
    idx = 3 + 2 * belief.n_lm
    c = jnp.cos(pose[2] + z[1])
    s = jnp.sin(pose[2] + z[1])
    lx = pose[0] + z[0] * c
    ly = pose[1] + z[0] * s
    mean = jax.lax.dynamic_update_slice(belief.mean, jnp.stack([lx, ly]), (idx,))
    g_r = jnp.array([[1.0, 0.0, -z[0] * s], [0.0, 1.0, z[0] * c]],
                    dtype=belief.cov.dtype)
    g_z = jnp.array([[c, -z[0] * s], [s, z[0] * c]], dtype=belief.cov.dtype)
    p_rr = belief.cov[:3, :3]
    p_lm = g_r @ p_rr @ g_r.T + g_z @ r_obs @ g_z.T
    cross = g_r @ belief.cov[:3, :]  # [2, n]
    cov = jax.lax.dynamic_update_slice(belief.cov, cross, (idx, 0))
    cov = jax.lax.dynamic_update_slice(cov, cross.T, (0, idx))
    cov = jax.lax.dynamic_update_slice(cov, p_lm, (idx, idx))
    return EKFSLAMBelief(mean, cov, belief.n_lm + 1)


def ekf_slam_update_one(belief: EKFSLAMBelief, z, r_obs):
    """Process one [range, bearing] observation with Mahalanobis association
    (ekf_slam.rs:285): min over active landmarks; distance > M_DIST_TH (or
    no active landmarks) ⇒ new landmark (if capacity remains)."""
    cap = belief.capacity
    y, s, h = _landmark_innovations(belief, z)
    s = s + r_obs
    s_inv = inv_spd_small(s)
    mdist = jnp.einsum("li,lij,lj->l", y, s_inv, y)
    active = jnp.arange(cap) < belief.n_lm
    mdist = jnp.where(active, mdist, jnp.inf)
    best = jnp.argmin(mdist)
    is_new = (~jnp.any(active)) | (mdist[best] > M_DIST_TH**2)
    can_add = belief.n_lm < cap

    def do_add(b):
        return _add_landmark(b, z, r_obs)

    def do_update(b):
        hb = h[best]
        k = b.cov @ hb.T @ s_inv[best]
        mean = b.mean + k @ y[best]
        mean = mean.at[2].set(normalize_angle(mean[2]))
        n = b.mean.shape[0]
        cov = (jnp.eye(n, dtype=b.cov.dtype) - k @ hb) @ b.cov
        return EKFSLAMBelief(mean, cov, b.n_lm)

    return jax.lax.cond(is_new & can_add, do_add, do_update, belief)


def ekf_slam_step(belief: EKFSLAMBelief, u, observations, obs_mask, dt,
                  q_control, r_obs):
    """Full step: predict + sequentially fold O observations
    (ekf_slam.rs:418 `ekf_slam` step). observations [O, 2], obs_mask [O]."""
    belief = ekf_slam_predict(belief, u, dt, q_control)

    def fold(b, zm):
        z, m = zm
        return jax.lax.cond(
            m, lambda bb: ekf_slam_update_one(bb, z, r_obs), lambda bb: bb, b
        ), None

    belief, _ = jax.lax.scan(fold, belief, (observations, obs_mask))
    return belief
