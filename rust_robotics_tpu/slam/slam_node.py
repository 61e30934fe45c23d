"""Headless SLAM-node pipeline: scan → ICP → submap → quality-gated blend.

Reference: ros2_nodes/slam_node/src/main.rs (1,853 LoC): laser scan to point
matrix (:203), stride subsampling for ICP (:228), the per-axis ICP quality
gate `compute_icp_blend_decision` (:592) built from ramp weights
(`ramp_weight` :572 down-ramps error/iterations/correction magnitude,
`ramp_up_weight` :582 up-ramps motion magnitude), clamped correction
blending `blend_motion_delta` (:741), the local submap budget
`append_and_prune` (:508: radius prune around an anchor, then newest
`max_points` survive), and gating defaults (:31-:41). The ROS plumbing
(topics, TF, env-var config) is not reproduced — this is the
`headless_*`-style capability: the same decisions driven by a simulated
scan/odometry stream.

TPU-native shape: scans and submaps are fixed-capacity [N, 2] arrays with
validity masks (append/prune are mask-and-roll edits, never reshapes); the
gate is branch-free arithmetic returning (alpha, reason_code) so whole
scan batches can be gated under vmap; the scan matcher is the jitted
point-to-line ICP kernel (point-to-point NN correspondences slide
tangentially on flat walls and bias yaw — the same reason the reference
node gates ICP conservatively).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from rust_robotics_tpu.core.angles import normalize_angle
from rust_robotics_tpu.core.types import pytree_dataclass
from rust_robotics_tpu.slam.icp import icp_matching  # noqa: F401 (scan-to-scan alternative)
from rust_robotics_tpu.slam.scan_matching import point_to_line_icp

__all__ = [
    "IcpGatingParams", "REASONS", "ramp_weight", "ramp_up_weight",
    "compute_icp_blend_decision", "blend_motion_delta", "scan_to_points",
    "subsample_stride", "append_and_prune", "run_slam_node_loop",
]

# slam_node/src/main.rs:31-41 defaults
@dataclasses.dataclass(frozen=True)
class IcpGatingParams:
    blend_alpha: float = 0.35
    blend_alpha_yaw: float = 0.35
    full_weight_error: float = 0.007
    reject_error: float = 0.011
    full_weight_error_yaw: float = 0.007
    reject_error_yaw: float = 0.011
    full_weight_iterations: float = 12.0
    reject_iterations: float = 40.0
    full_weight_translation_correction: float = 0.05
    max_translation_correction: float = 0.25
    full_weight_yaw_correction: float = 0.08
    max_yaw_correction: float = 0.35
    full_weight_translation_motion: float = 0.05
    full_weight_yaw_motion: float = 0.08


# Reason codes (main.rs uses &'static str reasons; fixed ints jit cleanly).
REASONS = (
    "accepted",                # 0
    "not_converged",           # 1
    "invalid_error",           # 2
    "high_error",              # 3
    "slow_convergence",        # 4
    "translation_outlier",     # 5
    "yaw_outlier",             # 6
    "low_motion",              # 7
    "attenuated_low_motion",   # 8
    "attenuated_error",        # 9
    "attenuated_iterations",   # 10
    "attenuated_translation",  # 11
    "attenuated_yaw",          # 12
    "rejected",                # 13
)
_R = {name: i for i, name in enumerate(REASONS)}


def ramp_weight(value, full_weight_limit, reject_limit):
    """1 below full_weight_limit, 0 above reject_limit, linear between
    (main.rs:572)."""
    t = (reject_limit - value) / (reject_limit - full_weight_limit)
    return jnp.clip(t, 0.0, 1.0)


def ramp_up_weight(value, reject_limit, full_weight_limit):
    """0 below reject_limit, 1 above full_weight_limit (main.rs:582)."""
    t = (value - reject_limit) / (full_weight_limit - reject_limit)
    return jnp.clip(t, 0.0, 1.0)


def _axis_decision(base_alpha, final_error, full_weight_error, reject_error,
                   iteration_weight, correction_size, max_correction,
                   correction_weight, motion_weight, outlier_code,
                   attenuated_code):
    """compute_axis_decision (main.rs:697), branch-free: alpha = base ·
    min(error, iteration, correction, motion weights); the reason code
    follows the same precedence order as the reference's early returns."""
    error_weight = ramp_weight(final_error, full_weight_error, reject_error)
    scale = jnp.minimum(jnp.minimum(error_weight, iteration_weight),
                        jnp.minimum(correction_weight, motion_weight))
    alpha = base_alpha * scale

    # precedence-ordered rejection reasons (first match wins, main.rs
    # early-return order)
    reason = jnp.where(
        correction_size >= max_correction, outlier_code,
        jnp.where(error_weight <= 0.0, _R["high_error"],
        jnp.where(iteration_weight <= 0.0, _R["slow_convergence"],
        jnp.where(correction_weight <= 0.0, outlier_code,
        jnp.where(motion_weight <= 0.0, _R["low_motion"],
        jnp.where(alpha <= 0.0, _R["rejected"],
        jnp.where(scale >= 0.999, _R["accepted"],
        # attenuation attribution: which weight is the binding min
        jnp.where(scale == motion_weight, _R["attenuated_low_motion"],
        jnp.where(scale == error_weight, _R["attenuated_error"],
        jnp.where(scale == iteration_weight, _R["attenuated_iterations"],
                  attenuated_code))))))))))
    is_reject = (((reason >= _R["not_converged"])
                  & (reason <= _R["low_motion"]))
                 | (reason == _R["rejected"]))
    return jnp.where(is_reject, 0.0, alpha), reason


def compute_icp_blend_decision(odom, icp, converged, iterations,
                               final_error,
                               p: IcpGatingParams = IcpGatingParams()):
    """Per-axis ICP trust decision (main.rs:592). `odom`/`icp` are motion
    deltas [x, y, yaw]. Returns dict(alpha_xy, reason_xy, alpha_yaw,
    reason_yaw) with reason codes into REASONS."""
    corr = icp - odom
    corr = corr.at[2].set(normalize_angle(corr[2]))
    corr_t = jnp.linalg.norm(corr[:2])
    corr_yaw = jnp.abs(corr[2])

    iteration_weight = ramp_weight(
        jnp.asarray(iterations, corr.dtype),
        p.full_weight_iterations, p.reject_iterations)
    trans_motion = ramp_up_weight(jnp.linalg.norm(odom[:2]),
                                  p.full_weight_translation_motion * 0.25,
                                  p.full_weight_translation_motion)
    yaw_motion = ramp_up_weight(jnp.abs(odom[2]),
                                p.full_weight_yaw_motion * 0.25,
                                p.full_weight_yaw_motion)
    yaw_axis_motion = jnp.maximum(trans_motion, yaw_motion)

    corr_t_weight = ramp_weight(corr_t, p.full_weight_translation_correction,
                                p.max_translation_correction)
    corr_yaw_weight = ramp_weight(corr_yaw, p.full_weight_yaw_correction,
                                  p.max_yaw_correction)

    alpha_xy, reason_xy = _axis_decision(
        p.blend_alpha, final_error, p.full_weight_error, p.reject_error,
        iteration_weight, corr_t, p.max_translation_correction,
        corr_t_weight, trans_motion, _R["translation_outlier"],
        _R["attenuated_translation"])
    alpha_yaw, reason_yaw = _axis_decision(
        p.blend_alpha_yaw, final_error, p.full_weight_error_yaw,
        p.reject_error_yaw, iteration_weight, corr_yaw, p.max_yaw_correction,
        corr_yaw_weight, yaw_axis_motion, _R["yaw_outlier"],
        _R["attenuated_yaw"])

    # global rejections override both axes (main.rs:600-:605)
    bad = (~converged) | ~jnp.isfinite(final_error)
    bad_code = jnp.where(~converged, _R["not_converged"],
                         _R["invalid_error"])
    alpha_xy = jnp.where(bad, 0.0, alpha_xy)
    alpha_yaw = jnp.where(bad, 0.0, alpha_yaw)
    reason_xy = jnp.where(bad, bad_code, reason_xy)
    reason_yaw = jnp.where(bad, bad_code, reason_yaw)
    return dict(alpha_xy=alpha_xy, reason_xy=reason_xy,
                alpha_yaw=alpha_yaw, reason_yaw=reason_yaw)


def blend_motion_delta(odom, icp, alpha_xy, alpha_yaw,
                       p: IcpGatingParams = IcpGatingParams()):
    """Blend clamped ICP corrections into odometry (main.rs:741)."""
    mt = p.max_translation_correction
    cx = jnp.clip(icp[0] - odom[0], -mt, mt)
    cy = jnp.clip(icp[1] - odom[1], -mt, mt)
    cyaw = jnp.clip(normalize_angle(icp[2] - odom[2]),
                    -p.max_yaw_correction, p.max_yaw_correction)
    return jnp.stack([
        odom[0] + alpha_xy * cx,
        odom[1] + alpha_xy * cy,
        normalize_angle(odom[2] + alpha_yaw * cyaw),
    ])


def scan_to_points(ranges, angle_min, angle_increment, range_min,
                   range_max):
    """LaserScan → fixed-shape body-frame points [N, 2] + valid mask
    (main.rs:203 drops non-finite / out-of-range returns; here they stay
    as masked slots)."""
    n = ranges.shape[0]
    angles = angle_min + angle_increment * jnp.arange(n, dtype=ranges.dtype)
    valid = jnp.isfinite(ranges) & (ranges > range_min) & (ranges < range_max)
    r = jnp.where(valid, ranges, 0.0)
    pts = jnp.stack([r * jnp.cos(angles), r * jnp.sin(angles)], -1)
    return pts, valid


def subsample_stride(points, valid, stride: int, min_points: int = 4):
    """Keep every stride-th VALID return (main.rs:228); falls back to the
    full set when fewer than `min_points` survive. Mask-only edit."""
    if stride <= 1:
        return valid
    rank = jnp.cumsum(valid) - 1  # index among valid points
    keep = valid & (rank % stride == 0)
    return jnp.where(jnp.sum(keep) < min_points, valid, keep)


def append_and_prune(submap_pts, submap_valid, new_pts, new_valid, anchor,
                     max_radius: float, max_points: int):
    """Submap budget maintenance (main.rs:508): radius-prune around the
    anchor, keep the newest `max_points`. Fixed capacity C = submap
    capacity; new points overwrite the OLDEST slots (ring semantics give
    exactly the reference's newest-first survival)."""
    cap = submap_pts.shape[0]
    both_pts = jnp.concatenate([submap_pts, new_pts], axis=0)
    both_valid = jnp.concatenate([submap_valid, new_valid], axis=0)
    in_radius = (jnp.linalg.norm(both_pts - anchor[None, :2], axis=-1)
                 <= max_radius)
    both_valid = both_valid & in_radius
    # newest-first: later rows win. Order rows by (valid, recency) and take
    # the last `cap` — argsort is stable so ties keep append order.
    order = jnp.argsort(both_valid.astype(jnp.int32), stable=True)
    keep = order[-cap:]
    pts = both_pts[keep]
    valid = both_valid[keep]
    # enforce max_points among the kept-valid (newest survive)
    n_valid = jnp.sum(valid)
    overflow = jnp.maximum(n_valid - max_points, 0)
    rank = jnp.cumsum(valid)  # 1-based among valid, oldest first
    valid = valid & (rank > overflow)
    return pts, valid


@pytree_dataclass
class SlamNodeDiagnostics:
    """Per-scan record mirroring /slam_diagnostics content."""

    alpha_xy: Any
    alpha_yaw: Any
    reason_xy: Any
    reason_yaw: Any
    icp_error: Any
    icp_iterations: Any
    submap_points: Any
    pose_error: Any
    odom_error: Any


def _se2_apply(pose, pts):
    c, s = jnp.cos(pose[2]), jnp.sin(pose[2])
    rot = jnp.array([[c, -s], [s, c]])
    return pts @ rot.T + pose[:2][None, :]


def _se2_delta(a, b):
    """Body-frame motion delta a→b (main.rs MotionDelta in odom frame)."""
    c, s = jnp.cos(a[2]), jnp.sin(a[2])
    d = b[:2] - a[:2]
    return jnp.stack([c * d[0] + s * d[1], -s * d[0] + c * d[1],
                      normalize_angle(b[2] - a[2])])


def _se2_compose(pose, delta):
    c, s = jnp.cos(pose[2]), jnp.sin(pose[2])
    return jnp.stack([
        pose[0] + c * delta[0] - s * delta[1],
        pose[1] + s * delta[0] + c * delta[1],
        normalize_angle(pose[2] + delta[2]),
    ])


def run_slam_node_loop(steps: int = 60, stride: int = 2,
                       odom_drift: float = 0.004,
                       odom_noise: float = 0.002,
                       submap_capacity: int = 1024,
                       submap_max_points: int = 800,
                       submap_radius: float = 6.0,
                       bootstrap_scans: int = 3,
                       seed: int = 0,
                       gating: IcpGatingParams = IcpGatingParams(
                           # sensor-dependent gate thresholds (env-tuned in
                           # the reference, main.rs:245-:380 ICP_*): scaled
                           # to this sim's wall-sampling NN residual
                           full_weight_error=0.02, reject_error=0.06,
                           full_weight_error_yaw=0.02,
                           reject_error_yaw=0.06,
                           full_weight_iterations=31.0,
                           reject_iterations=60.0)):
    """Headless slam_node loop (the ros2-smoke capability, SURVEY §2.10):
    a unicycle drives a loop in a square room; each step synthesizes a
    range scan of the wall points, odometry accumulates drift+noise,
    scan-to-scan ICP proposes a correction, the quality gate blends it,
    and the submap ring accumulates world-frame points. Returns a dict of
    stacked SlamNodeDiagnostics plus final poses."""
    rng = np.random.default_rng(seed)
    f = jnp.result_type(float)

    # square room wall points + interior pillars (pillars pin rotation —
    # pure walls let NN correspondences slide tangentially)
    side = jnp.linspace(-5.0, 5.0, 320)
    ang = jnp.linspace(0.0, 2 * jnp.pi, 48, endpoint=False)
    ring = jnp.stack([jnp.cos(ang), jnp.sin(ang)], -1)
    pillars = jnp.concatenate([
        jnp.array([[2.5, 1.5]]) + 0.4 * ring,
        jnp.array([[-2.0, 2.5]]) + 0.3 * ring,
        jnp.array([[-1.0, -3.0]]) + 0.5 * ring,
    ])
    walls = jnp.concatenate([
        jnp.stack([side, jnp.full_like(side, -5.0)], -1),
        jnp.stack([side, jnp.full_like(side, 5.0)], -1),
        jnp.stack([jnp.full_like(side, -5.0), side], -1),
        jnp.stack([jnp.full_like(side, 5.0), side], -1),
        pillars,
    ]).astype(f)

    def observe(pose):
        """Body-frame view of all wall points (virtual dense scan)."""
        c, s = jnp.cos(pose[2]), jnp.sin(pose[2])
        rot = jnp.array([[c, s], [-s, c]], f)
        return (walls - pose[:2][None, :]) @ rot.T

    dt = 0.1
    v, w = 1.2, 0.35  # drive a circle inside the room
    truth = jnp.zeros(3, f)
    raw_odom = jnp.zeros(3, f)
    corrected = jnp.zeros(3, f)
    prev_scan = observe(truth)
    prev_raw = raw_odom

    sub_pts = jnp.zeros((submap_capacity, 2), f)
    sub_valid = jnp.zeros((submap_capacity,), bool)

    icp_iters = 30
    icp_jit = jax.jit(lambda a, b: point_to_line_icp(a, b,
                                                     iterations=icp_iters))
    diags = []
    for k in range(steps):
        # truth advances; odometry integrates the same motion plus drift
        delta_true = jnp.array([v * dt, 0.0, w * dt], f)
        truth = _se2_compose(truth, delta_true)
        noise = jnp.asarray(rng.normal(0.0, odom_noise, 3), f)
        drift = jnp.array([odom_drift, 0.0, odom_drift * 0.5], f)
        raw_odom = _se2_compose(raw_odom, delta_true + drift + noise)

        scan = observe(truth)
        n = scan.shape[0]
        keep = subsample_stride(jnp.ones((n,), bool),
                                jnp.ones((n,), bool), stride)
        # ICP aligns previous scan to current (scan-to-scan odometry);
        # point-to-line kills the tangential-sliding bias flat walls
        # induce in point-to-point NN correspondences
        icp_delta, icp_err = icp_jit(prev_scan[keep], scan[keep])
        odom_delta = _se2_delta(prev_raw, raw_odom)

        dec = compute_icp_blend_decision(
            odom_delta, icp_delta, jnp.isfinite(icp_err),
            jnp.asarray(icp_iters), icp_err, gating)
        blended = blend_motion_delta(odom_delta, icp_delta,
                                     dec["alpha_xy"], dec["alpha_yaw"],
                                     gating)
        corrected = _se2_compose(corrected, blended)

        # submap maintenance in the corrected world frame
        world_pts = _se2_apply(corrected, scan[keep][:submap_capacity])
        new_valid = jnp.ones((world_pts.shape[0],), bool)
        if k >= bootstrap_scans:
            sub_pts, sub_valid = append_and_prune(
                sub_pts, sub_valid, world_pts, new_valid, corrected,
                submap_radius, submap_max_points)
        else:
            sub_pts, sub_valid = append_and_prune(
                sub_pts, sub_valid, world_pts, new_valid, corrected,
                1e9, submap_max_points)

        diags.append(SlamNodeDiagnostics(
            alpha_xy=dec["alpha_xy"], alpha_yaw=dec["alpha_yaw"],
            reason_xy=dec["reason_xy"], reason_yaw=dec["reason_yaw"],
            icp_error=icp_err, icp_iterations=jnp.asarray(icp_iters),
            submap_points=jnp.sum(sub_valid),
            pose_error=jnp.linalg.norm(corrected[:2] - truth[:2]),
            odom_error=jnp.linalg.norm(raw_odom[:2] - truth[:2]),
        ))
        prev_scan = scan
        prev_raw = raw_odom

    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *diags)
    return dict(diagnostics=stacked, truth=truth, raw_odom=raw_odom,
                corrected=corrected,
                submap=(sub_pts, sub_valid))
