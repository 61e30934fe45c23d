"""Conformal-prediction SIPP (CP-SIPP): confidence-filtered time-expanded
planning around predicted obstacle trajectories.

Reference: crates/rust_robotics_planning/src/conformal_sipp.rs (Liang et
al., "Time-aware Motion Planning in Dynamic Environments with Conformal
Prediction", L4DC 2026 reproduction slice) — calibration nonconformity
scores per horizon: ‖predicted − observed‖ over episodes
(`calibration_errors_from_trajectories` :66); cell confidence at (x, y, t)
= empirical coverage fraction of scores ≤ (distance to the nearest
predicted obstacle − obstacle_radius), 0 inside the footprint, 1 when no
prediction covers t (:355-:384); conformal radius = empirical quantile at
rank ⌈confidence·n⌉ plus the footprint radius (:386-:392); a cell is
traversable at t when confidence ≥ required_confidence; plan reports
min_confidence over waypoints and the Boole-union violation bound
Σ(1 − c_t) capped at 1 (:130-:140).

TPU-native shape: the reference builds per-cell safe-interval lists; here
the confidence field is one [T+1, W, H] tensor (distances to all predicted
obstacles batch over the grid; calibration coverage is a broadcast
compare+mean over scores) and the search is the time-expanded wavefront of
`planning/temporal.py` over the thresholded mask.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from rust_robotics_tpu.planning.temporal import (
    earliest_arrival,
    extract_time_path,
    time_expanded_costs,
)

__all__ = [
    "calibration_errors_from_trajectories",
    "empirical_quantile",
    "conformal_radius_at",
    "confidence_field",
    "conformal_sipp_plan",
]


def calibration_errors_from_trajectories(predictions, observations):
    """[E, T+1, 2] × [E, T+1, 2] → scores [T+1, E]: per-horizon Euclidean
    nonconformity (conformal_sipp.rs:66)."""
    predictions = jnp.asarray(predictions, float)
    observations = jnp.asarray(observations, float)
    err = jnp.linalg.norm(predictions - observations, axis=-1)  # [E, T+1]
    return err.T


def empirical_quantile(scores, confidence):
    """Rank-⌈confidence·n⌉ order statistic (conformal_sipp.rs:386)."""
    scores = jnp.sort(jnp.asarray(scores, float))
    n = scores.shape[-1]
    rank = jnp.ceil(confidence * n).astype(jnp.int32)
    idx = jnp.clip(rank - 1, 0, n - 1)
    return scores[..., idx]


def conformal_radius_at(calibration_errors, t, required_confidence,
                        obstacle_radius=0.0):
    """Quantile radius + footprint at horizon t (conformal_radius_at)."""
    return empirical_quantile(calibration_errors[t], required_confidence) \
        + obstacle_radius


@functools.partial(jax.jit, static_argnames=("width", "height"))
def confidence_field(predicted, predicted_mask, calibration_errors,
                     obstacle_radius, width: int, height: int):
    """Empirical confidence [T+1, W, H] (confidence_from_inputs):

    predicted [O, T+1, 2] obstacle centers (+ validity mask [O, T+1]);
    calibration_errors [T+1, E]. confidence = mean(score ≤ min-distance −
    radius); 0 when inside the footprint; 1 when no obstacle covers t."""
    f = jnp.result_type(float)
    gx = jax.lax.broadcasted_iota(jnp.int32, (width, height), 0).astype(f)
    gy = jax.lax.broadcasted_iota(jnp.int32, (width, height), 1).astype(f)
    pred = jnp.asarray(predicted, f)  # [O, T+1, 2]
    d = jnp.sqrt(
        (gx[None, None] - pred[:, :, 0, None, None]) ** 2
        + (gy[None, None] - pred[:, :, 1, None, None]) ** 2
    )  # [O, T+1, W, H]
    d = jnp.where(predicted_mask[:, :, None, None], d, jnp.inf)
    min_d = jnp.min(d, axis=0)  # [T+1, W, H]
    margin = min_d - obstacle_radius
    scores = jnp.asarray(calibration_errors, f)  # [T+1, E]
    covered = jnp.mean(
        scores[:, :, None, None] <= margin[:, None, :, :], axis=1
    )
    conf = jnp.where(margin < 0.0, 0.0, covered)
    return jnp.where(jnp.isinf(min_d), 1.0, conf)


def conformal_sipp_plan(static_blocked, predicted, calibration_errors,
                        start, goal, required_confidence: float = 0.9,
                        obstacle_radius: float = 0.5,
                        predicted_mask=None):
    """CP-SIPP plan (ConformalSippPlanner::plan): threshold the confidence
    field at required_confidence, run the time-expanded wavefront, report
    (path [T+1, 2], arrival, min_confidence, trajectory_violation_bound).
    Returns None when no confident path exists within the horizon."""
    static_blocked = jnp.asarray(static_blocked, bool)
    w, h = static_blocked.shape
    pred = jnp.asarray(predicted, float)
    t_len = pred.shape[1]
    if predicted_mask is None:
        predicted_mask = jnp.ones(pred.shape[:2], bool)
    conf = confidence_field(pred, predicted_mask, calibration_errors,
                            obstacle_radius, w, h)
    free_t = (~static_blocked)[None] & (conf >= required_confidence)
    costs = time_expanded_costs(free_t, jnp.asarray(start))
    t_arr, cost = earliest_arrival(costs, jnp.asarray(goal))
    if int(t_arr) < 0:
        return None
    path = extract_time_path(costs, goal, int(t_arr))
    conf_np = np.asarray(conf)
    waypoint_conf = np.array([
        conf_np[t, path[t, 0], path[t, 1]] for t in range(len(path))
    ])
    return {
        "path": path,
        "arrival": int(t_arr),
        "cost": float(cost),
        "min_confidence": float(waypoint_conf.min()),
        "trajectory_violation_bound": float(
            min(np.sum(1.0 - waypoint_conf), 1.0)
        ),
        "confidence_field": conf,
    }
