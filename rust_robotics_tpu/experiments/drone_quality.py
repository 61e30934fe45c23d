"""Drone trajectory quality experiment suite.

Reference: crates/rust_robotics_control/src/experiments/
drone_trajectory_quality/ — trajectory-generator variants (quintic
segments vs minimum-snap) flown by the PD quadrotor through seeded
waypoint scenarios; per-cell quality metrics (tracking RMSE, max error,
smoothness/jerk integral, completion) aggregated by the shared harness and
annotated against the reference variant.

TPU-native shape: segment coefficient solves batch per axis, and the
closed-loop PD flight is the `lax.scan` of control/aerial.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from rust_robotics_tpu.control.aerial import (
    minimum_snap_coeffs,
    quintic_3d_segments,
    simulate_quadrotor,
    eval_poly8,
)
from rust_robotics_tpu.utils.experiments import (
    ExperimentSamplingPlan,
    VariantDescriptor,
    annotate_against_reference,
    run_experiment,
)

__all__ = ["run_drone_trajectory_quality", "GENERATORS"]

GENERATORS = (
    VariantDescriptor("quintic", "per-segment quintic (5th order)"),
    VariantDescriptor("min_snap", "7th-order minimum snap"),
)


def _waypoints(key, n=5, scale=4.0):
    w = jax.random.uniform(key, (n, 3), minval=-1.0, maxval=1.0) * scale
    return w.at[:, 2].set(jnp.abs(w[:, 2]) + 1.0)


def _fly_quintic(waypoints, segment_time=2.0, dt=0.02):
    coeffs = quintic_3d_segments(waypoints, segment_time)
    pos, refs = simulate_quadrotor(coeffs, segment_time, dt)
    return pos, refs


def _fly_min_snap(waypoints, segment_time=2.0, dt=0.02):
    n_seg = waypoints.shape[0] - 1
    times = jnp.full((n_seg,), segment_time)
    axes = [minimum_snap_coeffs(waypoints[:, d], times) for d in range(3)]
    steps = int(n_seg * segment_time / dt)

    def ref_at(t):
        si = jnp.minimum((t / segment_time).astype(jnp.int32), n_seg - 1)
        tl = t - si * segment_time
        p = jnp.stack([eval_poly8(a[si], tl, 0) for a in axes])
        v = jnp.stack([eval_poly8(a[si], tl, 1) for a in axes])
        acc = jnp.stack([eval_poly8(a[si], tl, 2) for a in axes])
        return p, v, acc

    from rust_robotics_tpu.control.aerial import QuadPDConfig, quad_pd_accel

    cfg = QuadPDConfig()

    def step(carry, k):
        pos, vel = carry
        p_ref, v_ref, a_ref = ref_at(k * dt)
        acc = quad_pd_accel(pos, vel, p_ref, v_ref, a_ref, cfg) - jnp.array(
            [0.0, 0.0, cfg.gravity])
        vel = vel + acc * dt
        pos = pos + vel * dt
        return (pos, vel), (pos, p_ref)

    p0, _, _ = ref_at(jnp.asarray(0.0))
    (_, _), (ps, refs) = jax.lax.scan(
        step, (p0, jnp.zeros(3)),
        jnp.arange(steps, dtype=jnp.result_type(float)),
    )
    return ps, refs


def _metrics(pos, refs, dt=0.02):
    e = jnp.linalg.norm(pos - refs, axis=-1)
    jerk = jnp.diff(refs, n=3, axis=0) / dt ** 3
    return {
        "tracking_rmse": float(jnp.sqrt(jnp.mean(e ** 2))),
        "max_error": float(jnp.max(e)),
        "ref_jerk_integral": float(jnp.mean(jnp.sum(jerk ** 2, -1))),
        "endpoint_error": float(jnp.linalg.norm(pos[-1] - refs[-1])),
    }


def run_drone_trajectory_quality(seeds=(0, 1, 2), reference="quintic"):
    """Suite: generators × seeded waypoint scenarios. Returns reports with
    deltas vs the reference variant."""

    def run_fn(variant, seed, scenario):
        key = jax.random.PRNGKey(seed)
        wps = _waypoints(key)
        if variant.name == "quintic":
            pos, refs = _fly_quintic(wps)
        else:
            pos, refs = _fly_min_snap(wps)
        return _metrics(pos, refs)

    plan = ExperimentSamplingPlan(seeds=tuple(seeds))
    reducers = {
        "mean_tracking_rmse": lambda obs: float(np.mean(
            [o["tracking_rmse"] for o in obs])),
        "mean_jerk": lambda obs: float(np.mean(
            [o["ref_jerk_integral"] for o in obs])),
        "worst_endpoint_error": lambda obs: float(np.max(
            [o["endpoint_error"] for o in obs])),
    }
    reports = run_experiment(GENERATORS, plan, run_fn, reducers)
    return annotate_against_reference(reports, reference)
