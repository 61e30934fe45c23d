"""MPPI variants: person following + racing.

Reference: crates/rust_robotics_control/src/ — person_following_mppi.rs
(692 LoC: track a moving target at a standoff distance),
racing_mppi_3d.rs / racing_mppi_quadrotor.rs / racing_mppi_motor.rs /
racing_mppi_powertrain.rs (787-1,122 LoC: track-progress rewards, boundary
penalties, actuator/battery budgets).

All variants are cost/dynamics configs of the shared MPPI engine
(control/mppi.py) — the TPU-native factoring of the reference's five
near-duplicate samplers.
"""

from __future__ import annotations

import jax.numpy as jnp

from rust_robotics_tpu.control.mppi import (  # noqa: F401 (re-export)
    MPPIConfig,
    double_integrator_dynamics,
    mppi_plan,
    shift_nominal,
)


def make_person_following_costs(target_traj, standoff=1.5,
                                control_weight=0.05, speed_weight=0.1):
    """Follow a moving target at a standoff distance
    (person_following_mppi.rs): stage cost penalizes deviation from the
    standoff ring around the target's predicted path; `target_traj`
    [H, 2] is the predicted person path over the horizon."""

    def stage(x, u):
        d = jnp.linalg.norm(
            x[..., None, :2] - target_traj[None, :, :], axis=-1
        )
        ring_err = (jnp.min(d, axis=-1) - standoff) ** 2
        return (
            ring_err
            + control_weight * jnp.sum(u**2, axis=-1)
            + speed_weight * jnp.sum(x[..., 2:4] ** 2, axis=-1)
        )

    def terminal(x):
        d = jnp.linalg.norm(
            x[..., None, :2] - target_traj[None, -1:, :], axis=-1
        )[..., 0]
        return 5.0 * (d - standoff) ** 2

    return stage, terminal


def make_racing_costs(centerline, half_width=1.0, progress_weight=2.0,
                      boundary_weight=200.0, control_weight=0.01):
    """Track racing costs (racing_mppi_*.rs): reward arc-length progress
    along the centerline [M, 2], hard-penalize leaving the track corridor.
    Progress = index of the nearest centerline sample (monotone along the
    lap)."""
    m = centerline.shape[0]
    idxs = jnp.arange(m, dtype=centerline.dtype)

    def nearest(x):
        d = jnp.linalg.norm(x[..., None, :2] - centerline[None, :, :], axis=-1)
        return jnp.argmin(d, axis=-1), jnp.min(d, axis=-1)

    def stage(x, u):
        i, dist = nearest(x)
        off = jnp.clip(dist - half_width, 0.0, None)
        return (
            -progress_weight * idxs[i] / m
            + boundary_weight * off**2
            + control_weight * jnp.sum(u**2, axis=-1)
        )

    def terminal(x):
        i, dist = nearest(x)
        return -10.0 * progress_weight * idxs[i] / m + boundary_weight * jnp.clip(
            dist - half_width, 0.0, None
        ) ** 2

    return stage, terminal


def lap_progress(xs, centerline):
    """Diagnostics: fraction of centerline indices passed (racing report
    fields in control/src/lib.rs:117-160)."""
    d = jnp.linalg.norm(
        xs[:, None, :2] - centerline[None, :, :], axis=-1
    )
    return jnp.max(jnp.argmin(d, axis=-1)) / centerline.shape[0]
