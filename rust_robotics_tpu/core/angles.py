"""Angle utilities (reference: rust_robotics_core/src/types.rs Pose2D::normalize_yaw)."""

import jax.numpy as jnp


def normalize_angle(theta):
    """Wrap an angle (array) to (-pi, pi].

    Matches the reference's `Pose2D::normalize_yaw`
    (crates/rust_robotics_core/src/types.rs:90) semantics: result lies in
    (-pi, pi]. Pure, branchless, vmappable.
    """
    two_pi = 2.0 * jnp.pi
    wrapped = theta - two_pi * jnp.floor((theta + jnp.pi) / two_pi)
    # floor-based wrap yields [-pi, pi); map -pi -> pi to get (-pi, pi]
    return jnp.where(wrapped <= -jnp.pi, wrapped + two_pi, wrapped)


def angle_diff(a, b):
    """Smallest signed difference a - b, wrapped to (-pi, pi]."""
    return normalize_angle(a - b)
