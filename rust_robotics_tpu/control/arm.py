"""Arm control: planar n-joint kinematics, resolved-rate IK, obstacle-aware
joint-space navigation.

Reference (crates/rust_robotics_control/src/): two_joint_arm_control.rs
(362: analytic 2-link IK + tracking), n_joint_arm_control.rs (405: Jacobian
resolved-rate IK), n_joint_arm_3d.rs (266), arm_obstacle_navigation.rs
(569: joint-space planning around circle obstacles),
rrt_star_seven_joint_arm.rs (468).

TPU-native: FK is a cumulative-angle scan; the Jacobian comes from
jax.jacobian of FK (the reference hand-derives it); IK iterations and
joint-space wavefronts batch over configurations.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from rust_robotics_tpu.core.angles import normalize_angle


def forward_kinematics(angles, lengths):
    """Planar chain FK: joint positions [N+1, 2] (n_joint_arm_control.rs)."""
    cum = jnp.cumsum(angles)
    dx = lengths * jnp.cos(cum)
    dy = lengths * jnp.sin(cum)
    pts = jnp.cumsum(jnp.stack([dx, dy], axis=-1), axis=0)
    return jnp.concatenate([jnp.zeros((1, 2), pts.dtype), pts], axis=0)


def end_effector(angles, lengths):
    return forward_kinematics(angles, lengths)[-1]


def two_joint_ik(target, l1, l2, elbow_up=True):
    """Analytic 2-link IK (two_joint_arm_control.rs)."""
    x, y = target[0], target[1]
    d2 = x * x + y * y
    c2 = jnp.clip((d2 - l1 * l1 - l2 * l2) / (2 * l1 * l2), -1.0, 1.0)
    s2 = jnp.sqrt(jnp.clip(1.0 - c2 * c2, 0.0, None))
    s2 = jnp.where(elbow_up, s2, -s2)
    th2 = jnp.arctan2(s2, c2)
    th1 = jnp.arctan2(y, x) - jnp.arctan2(l2 * s2, l1 + l2 * c2)
    return jnp.stack([normalize_angle(th1), normalize_angle(th2)])


def resolved_rate_ik(angles0, target, lengths, iterations: int = 200,
                     gain: float = 0.5, damping: float = 1e-3):
    """Damped-least-squares resolved-rate IK (n_joint_arm_control.rs):
    θ ← θ + Jᵀ(JJᵀ + λI)⁻¹ (gain·e). Jacobian via autodiff."""
    jac_fn = jax.jacobian(lambda a: end_effector(a, lengths))

    def body(_, a):
        e = target - end_effector(a, lengths)
        j = jac_fn(a)  # [2, N]
        jjt = j @ j.T + damping * jnp.eye(2, dtype=a.dtype)
        return a + j.T @ jnp.linalg.solve(jjt, gain * e)

    return jax.lax.fori_loop(0, iterations, body, angles0)


def arm_collides(angles, lengths, obstacles, radii, samples: int = 8):
    """Any link segment intersects any circle obstacle
    (arm_obstacle_navigation.rs collision check)."""
    pts = forward_kinematics(angles, lengths)
    t = jnp.linspace(0.0, 1.0, samples)
    seg = pts[:-1][:, None, :] + t[None, :, None] * (
        pts[1:] - pts[:-1]
    )[:, None, :]  # [N, S, 2]
    d = jnp.linalg.norm(
        seg[:, :, None, :] - obstacles[None, None, :, :], axis=-1
    )
    return jnp.any(d <= radii)


def joint_space_plan(start_angles, goal_angles, lengths, obstacles, radii,
                     steps: int = 100):
    """Straight-line joint-space interpolation with collision mask — the
    validity profile feeds higher-level planners (RRT over configurations).
    Returns (configs [steps, N], collision_free [steps])."""
    t = jnp.linspace(0.0, 1.0, steps)[:, None]
    configs = start_angles[None, :] + t * normalize_angle(
        goal_angles - start_angles
    )[None, :]
    free = ~jax.vmap(lambda a: arm_collides(a, lengths, obstacles, radii))(configs)
    return configs, free
