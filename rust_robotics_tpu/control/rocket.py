"""Rocket landing by successive convexification (SCvx).

Reference: crates/rust_robotics_control/src/rocket_landing.rs (596 LoC):
plan a fuel-optimal powered descent by repeatedly linearizing the rocket
dynamics around the current trajectory and solving the resulting convex
subproblem with trust regions, until the linearization converges.

TPU-native: the convex subproblem (quadratic objective, linear dynamics,
thrust bounds) is solved by projected gradient on the control sequence with
the dynamics eliminated by a differentiable linear rollout — the same AD
inner-solver family as control/mpc.py. All Jacobians come from jax.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class RocketConfig:
    horizon: int = 40
    dt: float = 0.25
    gravity: float = 9.81
    mass: float = 10.0
    max_thrust: float = 250.0
    min_thrust: float = 0.0
    fuel_weight: float = 0.002
    terminal_weight: float = 200.0
    outer_iterations: int = 5
    inner_iterations: int = 150
    lr: float = 0.02


def rocket_dynamics(state, thrust, cfg: RocketConfig):
    """state [x, y, vx, vy]; thrust [2] (world-frame force)."""
    ax = thrust[..., 0] / cfg.mass
    ay = thrust[..., 1] / cfg.mass - cfg.gravity
    return jnp.stack(
        [
            state[..., 0] + state[..., 2] * cfg.dt,
            state[..., 1] + state[..., 3] * cfg.dt,
            state[..., 2] + ax * cfg.dt,
            state[..., 3] + ay * cfg.dt,
        ],
        axis=-1,
    )


def plan_landing(x0, target_xy, cfg: RocketConfig = RocketConfig()):
    """Returns (states [H+1, 4], thrusts [H, 2], final cost): soft landing
    at target with near-zero velocity, fuel-weighted."""
    tmax = cfg.max_thrust

    def rollout(us):
        def step(x, u):
            xn = rocket_dynamics(x, u, cfg)
            return xn, xn

        _, xs = jax.lax.scan(step, x0, us)
        return jnp.concatenate([x0[None], xs])

    def objective(us):
        xs = rollout(us)
        fuel = cfg.fuel_weight * jnp.sum(jnp.linalg.norm(us, axis=-1))
        terminal = cfg.terminal_weight * (
            jnp.sum((xs[-1, :2] - target_xy) ** 2) + jnp.sum(xs[-1, 2:] ** 2)
        )
        # keep altitude non-negative along the way (soft)
        ground = 50.0 * jnp.sum(jnp.clip(-xs[:, 1], 0.0, None) ** 2)
        return fuel + terminal + ground

    grad = jax.grad(objective)

    def project(us):
        mag = jnp.linalg.norm(us, axis=-1, keepdims=True)
        scale = jnp.clip(mag, cfg.min_thrust, tmax) / jnp.clip(mag, 1e-9, None)
        return us * scale

    def inner(us):
        def body(k, uu):
            return project(uu - cfg.lr / jnp.sqrt(1.0 + k) * grad(uu))

        return jax.lax.fori_loop(0, cfg.inner_iterations, body, us)

    # successive refinement: re-run PGD from the projected solution (the
    # dynamics here are control-affine, so the "convexification" converges
    # after the first pass; the loop mirrors the reference's SCvx structure
    # and matters when drag/mass-depletion terms are added)
    us = jnp.zeros((cfg.horizon, 2), x0.dtype).at[:, 1].set(
        cfg.mass * cfg.gravity
    )
    for _ in range(cfg.outer_iterations):
        us = inner(us)
    xs = rollout(us)
    return xs, us, objective(us)
