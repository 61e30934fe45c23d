"""CHOMP: covariant gradient trajectory optimization.

Reference: crates/rust_robotics_planning/src/chomp.rs — fixed-count
waypoint trajectory initialized as a straight line with a tiny sine bump
(:143), iterated gradient descent with per-iteration backtracking line
search (8 halvings, accept on nonincrease :90-:110), smoothness gradient
−2·(x_{i−1} − 2x_i + x_{i+1})/dt² (:155), obstacle gradient
−(influence − signed_distance)·direction within the influence band (:160),
cost = Σ‖second-diff‖²/dt² + Σ½·penetration² (:175-:195); endpoints pinned.

TPU-native shape: the whole waypoint trajectory updates as one [N, 2]
tensor per iteration (second differences are a conv, the obstacle band is a
[N, M] distance matrix); iterations are a `lax.while_loop` with the line
search as an inner `lax.fori_loop` over precomputed halved steps. Fully
differentiable w.r.t. obstacles and endpoints.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

__all__ = ["ChompConfig", "chomp_optimize"]

INFLUENCE_DISTANCE = 2.0
ROBOT_RADIUS = 0.8


@dataclasses.dataclass(frozen=True)
class ChompConfig:
    """chomp.rs ChompConfig defaults."""

    n_waypoints: int = 50
    dt: float = 0.1
    max_iterations: int = 100
    learning_rate: float = 0.01
    obstacle_cost_weight: float = 1.0
    smoothness_weight: float = 1.0
    line_search_halvings: int = 8


def _second_diff(x):
    """x_{i−1} − 2x_i + x_{i+1} for interior waypoints; zeros at ends."""
    d = x[:-2] - 2.0 * x[1:-1] + x[2:]
    z = jnp.zeros((1, x.shape[-1]), x.dtype)
    return jnp.concatenate([z, d, z], axis=0)


@functools.partial(jax.jit, static_argnames=("cfg",))
def chomp_optimize(start, goal, obstacles, radii,
                   cfg: ChompConfig = ChompConfig()):
    """Returns (waypoints [N, 2], cost, iterations) — ChompResult."""
    f = jnp.result_type(float)
    start = jnp.asarray(start, f)
    goal = jnp.asarray(goal, f)
    obstacles = jnp.asarray(obstacles, f)
    radii = jnp.asarray(radii, f)
    n = cfg.n_waypoints
    t = jnp.linspace(0.0, 1.0, n)[:, None]
    x0 = start[None] + t * (goal - start)[None]
    # tiny sine bump off the straight line (chomp.rs:143)
    x0 = x0.at[:, 1].add(1e-3 * jnp.sin(jnp.pi * t[:, 0]))
    dt2 = cfg.dt * cfg.dt

    def cost(x):
        sd = x[:-2] - 2.0 * x[1:-1] + x[2:]
        smooth = jnp.sum(sd * sd) / dt2
        d = jnp.linalg.norm(x[:, None, :] - obstacles[None], axis=-1)
        signed = d - (radii[None, :] + ROBOT_RADIUS)
        pen = jnp.where(signed < INFLUENCE_DISTANCE,
                        INFLUENCE_DISTANCE - signed, 0.0)
        return (cfg.smoothness_weight * smooth
                + cfg.obstacle_cost_weight * jnp.sum(0.5 * pen * pen))

    def gradient(x):
        smooth_g = -2.0 * _second_diff(x) / dt2
        delta = x[:, None, :] - obstacles[None]  # [N, M, 2]
        norm = jnp.clip(jnp.linalg.norm(delta, axis=-1), 1e-9, None)
        signed = norm - (radii[None, :] + ROBOT_RADIUS)
        inband = signed < INFLUENCE_DISTANCE
        direction = delta / norm[..., None]
        obs_g = -jnp.sum(
            jnp.where(inband[..., None],
                      (INFLUENCE_DISTANCE - signed)[..., None] * direction,
                      0.0),
            axis=1,
        )
        g = cfg.smoothness_weight * smooth_g + cfg.obstacle_cost_weight * obs_g
        # endpoints pinned
        return g.at[0].set(0.0).at[-1].set(0.0)

    def body(carry):
        x, c, it, _ = carry
        g = gradient(x)

        def try_step(k, acc):
            accepted, bx, bc = acc
            step = cfg.learning_rate * (0.5 ** k)
            nx = x - step * g
            nc = cost(nx)
            take = (~accepted) & (nc <= c)
            return (accepted | take,
                    jnp.where(take, nx, bx),
                    jnp.where(take, nc, bc))

        accepted, nx, nc = jax.lax.fori_loop(
            0, cfg.line_search_halvings, try_step,
            (jnp.asarray(False), x, c),
        )
        converged = (~accepted) | (jnp.abs(c - nc) < 1e-9)
        return nx, nc, it + 1, converged

    def cond(carry):
        _, _, it, converged = carry
        return (~converged) & (it < cfg.max_iterations)

    x, c, it, _ = jax.lax.while_loop(
        cond, body, (x0, cost(x0), 0, jnp.asarray(False))
    )
    return x, c, it
