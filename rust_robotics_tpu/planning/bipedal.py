"""Bipedal walking planner: LIPM footstep modification.

Reference: crates/rust_robotics_planning/src/bipedal_planner.rs — the
PythonRobotics bipedal demo: for each designated footstep, integrate the
linear inverted pendulum about the current modified foot placement
(ẍ = g/z_c (x − p*), Euler at dt = t_sup/time_split :194-219), accumulate
the reference placements px/py with alternating lateral sign and per-step
rotation (:151-160), compute the end-of-phase targets
x_d = p + x̄, ẋ_d from the analytic LIPM transition (c = cosh(T/Tc),
s = sinh(T/Tc)), and choose the modified placement
p* = −a(c−1)/D·(x_d − c·x − Tc·s·ẋ) − b·s/(Tc·D)·(ẋ_d − s/Tc·x − c·ẋ),
D = a(c−1)² + b(s/Tc)² (:170-186).

TPU-native shape: the per-step LIPM integration is a `lax.scan` over
time_split Euler steps; the footstep loop is a `lax.scan` over the
designated steps (the whole plan compiles to one program; batches of gaits
vmap on a leading axis). Footsteps are [N, 3] (dx, dy, dtheta)
body-relative commands, exactly the reference's input contract.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

__all__ = ["BipedalConfig", "bipedal_plan"]


@dataclasses.dataclass(frozen=True)
class BipedalConfig:
    """BipedalPlannerConfig (bipedal_planner.rs defaults)."""

    t_sup: float = 0.8
    z_c: float = 0.8
    a: float = 10.0
    b: float = 1.0
    time_split: int = 100
    trajectory_stride: int = 1
    gravity: float = 9.8


def _rotate(theta, x, y):
    c, s = jnp.cos(theta), jnp.sin(theta)
    return c * x - s * y, s * x + c * y


@functools.partial(jax.jit, static_argnames=("cfg",))
def bipedal_plan(footsteps, cfg: BipedalConfig = BipedalConfig()):
    """Returns dict(reference_footsteps [N+1, 3], modified_footsteps
    [N+1, 3], com_trajectory [N·time_split/stride, 2]) — BipedalPlan.

    footsteps: [N, 3] designated (x, y, theta) body-relative steps."""
    f = jnp.result_type(float)
    steps = jnp.asarray(footsteps, f)
    n = steps.shape[0]
    dt = cfg.t_sup / cfg.time_split
    tc = jnp.sqrt(cfg.z_c / cfg.gravity)
    c = jnp.cosh(cfg.t_sup / tc)
    s = jnp.sinh(cfg.t_sup / tc)
    dd = cfg.a * (c - 1.0) ** 2 + cfg.b * (s / tc) ** 2

    def integrate(state, p_star):
        def euler(st, _):
            x, xd, y, yd = st
            xdd = cfg.gravity / cfg.z_c * (x - p_star[0])
            ydd = cfg.gravity / cfg.z_c * (y - p_star[1])
            x = x + xd * dt
            xd = xd + xdd * dt
            y = y + yd * dt
            yd = yd + ydd * dt
            return (x, xd, y, yd), jnp.stack([x, y])

        state, com = jax.lax.scan(euler, state, None, length=cfg.time_split)
        return state, com[:: cfg.trajectory_stride]

    # next designated step (zero pad at the end, bipedal_planner.rs:160)
    next_steps = jnp.concatenate([steps[1:], jnp.zeros((1, 3), f)])
    signs = jnp.where(jnp.arange(1, n + 1) % 2 == 0, 1.0, -1.0)

    def body(carry, xs):
        state, px, py, p_star = carry
        cur, nxt, sign = xs
        state, com = integrate(state, p_star)
        dx, dy = _rotate(cur[2], cur[0], -sign * cur[1])
        px, py = px + dx, py + dy
        x_ref, y_ref = _rotate(nxt[2], nxt[0] / 2.0, sign * nxt[1] / 2.0)
        vx_ref, vy_ref = _rotate(
            nxt[2], (1.0 + c) / (tc * s) * x_ref, (c - 1.0) / (tc * s) * y_ref
        )
        xd_t, yd_t = px + x_ref, py + y_ref
        x, xdot, y, ydot = state
        px_star = (-cfg.a * (c - 1.0) / dd * (xd_t - c * x - tc * s * xdot)
                   - cfg.b * s / (tc * dd) * (vx_ref - s / tc * x - c * xdot))
        py_star = (-cfg.a * (c - 1.0) / dd * (yd_t - c * y - tc * s * ydot)
                   - cfg.b * s / (tc * dd) * (vy_ref - s / tc * y - c * ydot))
        ref = jnp.stack([px, py, cur[2]])
        mod = jnp.stack([px_star, py_star, cur[2]])
        return (state, px, py, jnp.stack([px_star, py_star])), (ref, mod, com)

    state0 = (jnp.asarray(0.0, f), jnp.asarray(0.0, f),
              jnp.asarray(0.01, f), jnp.asarray(0.0, f))
    carry0 = (state0, jnp.asarray(0.0, f), jnp.asarray(0.0, f),
              jnp.zeros(2, f))
    _, (refs, mods, coms) = jax.lax.scan(body, carry0, (steps, next_steps,
                                                        signs))
    zero = jnp.zeros((1, 3), f)
    return {
        "reference_footsteps": jnp.concatenate([zero, refs]),
        "modified_footsteps": jnp.concatenate([zero, mods]),
        "com_trajectory": coms.reshape(-1, 2),
    }
