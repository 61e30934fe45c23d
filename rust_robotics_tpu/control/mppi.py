"""Model Predictive Path Integral (MPPI) control.

Reference: crates/rust_robotics_control/src/mppi.rs — the double-integrator
MPPI core (:892-1010): sample K noisy control sequences around the nominal,
roll out the dynamics, exponentially weight by path cost with temperature λ,
update the nominal with the weighted noise average; sampling diagnostics
(:857, `MppiSamplingDiagnostics2D`: ESS, best/mean cost). The racing /
person-following / pusher-slider variants (racing_mppi_*.rs,
person_following_mppi.rs, pusher_slider.rs) specialize dynamics + cost.

TPU-native: rollouts are a [K]-batched `lax.scan` over the horizon — the
embarrassing parallelism the reference leaves on the table (SURVEY.md §2.4
note). `dynamics` and `cost` are user callables, so every reference variant
is a config of this one engine. Fully differentiable: gradients flow
through the soft weighting (the argmin-free update), enabling cost-shaping
by gradient descent.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp

from rust_robotics_tpu.core.types import pytree_dataclass


@dataclasses.dataclass(frozen=True)
class MPPIConfig:
    horizon: int = 30
    num_samples: int = 256
    temperature: float = 1.0  # λ
    noise_sigma: tuple = (0.5, 0.5)
    control_min: tuple = (-2.0, -2.0)
    control_max: tuple = (2.0, 2.0)
    dt: float = 0.1


@pytree_dataclass
class MPPIDiagnostics:
    """MppiSamplingDiagnostics2D analog (mppi.rs:857)."""

    best_cost: Any
    mean_cost: Any
    effective_sample_size: Any


def mppi_plan(key, dynamics: Callable, stage_cost: Callable,
              terminal_cost: Callable, state, u_nominal,
              cfg: MPPIConfig = MPPIConfig()):
    """One MPPI update.

    dynamics(state [..., n], u [..., m], dt) -> state'
    stage_cost(state [..., n], u [..., m]) -> cost [...]
    terminal_cost(state [..., n]) -> cost [...]
    state [n]; u_nominal [H, m].

    Returns (u_new [H, m], first_control [m], diagnostics).
    """
    h, m = u_nominal.shape
    k = cfg.num_samples
    f = state.dtype
    sigma = jnp.asarray(cfg.noise_sigma, dtype=f)
    lo = jnp.asarray(cfg.control_min, dtype=f)
    hi = jnp.asarray(cfg.control_max, dtype=f)

    noise = jax.random.normal(key, (k, h, m), dtype=f) * sigma
    controls = jnp.clip(u_nominal[None] + noise, lo, hi)
    clipped_noise = controls - u_nominal[None]

    def step(states, u_t):
        next_states = dynamics(states, u_t, cfg.dt)
        c = stage_cost(next_states, u_t)
        return next_states, c

    states0 = jnp.broadcast_to(state, (k,) + state.shape)
    final_states, costs = jax.lax.scan(
        step, states0, jnp.moveaxis(controls, 1, 0)
    )
    total = jnp.sum(costs, axis=0) + terminal_cost(final_states)

    beta = jnp.min(total)
    w = jnp.exp(-(total - beta) / cfg.temperature)
    w = w / jnp.sum(w)
    u_new = u_nominal + jnp.einsum("k,khm->hm", w, clipped_noise)
    u_new = jnp.clip(u_new, lo, hi)

    diag = MPPIDiagnostics(
        best_cost=beta,
        mean_cost=jnp.mean(total),
        effective_sample_size=1.0 / jnp.sum(w**2),
    )
    return u_new, u_new[0], diag


def shift_nominal(u, fill=None):
    """Receding-horizon shift: drop the executed control, repeat the last."""
    tail = u[-1:] if fill is None else jnp.broadcast_to(fill, u[-1:].shape)
    return jnp.concatenate([u[1:], tail], axis=0)


# ---------------------------------------------------------------------------
# Double-integrator demo problem (mppi.rs:892-1010)
# ---------------------------------------------------------------------------

def double_integrator_dynamics(state, u, dt):
    """[x, y, vx, vy]; u = accel [ax, ay]."""
    x = state[..., 0] + state[..., 2] * dt
    y = state[..., 1] + state[..., 3] * dt
    vx = state[..., 2] + u[..., 0] * dt
    vy = state[..., 3] + u[..., 1] * dt
    return jnp.stack([x, y, vx, vy], axis=-1)


def make_goal_costs(goal, obstacles=None, obstacle_radius=0.5,
                    control_weight=0.01, obstacle_weight=100.0):
    """Goal-seeking stage/terminal costs with optional circular obstacles."""

    def stage(state, u):
        c = jnp.sum((state[..., :2] - goal) ** 2, axis=-1)
        c = c + control_weight * jnp.sum(u**2, axis=-1)
        if obstacles is not None:
            d = jnp.linalg.norm(
                state[..., None, :2] - obstacles, axis=-1
            )
            c = c + obstacle_weight * jnp.sum(
                jnp.clip(obstacle_radius - d, 0.0, None) ** 2, axis=-1
            )
        return c

    def terminal(state):
        return 10.0 * jnp.sum((state[..., :2] - goal) ** 2, axis=-1) + jnp.sum(
            state[..., 2:] ** 2, axis=-1
        )

    return stage, terminal
