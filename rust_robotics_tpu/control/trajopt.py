"""Trajectory optimization: iLQR / DDP and infinite-horizon LQR.

Reference: crates/rust_robotics_control/src/ — ilqr.rs (469 LoC: backward
Riccati pass with regularization + forward line search), ddp.rs (506 LoC:
adds second-order dynamics tensors), lqr_control.rs (466 LoC: inverted
pendulum, discrete Riccati iteration).

TPU-native: dynamics/cost are user callables; all Jacobians/Hessians come
from jax autodiff (the reference hand-derives them per problem); backward
pass is a `lax.scan` (reverse), forward line search evaluates ALL candidate
step sizes in parallel and picks the best feasible — no data-dependent
Python control flow.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class ILQRConfig:
    iterations: int = 50
    # 1e-3 keeps the DDP second-order terms well-conditioned; iLQR is
    # insensitive to this value
    regularization: float = 1e-3
    line_search_steps: tuple = (1.0, 0.5, 0.25, 0.1, 0.05, 0.01)
    tol: float = 1e-6


def _rollout(dynamics, x0, us, dt):
    def step(x, u):
        xn = dynamics(x, u, dt)
        return xn, xn

    _, xs = jax.lax.scan(step, x0, us)
    return jnp.concatenate([x0[None], xs], axis=0)


def _total_cost(stage_cost, terminal_cost, xs, us):
    cs = jax.vmap(stage_cost)(xs[:-1], us)
    return jnp.sum(cs) + terminal_cost(xs[-1])


def ilqr_solve(dynamics: Callable, stage_cost: Callable,
               terminal_cost: Callable, x0, us_init, dt,
               cfg: ILQRConfig = ILQRConfig(), use_ddp: bool = False):
    """Returns (xs [H+1, n], us [H, m], final_cost).

    iLQR (Gauss-Newton on the trajectory); `use_ddp=True` adds the
    second-order dynamics contraction (full DDP, ddp.rs).
    """
    h, m = us_init.shape
    n = x0.shape[0]

    fx_fn = jax.jacobian(dynamics, argnums=0)
    fu_fn = jax.jacobian(dynamics, argnums=1)
    lx_fn = jax.grad(stage_cost, argnums=0)
    lu_fn = jax.grad(stage_cost, argnums=1)
    lxx_fn = jax.hessian(stage_cost, argnums=0)
    luu_fn = jax.hessian(stage_cost, argnums=1)
    lux_fn = jax.jacobian(jax.grad(stage_cost, argnums=1), argnums=0)
    vx_fn = jax.grad(terminal_cost)
    vxx_fn = jax.hessian(terminal_cost)
    if use_ddp:
        fxx_fn = jax.jacobian(jax.jacobian(dynamics, argnums=0), argnums=0)
        fux_fn = jax.jacobian(jax.jacobian(dynamics, argnums=1), argnums=0)
        fuu_fn = jax.jacobian(jax.jacobian(dynamics, argnums=1), argnums=1)

    def backward(xs, us):
        def bstep(carry, inp):
            vx, vxx = carry
            x, u = inp
            fx = fx_fn(x, u, dt)
            fu = fu_fn(x, u, dt)
            qx = lx_fn(x, u) + fx.T @ vx
            qu = lu_fn(x, u) + fu.T @ vx
            qxx = lxx_fn(x, u) + fx.T @ vxx @ fx
            quu = luu_fn(x, u) + fu.T @ vxx @ fu
            qux = lux_fn(x, u) + fu.T @ vxx @ fx
            if use_ddp:
                fxx = fxx_fn(x, u, dt)
                fux = fux_fn(x, u, dt)
                fuu = fuu_fn(x, u, dt)
                qxx = qxx + jnp.einsum("i,ijk->jk", vx, fxx)
                qux = qux + jnp.einsum("i,ijk->jk", vx, fux)
                quu = quu + jnp.einsum("i,ijk->jk", vx, fuu)
            quu_reg = quu + cfg.regularization * jnp.eye(m, dtype=x.dtype)
            kff = -jnp.linalg.solve(quu_reg, qu)
            kfb = -jnp.linalg.solve(quu_reg, qux)
            vx_new = qx + kfb.T @ quu @ kff + kfb.T @ qu + qux.T @ kff
            vxx_new = qxx + kfb.T @ quu @ kfb + kfb.T @ qux + qux.T @ kfb
            vxx_new = 0.5 * (vxx_new + vxx_new.T)
            return (vx_new, vxx_new), (kff, kfb)

        vx0 = vx_fn(xs[-1])
        vxx0 = vxx_fn(xs[-1])
        (_, _), (kffs, kfbs) = jax.lax.scan(
            bstep, (vx0, vxx0), (xs[:-1], us), reverse=True
        )
        return kffs, kfbs

    def forward(xs, us, kffs, kfbs, alpha):
        def fstep(x, inp):
            x_ref, u_ref, kff, kfb = inp
            u = u_ref + alpha * kff + kfb @ (x - x_ref)
            xn = dynamics(x, u, dt)
            return xn, (xn, u)

        _, (xs_new, us_new) = jax.lax.scan(
            fstep, x0, (xs[:-1], us, kffs, kfbs)
        )
        xs_new = jnp.concatenate([x0[None], xs_new], axis=0)
        return xs_new, us_new

    def outer(carry, _):
        xs, us, cost = carry
        kffs, kfbs = backward(xs, us)
        alphas = jnp.asarray(cfg.line_search_steps, x0.dtype)
        cand = jax.vmap(lambda a: forward(xs, us, kffs, kfbs, a))(alphas)
        costs = jax.vmap(
            lambda xsn, usn: _total_cost(stage_cost, terminal_cost, xsn, usn)
        )(*cand)
        best = jnp.argmin(costs)
        improved = costs[best] < cost
        xs = jnp.where(improved, cand[0][best], xs)
        us = jnp.where(improved, cand[1][best], us)
        cost = jnp.where(improved, costs[best], cost)
        return (xs, us, cost), cost

    xs0 = _rollout(dynamics, x0, us_init, dt)
    cost0 = _total_cost(stage_cost, terminal_cost, xs0, us_init)
    (xs, us, cost), _ = jax.lax.scan(
        outer, (xs0, us_init, cost0), None, length=cfg.iterations
    )
    return xs, us, cost


def ddp_solve(dynamics, stage_cost, terminal_cost, x0, us_init, dt,
              cfg: ILQRConfig = ILQRConfig()):
    """Full DDP (ddp.rs): iLQR + second-order dynamics terms."""
    return ilqr_solve(dynamics, stage_cost, terminal_cost, x0, us_init, dt,
                      cfg, use_ddp=True)


def lqr_regulator(a, b, q, r, iterations: int = 200, tol: float = 1e-9):
    """Infinite-horizon discrete LQR gain K (lqr_control.rs Riccati
    iteration): u = −K x."""

    def body(carry):
        p, it, done = carry
        pn = (
            a.T @ p @ a
            - a.T @ p @ b @ jnp.linalg.solve(r + b.T @ p @ b, b.T @ p @ a)
            + q
        )
        return pn, it + 1, jnp.max(jnp.abs(pn - p)) < tol

    def cond(carry):
        _, it, done = carry
        return (~done) & (it < iterations)

    p, _, _ = jax.lax.while_loop(cond, body, (q, 0, jnp.asarray(False)))
    return jnp.linalg.solve(r + b.T @ p @ b, b.T @ p @ a)
