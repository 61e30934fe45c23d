"""Continuation/GMRES (C/GMRES) nonlinear MPC.

Reference: crates/rust_robotics_control/src/cgmres_nmpc.rs (745 LoC):
solve the receding-horizon necessary conditions F(U, x, t) = 0 by the
continuation method — U̇ from the GMRES solution of
(∂F/∂U) U̇ = −ζ F − (∂F/∂x) ẋ — instead of re-solving the NLP each step.

TPU-native: F evaluates as one `lax.scan` over the horizon (forward state
rollout + backward costate rollout); the Jacobian-vector products that
GMRES needs come from jax.jvp (the reference uses finite differences);
GMRES itself is jax.scipy.sparse.linalg.gmres. Entirely matrix-free and
jitted.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class CGMRESConfig:
    horizon: int = 20
    dt_horizon: float = 0.05   # prediction-interval step
    zeta: float = 100.0        # continuation stabilization gain
    gmres_iters: int = 20
    sampling_dt: float = 0.01


def make_optimality_residual(dynamics: Callable, stage_cost_u_grad: Callable,
                             stage_cost_x_grad: Callable,
                             terminal_cost_x_grad: Callable,
                             cfg: CGMRESConfig):
    """Build F(U, x): stack of ∂H/∂u along the horizon.

    dynamics(x, u) -> ẋ ; H = l(x, u) + λᵀ f(x, u).
    """
    dfdx = jax.jacobian(dynamics, argnums=0)
    dfdu = jax.jacobian(dynamics, argnums=1)

    def residual(u_flat, x0):
        us = u_flat.reshape(cfg.horizon, -1)

        def fwd(x, u):
            xn = x + dynamics(x, u) * cfg.dt_horizon
            return xn, x

        x_end, xs = jax.lax.scan(fwd, x0, us)

        def bwd(lam, inp):
            x, u = inp
            lam_prev = lam + (
                stage_cost_x_grad(x, u) + dfdx(x, u).T @ lam
            ) * cfg.dt_horizon
            return lam_prev, lam

        lam_end = terminal_cost_x_grad(x_end)
        _, lams = jax.lax.scan(bwd, lam_end, (xs, us), reverse=True)

        def dhdu(x, u, lam):
            return stage_cost_u_grad(x, u) + dfdu(x, u).T @ lam

        return jax.vmap(dhdu)(xs, us, lams).reshape(-1)

    return residual


def cgmres_step(residual, u_flat, x, x_dot, cfg: CGMRESConfig):
    """One continuation update: solve (∂F/∂U) U̇ = −ζF − (∂F/∂x)ẋ with
    matrix-free GMRES, advance U by sampling_dt."""
    f_val = residual(u_flat, x)
    _, fx_dot = jax.jvp(lambda xx: residual(u_flat, xx), (x,), (x_dot,))
    rhs = -cfg.zeta * f_val - fx_dot

    def a_times(v):
        _, jv = jax.jvp(lambda uu: residual(uu, x), (u_flat,), (v,))
        return jv

    u_dot, _ = jax.scipy.sparse.linalg.gmres(
        a_times, rhs, maxiter=cfg.gmres_iters, restart=cfg.gmres_iters,
        solve_method="incremental",
    )
    return u_flat + u_dot * cfg.sampling_dt


def run_cgmres(dynamics, stage_cost, terminal_cost, x0, steps,
               cfg: CGMRESConfig = CGMRESConfig(), m_controls: int = 1):
    """Closed-loop C/GMRES NMPC run (cgmres_nmpc.rs sim shape). Returns
    (states [steps+1, n], controls [steps, m])."""
    res = make_optimality_residual(
        dynamics,
        jax.grad(stage_cost, argnums=1),
        jax.grad(stage_cost, argnums=0),
        jax.grad(terminal_cost),
        cfg,
    )

    @jax.jit
    def step(carry, _):
        x, u_flat = carry
        u0 = u_flat[:m_controls]
        x_dot = dynamics(x, u0)
        u_flat = cgmres_step(res, u_flat, x, x_dot, cfg)
        x_new = x + dynamics(x, u0) * cfg.sampling_dt
        return (x_new, u_flat), (x_new, u0)

    u_init = jnp.zeros(cfg.horizon * m_controls, x0.dtype)
    (_, _), (xs, us) = jax.lax.scan(step, (x0, u_init), None, length=steps)
    return jnp.concatenate([x0[None], xs]), us
