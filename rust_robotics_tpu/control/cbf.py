"""Control-barrier-function safety filter.

Reference: crates/rust_robotics_control/src/cbf_safety_filter.rs (611 LoC):
QP filter min ‖u − u_des‖² s.t. ḣ_i(x, u) ≥ −α h_i(x) over convex (circle)
obstacles, for single/double-integrator dynamics.

TPU-native: the small QP is solved by projected dual ascent (the same
inner-solver family as the reference MPC's projected-gradient QP,
mpc.rs), fully jitted, batched over robots with vmap.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class CBFConfig:
    alpha: float = 1.0
    dual_iterations: int = 200
    dual_lr: float = 0.3
    u_max: float = 10.0


def solve_qp_dual(u_des, a_mat, b_vec, iterations=200, lr=0.3):
    """min ½‖u − u_des‖² s.t. A u ≥ b, via projected dual ascent:
    u(λ) = u_des + Aᵀλ;  λ ← max(0, λ + lr (b − A u))."""

    def body(lam, _):
        u = u_des + a_mat.T @ lam
        lam = jnp.clip(lam + lr * (b_vec - a_mat @ u), 0.0, None)
        return lam, None

    lam0 = jnp.zeros(b_vec.shape, u_des.dtype)
    lam, _ = jax.lax.scan(body, lam0, None, length=iterations)
    return u_des + a_mat.T @ lam


def cbf_filter_single_integrator(pos, u_des, obstacles, radii,
                                 cfg: CBFConfig = CBFConfig()):
    """Safety-filter a desired velocity for ẋ = u.

    Barriers h_i = ‖x − o_i‖² − r_i²; constraint ∇h_i·u ≥ −α h_i, i.e.
    2(x−o_i)ᵀ u ≥ −α h_i. Returns the filtered velocity.
    """
    d = pos - obstacles  # [M, 2]
    h = jnp.sum(d * d, axis=-1) - jnp.asarray(radii) ** 2
    a_mat = 2.0 * d  # [M, 2]
    b_vec = -cfg.alpha * h
    u = solve_qp_dual(u_des, a_mat, b_vec, cfg.dual_iterations, cfg.dual_lr)
    return jnp.clip(u, -cfg.u_max, cfg.u_max)
