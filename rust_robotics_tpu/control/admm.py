"""ADMM consensus: formation / graph / horizon consensus.

Reference: crates/rust_robotics_control/src/admm_consensus.rs (1,012 LoC) —
`solve_formation_consensus` etc. (control/src/lib.rs:94-97): agents with
local quadratic objectives agree on a shared consensus variable via ADMM
(x-update local, z-update global average, scaled dual update).

TPU-native (SURVEY.md §2.12): the z-update's global average IS a psum — the
one reference algorithm whose math maps 1:1 onto a mesh collective. The
dense version below runs all agents batched on one chip; `shard_map` it
over the `data` axis and the jnp.mean becomes psum/axis_size with no other
change (see rust_robotics_tpu/train.py for the pattern).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from rust_robotics_tpu.core.types import pytree_dataclass


@dataclasses.dataclass(frozen=True)
class ADMMConfig:
    rho: float = 1.0
    iterations: int = 100


@pytree_dataclass
class ADMMResult:
    x: Any          # [A, d] local solutions
    z: Any          # [d] consensus value
    primal_residual: Any
    dual_residual: Any


def solve_consensus(targets, weights=None, cfg: ADMMConfig = ADMMConfig()):
    """min Σ_i w_i/2 ‖x_i − a_i‖²  s.t.  x_i = z.

    targets [A, d]; returns ADMMResult. Scaled-form ADMM:
      x_i ← (w_i a_i + ρ(z − u_i)) / (w_i + ρ)
      z   ← mean(x + u)                   (the psum)
      u_i ← u_i + x_i − z
    """
    a = jnp.asarray(targets)
    n_agents, d = a.shape
    w = jnp.ones((n_agents, 1), a.dtype) if weights is None else (
        jnp.asarray(weights).reshape(n_agents, 1)
    )
    rho = cfg.rho

    def body(carry, _):
        x, z, u = carry
        x = (w * a + rho * (z - u)) / (w + rho)
        z_new = jnp.mean(x + u, axis=0)
        u = u + x - z_new
        return (x, z_new, u), (
            jnp.linalg.norm(x - z_new),
            rho * jnp.linalg.norm(z_new - z),
        )

    x0 = a
    z0 = jnp.mean(a, axis=0)
    u0 = jnp.zeros_like(a)
    (x, z, u), (pr, dr) = jax.lax.scan(
        body, (x0, z0, u0), None, length=cfg.iterations
    )
    return ADMMResult(x, z, pr[-1], dr[-1])


def solve_formation_consensus(positions, formation_offsets, weights=None,
                              cfg: ADMMConfig = ADMMConfig()):
    """Formation consensus (admm_consensus.rs `solve_formation_consensus`):
    agents at `positions` [A, d] agree on a formation *center* such that
    agent i sits at center + offset_i; returns (center [d], target
    positions [A, d], result)."""
    targets = jnp.asarray(positions) - jnp.asarray(formation_offsets)
    res = solve_consensus(targets, weights, cfg)
    center = res.z
    return center, center + jnp.asarray(formation_offsets), res


def solve_horizon_consensus(goal_trajs, anchor=None, smooth_weight=0.0,
                            cfg: ADMMConfig = ADMMConfig()):
    """Receding-horizon trajectory consensus
    (admm_consensus.rs `solve_horizon_consensus`:491-693,
    benchmark_admm_horizon_consensus.rs): agents with noisy per-agent goal
    trajectories agree on ONE shared center trajectory over the horizon.

    min over z [H, d]:  Σ_i ½‖x_i − g_i‖²  +  (λ/2)‖Δ²z‖²
    s.t. x_i = z, z_0 = anchor (HARD, when anchor is given — the
    receding-horizon loop re-anchors each cycle at the executed center).

    Mirrors the reference splitting exactly: the x-update is the plain
    per-agent proximal step x_i = (g_i + ρ(z − u_i)) / (1 + ρ); the
    z-update applies the smoothness ONCE by solving
    (ρ·A·I + λ DᵀD) z = ρ Σ_i (x_i + u_i) per axis with the anchored z_0
    eliminated into the RHS (the reference's reduced Cholesky system).
    The Σ_i in the z-update is the psum when agents are mesh-sharded.

    goal_trajs [A, H, d]; anchor [d] or None. Returns (z [H, d],
    ADMMResult).
    """
    g = jnp.asarray(goal_trajs)
    n_agents, horizon, d = g.shape
    f = g.dtype
    rho = cfg.rho
    lam = smooth_weight

    # z-system A = ρ·N·I + λ DᵀD with D the second-difference operator
    if horizon >= 3:
        dd = (jnp.eye(horizon, dtype=f)[:-2]
              - 2.0 * jnp.eye(horizon, k=1, dtype=f)[:-2]
              + jnp.eye(horizon, k=2, dtype=f)[:-2])
        smooth = lam * dd.T @ dd
    else:
        smooth = jnp.zeros((horizon, horizon), f)
    a_mat = jnp.eye(horizon, dtype=f) * (rho * n_agents) + smooth
    anchored = anchor is not None
    if anchored and horizon == 1:
        # the whole trajectory IS the anchored step (the reference's
        # m == 0 reduced-system case, admm_consensus.rs:582)
        anchor = jnp.asarray(anchor, f)

        def z_update(x, u):
            return anchor[None, :]
    elif anchored:
        anchor = jnp.asarray(anchor, f)
        # reduced system over the free steps 1..H; the anchored z_0 column
        # moves to the RHS (admm_consensus.rs:568-581)
        a_red_inv = jnp.linalg.inv(a_mat[1:, 1:])
        a_col0 = a_mat[1:, 0]  # [H-1]

        def z_update(x, u):
            b = rho * jnp.sum(x + u, axis=0)  # [H, d]
            b_red = b[1:] - a_col0[:, None] * anchor[None, :]
            z_free = a_red_inv @ b_red
            return jnp.concatenate([anchor[None, :], z_free], axis=0)
    else:
        a_inv = jnp.linalg.inv(a_mat)

        def z_update(x, u):
            return a_inv @ (rho * jnp.sum(x + u, axis=0))

    def body(carry, _):
        x, z, u = carry
        # x-update: plain proximal step (unit agent weight, no box)
        x = (g + rho * (z[None] - u)) / (1.0 + rho)
        z_new = z_update(x, u)
        u = u + x - z_new
        return (x, z_new, u), (
            jnp.linalg.norm(x - z_new[None]),
            rho * jnp.sqrt(jnp.asarray(n_agents, f))
            * jnp.linalg.norm(z_new - z),
        )

    z0 = jnp.mean(g, axis=0)
    if anchored:
        z0 = z0.at[0].set(anchor)
    x0 = jnp.broadcast_to(z0[None], g.shape)
    u0 = jnp.zeros_like(g)
    (x, z, u), (pr, dr) = jax.lax.scan(
        body, (x0, z0, u0), None, length=cfg.iterations
    )
    return z, ADMMResult(x, z, pr[-1], dr[-1])
