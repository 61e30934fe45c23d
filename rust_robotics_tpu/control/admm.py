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


def solve_horizon_consensus(goal_trajs, anchor, smooth_weight=0.0,
                            anchor_weight=1e4,
                            cfg: ADMMConfig = ADMMConfig()):
    """Receding-horizon trajectory consensus
    (admm_consensus.rs `solve_horizon_consensus`,
    benchmark_admm_horizon_consensus.rs): agents with noisy per-agent goal
    trajectories agree on ONE shared center trajectory over the horizon.

    min over z [H, d]:  Σ_i ½‖x_i − g_i‖²  +  (λ/2)‖Δ²z‖²
    s.t. x_i = z, z_0 ≈ anchor (weight `anchor_weight` — the receding-
    horizon loop re-anchors each cycle at the executed center).

    The x-update is a per-agent quadratic over the horizon — a batched
    [H, H] solve per axis (H ≈ 10, trivial); the z-update is the agent
    mean (the psum); scaled duals close the loop.

    goal_trajs [A, H, d]; anchor [d]. Returns (z [H, d], ADMMResult).
    """
    g = jnp.asarray(goal_trajs)
    n_agents, horizon, d = g.shape
    f = g.dtype
    rho = cfg.rho
    lam = smooth_weight

    # second-difference operator over the horizon (rms-accel penalty)
    if horizon >= 3:
        dd = (jnp.eye(horizon, dtype=f)[:-2]
              - 2.0 * jnp.eye(horizon, k=1, dtype=f)[:-2]
              + jnp.eye(horizon, k=2, dtype=f)[:-2])
        smooth = lam * dd.T @ dd
    else:
        smooth = jnp.zeros((horizon, horizon), f)
    w_anchor = jnp.zeros((horizon,), f).at[0].set(anchor_weight)
    # local systems: (I + diag(w_anchor) + λ DᵀD + ρ I) x = rhs
    m = (jnp.eye(horizon, dtype=f) * (1.0 + rho) + jnp.diag(w_anchor)
         + smooth)
    m_inv = jnp.linalg.inv(m)
    anchor_term = w_anchor[:, None] * jnp.asarray(anchor)[None, :]

    def body(carry, _):
        x, z, u = carry
        rhs = g + anchor_term[None] + rho * (z[None] - u)  # [A, H, d]
        x = jnp.einsum("ht,atd->ahd", m_inv, rhs)
        z_new = jnp.mean(x + u, axis=0)
        u = u + x - z_new
        return (x, z_new, u), (
            jnp.linalg.norm(x - z_new[None]),
            rho * jnp.linalg.norm(z_new - z),
        )

    x0 = g
    z0 = jnp.mean(g, axis=0)
    u0 = jnp.zeros_like(g)
    (x, z, u), (pr, dr) = jax.lax.scan(
        body, (x0, z0, u0), None, length=cfg.iterations
    )
    return z, ADMMResult(x, z, pr[-1], dr[-1])
