"""Tensor-parallel matrix-free NLLS: factor shards + psum per matvec.

The reference's BlockSparseHessian PCG / Schur solves are single-threaded
(rust_robotics_optimization/src/sparse.rs:115,160); SURVEY.md §2.12's TP row
asks for the pose-graph / BA / EKF-SLAM Hessian work to be sharded over the
mesh `model` axis. The TPU-native shape of that is NOT sharding the Hessian
matrix (it is never materialized here) but sharding the FACTORS:

- every factor block (graph edges, reprojections, IMU constraints) is
  padded to a multiple of the shard count and split over the `model` axis;
- the variable (tangent) vector is replicated — for the reference's
  workloads (≤ 30k params) it is tiny next to the factor arrays;
- linearization computes local gradient / diagonal-block / cost partial
  sums, combined with one psum each;
- every PCG H·v matvec streams the LOCAL factor Jacobians
  (gather → J·v → Λ → Jᵀ → scatter-add) and finishes with a single psum of
  the [D] vector — the only per-iteration collective, riding ICI.

Semantics match `nlls.solver.solve(..., linear_solver="matfree_pcg")` up to
floating-point reduction order; tests pin the sharded solve against the
single-device oracle on a virtual 8-device mesh.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from rust_robotics_tpu.nlls.problem import FactorBlock, Problem
from rust_robotics_tpu.nlls.solver import (
    SolverConfig,
    SolverSummary,
    _apply_increment,
    _block_jacobians,
    _weighted,
)
from rust_robotics_tpu.ops.smallmat import inv_spd_small

try:
    from jax import shard_map as _shard_map
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map as _shard_map


def _pad_block(block: FactorBlock, n_shards: int):
    """Pad a factor block to a multiple of n_shards; returns (block, valid).

    Padding rows duplicate row 0 and carry valid=False — their robust weight
    and cost contribution are zeroed, so they are exact no-ops (the masked
    fixed-capacity idiom of SURVEY.md §7.3)."""
    f = block.num
    rem = (-f) % n_shards
    valid = jnp.arange(f + rem) < f
    if rem == 0:
        return block, valid

    def padrow(a):
        return jnp.concatenate(
            [a, jnp.broadcast_to(a[:1], (rem,) + a.shape[1:])], axis=0
        )

    return (
        dataclasses.replace(
            block,
            indices=padrow(block.indices),
            measurement=None
            if block.measurement is None
            else jax.tree.map(padrow, block.measurement),
            information=None
            if block.information is None
            else padrow(block.information),
        ),
        valid,
    )


def _local_linearize(problem, padded, blocks_data, gv, dtype, axes):
    """Local linearization over this device's factor shard, psum-combined.

    Returns (cache, grad, cost, diag_blocks) — cache holds the LOCAL
    Jacobians (never gathered); grad/cost/diag are global (post-psum)."""
    offsets, total = problem.layout()
    groups = {g.name: g for g in problem.groups}
    grad = jnp.zeros((total,), dtype=dtype)
    cost = jnp.zeros((), dtype=dtype)
    diag_blocks = {
        g.name: jnp.zeros((g.num, g.tdim, g.tdim), dtype=dtype)
        for g in problem.groups
    }
    cache = []
    for template, bd in zip(padded, blocks_data):
        idx_, meas_, info_, valid_ = bd
        block = dataclasses.replace(
            template, indices=idx_, measurement=meas_, information=info_
        )
        r, jacs = _block_jacobians(problem, block, gv)
        wr, e2, val, w = _weighted(block, r)
        w = w * valid_
        val = val * valid_
        cost = cost + 0.5 * jnp.sum(val)
        for k, gname in enumerate(block.groups):
            fixed = groups[gname].fixed()[block.indices[:, k]]
            jacs[k] = jnp.where(fixed[:, None, None], 0.0, jacs[k])
        cache.append((block, tuple(jacs), w))
        for k_i, gname_i in enumerate(block.groups):
            g_i = groups[gname_i]
            ti = g_i.tdim
            rows = (offsets[gname_i] + block.indices[:, k_i] * ti)[:, None] \
                + jnp.arange(ti)[None, :]
            grad = grad.at[rows].add(
                w[:, None] * jnp.einsum("fri,fr->fi", jacs[k_i], wr))
            lam_jk = (jacs[k_i] if block.information is None else
                      jnp.einsum("fij,fjk->fik", block.information, jacs[k_i]))
            contrib = w[:, None, None] * jnp.einsum(
                "fri,frj->fij", jacs[k_i], lam_jk)
            diag_blocks[gname_i] = diag_blocks[gname_i].at[
                block.indices[:, k_i]].add(contrib)

    grad = jax.lax.psum(grad, axes)
    cost = jax.lax.psum(cost, axes)
    diag_blocks = {k: jax.lax.psum(v, axes) for k, v in diag_blocks.items()}
    return cache, grad, cost, diag_blocks


def _fixed_diag_mask(problem, dtype):
    offsets, total = problem.layout()
    fixed_diag = jnp.zeros((total,), dtype=bool)
    for g in problem.groups:
        off = offsets[g.name]
        idx = off + jnp.arange(g.num)[:, None] * g.tdim \
            + jnp.arange(g.tdim)[None, :]
        fixed_diag = fixed_diag.at[idx].set(
            jnp.broadcast_to(g.fixed()[:, None], (g.num, g.tdim)))
    return fixed_diag


def solve_sharded(problem: Problem, config: SolverConfig | None = None,
                  mesh: Mesh | None = None, axis_names=("model",)):
    """LM/GN solve with factor blocks sharded over `axis_names` of `mesh`.

    Mirrors `nlls.solver.solve` termination semantics (solver.rs:81-188);
    the linear solver is always the matrix-free block-Jacobi PCG. If `mesh`
    is None, a flat ('model',) mesh over all visible devices is built.
    Returns (solved Problem, SolverSummary).
    """
    if config is None:
        config = SolverConfig(linear_solver="matfree_pcg")
    if mesh is None:
        import numpy as np
        mesh = Mesh(np.asarray(jax.devices()), ("model",))
        axis_names = ("model",)
    axes = tuple(axis_names) if not isinstance(axis_names, str) \
        else (axis_names,)
    n_shards = 1
    for a in axes:
        n_shards *= mesh.shape[a]

    values = problem.values()
    dtype = values[0].dtype
    offsets, total = problem.layout()
    if total == 0:
        from rust_robotics_tpu.nlls.solver import problem_cost
        c = float(problem_cost(problem, values))
        return problem, SolverSummary(c, c, 0, 0, "gradient_converged", 0)

    padded, valids = zip(*[_pad_block(b, n_shards) for b in problem.factors])
    blocks_data = tuple(
        (b.indices, b.measurement, b.information, v)
        for b, v in zip(padded, valids)
    )
    lm = config.method == "lm"
    groups = {g.name: g for g in problem.groups}
    # every other mesh axis sees replicated factor data: the worker runs the
    # same program there, so outputs stay unvarying and out_specs=P() holds
    factor_spec = P(axes if len(axes) > 1 else axes[0])

    def worker(values_tuple, damping, bdata):
        gv = {g.name: v for g, v in zip(problem.groups, values_tuple)}
        cache, grad, cost, diag_blocks = _local_linearize(
            problem, padded, bdata, gv, dtype, axes)
        fixed_diag = _fixed_diag_mask(problem, dtype)
        grad = jnp.where(fixed_diag, 0.0, grad)

        # damped diagonal + block-Jacobi preconditioner (replicated math —
        # identical on every device, no collective needed)
        damp_parts, pre_inv = [], []
        for g in problem.groups:
            db = diag_blocks[g.name]
            eye = jnp.eye(g.tdim, dtype=dtype)
            db = jnp.where(g.fixed()[:, None, None], eye[None], db)
            d = jnp.diagonal(db, axis1=-2, axis2=-1)
            lamv = (damping * jnp.maximum(jnp.abs(d), 1.0)) if lm \
                else jnp.zeros_like(d)
            damp_parts.append(lamv.reshape(-1))
            pre_inv.append(inv_spd_small(db + jax.vmap(jnp.diag)(lamv)))
        damp_vec = jnp.concatenate(damp_parts)
        damp_vec = jnp.where(fixed_diag, 1.0, damp_vec)

        def precond(rv):
            outs = []
            for g, inv in zip(problem.groups, pre_inv):
                off = offsets[g.name]
                rg = rv[off:off + g.num * g.tdim].reshape(g.num, g.tdim)
                outs.append(jnp.einsum("nij,nj->ni", inv, rg).reshape(-1))
            return jnp.concatenate(outs)

        def hvp(v):
            local = jnp.zeros((total,), dtype)
            for block, jacs, w in cache:
                jv = None
                for k, gname in enumerate(block.groups):
                    t = jacs[k].shape[-1]
                    cols = (offsets[gname] + block.indices[:, k] * t)[:, None] \
                        + jnp.arange(t)[None, :]
                    term = jnp.einsum("frt,ft->fr", jacs[k], v[cols])
                    jv = term if jv is None else jv + term
                lam_jv = (jv if block.information is None else
                          jnp.einsum("fij,fj->fi", block.information, jv))
                for k, gname in enumerate(block.groups):
                    t = jacs[k].shape[-1]
                    rows = (offsets[gname] + block.indices[:, k] * t)[:, None] \
                        + jnp.arange(t)[None, :]
                    local = local.at[rows].add(
                        w[:, None] * jnp.einsum("fri,fr->fi", jacs[k], lam_jv))
            return damp_vec * v + jax.lax.psum(local, axes)

        b = -grad

        def body(carry):
            x, rv, z, p_, k, rz = carry
            hp = hvp(p_)
            alpha = rz / jnp.clip(p_ @ hp, 1e-300, None)
            x = x + alpha * p_
            rv = rv - alpha * hp
            z = precond(rv)
            rz_new = rv @ z
            beta = rz_new / jnp.clip(rz, 1e-300, None)
            return x, rv, z, z + beta * p_, k + 1, rz_new

        def cond(carry):
            _, rv, _, _, k, _ = carry
            return (jnp.linalg.norm(rv) > config.pcg_tolerance) \
                & (k < config.pcg_max_iterations)

        x0 = jnp.zeros((total,), dtype)
        z0 = precond(b)
        delta, _, _, _, iters, _ = jax.lax.while_loop(
            cond, body, (x0, b, z0, z0, 0, b @ z0))
        return delta, iters, cost, jnp.max(jnp.abs(grad))

    def cost_worker(values_tuple, bdata):
        gv = {g.name: v for g, v in zip(problem.groups, values_tuple)}
        cost = jnp.zeros((), dtype=dtype)
        for template, bd in zip(padded, bdata):
            idx_, meas_, info_, valid_ = bd
            block = dataclasses.replace(
                template, indices=idx_, measurement=meas_, information=info_)
            from rust_robotics_tpu.nlls.solver import _block_eval
            r = _block_eval(block, gv)
            _, _, val, _ = _weighted(block, r)
            cost = cost + 0.5 * jnp.sum(val * valid_)
        return jax.lax.psum(cost, axes)

    lin_solve = jax.jit(_shard_map(
        worker, mesh=mesh,
        in_specs=(P(), P(), factor_spec), out_specs=P(),
    ))
    cost_fn = jax.jit(_shard_map(
        cost_worker, mesh=mesh,
        in_specs=(P(), factor_spec), out_specs=P(),
    ))
    apply_fn = jax.jit(
        lambda vals, delta: _apply_increment(problem, vals, delta))

    initial_cost = float(cost_fn(values, blocks_data))
    current_cost = initial_cost
    damping = config.initial_damping
    accepted = 0
    total_linear = 0
    termination = "max_iterations"
    it = 0

    for it in range(config.max_iterations):
        delta, lin_iters, _, gmax = lin_solve(
            values, jnp.asarray(damping, dtype), blocks_data)
        if float(gmax) <= config.gradient_tolerance:
            termination = "gradient_converged"
            break
        total_linear += int(lin_iters)
        if not bool(jnp.all(jnp.isfinite(delta))):
            raise FloatingPointError("non-finite increment")
        if float(jnp.linalg.norm(delta)) <= config.step_tolerance:
            termination = "step_converged"
            it += 1
            break
        trial = apply_fn(values, delta)
        trial_cost = float(cost_fn(trial, blocks_data))
        if config.method == "gn" or trial_cost < current_cost:
            accepted += 1
            change = abs(current_cost - trial_cost)
            values = trial
            current_cost = trial_cost
            damping = max(damping * 0.3, 1e-15)
            if change <= config.cost_tolerance:
                termination = "cost_converged"
                it += 1
                break
        else:
            damping = min(damping * 10.0, 1e15)
    else:
        it = config.max_iterations

    return problem.with_values(values), SolverSummary(
        initial_cost, current_cost, it, accepted, termination, total_linear
    )


def optimize_pose_graph_2d_sharded(poses, edges_from, edges_to, measurements,
                                   information=None, mesh=None,
                                   axis_names=("model",), max_iterations=50,
                                   tolerance=1e-10, pcg_max_iterations=3000,
                                   pcg_tolerance=1e-6):
    """Model-sharded SE(2) pose-graph solve (slam/pose_graph.py semantics,
    edges split over the mesh). Returns (poses [N, 3], SolverSummary)."""
    from rust_robotics_tpu.slam.pose_graph import build_pose_graph_2d

    prob = build_pose_graph_2d(poses, edges_from, edges_to, measurements,
                               information)
    cfg = SolverConfig(
        method="lm", max_iterations=max(max_iterations, 1),
        gradient_tolerance=tolerance, step_tolerance=tolerance,
        cost_tolerance=tolerance * tolerance, linear_solver="matfree_pcg",
        pcg_max_iterations=pcg_max_iterations, pcg_tolerance=pcg_tolerance,
    )
    solved, summary = solve_sharded(prob, cfg, mesh, axis_names)
    return solved.groups[0].values, summary
