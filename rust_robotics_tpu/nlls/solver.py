"""Gauss-Newton / Levenberg-Marquardt solver over factor blocks.

Reference: rust_robotics_optimization/src/solver.rs — LM loop with trial
step accept/reject and ×0.3/×10 damping schedule (:81-188), linearization
into a block Hessian with robust IRLS weights (:216-258), scaled LM damping
diag += λ·max(|d|, 1) (sparse.rs:34-42), cost = Σ ½ρ(rᵀΛr) (:274); linear
solvers Dense LU (sparse.rs:52), block-Jacobi PCG (sparse.rs:115), Schur
elimination of trailing blocks (sparse.rs:160).

TPU-native design:
- Linearization is one vmapped jacfwd per factor *block* (not per factor):
  J_k = ∂r/∂δ_k through the group retraction at δ=0, [F, rdim, tdim].
- Assembly is dense scatter-add (jnp .at[].add) into [D, D] — for the
  reference's workloads (≤ 30k params) a dense Hessian on HBM is small, and
  batched scatter beats pointer-chasing a BTreeMap.
- PCG is *matrix-free*: H·v = Σ_blocks Jᵀ(Λ(J·v_gathered)) + damping·v —
  never materializes H, gathers/scatters stream over the factor arrays, and
  the block-Jacobi preconditioner is a batched [N, t, t] inverse.
- Schur eliminates the LAST variable group assuming its diagonal blocks are
  independent (the BA landmark structure): batched [N, t, t] inverses + one
  dense MXU matmul for the reduced system.
- The LM outer loop runs on host (mirroring the reference's early-exit
  semantics exactly); each iteration's linearize/solve/cost is one jitted
  call. A fully-jitted while_loop variant can fuse the loop when parity
  with reference termination codes is not needed.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any

import jax
import jax.numpy as jnp

from rust_robotics_tpu.nlls.problem import FactorBlock, Problem
from rust_robotics_tpu.ops.smallmat import inv_spd_small


@dataclasses.dataclass(frozen=True)
class SolverConfig:
    """solver.rs:34-56 defaults."""

    method: str = "lm"  # "gn" | "lm"
    max_iterations: int = 50
    gradient_tolerance: float = 1e-10
    step_tolerance: float = 1e-10
    cost_tolerance: float = 1e-12
    initial_damping: float = 1e-3
    linear_solver: str = "dense"  # "dense" | "pcg" | "schur"
    pcg_max_iterations: int = 200
    pcg_tolerance: float = 1e-10
    # reduced (retained) system factorization for the Schur path:
    # "auto" = Pallas blocked Cholesky on TPU for n ≥ 1024 (VMEM-resident,
    # MXU trailing updates — ops/cholesky_pallas.py), XLA dense otherwise.
    # Threshold from the round-4 dependent-loop measurement (50 solves in
    # one fori_loop, dispatch floor eliminated): XLA wins ≤512, parity at
    # ~1280, Pallas 1.2-1.6x faster at 1024-3072 (docs/PERF.md).
    reduced_solver: str = "auto"  # "auto" | "pallas_chol" | "dense"


@dataclasses.dataclass
class SolverSummary:
    initial_cost: float
    final_cost: float
    iterations: int
    accepted_steps: int
    termination: str
    linear_iterations: int


def _gather(block: FactorBlock, values, k):
    return values[block.indices[:, k]]


def _block_eval(block: FactorBlock, group_values: dict):
    """Residuals [F, rdim] for one factor block."""
    vals = [
        _gather(block, group_values[g], k) for k, g in enumerate(block.groups)
    ]
    if block.measurement is None:
        return jax.vmap(block.residual)(*vals)
    return jax.vmap(block.residual)(*vals, block.measurement)


def _weighted(block: FactorBlock, r):
    """(Λr, e², robust value, robust weight)."""
    if block.information is None:
        wr = r
    else:
        wr = jnp.einsum("fij,fj->fi", block.information, r)
    e2 = jnp.sum(r * wr, axis=-1)
    val, w = block.robust.evaluate(e2)
    return wr, e2, val, w


def problem_cost(problem: Problem, values_tuple):
    """Σ ½ ρ(rᵀΛr) (solver.rs:274)."""
    gv = {g.name: v for g, v in zip(problem.groups, values_tuple)}
    cost = 0.0
    for block in problem.factors:
        r = _block_eval(block, gv)
        _, _, val, _ = _weighted(block, r)
        cost = cost + 0.5 * jnp.sum(val)
    return cost


def _block_jacobians(problem: Problem, block: FactorBlock, gv: dict):
    """Tangent-space Jacobians per slot: list of [F, rdim, tdim_k]."""
    groups = {g.name: g for g in problem.groups}
    vals = [
        _gather(block, gv[g], k) for k, g in enumerate(block.groups)
    ]
    retracts = [groups[g].retract for g in block.groups]
    tdims = [groups[g].tdim for g in block.groups]

    def with_deltas(*args):
        deltas = args[: len(vals)]
        vs = args[len(vals) : 2 * len(vals)]
        m = args[-1] if block.measurement is not None else None
        xs = [ret(v, d) for ret, v, d in zip(retracts, vs, deltas)]
        return block.residual(*xs, m) if m is not None else block.residual(*xs)

    zeros = [jnp.zeros((td,), dtype=vals[0].dtype) for td in tdims]

    def per_factor(*args):
        vs = args[: len(vals)]
        m = args[-1] if block.measurement is not None else None

        def f(deltas):
            extra = (m,) if m is not None else ()
            return with_deltas(*deltas, *vs, *extra)

        r = f(zeros)
        jacs = jax.jacfwd(f)(tuple(zeros))
        return r, jacs

    m_args = (block.measurement,) if block.measurement is not None else ()
    r, jacs = jax.vmap(per_factor)(*vals, *m_args)
    return r, list(jacs)


def _linearize_dense(problem: Problem, values_tuple, dtype):
    """Dense Hessian [D, D], gradient [D], cost — one pass over blocks."""
    gv = {g.name: v for g, v in zip(problem.groups, values_tuple)}
    offsets, total = problem.layout()
    groups = {g.name: g for g in problem.groups}
    h = jnp.zeros((total, total), dtype=dtype)
    grad = jnp.zeros((total,), dtype=dtype)
    cost = 0.0

    for block in problem.factors:
        r, jacs = _block_jacobians(problem, block, gv)
        wr, e2, val, w = _weighted(block, r)
        cost = cost + 0.5 * jnp.sum(val)
        # zero Jacobian columns of fixed variables
        for k, gname in enumerate(block.groups):
            g = groups[gname]
            fixed = g.fixed()[block.indices[:, k]]
            jacs[k] = jnp.where(fixed[:, None, None], 0.0, jacs[k])
        lam_j = [
            jacs[k]
            if block.information is None
            else jnp.einsum("fij,fjk->fik", block.information, jacs[k])
            for k in range(block.arity)
        ]
        for k_i, gname_i in enumerate(block.groups):
            g_i = groups[gname_i]
            ti = g_i.tdim
            rows = (
                offsets[gname_i]
                + block.indices[:, k_i] * ti
            )[:, None] + jnp.arange(ti)[None, :]
            g_contrib = w[:, None] * jnp.einsum("fri,fr->fi", jacs[k_i], wr)
            grad = grad.at[rows].add(g_contrib)
            for k_j, gname_j in enumerate(block.groups):
                g_j = groups[gname_j]
                tj = g_j.tdim
                cols = (
                    offsets[gname_j]
                    + block.indices[:, k_j] * tj
                )[:, None] + jnp.arange(tj)[None, :]
                blk = w[:, None, None] * jnp.einsum(
                    "fri,frj->fij", jacs[k_i], lam_j[k_j]
                )
                h = h.at[rows[:, :, None], cols[:, None, :]].add(blk)

    # fixed variables: unit diagonal, zero gradient
    fixed_diag = jnp.zeros((total,), dtype=bool)
    for g in problem.groups:
        off = offsets[g.name]
        idx = off + jnp.arange(g.num)[:, None] * g.tdim + jnp.arange(g.tdim)[None, :]
        fixed_diag = fixed_diag.at[idx].set(
            jnp.broadcast_to(g.fixed()[:, None], (g.num, g.tdim))
        )
    diag = jnp.diag(h)
    h = h + jnp.diag(jnp.where(fixed_diag & (diag == 0), 1.0, 0.0))
    grad = jnp.where(fixed_diag, 0.0, grad)
    return h, grad, cost, fixed_diag


def _add_damping(h, damping):
    """sparse.rs:34-42: diag += λ·max(|diag|, 1)."""
    d = jnp.diag(h)
    return h + jnp.diag(damping * jnp.maximum(jnp.abs(d), 1.0))


def _linearize_matfree(problem: Problem, values_tuple, dtype):
    """Linearize WITHOUT assembling H: returns (jac_cache, grad, cost,
    fixed_diag, diag_blocks). jac_cache holds per-block (jacs, w, wr);
    diag_blocks holds per-group [N, t, t] Hessian diagonal blocks (the
    block-Jacobi preconditioner data, sparse.rs:115). Memory is O(edges),
    never O(params²) — the path that makes 10k-pose graphs (30k params,
    a 7 GB dense H) feasible."""
    gv = {g.name: v for g, v in zip(problem.groups, values_tuple)}
    offsets, total = problem.layout()
    groups = {g.name: g for g in problem.groups}
    grad = jnp.zeros((total,), dtype=dtype)
    cost = 0.0
    diag_blocks = {
        g.name: jnp.zeros((g.num, g.tdim, g.tdim), dtype=dtype)
        for g in problem.groups
    }
    cache = []
    for block in problem.factors:
        r, jacs = _block_jacobians(problem, block, gv)
        wr, e2, val, w = _weighted(block, r)
        cost = cost + 0.5 * jnp.sum(val)
        for k, gname in enumerate(block.groups):
            fixed = groups[gname].fixed()[block.indices[:, k]]
            jacs[k] = jnp.where(fixed[:, None, None], 0.0, jacs[k])
        cache.append((tuple(jacs), w))
        for k_i, gname_i in enumerate(block.groups):
            g_i = groups[gname_i]
            ti = g_i.tdim
            rows = (offsets[gname_i] + block.indices[:, k_i] * ti)[:, None] \
                + jnp.arange(ti)[None, :]
            grad = grad.at[rows].add(
                w[:, None] * jnp.einsum("fri,fr->fi", jacs[k_i], wr))
            lam_jk = (jacs[k_i] if block.information is None else
                      jnp.einsum("fij,fjk->fik", block.information,
                                 jacs[k_i]))
            contrib = w[:, None, None] * jnp.einsum(
                "fri,frj->fij", jacs[k_i], lam_jk)
            diag_blocks[gname_i] = diag_blocks[gname_i].at[
                block.indices[:, k_i]].add(contrib)

    fixed_diag = jnp.zeros((total,), dtype=bool)
    for g in problem.groups:
        off = offsets[g.name]
        idx = off + jnp.arange(g.num)[:, None] * g.tdim \
            + jnp.arange(g.tdim)[None, :]
        fixed_diag = fixed_diag.at[idx].set(
            jnp.broadcast_to(g.fixed()[:, None], (g.num, g.tdim)))
        # fixed variables get identity diagonal blocks
        eye = jnp.eye(g.tdim, dtype=dtype)
        diag_blocks[g.name] = jnp.where(
            g.fixed()[:, None, None], eye[None], diag_blocks[g.name])
    grad = jnp.where(fixed_diag, 0.0, grad)
    return (tuple(cache), grad, cost, fixed_diag,
            tuple(diag_blocks[g.name] for g in problem.groups))


def _solve_matfree_pcg(problem: Problem, cache, grad, fixed_diag,
                       diag_blocks, damping, lm, max_iter, tol):
    """Matrix-free block-Jacobi PCG: H·v streams over the cached factor
    Jacobians (gather → J v → Λ → Jᵀ → scatter-add), the preconditioner is
    batched [N, t, t] SPD inverses of the damped diagonal blocks. Never
    materializes H (the TPU-native form of sparse.rs:115's
    BlockSparseHessian::pcg)."""
    offsets, total = problem.layout()
    dtype = grad.dtype

    # damped diagonal: diag += λ·max(|diag|, 1) (sparse.rs:34-42)
    damp_parts = []
    pre_inv = []
    for g, db in zip(problem.groups, diag_blocks):
        d = jnp.diagonal(db, axis1=-2, axis2=-1)  # [N, t]
        lam = (damping * jnp.maximum(jnp.abs(d), 1.0)) if lm \
            else jnp.zeros_like(d)
        damp_parts.append(lam.reshape(-1))
        dbd = db + jax.vmap(jnp.diag)(lam)
        pre_inv.append(inv_spd_small(dbd))
    damp_vec = jnp.concatenate(damp_parts)
    # fixed rows act as the identity
    damp_vec = jnp.where(fixed_diag, 1.0, damp_vec)

    def precond(r):
        outs = []
        for g, inv in zip(problem.groups, pre_inv):
            off = offsets[g.name]
            rg = r[off:off + g.num * g.tdim].reshape(g.num, g.tdim)
            outs.append(
                jnp.einsum("nij,nj->ni", inv, rg).reshape(-1))
        return jnp.concatenate(outs)

    def hvp(v):
        out = damp_vec * v
        for block, (jacs, w) in zip(problem.factors, cache):
            jv = None
            for k, gname in enumerate(block.groups):
                t = jacs[k].shape[-1]
                cols = (offsets[gname] + block.indices[:, k] * t)[:, None] \
                    + jnp.arange(t)[None, :]
                vg = v[cols]  # [F, t]
                term = jnp.einsum("frt,ft->fr", jacs[k], vg)
                jv = term if jv is None else jv + term
            lam_jv = (jv if block.information is None else
                      jnp.einsum("fij,fj->fi", block.information, jv))
            for k, gname in enumerate(block.groups):
                t = jacs[k].shape[-1]
                rows = (offsets[gname] + block.indices[:, k] * t)[:, None] \
                    + jnp.arange(t)[None, :]
                out = out.at[rows].add(
                    w[:, None] * jnp.einsum("fri,fr->fi", jacs[k], lam_jv))
        return out

    b = -grad

    def body(carry):
        x, r, z, p, k, rz = carry
        hp = hvp(p)
        alpha = rz / jnp.clip(p @ hp, 1e-300, None)
        x = x + alpha * p
        r = r - alpha * hp
        z = precond(r)
        rz_new = r @ z
        beta = rz_new / jnp.clip(rz, 1e-300, None)
        p = z + beta * p
        return x, r, z, p, k + 1, rz_new

    def cond(carry):
        _, r, _, _, k, _ = carry
        return (jnp.linalg.norm(r) > tol) & (k < max_iter)

    x0 = jnp.zeros((total,), dtype)
    z0 = precond(b)
    x, r, _, _, iters, _ = jax.lax.while_loop(
        cond, body, (x0, b, z0, z0, 0, b @ z0))
    return x, iters


def _solve_dense(h, grad, damping, lm):
    hd = _add_damping(h, damping) if lm else h
    return jnp.linalg.solve(hd, -grad), 1


def _solve_pcg(h, grad, damping, lm, groups_meta, max_iter, tol):
    """PCG with block-Jacobi preconditioner on the (damped) dense H.

    (The matrix-free variant streams factor arrays instead of H; with dense
    H already assembled the matvec is a single MXU matmul, which on TPU is
    the faster choice up to ~30k params.)
    """
    hd = _add_damping(h, damping) if lm else h
    # block-Jacobi: invert per-variable diagonal blocks
    pre = jnp.zeros_like(h)
    for off, num, tdim in groups_meta:
        idx = off + jnp.arange(num)[:, None] * tdim + jnp.arange(tdim)[None, :]
        blocks = hd[idx[:, :, None], idx[:, None, :]]  # [N, t, t]
        inv = inv_spd_small(blocks)
        pre = pre.at[idx[:, :, None], idx[:, None, :]].set(inv)

    b = -grad

    def body(carry):
        x, r, z, p, k, rz = carry
        hp = hd @ p
        alpha = rz / jnp.clip(p @ hp, 1e-300, None)
        x = x + alpha * p
        r = r - alpha * hp
        z = pre @ r
        rz_new = r @ z
        beta = rz_new / jnp.clip(rz, 1e-300, None)
        p = z + beta * p
        return x, r, z, p, k + 1, rz_new

    def cond(carry):
        _, r, _, _, k, _ = carry
        return (jnp.linalg.norm(r) > tol) & (k < max_iter)

    x0 = jnp.zeros_like(b)
    z0 = pre @ b
    x, r, _, _, iters, _ = jax.lax.while_loop(
        cond, body, (x0, b, z0, z0, 0, b @ z0)
    )
    return x, iters


def _reduced_solve(s, rhs, reduced_solver):
    """Retained-system solve for the Schur path."""
    use_pallas = reduced_solver == "pallas_chol" or (
        reduced_solver == "auto"
        and s.shape[0] >= 1024
        and s.dtype == jnp.float32
        and jax.devices()[0].platform not in ("cpu",)
    )
    if use_pallas:
        from rust_robotics_tpu.ops.cholesky_pallas import (
            cholesky_solve_pallas,
        )

        return cholesky_solve_pallas(s, rhs)
    return jnp.linalg.solve(s, rhs)


def _solve_schur(h, grad, damping, lm, retained_dim, elim_meta,
                 reduced_solver="auto"):
    """Eliminate the trailing group (block-diagonal [N, t, t] inverses), then
    dense-solve the retained system (sparse.rs:160 semantics)."""
    hd = _add_damping(h, damping) if lm else h
    dr = retained_dim
    num, tdim = elim_meta
    h_rr = hd[:dr, :dr]
    h_rl = hd[:dr, dr:]
    h_ll = hd[dr:, dr:]
    g_r = grad[:dr]
    g_l = grad[dr:]
    blocks = h_ll.reshape(num, tdim, num, tdim)
    diag_blocks = blocks[jnp.arange(num), :, jnp.arange(num), :]  # [N, t, t]
    inv = inv_spd_small(diag_blocks)
    # H_ll^{-1} acting as block-diag
    def ll_inv_mul(v):
        return (inv @ v.reshape(num, tdim, -1)).reshape(num * tdim, -1)

    s = h_rr - h_rl @ ll_inv_mul(h_rl.T)
    rhs = -g_r + (h_rl @ ll_inv_mul(g_l[:, None]))[:, 0]
    dx_r = _reduced_solve(s, rhs, reduced_solver)
    dx_l = ll_inv_mul((-g_l - h_rl.T @ dx_r)[:, None])[:, 0]
    return jnp.concatenate([dx_r, dx_l]), 1


def _apply_increment(problem: Problem, values_tuple, delta):
    offsets, _ = problem.layout()
    new_values = []
    for g, v in zip(problem.groups, values_tuple):
        off = offsets[g.name]
        d = delta[off : off + g.num * g.tdim].reshape(g.num, g.tdim)
        d = jnp.where(g.fixed()[:, None], 0.0, d)
        new_values.append(jax.vmap(g.retract)(v, d))
    return tuple(new_values)


def solve(problem: Problem, config: SolverConfig = SolverConfig()):
    """Run the solver; returns (solved Problem, SolverSummary).

    Host-side LM loop with jitted linearize/solve/cost (matches the
    reference's termination semantics, solver.rs:81-188).
    """
    values = problem.values()
    dtype = values[0].dtype
    offsets, total = problem.layout()
    if total == 0:
        c = float(problem_cost(problem, values))
        return problem, SolverSummary(c, c, 0, 0, "gradient_converged", 0)

    groups_meta = tuple(
        (offsets[g.name], g.num, g.tdim) for g in problem.groups
    )
    lm = config.method == "lm"
    if config.linear_solver == "schur":
        elim = problem.groups[-1]
        retained_dim = total - elim.num * elim.tdim
        elim_meta = (elim.num, elim.tdim)

    matfree = config.linear_solver == "matfree_pcg"

    @jax.jit
    def linearize(vals):
        if matfree:
            cache, grad, cost, fixed, diag = _linearize_matfree(
                problem, vals, dtype)
            return (cache, fixed, diag), grad
        h, grad, _, _ = _linearize_dense(problem, vals, dtype)
        return h, grad

    @jax.jit
    def lin_solve(lin_state, grad, damping):
        if matfree:
            cache, fixed, diag = lin_state
            return _solve_matfree_pcg(
                problem, cache, grad, fixed, diag, damping, lm,
                config.pcg_max_iterations, config.pcg_tolerance,
            )
        h = lin_state
        if config.linear_solver == "dense":
            return _solve_dense(h, grad, damping, lm)
        if config.linear_solver == "pcg":
            return _solve_pcg(
                h, grad, damping, lm, groups_meta,
                config.pcg_max_iterations, config.pcg_tolerance,
            )
        if config.linear_solver == "schur":
            return _solve_schur(h, grad, damping, lm, retained_dim, elim_meta,
                                config.reduced_solver)
        raise ValueError(config.linear_solver)

    @jax.jit
    def cost_fn(vals):
        return problem_cost(problem, vals)

    @jax.jit
    def apply_fn(vals, delta):
        return _apply_increment(problem, vals, delta)

    initial_cost = float(cost_fn(values))
    current_cost = initial_cost
    damping = config.initial_damping
    accepted = 0
    total_linear = 0
    termination = "max_iterations"
    it = 0

    for it in range(config.max_iterations):
        lin_state, grad = linearize(values)
        if float(jnp.max(jnp.abs(grad))) <= config.gradient_tolerance:
            termination = "gradient_converged"
            break
        delta, lin_iters = lin_solve(lin_state, grad, damping)
        total_linear += int(lin_iters)
        if not bool(jnp.all(jnp.isfinite(delta))):
            raise FloatingPointError("non-finite increment")
        if float(jnp.linalg.norm(delta)) <= config.step_tolerance:
            termination = "step_converged"
            it += 1
            break
        trial = apply_fn(values, delta)
        trial_cost = float(cost_fn(trial))
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


_DEVICE_TERMINATION = {0: "max_iterations", 1: "gradient_converged",
                       2: "step_converged", 3: "cost_converged",
                       4: "numerical_failure"}


def solve_device(problem: Problem, config: SolverConfig = SolverConfig()):
    """Fully device-resident LM: the WHOLE outer loop is one
    `lax.while_loop` — linearize, linear solve (dense or matfree-PCG),
    trial, accept/reject and termination all on device, one host
    transfer at the end (VERDICT r02 #1: no per-iteration host syncs).

    Semantics mirror `solve` (solver.rs:81-188) except that the f64 host
    comparisons become on-device scalars of the problem dtype. Supported
    linear solvers: "dense", "matfree_pcg" (chain-structured problems
    should use nlls/tridiag.py instead — direct solve, no Krylov loop).
    Returns (solved Problem, SolverSummary of concrete Python scalars).
    """
    values = problem.values()
    dtype = values[0].dtype
    offsets, total = problem.layout()
    if total == 0:
        c = float(problem_cost(problem, values))
        return problem, SolverSummary(c, c, 0, 0, "gradient_converged", 0)
    if config.linear_solver not in ("dense", "matfree_pcg"):
        raise ValueError(
            f"solve_device supports dense|matfree_pcg, "
            f"got {config.linear_solver!r}")
    matfree = config.linear_solver == "matfree_pcg"
    lm = config.method == "lm"

    def lin_and_solve(vals, damping):
        if matfree:
            cache, grad, _, fixed, diag = _linearize_matfree(
                problem, vals, dtype)
            delta, iters = _solve_matfree_pcg(
                problem, cache, grad, fixed, diag, damping, lm,
                config.pcg_max_iterations, config.pcg_tolerance)
        else:
            h, grad, _, _ = _linearize_dense(problem, vals, dtype)
            delta, iters = _solve_dense(h, grad, damping, lm)
        return grad, delta, iters

    @jax.jit
    def run(values):
        cost0 = problem_cost(problem, values)

        def body(carry):
            vals, damping, cost, it, accepted, lin_tot, term, done = carry
            grad, delta, lin_iters = lin_and_solve(vals, damping)
            grad_conv = jnp.max(jnp.abs(grad)) <= config.gradient_tolerance
            bad = ~jnp.all(jnp.isfinite(delta))
            step_conv = jnp.linalg.norm(delta) <= config.step_tolerance
            trial = _apply_increment(problem, vals, delta)
            trial_cost = problem_cost(problem, trial)
            accept = ((~grad_conv) & (~step_conv) & (~bad)
                      & ((config.method == "gn") | (trial_cost < cost)))
            change = jnp.abs(cost - trial_cost)
            cost_conv = accept & (change <= config.cost_tolerance)
            new_vals = jax.tree_util.tree_map(
                lambda t, v: jnp.where(accept, t, v), trial, vals)
            new_cost = jnp.where(accept, trial_cost, cost)
            new_damping = jnp.where(
                accept, jnp.maximum(damping * 0.3, 1e-15),
                jnp.minimum(damping * 10.0, 1e15))
            new_damping = jnp.where(grad_conv | step_conv | bad, damping,
                                    new_damping)
            term = jnp.where(
                grad_conv, 1,
                jnp.where(bad, 4,
                          jnp.where(step_conv, 2,
                                    jnp.where(cost_conv, 3, 0)))
            ).astype(jnp.int32)
            done = grad_conv | step_conv | cost_conv | bad
            return (new_vals, new_damping, new_cost, it + 1,
                    accepted + accept.astype(jnp.int32),
                    lin_tot + jnp.asarray(lin_iters, jnp.int32), term,
                    done)

        def cond(carry):
            _, _, _, it, _, _, _, done = carry
            return (~done) & (it < config.max_iterations)

        init = (values, jnp.asarray(config.initial_damping, dtype), cost0,
                jnp.asarray(0, jnp.int32), jnp.asarray(0, jnp.int32),
                jnp.asarray(0, jnp.int32), jnp.asarray(0, jnp.int32),
                jnp.asarray(False))
        vals, _, cost, it, accepted, lin_tot, term, _ = jax.lax.while_loop(
            cond, body, init)
        return vals, cost0, cost, it, accepted, lin_tot, term

    vals, cost0, cost, it, accepted, lin_tot, term = run(values)
    return problem.with_values(vals), SolverSummary(
        float(cost0), float(cost), int(it), int(accepted),
        _DEVICE_TERMINATION[int(term)], int(lin_tot),
    )
