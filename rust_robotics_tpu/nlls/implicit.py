"""Implicit-function-theorem gradients THROUGH the NLLS solve.

North-star requirement (README.md:40-44, SURVEY.md §7.2 M5): the solver's
output must be differentiable w.r.t. the problem data (measurements,
priors) — the reference has no gradient story at all
(rust_robotics_optimization/src/solver.rs is a pure value iteration), so
this surface is TPU-native by design.

Math: at a (local) optimum θ* of F(θ, m), the stationarity condition
g(θ*, m) = ∇_θ F = 0 defines θ*(m) implicitly, and

    dθ*/dm = -H⁻¹ · ∂g/∂m,      H = ∇²_θ F(θ*, m).

For a loss L(θ*) the VJP is therefore

    dL/dm = -(∂g/∂m)ᵀ · w,      H w = ∇_θ L(θ*),

— one extra linear solve with the SAME Gauss-Newton Hessian the solver
already builds (the GN approximation of H is exact at zero residual and
standard elsewhere; finite-difference agreement is pinned by
tests/test_implicit.py). Everything here is plain jax: `∂g/∂m`ᵀ·w comes
from one `jax.vjp` of the tangent-space gradient function, and manifolds
are handled by evaluating gradients w.r.t. the retraction tangent at δ=0,
exactly as the solver linearizes.

This avoids differentiating THROUGH the LM iteration (which runs on host
with data-dependent control flow): the forward solve runs as-is, the
backward pass needs only the converged solution.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from rust_robotics_tpu.nlls.problem import Problem
from rust_robotics_tpu.nlls.solver import (
    SolverConfig,
    _linearize_dense,
    solve,
)


def _retract_all(problem: Problem, values_tuple, delta_flat):
    """Apply a flat tangent increment through each group's retraction."""
    offsets, _ = problem.layout()
    out = []
    for g, v in zip(problem.groups, values_tuple):
        off = offsets[g.name]
        d = delta_flat[off:off + g.num * g.tdim].reshape(g.num, g.tdim)
        d = jnp.where(g.fixed()[:, None], 0.0, d)
        out.append(jax.vmap(g.retract)(v, d))
    return tuple(out)


def _cost_with_measurements(problem: Problem, values_tuple, meas_list):
    """Total cost with the measurement arrays of each block substituted
    (robust kernels included, solver.rs:274 semantics)."""
    gv = {g.name: v for g, v in zip(problem.groups, values_tuple)}
    cost = 0.0
    for block, m in zip(problem.factors, meas_list):
        vals = [gv[g][block.indices[:, k]]
                for k, g in enumerate(block.groups)]
        if m is None:
            r = jax.vmap(block.residual)(*vals)
        else:
            r = jax.vmap(block.residual)(*vals, m)
        wr = r if block.information is None else jnp.einsum(
            "fij,fj->fi", block.information, r)
        e2 = jnp.sum(r * wr, axis=-1)
        val, _ = block.robust.evaluate(e2)
        cost = cost + 0.5 * jnp.sum(val)
    return cost


def implicit_vjp(problem: Problem, loss_fn, hessian: str = "exact"):
    """Gradients of `loss_fn(values_tuple)` at the solution w.r.t. each
    factor block's measurements.

    problem: an ALREADY SOLVED Problem (values at the optimum — run
    `solve` first). loss_fn maps the values tuple to a scalar.

    hessian: "exact" (jax.hessian of the cost — the true IFT; needed for
    finite-difference-grade accuracy when residuals at the optimum are
    NOT near zero, since GN drops the ∂J·r curvature term) or
    "gauss_newton" (the solver's JᵀΛJ — cheaper at scale, exact only at
    zero residual).

    Returns (loss, grads) where grads is a list aligned with
    problem.factors: dL/d(measurement) arrays (None where a block has no
    measurement).
    """
    values = problem.values()
    dtype = values[0].dtype
    offsets, total = problem.layout()
    meas = [b.measurement for b in problem.factors]

    # u = tangent-space gradient of the loss at θ*
    def loss_of_delta(delta):
        return loss_fn(_retract_all(problem, values, delta))

    zero = jnp.zeros((total,), dtype)
    loss, u = jax.value_and_grad(loss_of_delta)(zero)

    # H w = u (fixed rows forced to identity)
    _, _, _, fixed_diag = _linearize_dense(problem, values, dtype)
    if hessian == "exact":
        def cost_of_delta(delta):
            vals = _retract_all(problem, values, delta)
            return _cost_with_measurements(problem, vals, meas)

        h = jax.hessian(cost_of_delta)(zero)
        h = jnp.where(fixed_diag[:, None] | fixed_diag[None, :], 0.0, h)
        h = h + jnp.diag(fixed_diag.astype(dtype))
    else:
        h, _, _, _ = _linearize_dense(problem, values, dtype)
    w = jnp.linalg.solve(h, u)
    w = jnp.where(fixed_diag, 0.0, w)

    # dL/dm = -(∂g/∂m)ᵀ w via one vjp of the tangent gradient in m
    def tangent_grad(meas_list):
        def cost_of_delta(delta):
            vals = _retract_all(problem, values, delta)
            return _cost_with_measurements(problem, vals, meas_list)

        return jax.grad(cost_of_delta)(zero)

    _, pullback = jax.vjp(tangent_grad, meas)
    (dm,) = pullback(-w)
    return loss, list(dm)


def solve_implicit(problem: Problem, loss_fn,
                   config: SolverConfig = SolverConfig()):
    """Solve, then return (solved_problem, loss, measurement_grads) — the
    one-call form of `solve` + `implicit_vjp`."""
    solved, summary = solve(problem, config)
    loss, grads = implicit_vjp(solved, loss_fn)
    return solved, summary, loss, grads
