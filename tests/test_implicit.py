"""IFT gradients through the NLLS solver (nlls/implicit.py) — pinned by
finite-difference agreement on a pose-graph problem (the north-star
differentiability surface; the reference solver has no gradient story)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rust_robotics_tpu.demos.pose_graph_bench import synthesize_chain
from rust_robotics_tpu.nlls import SolverConfig, solve
from rust_robotics_tpu.nlls.implicit import implicit_vjp, solve_implicit
from rust_robotics_tpu.slam.pose_graph import build_pose_graph_2d


def _solve_chain(meas, initial, ef, et, info):
    prob = build_pose_graph_2d(jnp.asarray(initial), ef, et,
                               jnp.asarray(meas), jnp.asarray(info))
    cfg = SolverConfig(method="lm", max_iterations=30,
                      gradient_tolerance=1e-12, step_tolerance=1e-12,
                      cost_tolerance=1e-14)
    return solve(prob, cfg)


@pytest.mark.slow
def test_implicit_grad_matches_finite_difference():
    truth, initial, ef, et, meas, info = synthesize_chain(12)
    solved, _ = _solve_chain(meas, initial, ef, et, info)

    def loss_fn(values_tuple):
        poses = values_tuple[0]
        return jnp.sum(poses[-1] ** 2)  # final-pose objective

    loss, grads = implicit_vjp(solved, loss_fn)
    g = np.asarray(grads[0])  # dL/d(edge measurements) [E, 3]
    assert g.shape == meas.shape
    assert np.all(np.isfinite(g))

    # finite differences: re-solve with a perturbed measurement
    eps = 1e-6
    rng = np.random.default_rng(0)
    for e, k in [(0, 0), (5, 1), (10, 2), (8, 0)]:
        m2 = meas.copy()
        m2[e, k] += eps
        solved2, _ = _solve_chain(m2, initial, ef, et, info)
        l2 = float(loss_fn(solved2.values()))
        m3 = meas.copy()
        m3[e, k] -= eps
        solved3, _ = _solve_chain(m3, initial, ef, et, info)
        l3 = float(loss_fn(solved3.values()))
        fd = (l2 - l3) / (2 * eps)
        np.testing.assert_allclose(g[e, k], fd, rtol=2e-4, atol=1e-8)


def test_solve_implicit_one_call():
    truth, initial, ef, et, meas, info = synthesize_chain(10)
    prob = build_pose_graph_2d(jnp.asarray(initial), ef, et,
                               jnp.asarray(meas), jnp.asarray(info))

    def loss_fn(values_tuple):
        return jnp.sum((values_tuple[0][-1] - jnp.asarray(truth[-1])) ** 2)

    solved, summary, loss, grads = solve_implicit(prob, loss_fn)
    assert summary.termination != "max_iterations"
    # converged to truth -> loss ~ 0 and gradient small but finite-shaped
    assert loss < 1e-8
    assert grads[0].shape == meas.shape
    assert bool(jnp.all(jnp.isfinite(grads[0])))
