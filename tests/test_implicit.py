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


def _solve_chain_direct(meas, initial, ef, et, info, max_iterations=40):
    from rust_robotics_tpu.slam.pose_graph import optimize_pose_graph_2d

    return optimize_pose_graph_2d(
        jnp.asarray(initial), ef, et, jnp.asarray(meas),
        jnp.asarray(info), max_iterations=max_iterations,
        tolerance=1e-12, linear_solver="chain_direct")


@pytest.mark.slow
def test_chain_implicit_matches_finite_difference():
    """The structure-exploiting IFT (block-tridiag + streamed Woodbury,
    VERDICT r3 #3) FD-pinned on a small chain+loops graph."""
    from rust_robotics_tpu.nlls.implicit import pose_graph_implicit_vjp

    truth, initial, ef, et, meas, info = synthesize_chain(12)
    # add a couple of loop closures so the Woodbury branch is exercised
    from rust_robotics_tpu.demos.pose_graph_bench import relative
    ef = np.concatenate([ef, [0, 4]])
    et = np.concatenate([et, [7, 11]])
    meas = np.concatenate(
        [meas, [relative(truth[0], truth[7]),
                relative(truth[4], truth[11])]])
    info = np.concatenate([info, [np.eye(3) * 20.0] * 2])

    poses, _ = _solve_chain_direct(meas, initial, ef, et, info)

    def loss_fn(poses):
        return jnp.sum(poses[-1] ** 2)

    loss, g = pose_graph_implicit_vjp(poses, ef, et, meas, info, loss_fn)
    assert g.shape == meas.shape
    assert np.all(np.isfinite(g))

    eps = 1e-6
    checks = [(0, 0), (5, 1), (10, 2), (11, 0), (12, 1)]  # incl. a loop
    for e, k in checks:
        m2 = meas.copy()
        m2[e, k] += eps
        p2, _ = _solve_chain_direct(m2, initial, ef, et, info)
        m3 = meas.copy()
        m3[e, k] -= eps
        p3, _ = _solve_chain_direct(m3, initial, ef, et, info)
        fd = (float(loss_fn(jnp.asarray(p2)))
              - float(loss_fn(jnp.asarray(p3)))) / (2 * eps)
        np.testing.assert_allclose(g[e, k], fd, rtol=5e-4, atol=1e-7)


@pytest.mark.slow
def test_chain_implicit_matches_dense_ift():
    """chain_implicit_vjp must agree with the dense implicit_vjp
    (hessian='gauss_newton') on the same solved problem."""
    from rust_robotics_tpu.nlls.implicit import pose_graph_implicit_vjp

    truth, initial, ef, et, meas, info = synthesize_chain(30)
    solved, _ = _solve_chain(meas, initial, ef, et, info)

    def loss_tuple(values_tuple):
        return jnp.sum(values_tuple[0][-1] ** 2)

    _, grads_dense = implicit_vjp(solved, loss_tuple,
                                  hessian="gauss_newton")
    poses_sol = solved.groups[0].values

    def loss_poses(poses):
        return jnp.sum(poses[-1] ** 2)

    _, g_chain = pose_graph_implicit_vjp(poses_sol, ef, et, meas, info,
                                         loss_poses)
    np.testing.assert_allclose(g_chain, np.asarray(grads_dense[0]),
                               rtol=1e-4, atol=1e-8)


def _solve_banded_direct(meas, initial, ef, et, info, max_iterations=40):
    from rust_robotics_tpu.slam.pose_graph import optimize_pose_graph_2d

    return optimize_pose_graph_2d(
        jnp.asarray(initial), ef, et, jnp.asarray(meas),
        jnp.asarray(info), max_iterations=max_iterations,
        tolerance=1e-12, linear_solver="banded_direct")


@pytest.mark.slow
def test_banded_implicit_matches_finite_difference():
    """IFT through the GENERAL-graph banded solver (VERDICT r4 #1):
    FD-pinned on a small grid graph with NO odometry chain, including
    out-of-band (Woodbury) closure edges."""
    from rust_robotics_tpu.demos.pose_graph_bench import synthesize_grid
    from rust_robotics_tpu.nlls.implicit import pose_graph_implicit_vjp
    from rust_robotics_tpu.nlls.tridiag import has_full_chain

    truth, initial, ef, et, meas, info = synthesize_grid(5, 4, 2)
    assert not has_full_chain(truth.shape[0], ef, et)
    poses, _ = _solve_banded_direct(meas, initial, ef, et, info)

    def loss_fn(poses):
        return jnp.sum(poses[-1] ** 2)

    loss, g = pose_graph_implicit_vjp(poses, ef, et, meas, info, loss_fn)
    assert g.shape == meas.shape
    assert np.all(np.isfinite(g))

    eps = 1e-6
    # a horizontal edge, a vertical edge, and both long closures
    checks = [(0, 0), (7, 1), (20, 2), (len(ef) - 2, 0), (len(ef) - 1, 1)]
    for e, k in checks:
        m2 = meas.copy()
        m2[e, k] += eps
        p2, _ = _solve_banded_direct(m2, initial, ef, et, info)
        m3 = meas.copy()
        m3[e, k] -= eps
        p3, _ = _solve_banded_direct(m3, initial, ef, et, info)
        fd = (float(loss_fn(jnp.asarray(p2)))
              - float(loss_fn(jnp.asarray(p3)))) / (2 * eps)
        np.testing.assert_allclose(g[e, k], fd, rtol=5e-4, atol=1e-7)


@pytest.mark.slow
def test_banded_implicit_matches_dense_ift():
    """banded IFT must agree with the dense GN implicit_vjp on the same
    solved grid problem (the chain test's idiom, non-chain topology)."""
    from rust_robotics_tpu.demos.pose_graph_bench import synthesize_grid
    from rust_robotics_tpu.nlls.implicit import pose_graph_implicit_vjp

    truth, initial, ef, et, meas, info = synthesize_grid(6, 5, 3)
    prob = build_pose_graph_2d(jnp.asarray(initial), ef, et,
                               jnp.asarray(meas), jnp.asarray(info))
    cfg = SolverConfig(method="lm", max_iterations=40,
                       gradient_tolerance=1e-12, step_tolerance=1e-12,
                       cost_tolerance=1e-14)
    solved, _ = solve(prob, cfg)

    def loss_tuple(values_tuple):
        return jnp.sum(values_tuple[0][-1] ** 2)

    _, grads_dense = implicit_vjp(solved, loss_tuple,
                                  hessian="gauss_newton")
    poses_sol = solved.groups[0].values

    def loss_poses(poses):
        return jnp.sum(poses[-1] ** 2)

    _, g_banded = pose_graph_implicit_vjp(poses_sol, ef, et, meas, info,
                                          loss_poses)
    np.testing.assert_allclose(g_banded, np.asarray(grads_dense[0]),
                               rtol=1e-4, atol=1e-8)


@pytest.mark.slow
def test_banded_implicit_grid_10k_scale():
    """d(final-pose loss)/d(ALL measurements) on the 10k-pose 100x100
    GRID graph — the round-4 flagship topology, now differentiable
    (VERDICT r4 #1 'done' criterion). Dense IFT would need a 30k^2
    Hessian; the banded path reuses the fat-block ladder."""
    from rust_robotics_tpu.demos.pose_graph_bench import synthesize_grid
    from rust_robotics_tpu.nlls.implicit import pose_graph_implicit_vjp

    truth, initial, ef, et, meas, info = synthesize_grid(100, 100, 50)
    poses, summ = _solve_banded_direct(meas, initial, ef, et, info,
                                       max_iterations=15)

    def loss_fn(poses):
        # nonzero AT the optimum (the exact-measurement grid converges
        # to truth, so a loss against truth would have a ~0 gradient)
        return jnp.sum(poses[-1] ** 2)

    loss, g = pose_graph_implicit_vjp(poses, ef, et, meas, info, loss_fn)
    assert g.shape == meas.shape
    assert np.all(np.isfinite(g))
    # an edge incident to the final pose moves the loss directly: the
    # gradient there must be materially nonzero
    touching = np.nonzero((np.asarray(et) == truth.shape[0] - 1))[0]
    assert np.max(np.abs(g[touching])) > 1e-8


@pytest.mark.slow
def test_chain_implicit_10k_scale():
    """d(final-pose loss)/d(ALL 10k odometry + loop measurements) — the
    scale the README advertises. Dense IFT would need a 30k^2 Hessian;
    the chain path is O(n). Runs in seconds (CPU slow tier; ~1 s-class
    on the TPU)."""
    from rust_robotics_tpu.nlls.implicit import pose_graph_implicit_vjp

    truth, initial, ef, et, meas, info = synthesize_chain(10000)
    poses, summ = _solve_chain_direct(meas, initial, ef, et, info,
                                      max_iterations=15)

    def loss_fn(poses):
        return jnp.sum((poses[-1] - jnp.asarray(truth[-1],
                                                poses.dtype)) ** 2)

    loss, g = pose_graph_implicit_vjp(poses, ef, et, meas, info, loss_fn)
    assert g.shape == meas.shape
    assert np.all(np.isfinite(g))
    # the final edge's longitudinal component moves the final pose
    # directly: the gradient there must be materially nonzero
    assert abs(g[9998, 0]) > 1e-8 or abs(g[9998, 1]) > 1e-8
