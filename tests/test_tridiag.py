"""Device-resident chain solver (nlls/tridiag.py): cyclic-reduction
block-tridiagonal solve + Woodbury loop closures + fused-while_loop LM.

Reference problem: benchmark_large_pose_graph.rs:19-97 (chain + loop
closures every 100 poses, RMSE gate 5e-3)."""

import jax.numpy as jnp
import numpy as np
import pytest

from rust_robotics_tpu.demos.pose_graph_bench import rmse, synthesize_chain
from rust_robotics_tpu.nlls.tridiag import (
    block_tridiag_solve,
    classify_chain_edges,
    inv_spd,
)
from rust_robotics_tpu.slam.pose_graph import optimize_pose_graph_2d


@pytest.mark.parametrize("n,d,r", [(1, 3, 2), (2, 3, 1), (5, 3, 4),
                                   (16, 3, 2), (37, 6, 3), (100, 4, 5)])
def test_block_tridiag_solve_matches_dense(n, d, r):
    rng = np.random.default_rng(0)
    b = rng.normal(size=(n, d, d))
    b = b @ b.transpose(0, 2, 1) + 5 * np.eye(d)
    c = 0.3 * rng.normal(size=(n - 1, d, d))
    f = rng.normal(size=(n, d, r))
    t = np.zeros((n * d, n * d))
    for i in range(n):
        t[i * d:(i + 1) * d, i * d:(i + 1) * d] = b[i]
    for i in range(n - 1):
        t[i * d:(i + 1) * d, (i + 1) * d:(i + 2) * d] = c[i]
        t[(i + 1) * d:(i + 2) * d, i * d:(i + 1) * d] = c[i].T
    expect = np.linalg.solve(t, f.reshape(n * d, r))
    got = np.asarray(block_tridiag_solve(
        jnp.asarray(b), jnp.asarray(c), jnp.asarray(f)))
    np.testing.assert_allclose(got.reshape(n * d, r), expect, atol=1e-8)


def test_inv_spd_six_dim():
    rng = np.random.default_rng(1)
    m = rng.normal(size=(7, 6, 6))
    m = m @ m.transpose(0, 2, 1) + 3 * np.eye(6)
    inv = np.asarray(inv_spd(jnp.asarray(m)))
    np.testing.assert_allclose(inv @ m, np.broadcast_to(np.eye(6), m.shape),
                               atol=1e-10)


def test_classify_chain_edges_splits_loops():
    truth, initial, ef, et, meas, info = synthesize_chain(300)
    (c_meas, c_info, l_ef, l_et, l_meas,
     l_info) = classify_chain_edges(300, ef, et, meas, info)
    assert c_meas.shape == (299, 3)
    assert l_ef.shape == (2,)  # loops at 0->100, 100->200
    assert np.all(l_et - l_ef == 100)


def test_classify_chain_edges_rejects_gaps():
    truth, initial, ef, et, meas, info = synthesize_chain(50)
    with pytest.raises(ValueError):
        classify_chain_edges(50, ef[:-5], et[:-5], meas[:-5], info[:-5])


def test_chain_direct_matches_dense_solver():
    """The device-resident chain LM reproduces the host dense-LM solution
    on the reference's 200-pose benchmark chain to machine precision."""
    truth, initial, ef, et, meas, info = synthesize_chain(200)
    dense, sd = optimize_pose_graph_2d(
        initial, ef, et, meas, info, max_iterations=25, tolerance=1e-8)
    chain, sc = optimize_pose_graph_2d(
        initial, ef, et, meas, info, max_iterations=25, tolerance=1e-8,
        linear_solver="chain_direct")
    np.testing.assert_allclose(np.asarray(chain), np.asarray(dense),
                               atol=1e-8)
    assert sc.termination == "gradient_converged"
    assert rmse(np.asarray(chain), truth) < 1e-5


def test_chain_direct_no_loop_closures():
    """Pure chain (L=0): the Woodbury branch is skipped entirely."""
    truth, initial, ef, et, meas, info = synthesize_chain(120)
    keep = np.asarray(et) - np.asarray(ef) == 1
    chain, summ = optimize_pose_graph_2d(
        initial, ef[keep], et[keep], meas[keep], info[keep],
        max_iterations=25, tolerance=1e-8, linear_solver="chain_direct")
    assert summ.final_cost < 1e-12
    assert rmse(np.asarray(chain), truth) < 1e-5


@pytest.mark.slow
def test_chain_direct_1000_reference_gate():
    truth, initial, ef, et, meas, info = synthesize_chain(1000)
    poses, summary = optimize_pose_graph_2d(
        initial, ef, et, meas, info, max_iterations=25, tolerance=1e-8,
        linear_solver="chain_direct")
    assert summary.termination != "max_iterations"
    assert rmse(np.asarray(poses), truth) < 5e-3
