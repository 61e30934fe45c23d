"""IFT gradients through the sharded SPIKE chain solve
(parallel/sharded_tridiag.py::make_sharded_chain_ift) vs the
single-device chain_implicit_vjp oracle (itself FD-pinned in
tests/test_implicit.py). Runs on the virtual 8-device CPU mesh
(conftest). Closes the last clause of VERDICT r4 weak #1."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from rust_robotics_tpu.demos.pose_graph_bench import synthesize_chain
from rust_robotics_tpu.nlls.implicit import chain_implicit_vjp
from rust_robotics_tpu.nlls.tridiag import (
    classify_chain_edges,
    solve_chain_lm,
)
from rust_robotics_tpu.parallel.sharded_tridiag import (
    make_sharded_chain_ift,
    make_sharded_chain_solver,
)
from rust_robotics_tpu.slam.pose_graph import se2_edge_residual, se2_retract


def _mesh(n_dev=8):
    return Mesh(np.asarray(jax.devices()[:n_dev]), ("data",))


def _problem(size=96, loop_stride=16):
    truth, initial, ef, et, meas, info = synthesize_chain(
        size, loop_stride=loop_stride)
    c_meas, c_info, lf, lt, l_meas, l_info = classify_chain_edges(
        size, ef, et, meas, info)
    f = jnp.result_type(float)
    fixed = jnp.zeros((size,), bool).at[0].set(True)
    args = (jnp.asarray(c_meas, f),
            None if c_info is None else jnp.asarray(c_info, f),
            jnp.asarray(lf, jnp.int32), jnp.asarray(lt, jnp.int32),
            jnp.asarray(l_meas, f),
            None if l_info is None else jnp.asarray(l_info, f), fixed)
    return jnp.asarray(initial, f), jnp.asarray(truth, f), args


def loss_fn_of(truth):
    def loss_fn(values):
        return jnp.sum((values[:, :2] - truth[:, :2]) ** 2)
    return loss_fn


def test_sharded_ift_matches_chain_oracle():
    initial, truth, args = _problem()
    c_meas, c_info, lf, lt, l_meas, l_info, fixed = args
    solved, _ = solve_chain_lm(
        initial, *args, residual_fn=se2_edge_residual,
        retract_fn=se2_retract, tdim=3, max_iterations=30)
    loss_fn = loss_fn_of(truth)

    want_loss, want_dc, want_dl = chain_implicit_vjp(
        solved, c_meas, c_info, lf, lt, l_meas, l_info, fixed, loss_fn,
        residual_fn=se2_edge_residual, retract_fn=se2_retract, tdim=3)

    mesh = _mesh()
    ift = make_sharded_chain_ift(
        mesh, "data", residual_fn=se2_edge_residual,
        retract_fn=se2_retract, tdim=3, loss_fn=loss_fn)
    got_loss, got_dc, got_dl = ift(solved, *args)

    np.testing.assert_allclose(float(got_loss), float(want_loss),
                               rtol=1e-10)
    np.testing.assert_allclose(np.asarray(got_dc), np.asarray(want_dc),
                               rtol=1e-6, atol=1e-9)
    np.testing.assert_allclose(np.asarray(got_dl), np.asarray(want_dl),
                               rtol=1e-6, atol=1e-9)


def test_sharded_ift_no_loops_and_padding():
    """num_l = 0 branch AND a size (97) that does not divide the 8-device
    mesh — the padding contract must not leak into the gradients."""
    initial, truth, args = _problem(size=97, loop_stride=200)
    c_meas, c_info, lf, lt, l_meas, l_info, fixed = args
    assert lf.shape[0] == 0
    solved, _ = solve_chain_lm(
        initial, *args, residual_fn=se2_edge_residual,
        retract_fn=se2_retract, tdim=3, max_iterations=30)
    loss_fn = loss_fn_of(truth)
    want_loss, want_dc, _ = chain_implicit_vjp(
        solved, c_meas, c_info, lf, lt, l_meas, l_info, fixed, loss_fn,
        residual_fn=se2_edge_residual, retract_fn=se2_retract, tdim=3)

    ift = make_sharded_chain_ift(
        _mesh(), "data", residual_fn=se2_edge_residual,
        retract_fn=se2_retract, tdim=3, loss_fn=loss_fn)
    got_loss, got_dc, got_dl = ift(solved, *args)
    np.testing.assert_allclose(float(got_loss), float(want_loss),
                               rtol=1e-10)
    np.testing.assert_allclose(np.asarray(got_dc), np.asarray(want_dc),
                               rtol=1e-6, atol=1e-9)
    assert got_dl.shape[0] == 0


def test_sharded_forward_then_ift_end_to_end():
    """The full differentiable pipeline across the mesh: sharded SPIKE
    forward solve -> sharded IFT backward, no single-device solver in
    the loop."""
    initial, truth, args = _problem(size=64, loop_stride=16)
    mesh = _mesh()
    solve = make_sharded_chain_solver(
        mesh, "data", residual_fn=se2_edge_residual,
        retract_fn=se2_retract, tdim=3, max_iterations=30)
    solved, summary = solve(initial, *args)
    # a loss NOT minimized at the solution (distance to a shifted
    # target), so the IFT gradient is non-degenerate
    loss_fn = loss_fn_of(truth + 0.1)
    ift = make_sharded_chain_ift(
        mesh, "data", residual_fn=se2_edge_residual,
        retract_fn=se2_retract, tdim=3, loss_fn=loss_fn)
    loss, d_c, d_l = ift(solved, *args)
    assert np.isfinite(float(loss))
    assert np.all(np.isfinite(np.asarray(d_c)))
    assert np.all(np.isfinite(np.asarray(d_l)))
    # finite-difference pin of the FULL sharded pipeline: directional
    # derivative of loss(solve(m + eps*v)) along a fixed direction v
    # must match <d_c, v> (f64, central difference)
    rng = np.random.default_rng(7)
    v = jnp.asarray(rng.normal(0, 1.0, np.asarray(args[0]).shape),
                    args[0].dtype)
    eps = 1e-6
    up, _ = solve(initial, args[0] + eps * v, *args[1:])
    dn, _ = solve(initial, args[0] - eps * v, *args[1:])
    fd = (float(loss_fn(up)) - float(loss_fn(dn))) / (2 * eps)
    got = float(jnp.sum(d_c * v))
    np.testing.assert_allclose(got, fd, rtol=2e-4)
