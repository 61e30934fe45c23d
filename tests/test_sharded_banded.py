"""Mesh-sharded general-graph solver (parallel/sharded_banded): the
fat-block SPIKE solve injected into solve_banded_lm, pinned against the
single-device oracle on the virtual 8-device mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from rust_robotics_tpu.demos.pose_graph_bench import rmse, synthesize_grid
from rust_robotics_tpu.nlls.banded import solve_general_graph
from rust_robotics_tpu.parallel.sharded_banded import (
    make_sharded_fat_tridiag_solver,
    solve_general_graph_sharded,
)
from rust_robotics_tpu.slam.pose_graph import se2_edge_residual, se2_retract


def _mesh(n=8):
    return Mesh(np.asarray(jax.devices()[:n]), ("data",))


def test_sharded_fat_tridiag_matches_serial():
    """The SPIKE fat-block solve alone vs the serial ladder, including a
    supernode count that does NOT divide the device count."""
    from rust_robotics_tpu.nlls.tridiag import block_tridiag_solve

    rng = np.random.default_rng(3)
    for ns in (16, 13):
        dd, r = 24, 3
        a = rng.normal(0, 0.3, (ns, dd, dd))
        diag = jnp.asarray(a @ np.swapaxes(a, 1, 2) + 6 * np.eye(dd),
                           jnp.float64)
        upper = jnp.asarray(rng.normal(0, 0.2, (ns - 1, dd, dd)))
        rhs = jnp.asarray(rng.normal(0, 1, (ns, dd, r)))
        want = block_tridiag_solve(diag, upper, rhs)
        got = make_sharded_fat_tridiag_solver(_mesh(), "data")(
            diag, upper, rhs)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-8, atol=1e-8)


def test_sharded_banded_grid_matches_oracle():
    """Full LM on a grid graph with the sharded fat solve vs the
    single-device solve_general_graph."""
    truth, initial, ef, et, meas, info = synthesize_grid(9, 8, 4)
    fixed = np.zeros((truth.shape[0],), bool)
    fixed[0] = True
    kw = dict(residual_fn=se2_edge_residual, retract_fn=se2_retract,
              tdim=3, max_iterations=15, tolerance=1e-9)
    oracle, summ_o, _ = solve_general_graph(
        jnp.asarray(initial), ef, et, meas, info, fixed, **kw)
    sharded, summ_s, _ = solve_general_graph_sharded(
        jnp.asarray(initial), ef, et, meas, info, fixed, _mesh(), "data",
        **kw)
    assert int(summ_s.iterations) == int(summ_o.iterations)
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(oracle),
                               atol=1e-6)
    assert rmse(np.asarray(sharded), truth) < 1e-6
