"""Two-level (nested) chain solver parity (VERDICT r4 #6): closure
endpoints become separators, segment interiors are eliminated as one
vmapped batch, and the Woodbury rides the coarse ladder. Exactness is
the whole point — every test pins the nested path against the streamed
chain_woodbury_solve / solve_chain_lm reference to near machine eps."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rust_robotics_tpu.nlls.tridiag import (
    build_w_inv,
    chain_nested_solve,
    chain_woodbury_solve,
    classify_chain_edges,
    nested_partition,
    solve_chain_lm,
)


def _random_system(rng, n, t=3):
    a = rng.standard_normal((n, t, t)) * 0.3
    bd = jnp.asarray(np.einsum("nij,nkj->nik", a, a) + 4.0 * np.eye(t))
    c = jnp.asarray(rng.standard_normal((n - 1, t, t)) * 0.4)
    rhs = jnp.asarray(rng.standard_normal((n, t)))
    return bd, c, rhs


def _random_loops(rng, lf, lt, t=3, r=3):
    num_l = len(lf)
    ji = jnp.asarray(rng.standard_normal((num_l, r, t)))
    jj = jnp.asarray(rng.standard_normal((num_l, r, t)))
    s = rng.standard_normal((num_l, r, r)) * 0.3
    w = jnp.asarray(np.einsum("eij,ekj->eik", s, s) + 2.0 * np.eye(r))
    w_inv = build_w_inv(w, num_l, r, jnp.result_type(float))
    return (ji, jj), w, w_inv


def test_nested_matches_woodbury_mixed_topology():
    """Stride loops, overlapping long loops, duplicate endpoints, an
    adjacent (i, i+1) parallel edge, and endpoints at 0 / n-1."""
    rng = np.random.default_rng(0)
    n = 300
    bd, c, rhs = _random_system(rng, n)
    lf = np.array([0, 10, 40, 40, 100, 150, 17, 0], np.int32)
    lt = np.array([50, 110, 140, 41, 200, 299, 18, 299], np.int32)
    jac, w, w_inv = _random_loops(rng, lf, lt)
    x_ref = chain_woodbury_solve(bd, c, jac, jnp.asarray(lf),
                                 jnp.asarray(lt), w_inv, rhs, w_blocks=w)
    part = nested_partition(n, lf, lt)
    x_nest = chain_nested_solve(bd, c, jac, w_inv, rhs, part, w_blocks=w)
    rel = float(jnp.max(jnp.abs(x_ref - x_nest))
                / jnp.max(jnp.abs(x_ref)))
    assert rel < 1e-9, rel


def test_nested_randomized_sweep():
    """Random loop sets over random systems — the proptest idiom."""
    for seed in range(5):
        rng = np.random.default_rng(100 + seed)
        n = int(rng.integers(50, 400))
        bd, c, rhs = _random_system(rng, n)
        num_l = int(rng.integers(1, 12))
        lf = rng.integers(0, n - 1, num_l).astype(np.int32)
        lt = (lf + rng.integers(1, n, num_l)).astype(np.int32) % n
        swap = lt < lf
        lf2 = np.where(swap, lt, lf)
        lt2 = np.where(swap, lf, lt)
        keep = lt2 > lf2
        lf2, lt2 = lf2[keep], lt2[keep]
        if len(lf2) == 0:
            continue
        jac, w, w_inv = _random_loops(rng, lf2, lt2)
        x_ref = chain_woodbury_solve(bd, c, jac, jnp.asarray(lf2),
                                     jnp.asarray(lt2), w_inv, rhs,
                                     w_blocks=w)
        part = nested_partition(n, lf2, lt2)
        x_nest = chain_nested_solve(bd, c, jac, w_inv, rhs, part,
                                    w_blocks=w)
        rel = float(jnp.max(jnp.abs(x_ref - x_nest))
                    / jnp.max(jnp.abs(x_ref)))
        assert rel < 1e-8, (seed, n, rel)


def test_solve_chain_lm_nested_end_to_end():
    """Full LM on the reference benchmark chain: identical trajectory
    (iterations, cost, poses) with nested on vs off."""
    from rust_robotics_tpu.demos.pose_graph_bench import synthesize_chain
    from rust_robotics_tpu.slam.pose_graph import (
        se2_edge_residual,
        se2_retract,
    )

    size = 1200
    truth, initial, ef, et, meas, info = synthesize_chain(size)
    c_meas, c_info, l_ef, l_et, l_meas, l_info = classify_chain_edges(
        size, ef, et, meas, info)
    fixed = jnp.zeros((size,), bool).at[0].set(True)
    f = jnp.result_type(float)
    solve = functools.partial(
        solve_chain_lm, residual_fn=se2_edge_residual,
        retract_fn=se2_retract, tdim=3, max_iterations=20)
    args = (jnp.asarray(initial, f), jnp.asarray(c_meas, f),
            jnp.asarray(c_info, f), jnp.asarray(l_ef, jnp.int32),
            jnp.asarray(l_et, jnp.int32), jnp.asarray(l_meas, f),
            jnp.asarray(l_info, f), fixed)
    v1, s1 = solve(*args, nested=False)
    v2, s2 = solve(*args, nested=True)
    assert int(s1.iterations) == int(s2.iterations)
    np.testing.assert_allclose(float(s1.final_cost),
                               float(s2.final_cost), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2),
                               atol=1e-8)


def test_nested_rejects_chunked():
    from rust_robotics_tpu.slam.pose_graph import (
        se2_edge_residual,
        se2_retract,
    )

    n = 16
    f = jnp.result_type(float)
    with pytest.raises(ValueError, match="mutually exclusive"):
        solve_chain_lm(
            jnp.zeros((n, 3), f), jnp.zeros((n - 1, 3), f), None,
            jnp.array([0], jnp.int32), jnp.array([8], jnp.int32),
            jnp.zeros((1, 3), f), None, jnp.zeros((n,), bool),
            residual_fn=se2_edge_residual, retract_fn=se2_retract,
            tdim=3, chunks=4, nested=True)


def test_nested_auto_heuristic_off_when_small():
    """nested=None on a small chain resolves to the plain path (same
    result either way; this pins that the auto gate doesn't engage and
    that explicit nested=False/None agree)."""
    from rust_robotics_tpu.demos.pose_graph_bench import synthesize_chain
    from rust_robotics_tpu.slam.pose_graph import (
        se2_edge_residual,
        se2_retract,
    )

    size = 400
    truth, initial, ef, et, meas, info = synthesize_chain(size)
    c_meas, c_info, l_ef, l_et, l_meas, l_info = classify_chain_edges(
        size, ef, et, meas, info)
    fixed = jnp.zeros((size,), bool).at[0].set(True)
    f = jnp.result_type(float)
    solve = functools.partial(
        solve_chain_lm, residual_fn=se2_edge_residual,
        retract_fn=se2_retract, tdim=3, max_iterations=8)
    args = (jnp.asarray(initial, f), jnp.asarray(c_meas, f),
            jnp.asarray(c_info, f), jnp.asarray(l_ef, jnp.int32),
            jnp.asarray(l_et, jnp.int32), jnp.asarray(l_meas, f),
            jnp.asarray(l_info, f), fixed)
    va, sa = solve(*args)            # auto -> off at this size
    vb, sb = solve(*args, nested=False)
    np.testing.assert_array_equal(np.asarray(va), np.asarray(vb))
    assert int(sa.iterations) == int(sb.iterations)
