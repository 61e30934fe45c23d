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


@pytest.mark.parametrize("n,d,r,chunks", [(37, 3, 2, 4), (64, 3, 1, 8),
                                          (100, 6, 3, 5), (9, 4, 2, 3),
                                          (16, 3, 2, 1)])
def test_chunked_tridiag_matches_plain_ladder(n, d, r, chunks):
    """Single-chip SPIKE chunking (the 1M-pose compile-ceiling fix,
    VERDICT r4 #2) must reproduce the plain cyclic-reduction solve to
    machine precision, including non-divisible chunk padding."""
    from rust_robotics_tpu.nlls.tridiag import (
        chunked_tridiag_apply,
        chunked_tridiag_factor,
    )

    rng = np.random.default_rng(3)
    b = rng.normal(size=(n, d, d))
    b = b @ b.transpose(0, 2, 1) + 5 * np.eye(d)
    c = 0.3 * rng.normal(size=(n - 1, d, d))
    f = rng.normal(size=(n, d, r))
    expect = np.asarray(block_tridiag_solve(
        jnp.asarray(b), jnp.asarray(c), jnp.asarray(f)))
    fac = chunked_tridiag_factor(jnp.asarray(b), jnp.asarray(c), chunks)
    got = np.asarray(chunked_tridiag_apply(fac, jnp.asarray(f)))
    np.testing.assert_allclose(got, expect, atol=1e-9)


def test_chain_lm_chunks_matches_unchunked():
    """solve_chain_lm(chunks=8) must walk the IDENTICAL LM trajectory as
    the plain solve (same iteration count, poses to fp round-off) —
    chain + loop closures, so the chunked ladder also carries the
    streamed Woodbury applies."""
    from rust_robotics_tpu.nlls.tridiag import solve_chain_lm
    from rust_robotics_tpu.slam.pose_graph import (
        se2_edge_residual,
        se2_retract,
    )

    n = 500
    truth, initial, ef, et, meas, info = synthesize_chain(n)
    cm, ci, lf, lt, lm, li = classify_chain_edges(n, ef, et, meas, info)
    fixed = jnp.zeros((n,), bool).at[0].set(True)
    kw = dict(residual_fn=se2_edge_residual, retract_fn=se2_retract,
              tdim=3, max_iterations=25, gradient_tolerance=1e-10,
              step_tolerance=1e-10, cost_tolerance=1e-16)
    args = (jnp.asarray(initial), jnp.asarray(cm), jnp.asarray(ci),
            jnp.asarray(lf, jnp.int32), jnp.asarray(lt, jnp.int32),
            jnp.asarray(lm), jnp.asarray(li), fixed)
    out0, s0 = solve_chain_lm(*args, **kw)
    out8, s8 = solve_chain_lm(*args, chunks=8, **kw)
    assert int(s0.iterations) == int(s8.iterations)
    np.testing.assert_allclose(np.asarray(out8), np.asarray(out0),
                               atol=1e-10)
    assert rmse(np.asarray(out8), truth) < 5e-3


def test_inv_spd_ill_conditioned_fat_block():
    """ADVICE r4: pin the recursive-Schur inv_spd's accuracy on an
    ill-conditioned fat supernodal block (d=96, the banded solver's
    block class). MEASURED conditioning behavior (f64): residual
    ~1.5e-9 at kappa=1e4, but the half-split Schur recursion degrades
    much faster than LAPACK beyond that (~1e-1 at kappa=1e6 vs LAPACK
    6e-11) — inv_spd's docstring documents the kappa <~ 1e4 envelope;
    the damped GN Schur complements the ladder actually inverts sit
    well inside it (the 10k-grid bench lands RMSE 8.5e-6)."""
    rng = np.random.default_rng(11)
    d = 96
    q, _ = np.linalg.qr(rng.normal(size=(d, d)))
    eigs = np.logspace(0, 4, d)  # condition number 1e4
    m = (q * eigs) @ q.T
    m = 0.5 * (m + m.T)
    inv = np.asarray(inv_spd(jnp.asarray(m[None])))[0]
    resid = np.max(np.abs(inv @ m - np.eye(d)))
    assert resid < 1e-6, resid  # measured 1.5e-9; 600x headroom


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


def test_se3_chain_direct_matches_dense():
    """6×6-block cyclic reduction (inv_spd d=6 path) on an SE(3) chain
    with a loop closure matches the dense solver."""
    import jax

    from rust_robotics_tpu.core.lie import se3_exp, se3_inverse, se3_log
    from rust_robotics_tpu.slam.pose_graph import optimize_pose_graph_3d

    key = jax.random.PRNGKey(4)
    n = 14
    truth_t = 0.2 * jax.random.normal(key, (n, 6), dtype=jnp.float64)
    truth_t = truth_t.at[0].set(0.0)
    mats = se3_exp(truth_t)
    ef = jnp.concatenate([jnp.arange(n - 1), jnp.array([0])]).astype(
        jnp.int32)
    et = jnp.concatenate([jnp.arange(1, n), jnp.array([n - 1])]).astype(
        jnp.int32)
    meas = jnp.concatenate([
        se3_log(se3_inverse(mats[:-1]) @ mats[1:]),
        se3_log(se3_inverse(mats[0:1]) @ mats[n - 1:n])])
    noisy = truth_t + 0.01 * jax.random.normal(
        jax.random.PRNGKey(5), (n, 6), dtype=jnp.float64)
    noisy = noisy.at[0].set(0.0)
    dense, _ = optimize_pose_graph_3d(noisy, ef, et, meas,
                                      max_iterations=30, tolerance=1e-12)
    chain, summ = optimize_pose_graph_3d(noisy, ef, et, meas,
                                         max_iterations=30,
                                         tolerance=1e-12,
                                         linear_solver="chain_direct")
    t_d = se3_exp(dense)
    t_c = se3_exp(chain)
    err = se3_log(se3_inverse(t_d) @ t_c)
    assert float(jnp.max(jnp.abs(err))) < 1e-8
    assert summ.termination != "max_iterations"


def test_chain_direct_parallel_edges_demoted_to_woodbury():
    """Two parallel (i, i+1) edge sets (the VIO fusion shape,
    vio_pipeline.rs:408) — extras route to the low-rank correction and
    the solution still matches the dense solver."""
    truth, initial, ef, et, meas, info = synthesize_chain(80)
    ef2 = np.concatenate([ef, ef[:79]])
    et2 = np.concatenate([et, et[:79]])
    meas2 = np.concatenate([meas, meas[:79] + 0.001])
    info2 = np.concatenate([info, 0.5 * info[:79]])
    dense, _ = optimize_pose_graph_2d(initial, ef2, et2, meas2, info2,
                                      max_iterations=25, tolerance=1e-8)
    chain, _ = optimize_pose_graph_2d(initial, ef2, et2, meas2, info2,
                                      max_iterations=25, tolerance=1e-8,
                                      linear_solver="chain_direct")
    np.testing.assert_allclose(np.asarray(chain), np.asarray(dense),
                               atol=1e-7)


def test_chain_solver_vmaps_over_problems():
    """B independent graphs solve concurrently under vmap with bitwise
    agreement vs individual solves (the batched framing of the flagship
    workload — VERDICT r02 #1)."""
    import functools

    import jax

    from rust_robotics_tpu.nlls.tridiag import solve_chain_lm
    from rust_robotics_tpu.slam.pose_graph import (
        se2_edge_residual,
        se2_retract,
    )

    truth, initial, ef, et, meas, info = synthesize_chain(120)
    c_meas, c_info, l_ef, l_et, l_meas, l_info = classify_chain_edges(
        120, ef, et, meas, info)
    fixed = jnp.zeros((120,), bool).at[0].set(True)
    wobble = 0.01 * np.sin(np.arange(360)).reshape(120, 3) * [1, 1, 0.1]
    init_b = jnp.stack([jnp.asarray(initial),
                        jnp.asarray(initial + wobble)])
    init_b = init_b.at[:, 0].set(jnp.asarray(truth[0]))

    solve1 = functools.partial(
        solve_chain_lm, residual_fn=se2_edge_residual,
        retract_fn=se2_retract, tdim=3, max_iterations=25,
        gradient_tolerance=1e-8, step_tolerance=1e-8,
        cost_tolerance=1e-16)
    args = (jnp.asarray(c_meas), jnp.asarray(c_info),
            jnp.asarray(l_ef, jnp.int32), jnp.asarray(l_et, jnp.int32),
            jnp.asarray(l_meas), jnp.asarray(l_info), fixed)
    out_b, _ = jax.vmap(lambda v: solve1(v, *args))(init_b)
    for i in range(2):
        out_i, _ = solve1(init_b[i], *args)
        np.testing.assert_array_equal(np.asarray(out_b[i]),
                                      np.asarray(out_i))
        assert rmse(np.asarray(out_b[i]), truth) < 1e-5


def test_woodbury_chunked_matches_single_chunk(monkeypatch):
    """Force the multi-chunk streamed-Woodbury path (VERDICT r4: the
    100k-pose capacity fix) on a small graph and pin it against the
    single-chunk solve."""
    import rust_robotics_tpu.nlls.tridiag as td
    from rust_robotics_tpu.demos.pose_graph_bench import synthesize_chain
    from rust_robotics_tpu.slam.pose_graph import optimize_pose_graph_2d

    truth, initial, ef, et, meas, info = synthesize_chain(400)
    args = (jnp.asarray(initial, jnp.float32), ef, et,
            jnp.asarray(meas, jnp.float32), jnp.asarray(info, jnp.float32))
    kw = dict(max_iterations=15, tolerance=1e-8,
              linear_solver="chain_direct")
    poses_one, _ = optimize_pose_graph_2d(*args, **kw)
    td.solve_chain_lm.clear_cache()
    # ~3 edges per chunk -> the 400-pose graph's 3 loop edges split
    monkeypatch.setattr(td, "WOODBURY_CHUNK_BYTES", 1)
    try:
        poses_chunked, _ = optimize_pose_graph_2d(*args, **kw)
    finally:
        td.solve_chain_lm.clear_cache()
    np.testing.assert_allclose(np.asarray(poses_chunked),
                               np.asarray(poses_one), atol=2e-5)


@pytest.mark.slow
def test_chain_direct_30k_multi_chunk_capacity():
    """30k poses / 300 loop closures: the streamed Woodbury splits into
    multiple edge chunks at the default budget (no [n, t, K] U array is
    ever built — the r3 50k OOM cliff). Pins RMSE; on the TPU the same
    path completes 100k poses in ~10 s at RMSE 3.3e-4 (docs/PERF.md)."""
    from rust_robotics_tpu.demos.pose_graph_bench import (
        rmse,
        run_large_benchmark,
    )

    seconds, err, iters = run_large_benchmark(30000, device_resident=True)
    assert err < 1e-3, err
    assert iters >= 5


@pytest.mark.slow
def test_se3_chain_1k_f64_island_converges_tight():
    """SE(3) chains at scale: the f64 island converges to ~1e-7 position
    RMSE at n=1000 (and 1.0e-6 at 10k, docs/PERF.md); pure f32 stalls at
    the residual-noise floor (~2e-5 at n=1000, ~1 m at 10k on a 30-unit
    workspace) — an accuracy-island boundary, not a solver defect."""
    import jax

    from rust_robotics_tpu.core.lie import se3_exp, se3_log
    from rust_robotics_tpu.slam.pose_graph import optimize_pose_graph_3d

    n = 1000
    i = np.arange(n, dtype=np.float64)
    truth_t = np.stack(
        [15 * np.sin(0.002 * i), 10 * np.sin(0.004 * i),
         2 * np.sin(0.003 * i), 0.3 * np.sin(0.0017 * i),
         0.3 * np.cos(0.0023 * i), 0.4 * np.sin(0.0011 * i)], -1)
    tm = np.asarray(jax.vmap(se3_exp)(jnp.asarray(truth_t)))
    rel = jax.vmap(lambda a, b: se3_log(jnp.linalg.inv(a) @ b))
    mc = np.asarray(rel(jnp.asarray(tm[:-1]), jnp.asarray(tm[1:])))
    ef = list(range(n - 1))
    et = list(range(1, n))
    lf = list(range(0, n - 100, 100))
    lt = [a + 100 for a in lf]
    ml = np.asarray(rel(jnp.asarray(tm[lf]), jnp.asarray(tm[lt])))
    ef += lf
    et += lt
    meas = np.concatenate([mc, ml])
    info = np.concatenate([np.tile(np.eye(6) * 100.0, (n - 1, 1, 1)),
                           np.tile(np.eye(6) * 20.0, (len(lf), 1, 1))])
    initial_t = truth_t + np.stack(
        [0.02 * np.sin(i * 0.013), 0.03 * np.cos(i * 0.021),
         0.005 * np.sin(i * 0.017), 0.004 * np.cos(i * 0.019),
         0.004 * np.sin(i * 0.023), 0.003 * np.cos(i * 0.029)], -1)
    initial_t[0] = truth_t[0]

    out, summ = optimize_pose_graph_3d(
        jnp.asarray(initial_t), np.asarray(ef, np.int32),
        np.asarray(et, np.int32), jnp.asarray(meas), jnp.asarray(info),
        max_iterations=25, tolerance=1e-10,
        linear_solver="chain_direct")
    pos = np.asarray(jax.vmap(se3_exp)(
        jnp.asarray(np.asarray(out))))[:, :3, 3]
    err = float(np.sqrt(np.mean(np.sum((pos - tm[:, :3, 3]) ** 2, -1))))
    assert err < 1e-6, err
    assert summ.termination == "gradient_converged"


def test_chain_refine_matches_plain_solve():
    """Iterative refinement (refine=1) is a no-op to f32 tolerance on a
    well-conditioned chain — same solution, slightly tighter linear
    solves (opt-in knob for ill-conditioned f32 systems)."""
    truth, initial, ef, et, meas, info = synthesize_chain(400)
    args = (jnp.asarray(initial, jnp.float32), ef, et,
            jnp.asarray(meas, jnp.float32), jnp.asarray(info, jnp.float32))
    kw = dict(max_iterations=15, tolerance=1e-8,
              linear_solver="chain_direct")
    plain, _ = optimize_pose_graph_2d(*args, **kw)
    refined, _ = optimize_pose_graph_2d(*args, refine=1, **kw)
    np.testing.assert_allclose(np.asarray(refined), np.asarray(plain),
                               atol=5e-4)
    assert rmse(np.asarray(refined), truth) < 5e-3


def test_chain_direct_random_property_sweep():
    """proptest-style sweep (the reference's proptest_filters.rs idiom):
    random chains with random SPD edge information, random loop-closure
    patterns (incl. parallel (i,i+1) duplicates and repeated endpoints)
    must match the dense LM solver."""
    from rust_robotics_tpu.demos.pose_graph_bench import relative

    for seed in range(6):
        rng = np.random.default_rng(100 + seed)
        n = int(rng.integers(12, 40))
        truth = np.stack([np.cumsum(rng.normal(0.3, 0.1, n)),
                          np.cumsum(rng.normal(0.0, 0.2, n)),
                          rng.normal(0, 0.4, n)], -1)
        ef = list(range(n - 1))
        et = list(range(1, n))
        # random extra edges: loops, parallel odometry duplicates
        for _ in range(int(rng.integers(1, 6))):
            a = int(rng.integers(0, n - 1))
            b = int(rng.integers(a + 1, n))
            ef.append(a)
            et.append(b)
        meas = np.stack([relative(truth[a], truth[b])
                         for a, b in zip(ef, et)])
        # random SPD information per edge
        infos = []
        for _ in range(len(ef)):
            m = rng.normal(0, 0.3, (3, 3))
            infos.append(m @ m.T + np.eye(3) * rng.uniform(5, 50))
        info = np.stack(infos)
        initial = truth + rng.normal(0, 0.02, truth.shape)
        initial[0] = truth[0]
        args = (jnp.asarray(initial), np.asarray(ef, np.int32),
                np.asarray(et, np.int32), jnp.asarray(meas),
                jnp.asarray(info))
        dense, _ = optimize_pose_graph_2d(
            *args, max_iterations=25, tolerance=1e-10,
            linear_solver="dense")
        chain, _ = optimize_pose_graph_2d(
            *args, max_iterations=25, tolerance=1e-10,
            linear_solver="chain_direct")
        # both at the optimum; LM stopping points may differ by a last
        # near-converged accept, so compare at optimization (not fp)
        # tolerance
        np.testing.assert_allclose(np.asarray(chain), np.asarray(dense),
                                   atol=1e-4, err_msg=f"seed {seed}")


def test_se3_anchored_f32_small_matches_dense():
    """The deviation-space anchored residual must reproduce the plain
    SE(3) optimum (same graph, small size, f64 so the comparison is
    exact-arithmetic-grade)."""
    from rust_robotics_tpu.demos.pose_graph_bench import (
        se3_position_rmse,
        synthesize_se3_chain,
    )
    from rust_robotics_tpu.slam.pose_graph import optimize_pose_graph_3d

    truth_t, tm, initial_t, ef, et, meas, info = synthesize_se3_chain(
        60, loop_stride=20)
    plain, _ = optimize_pose_graph_3d(
        jnp.asarray(initial_t), ef, et, jnp.asarray(meas),
        jnp.asarray(info), max_iterations=30, tolerance=1e-12,
        linear_solver="chain_direct")
    anch, summ = optimize_pose_graph_3d(
        jnp.asarray(initial_t), ef, et, jnp.asarray(meas),
        jnp.asarray(info), max_iterations=30, tolerance=1e-12,
        linear_solver="chain_direct", anchored=True)
    assert se3_position_rmse(np.asarray(anch), tm) < 1e-9
    assert se3_position_rmse(np.asarray(plain), tm) < 1e-9
    assert summ.termination != "numerical_failure"


@pytest.mark.slow
def test_se3_anchored_f32_1k_beats_plain_floor():
    """VERDICT r4 #3: anchored deviation-space f32 at n=1000 must land
    ~1e-7 position RMSE — through the old plain-f32 ~2e-5 floor, in the
    f64 island's accuracy class (measured 3.5e-7)."""
    from rust_robotics_tpu.demos.pose_graph_bench import (
        se3_position_rmse,
        synthesize_se3_chain,
    )
    from rust_robotics_tpu.slam.pose_graph import optimize_pose_graph_3d

    truth_t, tm, initial_t, ef, et, meas, info = synthesize_se3_chain(
        1000)
    out, summ = optimize_pose_graph_3d(
        jnp.asarray(initial_t, jnp.float32), ef, et,
        jnp.asarray(meas, jnp.float32), jnp.asarray(info, jnp.float32),
        max_iterations=25, tolerance=1e-10,
        linear_solver="chain_direct", anchored=True)
    err = se3_position_rmse(np.asarray(out), tm)
    assert err < 2e-6, err  # measured 3.5e-7; old plain-f32 floor 2e-5
    assert summ.termination == "gradient_converged"


@pytest.mark.slow
def test_se3_anchored_f32_10k_closes_accuracy_island():
    """The round-4 headline gap: 10k SE(3) chain on f32 stalled at ~1 m
    position RMSE and was routed to the CPU f64 island. Anchored
    deviation-space f32 must land <= 1e-4 (VERDICT r4 #3 'done'
    criterion; measured 3.4e-5 — the f64 island is 1.0e-6)."""
    from rust_robotics_tpu.demos.pose_graph_bench import (
        se3_position_rmse,
        synthesize_se3_chain,
    )
    from rust_robotics_tpu.slam.pose_graph import optimize_pose_graph_3d

    truth_t, tm, initial_t, ef, et, meas, info = synthesize_se3_chain(
        10000)
    out, summ = optimize_pose_graph_3d(
        jnp.asarray(initial_t, jnp.float32), ef, et,
        jnp.asarray(meas, jnp.float32), jnp.asarray(info, jnp.float32),
        max_iterations=25, tolerance=1e-10,
        linear_solver="chain_direct", anchored=True)
    err = se3_position_rmse(np.asarray(out), tm)
    assert err < 1e-4, err  # measured 3.4e-5
    assert summ.termination == "gradient_converged"


def test_chain_vmap_freezes_converged_instances():
    """VERDICT r4 #5: under vmap the lock-step while_loop runs until the
    SLOWEST instance converges; early-converged instances must FREEZE —
    identical values AND identical per-instance summaries (iterations,
    termination) to their solo solves. Instances deliberately differ in
    difficulty (one exact-measurement graph converges almost
    immediately)."""
    import functools

    import jax

    from rust_robotics_tpu.nlls.tridiag import solve_chain_lm
    from rust_robotics_tpu.slam.pose_graph import (
        se2_edge_residual,
        se2_retract,
    )

    n = 120
    truth, initial, ef, et, meas, info = synthesize_chain(n)
    c_meas, c_info, l_ef, l_et, l_meas, l_info = classify_chain_edges(
        n, ef, et, meas, info)
    fixed = jnp.zeros((n,), bool).at[0].set(True)
    # instance 0: starts AT the optimum (terminates in ~1 iteration);
    # instances 1, 2: progressively harder perturbations
    init_b = jnp.stack([
        jnp.asarray(truth),
        jnp.asarray(initial),
        jnp.asarray(initial) + 0.05 * jnp.sin(
            jnp.arange(n * 3, dtype=jnp.float64)).reshape(n, 3)
        * jnp.asarray([1.0, 1.0, 0.1]),
    ])
    init_b = init_b.at[:, 0].set(jnp.asarray(truth[0]))

    solve1 = functools.partial(
        solve_chain_lm, residual_fn=se2_edge_residual,
        retract_fn=se2_retract, tdim=3, max_iterations=30,
        gradient_tolerance=1e-9, step_tolerance=1e-9,
        cost_tolerance=1e-18)
    args = (jnp.asarray(c_meas), jnp.asarray(c_info),
            jnp.asarray(l_ef, jnp.int32), jnp.asarray(l_et, jnp.int32),
            jnp.asarray(l_meas), jnp.asarray(l_info), fixed)
    out_b, summ_b = jax.vmap(lambda v: solve1(v, *args))(init_b)
    iters_b = np.asarray(summ_b.iterations)
    assert iters_b[0] < iters_b[2], iters_b  # the easy one stopped early
    for i in range(3):
        out_i, summ_i = solve1(init_b[i], *args)
        np.testing.assert_array_equal(np.asarray(out_b[i]),
                                      np.asarray(out_i))
        assert int(iters_b[i]) == int(summ_i.iterations)
        assert int(np.asarray(summ_b.termination_code)[i]) == \
            int(summ_i.termination_code)
        assert int(np.asarray(summ_b.accepted_steps)[i]) == \
            int(summ_i.accepted_steps)
