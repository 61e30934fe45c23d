"""Deterministic pose-graph benchmark generator.

Exact reproduction of the reference's benchmark problem
(crates/rust_robotics/examples/benchmark_large_pose_graph.rs:19-56): a
sinusoidal ground-truth chain, deterministic sinusoid perturbations on the
initial guess, odometry edges (info 100·I) plus loop edges every 100 poses
(info 20·I). RMSE acceptance < 5e-3 (:97), PCG config max 3000 iters tol
1e-5 with LM max 25 iters tol 1e-8 (:66-75) for the 1k/5k/10k table
(README.md:722-730).
"""

import numpy as np


def relative(a, b):
    """benchmark_large_pose_graph.rs:11-16 (yaw left unwrapped, as in ref).
    Vectorized over leading axes ([..., 3] inputs)."""
    a = np.asarray(a)
    b = np.asarray(b)
    s, c = np.sin(a[..., 2]), np.cos(a[..., 2])
    dx, dy = b[..., 0] - a[..., 0], b[..., 1] - a[..., 1]
    return np.stack(
        [c * dx + s * dy, -s * dx + c * dy, b[..., 2] - a[..., 2]],
        axis=-1)


def synthesize_chain(size: int, loop_stride: int = 100):
    """Returns (truth [N,3], initial [N,3], edges_from, edges_to,
    measurements [E,3], information [E,3,3]).

    loop_stride: poses between loop closures (reference: 100,
    benchmark_large_pose_graph.rs:47-51). The 1M-pose capacity row uses
    a sparser stride (10000) so the Woodbury capacity system stays small
    — at stride 100 a 1M chain would carry K=30000 closure columns,
    which is a different (closure-dominated) workload."""
    i = np.arange(size, dtype=np.float64)
    x = i * 0.05
    truth = np.stack(
        [x, 2.0 * np.sin(x * 0.015), 0.03 * np.cos(x * 0.015)], axis=-1
    )
    phase = i
    initial = truth + np.stack(
        [
            0.02 * np.sin(phase * 0.013),
            0.03 * np.cos(phase * 0.021),
            0.005 * np.sin(phase * 0.017),
        ],
        axis=-1,
    )
    initial[0] = truth[0]

    # vectorized edge construction (identical output to the per-edge loop;
    # needed for the 1M-pose row, where a Python loop is minutes)
    ef_c = np.arange(size - 1, dtype=np.int32)
    et_c = ef_c + 1
    meas_c = relative(truth[:-1], truth[1:])
    ef_l = np.arange(0, max(size - loop_stride, 0), loop_stride,
                     dtype=np.int32)
    et_l = ef_l + loop_stride
    meas_l = relative(truth[ef_l], truth[et_l])
    info = np.concatenate([
        np.broadcast_to(np.eye(3) * 100.0, (len(ef_c), 3, 3)),
        np.broadcast_to(np.eye(3) * 20.0, (len(ef_l), 3, 3)),
    ]).copy()
    return (
        truth,
        initial,
        np.concatenate([ef_c, ef_l]),
        np.concatenate([et_c, et_l]),
        np.concatenate([meas_c, meas_l]),
        info,
    )


def rmse(poses, truth):
    """benchmark_large_pose_graph.rs:77-89: sqrt(mean over poses of summed
    squared (x, y, yaw) errors)."""
    d = np.asarray(poses) - truth
    return float(np.sqrt(np.mean(np.sum(d**2, axis=-1))))


def run_large_benchmark(size=10000, max_iterations=4, tolerance=1e-8,
                        pcg_tolerance=1e-5, pcg_max_iterations=3000,
                        device_resident=False):
    """The reference's large pose-graph benchmark.

    Reference wall-clock (README.md:728-730, single core, --release):
    1k 0.64 s · 5k 4.54 s · 10k 8.62 s at RMSE ≤ 2.2e-3.

    Default path: matfree-PCG with a host-side LM loop — 4 LM iterations
    land ~7e-4 RMSE on the 10k chain (gate is < 5e-3,
    benchmark_large_pose_graph.rs:97) in ~3.4 s CPU f64.

    device_resident=True: the TPU-native chain_direct path — one fused
    lax.while_loop LM with a cyclic-reduction block-tridiagonal direct
    solve + Woodbury loop closures per iteration (nlls/tridiag.py). No
    Krylov iteration, no per-iteration host syncs; runs the full
    25-iteration LM schedule because each linear solve is exact. Timing
    excludes compilation (one warm-up call on the same shapes), matching
    the reference's exclusion of rustc time. Returns
    (seconds, rmse, lm_iterations).
    """
    import time

    import jax.numpy as jnp

    from rust_robotics_tpu.slam.pose_graph import optimize_pose_graph_2d

    truth, initial, ef, et, meas, info = synthesize_chain(size)
    f = jnp.result_type(float)
    args = (jnp.asarray(initial, f), jnp.asarray(ef), jnp.asarray(et),
            jnp.asarray(meas, f), jnp.asarray(info, f))
    if device_resident:
        kwargs = dict(max_iterations=25, tolerance=tolerance,
                      linear_solver="chain_direct")
        # compile + settle; np.asarray blocks until the warm-up solve has
        # fully completed so no in-flight work leaks into the timed region
        np.asarray(optimize_pose_graph_2d(*args, **kwargs)[0])
        t0 = time.perf_counter()
        poses, summary = optimize_pose_graph_2d(*args, **kwargs)
        poses_np = np.asarray(poses)
        seconds = time.perf_counter() - t0
        return seconds, rmse(poses_np, truth), int(summary.iterations)
    t0 = time.perf_counter()
    poses, summary = optimize_pose_graph_2d(
        *args, max_iterations=max_iterations, tolerance=tolerance,
        linear_solver="matfree_pcg", pcg_max_iterations=pcg_max_iterations,
        pcg_tolerance=pcg_tolerance)
    poses_np = np.asarray(poses)
    seconds = time.perf_counter() - t0
    return seconds, rmse(poses_np, truth), int(summary.iterations)


def run_batched_benchmark(size=10000, batch=8, max_iterations=25,
                          tolerance=1e-8):
    """B independent `size`-pose graphs solved CONCURRENTLY by vmapping
    the device-resident chain solver — the throughput framing of the
    flagship workload. Returns (seconds, worst_rmse, graphs_per_s).
    Timing excludes compilation (one warm-up call)."""
    import functools
    import time

    import jax
    import jax.numpy as jnp

    from rust_robotics_tpu.nlls.tridiag import (
        classify_chain_edges,
        solve_chain_lm,
    )
    from rust_robotics_tpu.slam.pose_graph import (
        se2_edge_residual,
        se2_retract,
    )

    truth, initial, ef, et, meas, info = synthesize_chain(size)
    c_meas, c_info, l_ef, l_et, l_meas, l_info = classify_chain_edges(
        size, ef, et, meas, info)
    f = jnp.result_type(float)
    fixed = jnp.zeros((size,), bool).at[0].set(True)
    # distinct problems: phase-shifted deterministic wobbles
    wobbles = np.stack([
        0.01 * np.sin(np.arange(size * 3) * 0.01 + k).reshape(size, 3)
        * [1.0, 1.0, 0.1] for k in range(batch)])
    init_b = jnp.asarray(initial, f)[None] + jnp.asarray(wobbles, f)
    init_b = init_b.at[:, 0].set(jnp.asarray(truth[0], f))

    solve1 = functools.partial(
        solve_chain_lm, residual_fn=se2_edge_residual,
        retract_fn=se2_retract, tdim=3, max_iterations=max_iterations,
        gradient_tolerance=tolerance, step_tolerance=tolerance,
        cost_tolerance=tolerance * tolerance)
    args = (jnp.asarray(c_meas, f),
            None if c_info is None else jnp.asarray(c_info, f),
            jnp.asarray(l_ef, jnp.int32), jnp.asarray(l_et, jnp.int32),
            jnp.asarray(l_meas, f),
            None if l_info is None else jnp.asarray(l_info, f), fixed)
    vm = jax.jit(jax.vmap(lambda v: solve1(v, *args)))
    # The completion fence must be IDENTICAL in the warm-up and timed
    # paths: fetching a different slice (out[0, 0] vs out.ravel()[0])
    # compiles a distinct tiny fetch program, and on a tunneled TPU that
    # compile costs seconds — it used to land inside the timed region of
    # the first call and poisoned the round-4 serving capture
    # (164 graphs/s for what is really ~1350). Scalar readback, not
    # block_until_ready, per the bench.py protocol (block_until_ready
    # under-reports through the async axon relay).
    def fenced():
        out, _ = vm(init_b)
        float(out[0, 0, 0])
        return out

    out = fenced()  # compile (solver + fence program) + settle
    t0 = time.perf_counter()
    out = fenced()
    seconds = time.perf_counter() - t0
    worst = max(rmse(np.asarray(out[k]), truth) for k in range(batch))
    return seconds, worst, batch / seconds


def run_batched_compaction_benchmark(size=200, batch=256, chunk_iters=6,
                                     max_rounds=8, tolerance=1e-6,
                                     wobble_spread=True):
    """Batched small-graph serving WITHOUT paying the slowest instance's
    full iteration count everywhere (VERDICT r4 #5): the vmapped LM runs
    in `chunk_iters`-iteration rounds; after each round the CONVERGED
    instances leave the batch and the remainder is compacted into the
    next power-of-two bucket (bounding the number of compiled shapes).
    Each round restarts LM damping — a standard LM restart, so the
    per-instance solution quality is unchanged (RMSE gate asserted by
    the caller).

    wobble_spread=True makes the B problems deliberately heterogeneous
    (perturbation scale varying 8x across the batch) so convergence
    rounds actually differ — the serving shape where lock-step hurts.

    tolerance defaults to 1e-6, not the reference's 1e-8: in f32 the
    1e-8 gradient/step thresholds are below the arithmetic noise floor,
    so instances never REPORT convergence (termination_code stays 0) and
    no compaction ever happens, even though the solutions are long since
    converged (measured: 227/256 still "active" after 48 iterations at
    worst RMSE 5.9e-6).

    Returns (seconds, worst_rmse, graphs_per_s, rounds_profile) with
    rounds_profile = [(bucket_size, active_before)] per round. Timing
    excludes compilation (one full untimed warm-up sweep compiles every
    bucket the deterministic schedule visits)."""
    import functools
    import time

    import jax
    import jax.numpy as jnp

    from rust_robotics_tpu.nlls.tridiag import (
        classify_chain_edges,
        solve_chain_lm,
    )
    from rust_robotics_tpu.slam.pose_graph import (
        se2_edge_residual,
        se2_retract,
    )

    truth, initial, ef, et, meas, info = synthesize_chain(size)
    c_meas, c_info, l_ef, l_et, l_meas, l_info = classify_chain_edges(
        size, ef, et, meas, info)
    f = jnp.result_type(float)
    fixed = jnp.zeros((size,), bool).at[0].set(True)
    scale = (np.linspace(0.25, 2.0, batch)[:, None, None]
             if wobble_spread else np.ones((batch, 1, 1)))
    wobbles = scale * np.stack([
        0.01 * np.sin(np.arange(size * 3) * 0.01 + k).reshape(size, 3)
        * [1.0, 1.0, 0.1] for k in range(batch)])
    init_b = np.asarray(initial)[None] + wobbles
    init_b[:, 0] = truth[0]
    init_b = jnp.asarray(init_b, f)

    solve1 = functools.partial(
        solve_chain_lm, residual_fn=se2_edge_residual,
        retract_fn=se2_retract, tdim=3, max_iterations=chunk_iters,
        gradient_tolerance=tolerance, step_tolerance=tolerance,
        cost_tolerance=tolerance * tolerance)
    args = (jnp.asarray(c_meas, f),
            None if c_info is None else jnp.asarray(c_info, f),
            jnp.asarray(l_ef, jnp.int32), jnp.asarray(l_et, jnp.int32),
            jnp.asarray(l_meas, f),
            None if l_info is None else jnp.asarray(l_info, f), fixed)
    vm = jax.jit(jax.vmap(lambda v: solve1(v, *args)))

    def sweep():
        values = np.array(init_b)  # writable copy
        active = np.arange(batch)
        profile = []
        for _ in range(max_rounds):
            if len(active) == 0:
                break
            bucket = 1 << (len(active) - 1).bit_length()
            idx = np.concatenate(
                [active, np.zeros(bucket - len(active), np.int64)])
            out, summ = vm(jnp.asarray(values[idx], f))
            out_np = np.asarray(out)
            term = np.asarray(summ.termination_code)[:len(active)]
            values[active] = out_np[:len(active)]
            profile.append((bucket, len(active)))
            active = active[term == 0]  # 0 = max_iterations: not done
        return values, profile, active

    values, profile, left = sweep()  # warm-up: compiles every bucket
    t0 = time.perf_counter()
    values, profile, left = sweep()
    float(values.ravel()[0])
    seconds = time.perf_counter() - t0
    worst = max(rmse(values[k], truth) for k in range(batch))
    return seconds, worst, batch / seconds, profile


def synthesize_se3_chain(size: int, loop_stride: int = 100):
    """SE(3) analog of synthesize_chain on a 30-unit workspace (the
    docs/PERF.md accuracy-island problem): sinusoidal SE(3) truth,
    exact relative measurements (odometry + closures every
    `loop_stride`), deterministic initial perturbation. All host-side
    f64 (core/lie_np.py).

    Returns (truth_tangents [N,6], truth_mats [N,4,4], initial_tangents,
    ef, et, measurement_tangents [E,6], information [E,6,6])."""
    from rust_robotics_tpu.core import lie_np

    i = np.arange(size, dtype=np.float64)
    truth_t = np.stack(
        [15 * np.sin(0.002 * i), 10 * np.sin(0.004 * i),
         2 * np.sin(0.003 * i), 0.3 * np.sin(0.0017 * i),
         0.3 * np.cos(0.0023 * i), 0.4 * np.sin(0.0011 * i)], -1)
    tm = lie_np.se3_exp(truth_t)
    inv = lie_np.se3_inverse(tm)
    mc = lie_np.se3_log(inv[:-1] @ tm[1:])
    ef_c = np.arange(size - 1, dtype=np.int32)
    et_c = ef_c + 1
    lf = np.arange(0, max(size - loop_stride, 0), loop_stride,
                   dtype=np.int32)
    lt = lf + loop_stride
    ml = lie_np.se3_log(inv[lf] @ tm[lt])
    meas = np.concatenate([mc, ml])
    info = np.concatenate([
        np.broadcast_to(np.eye(6) * 100.0, (len(ef_c), 6, 6)),
        np.broadcast_to(np.eye(6) * 20.0, (len(lf), 6, 6)),
    ]).copy()
    initial_t = truth_t + np.stack(
        [0.02 * np.sin(i * 0.013), 0.03 * np.cos(i * 0.021),
         0.005 * np.sin(i * 0.017), 0.004 * np.cos(i * 0.019),
         0.004 * np.sin(i * 0.023), 0.003 * np.cos(i * 0.029)], -1)
    initial_t[0] = truth_t[0]
    return (truth_t, tm, initial_t, np.concatenate([ef_c, lf]),
            np.concatenate([et_c, lt]), meas, info)


def se3_position_rmse(tangents, truth_mats):
    """Position RMSE of tangent-stored SE(3) poses vs truth matrices."""
    from rust_robotics_tpu.core import lie_np

    pos = lie_np.se3_exp(np.asarray(tangents, np.float64))[:, :3, 3]
    d = pos - truth_mats[:, :3, 3]
    return float(np.sqrt(np.mean(np.sum(d * d, -1))))


def synthesize_grid(width: int, height: int, diag_closures: int = 0):
    """A NON-chain 10k-class pose graph: poses on a W×H grid (row-major),
    4-neighbor relative-pose edges (the reference-style exact
    measurements + deterministic initial perturbation of
    benchmark_large_pose_graph.rs:19-56, on a topology its chain
    structure cannot express), plus `diag_closures` long-range closures.

    Returns (truth [N,3], initial [N,3], ef, et, meas [E,3], info
    [E,3,3]). The grid's RCM bandwidth is ~min(W,H): the banded supernodal
    solver (nlls/banded.py) handles it as fat-block tridiagonal; the
    chain solver CANNOT (no (i,i+1) odometry chain exists)."""
    n = width * height
    ii = np.arange(n, dtype=np.float64)
    gx = (ii % width) * 0.5
    gy = (ii // width) * 0.5
    truth = np.stack(
        [gx + 0.2 * np.sin(0.07 * gy),
         gy + 0.2 * np.cos(0.05 * gx),
         0.3 * np.sin(0.011 * ii)], axis=-1)
    initial = truth + np.stack(
        [0.02 * np.sin(ii * 0.013),
         0.03 * np.cos(ii * 0.021),
         0.005 * np.sin(ii * 0.017)], axis=-1)
    initial[0] = truth[0]

    ef, et, meas, info = [], [], [], []

    def add_edge(a, b, w):
        ef.append(a)
        et.append(b)
        meas.append(relative(truth[a], truth[b]))
        info.append(np.eye(3) * w)

    for r in range(height):
        for c_ in range(width):
            i = r * width + c_
            if c_ + 1 < width:
                add_edge(i, i + 1, 100.0)
            if r + 1 < height:
                add_edge(i, i + width, 100.0)
    # long-range loop closures across the grid (out-of-band edges)
    for k in range(diag_closures):
        a = (k * 37) % (n // 2)
        b = n - 1 - ((k * 61) % (n // 2))
        if a != b:
            add_edge(a, b, 20.0)
    return (truth, initial, np.array(ef, np.int32), np.array(et, np.int32),
            np.stack(meas), np.stack(info))


def run_grid_benchmark(width=100, height=100, diag_closures=50,
                       max_iterations=25, tolerance=1e-8):
    """10k-pose NON-chain benchmark: the reference's block-sparse PCG
    solves its (chain) 10k benchmark in 8.62 s single-core
    (README.md:730); the banded supernodal direct solve must land under
    the same RMSE gate on a topology with no odometry chain at all.
    Returns (seconds, rmse, lm_iterations) — timing excludes compile
    (one warm-up call on the same shapes)."""
    import time

    import jax.numpy as jnp

    from rust_robotics_tpu.slam.pose_graph import optimize_pose_graph_2d

    truth, initial, ef, et, meas, info = synthesize_grid(
        width, height, diag_closures)
    f = jnp.result_type(float)
    args = (jnp.asarray(initial, f), ef, et, jnp.asarray(meas, f),
            jnp.asarray(info, f))
    kwargs = dict(max_iterations=max_iterations, tolerance=tolerance,
                  linear_solver="banded_direct")
    # compile + settle (np.asarray blocks: see run_benchmark)
    np.asarray(optimize_pose_graph_2d(*args, **kwargs)[0])
    t0 = time.perf_counter()
    poses, summary = optimize_pose_graph_2d(*args, **kwargs)
    poses_np = np.asarray(poses)
    seconds = time.perf_counter() - t0
    return seconds, rmse(poses_np, truth), int(summary.iterations)
