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
    """benchmark_large_pose_graph.rs:11-16 (yaw left unwrapped, as in ref)."""
    s, c = np.sin(a[2]), np.cos(a[2])
    dx, dy = b[0] - a[0], b[1] - a[1]
    return np.array([c * dx + s * dy, -s * dx + c * dy, b[2] - a[2]])


def synthesize_chain(size: int):
    """Returns (truth [N,3], initial [N,3], edges_from, edges_to,
    measurements [E,3], information [E,3,3])."""
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

    ef, et, meas, info = [], [], [], []
    for f in range(size - 1):
        ef.append(f)
        et.append(f + 1)
        meas.append(relative(truth[f], truth[f + 1]))
        info.append(np.eye(3) * 100.0)
    for f in range(0, max(size - 100, 0), 100):
        ef.append(f)
        et.append(f + 100)
        meas.append(relative(truth[f], truth[f + 100]))
        info.append(np.eye(3) * 20.0)
    return (
        truth,
        initial,
        np.array(ef, dtype=np.int32),
        np.array(et, dtype=np.int32),
        np.stack(meas),
        np.stack(info),
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
        optimize_pose_graph_2d(*args, **kwargs)  # compile + settle
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
    out, _ = vm(init_b)
    np.asarray(out[0, 0])  # compile + settle
    t0 = time.perf_counter()
    out, _ = vm(init_b)
    float(out.ravel()[0])
    seconds = time.perf_counter() - t0
    worst = max(rmse(np.asarray(out[k]), truth) for k in range(batch))
    return seconds, worst, batch / seconds


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
    optimize_pose_graph_2d(*args, **kwargs)  # compile + settle
    t0 = time.perf_counter()
    poses, summary = optimize_pose_graph_2d(*args, **kwargs)
    poses_np = np.asarray(poses)
    seconds = time.perf_counter() - t0
    return seconds, rmse(poses_np, truth), int(summary.iterations)
