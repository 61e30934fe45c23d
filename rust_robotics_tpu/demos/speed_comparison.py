"""Speed comparison: the reference's four headline workloads on TPU/JAX.

Reference: crates/rust_robotics/examples/speed_comparison.rs (:1-:139) —
A* on a walled 100×100 grid (100 runs), RRT among seven circles (500
iterations, 100 runs), EKF localization (1000 sequential steps), cubic
spline course (1000 runs); CSV `algorithm,rust_ms,runs` to stdout. The
published numbers (README.md:397-400): A* 4.0 ms vs Python 924.5 ms; EKF
0.19 ms vs 103.1 ms; RRT 0.12 ms vs 5.7 ms; CubicSpline 0.92 ms vs 6.9 ms.

TPU framing: single-plan latency is the reference's game; batched
amortized cost is ours. Both are reported — `ms_per_run` is the
dependency-chained sequential latency (honest single-query time, compile
excluded), `ms_per_run_batched` divides one vmapped batch of independent
queries by the batch size (the deployment-relevant number for a planner
or filter fleet on one chip).

Usage: python -m rust_robotics_tpu.demos.speed_comparison [--runs N]
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["run_speed_comparison", "REFERENCE_MS"]

# README.md:397-400 published baselines (single CPU core, author's machine)
REFERENCE_MS = {
    "a_star": (4.0, 924.5),
    "rrt": (0.12, 5.7),
    "ekf": (0.19, 103.1),
    "cubic_spline": (0.92, 6.9),
}


def _time_ms(fn, runs: int) -> float:
    """Marginal per-call wall ms with forced readback (compile excluded)."""
    out = fn()
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(runs):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) * 1000.0 / runs


def _grid_world():
    """speed_comparison.rs:17-40 obstacle layout via the GridMap builder."""
    ox, oy = [], []
    for i in range(101):
        ox += [float(i), float(i), 0.0, 100.0]
        oy += [0.0, 100.0, float(i), float(i)]
    for i in range(20, 80):
        ox.append(50.0)
        oy.append(float(i))
    from rust_robotics_tpu.planning.grid import grid_from_obstacle_points
    return grid_from_obstacle_points(jnp.asarray(ox), jnp.asarray(oy),
                                     resolution=1.0, robot_radius=0.5)


def run_speed_comparison(runs: int = 20, batch: int = 32):
    """Returns (header, rows) and prints the CSV."""
    from rust_robotics_tpu.planning.wavefront import (
        extract_path, goal_raster, wavefront_costs)
    from rust_robotics_tpu.planning.rrt import RRTConfig, rrt_plan
    from rust_robotics_tpu.planning.curves import calc_spline_course
    from rust_robotics_tpu.filters.kalman import (
        GaussianBelief, ekf_step, unicycle_position_model)

    f = jnp.result_type(float)
    rows = []

    # --- A* (100x100 walled grid, start (10,10) goal (90,90)) ------------
    grid = _grid_world()
    free = grid.free()
    start_idx = grid.world_to_index(jnp.array([10.0, 10.0]))
    goal_idx = grid.world_to_index(jnp.array([90.0, 90.0]))

    @jax.jit
    def astar_one(s_idx):
        costs = wavefront_costs(free, goal_raster(free.shape, goal_idx))
        idx, mask, cost = extract_path(costs, free, s_idx, max_len=512)
        return cost

    astar_batch_starts = jnp.stack(
        [start_idx + jnp.array([i % 8, i // 8]) for i in range(batch)])

    @jax.jit
    def astar_many(starts):
        costs = wavefront_costs(free, goal_raster(free.shape, goal_idx))
        return jax.vmap(
            lambda s: extract_path(costs, free, s, max_len=512)[2]
        )(starts)

    ms = _time_ms(lambda: astar_one(start_idx), runs)
    ms_b = _time_ms(lambda: astar_many(astar_batch_starts), runs) / batch
    rows.append(("a_star", ms, runs, batch, ms_b))

    # --- RRT (seven circles, 500 nodes) -----------------------------------
    obstacles = jnp.array([[5.0, 5.0], [3.0, 6.0], [3.0, 8.0], [3.0, 10.0],
                           [7.0, 5.0], [9.0, 5.0], [8.0, 10.0]], f)
    radii = jnp.array([1.0, 2.0, 2.0, 2.0, 2.0, 2.0, 1.0], f) + 0.8
    cfg = RRTConfig(expand_dis=3.0, goal_sample_rate=0.05, max_nodes=500,
                    area_min=(-2.0, -2.0), area_max=(15.0, 15.0),
                    goal_threshold=3.0)
    rrt_start = jnp.array([0.0, 0.0], f)
    rrt_goal = jnp.array([6.0, 10.0], f)

    @jax.jit
    def rrt_one(key):
        _, _, cost = rrt_plan(key, rrt_start, rrt_goal, obstacles, radii,
                              cfg)
        return cost

    @jax.jit
    def rrt_many(keys):
        return jax.vmap(lambda k: rrt_plan(
            k, rrt_start, rrt_goal, obstacles, radii, cfg)[2])(keys)

    key = jax.random.PRNGKey(0)
    keys = jax.random.split(key, batch)
    ms = _time_ms(lambda: rrt_one(key), runs)
    ms_b = _time_ms(lambda: rrt_many(keys), runs) / batch
    rows.append(("rrt", ms, runs, batch, ms_b))

    # --- EKF (1000 sequential steps, the reference's total-ms metric) ----
    model = unicycle_position_model()
    q = jnp.diag(jnp.array([0.1, 0.1, jnp.deg2rad(1.0), 1.0], f)) ** 2
    r = jnp.eye(2, dtype=f)
    control = jnp.array([1.0, 0.1], f)
    steps = 1000
    ts = jnp.arange(steps, dtype=f)
    zs = jnp.stack([0.1 * ts + 0.01 * ts, 0.005 * ts], -1)

    @jax.jit
    def ekf_chain(z):
        def step(b, zi):
            return ekf_step(b, zi, control, 0.1, q, r, model), b.mean

        b0 = GaussianBelief(jnp.zeros(4, f), jnp.eye(4, dtype=f))
        _, means = jax.lax.scan(step, b0, z)
        return means

    @jax.jit
    def ekf_chain_batched(z):  # batch independent 1000-step chains
        return jax.vmap(ekf_chain)(z)

    zb = jnp.broadcast_to(zs, (batch,) + zs.shape)
    ms = _time_ms(lambda: ekf_chain(zs), runs)
    ms_b = _time_ms(lambda: ekf_chain_batched(zb), runs) / batch
    rows.append(("ekf", ms, runs, batch, ms_b))

    # --- Cubic spline course (the reference's 7-waypoint course) ---------
    wx = jnp.array([-2.5, 0.0, 2.5, 5.0, 7.5, 3.0, -1.0], f)
    wy = jnp.array([0.7, -6.0, 5.0, 6.5, 0.0, 5.0, -2.0], f)
    n_samples = 360  # static sample count (≈ length/0.1)

    @jax.jit
    def spline_one(x, y):
        return calc_spline_course(x, y, ds=0.1, num_points=n_samples)[0]

    @jax.jit
    def spline_many(xs, ys):
        return jax.vmap(lambda a, b: calc_spline_course(
            a, b, ds=0.1, num_points=n_samples)[0])(xs, ys)

    xsb = jnp.broadcast_to(wx, (batch, 7))
    ysb = jnp.broadcast_to(wy, (batch, 7))
    ms = _time_ms(lambda: spline_one(wx, wy), runs)
    ms_b = _time_ms(lambda: spline_many(xsb, ysb), runs) / batch
    rows.append(("cubic_spline", ms, runs, batch, ms_b))

    header = ("algorithm", "ms_per_run", "runs", "batch",
              "ms_per_run_batched", "reference_rust_ms",
              "reference_python_ms")
    out_rows = []
    print(",".join(header))
    for name, ms, n, b, ms_b in rows:
        ref_rust, ref_py = REFERENCE_MS[name]
        row = (name, f"{ms:.6f}", n, b, f"{ms_b:.6f}", ref_rust, ref_py)
        out_rows.append(row)
        print(",".join(str(c) for c in row))
    return header, out_rows


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=20)
    ap.add_argument("--batch", type=int, default=32)
    args = ap.parse_args()
    run_speed_comparison(runs=args.runs, batch=args.batch)
