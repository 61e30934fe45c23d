"""Benchmark: batched EKF filter updates/s on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline (BASELINE.md): the reference runs 1000 sequential EKF steps in
0.19 ms on one CPU core -> 5.26e6 updates/s. Driver target (BASELINE.json):
>= 1e6 updates/s/chip.

Workload: B=131072 independent EKF localizers (the reference's 4-state
unicycle + GPS problem, ekf.rs:17-24) stepped T=200 times by the fused
Pallas kernel (rust_robotics_tpu/ops/ekf_pallas.py) — the full predict+
update chain runs in VMEM with batch on the lane axis. Measurement: min of
7 independent 64-rep dependent-chain bursts, each fenced by a scalar
readback (compile excluded); correctness of the kernel vs the generic jnp
path is pinned by tests/test_ekf_pallas.py.
"""

import json
import sys
import time


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp

    from rust_robotics_tpu.ops.ekf_pallas import ekf_scan_lanes

    platform = jax.devices()[0].platform
    on_tpu = platform not in ("cpu",)
    b = 131072 if on_tpu else 4096
    t = 200
    tile = 2048 if on_tpu else 512  # round-3 sweep: 2048 is 30% > 1024
    dtype = jnp.float32
    q = (0.01, 0.01, 3e-4, 0.01)
    r = (1.0, 1.0)

    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    zs = 10.0 + 0.3 * jax.random.normal(k1, (t, 2, b), dtype)
    us = jnp.concatenate(
        [
            1.0 + 0.1 * jax.random.normal(k2, (t, 1, b), dtype),
            0.1 * jnp.ones((t, 1, b), dtype),
        ],
        axis=1,
    )
    mean0 = jnp.zeros((4, b), dtype).at[2].set(jnp.pi / 2)
    cov0 = jnp.broadcast_to(
        jnp.eye(4, dtype=dtype).reshape(16, 1), (16, b)
    )

    import numpy as np

    def chain(m, p, n):
        # each call consumes the previous belief: a true data dependency, so
        # n kernel executions CANNOT overlap or be elided; a SCALAR host
        # readback at the end forces completion of the whole chain
        # (block_until_ready alone under-reports through the async axon
        # relay, and a full-array readback costs ~76 ms of relay transfer
        # that used to pollute the per-burst timing)
        for _ in range(n):
            m, p = ekf_scan_lanes(zs, us, m, p, 0.1, q, r, tile=tile)
        float(m[0, 0])
        return m, p

    m, p = chain(mean0, cov0, 3)  # compile + settle

    # Robust estimator (VERDICT r02 weak #1): the old single two-burst
    # MARGINAL estimate had ±25-35% run-to-run spread through the axon
    # relay — the difference of two noisy burst timings amplifies noise,
    # and it cost a phantom 26% "regression" in BENCH_r02. Instead:
    # 7 independent 64-rep bursts (one scalar readback each); per-call =
    # min of the burst averages. Plain averages are monotone in the noise
    # (relay hiccups only ADD time), so the min is the consistent
    # estimator — measured run-to-run delta ~3%. The remaining per-burst
    # overhead (~10 ms scalar round-trip / 64 reps) biases the result
    # slightly LOW (conservative).
    reps = 64 if on_tpu else 10
    samples = []
    for _ in range(7):
        t0 = time.perf_counter()
        m, p = chain(m, p, reps)
        samples.append((time.perf_counter() - t0) / reps)
    per_call = float(np.min(samples))

    updates_per_s = b * t / per_call
    baseline = 1000 / 0.19e-3  # reference: 1000 EKF steps / 0.19 ms

    # expected-floor sanity: PERF.md pins ~7.3e9 on the real chip; a
    # capture below half of that signals a measurement/runtime problem,
    # not a code regression (flagged, never fatal)
    floor = 3.5e9 if on_tpu else 1e6
    extras = {
        "below_expected_floor": bool(updates_per_s < floor),
        "ekf_updates_per_s_spread": {
            "best": updates_per_s,
            "median": b * t / float(np.median(samples)),
            "worst": b * t / float(np.max(samples)),
        },
    }
    try:
        extras["grid_cells_relaxed_per_s"] = _bench_grid_cells(jax, jnp)
        res = _bench_resample(jax, jnp, on_tpu)
        if isinstance(res, dict):
            extras["resample"] = res
            extras["resampled_particles_per_s"] = res["pinned_b256_p1024"]
        else:
            extras["resampled_particles_per_s"] = res
        extras["pose_graph_10k"] = _bench_pose_graph_10k()
        extras["pose_graph_grid_10k"] = _bench_pose_graph_grid()
        if on_tpu:
            extras["pose_graph_100k"] = _bench_pose_graph_100k()
            extras["pose_graph_serving"] = _bench_pose_graph_serving()
        from rust_robotics_tpu.utils.roofline import roofline_extras

        pg = extras["pose_graph_10k"]
        extras["roofline"] = roofline_extras({
            "ekf_updates_per_s": updates_per_s,
            "wavefront_cells_per_s": extras["grid_cells_relaxed_per_s"],
            "resampled_particles_per_s":
                extras["resampled_particles_per_s"],
            "chain_lm_iterations_per_s":
                pg["lm_iterations"] / max(pg["seconds"], 1e-9),
        })
    except Exception as e:  # noqa: BLE001 — extras must never kill the line
        extras["error"] = str(e)

    print(
        json.dumps(
            {
                "metric": "batched EKF filter updates/s/chip (fused pallas scan)",
                "value": updates_per_s,
                "unit": "updates/s",
                "vs_baseline": updates_per_s / baseline,
                "extras": extras,
            }
        )
    )


def _bench_grid_cells(jax, jnp):
    """Secondary metric (BASELINE.json): grid cells relaxed/s — one
    wavefront sweep relaxes W·H cells; a batch of B maps sweeps in
    parallel. Counts cells × sweeps executed by the while_loop."""
    import numpy as np

    from rust_robotics_tpu.planning.wavefront import (
        goal_raster, wavefront_costs)

    b, w, h = 64, 128, 128
    key = jax.random.PRNGKey(1)
    free = jax.random.uniform(key, (b, w, h)) > 0.2
    free = free.at[:, 0, 0].set(True).at[:, -1, -1].set(True)
    goals = jnp.broadcast_to(
        goal_raster((w, h), jnp.array([w - 1, h - 1])), (b, w, h))

    run = jax.jit(lambda f: wavefront_costs(f, goals))
    costs = run(free)
    np.asarray(costs)
    # sweeps until fixpoint ≈ longest shortest-path length; bound by the
    # observed max finite distance in moves (diag steps ≈ dist/1)
    finite = np.asarray(costs)[np.isfinite(np.asarray(costs))]
    sweeps = max(int(finite.max() / 1.0), 1) if finite.size else w + h
    import time as _time

    vals = []
    reps = 10
    for _ in range(5):
        t0 = _time.perf_counter()
        for _ in range(reps):
            costs = run(free)
        float(costs[0, 0, 0])  # scalar completion fence, no bulk readback
        vals.append((_time.perf_counter() - t0) / reps)
    per = float(np.min(vals))  # one-sided noise -> min is consistent
    return b * w * h * sweeps / per


def _bench_resample(jax, jnp, on_tpu):
    """Secondary metric: fused Pallas systematic resampling throughput."""
    import numpy as np
    import time as _time

    from rust_robotics_tpu.ops.resample_pallas import (
        systematic_resample_gather)

    def one(b, p, d, reps):
        k = jax.random.PRNGKey(2)
        wgt = jax.random.uniform(jax.random.fold_in(k, 1), (b, p),
                                 jnp.float32) + 1e-6
        u = jax.random.uniform(jax.random.fold_in(k, 2), (b,), jnp.float32)
        s = jax.random.normal(jax.random.fold_in(k, 3), (b, d, p),
                              jnp.float32)
        run = jax.jit(
            lambda w_, u_, s_: systematic_resample_gather(w_, u_, s_))
        out = run(wgt, u, s)
        np.asarray(out[1])
        vals = []
        for _ in range(5):
            t0 = _time.perf_counter()
            for _ in range(reps):
                out = run(wgt, u, s)
            float(out[1].ravel()[0])  # scalar completion fence
            vals.append((_time.perf_counter() - t0) / reps)
        per = float(np.min(vals))  # one-sided noise -> min is consistent
        return b * p / per

    if not on_tpu:
        return one(16, 256, 4, 20)
    # the historical pinned config (latency-dominated at B=256) AND the
    # saturated deployment config (VERDICT r3 #5) are both recorded; the
    # scalar return stays the pinned config for cross-round comparability
    pinned = one(256, 1024, 4, 20)
    saturated = one(8192, 1024, 4, 5)
    tiled_4096 = one(2048, 4096, 4, 5)
    return {"pinned_b256_p1024": pinned,
            "saturated_b8192_p1024": saturated,
            "tiled_b2048_p4096": tiled_4096}


def _bench_pose_graph_grid():
    """NON-chain flagship (VERDICT r3 #2): 100x100 grid pose graph + 50
    long closures on the RCM-banded supernodal direct solver
    (nlls/banded.py). The reference's block-sparse PCG needs 8.62 s for
    its 10k CHAIN benchmark (README.md:730); the banded solve must beat
    that on a topology with no odometry chain at all."""
    from rust_robotics_tpu.demos.pose_graph_bench import run_grid_benchmark

    runs = [run_grid_benchmark(100, 100, 50) for _ in range(2)]
    seconds, err, iters = min(runs, key=lambda r: r[0])
    return {"seconds": seconds, "rmse": err, "lm_iterations": iters,
            "reference_chain_seconds": 8.62}


def _bench_pose_graph_10k():
    """Flagship large-NLLS workload (README.md:728-730: reference 8.62 s
    single-core at RMSE <= 2.2e-3): device-resident LM + matfree-PCG on the
    10k-pose chain. Reports wall-clock (excl. compile) and RMSE."""
    from rust_robotics_tpu.demos.pose_graph_bench import run_large_benchmark

    # two timed runs, keep the faster (one-sided relay noise)
    runs = [run_large_benchmark(10000, device_resident=True)
            for _ in range(2)]
    seconds, err, iters = min(runs, key=lambda r: r[0])
    return {"seconds": seconds, "rmse": err, "lm_iterations": iters,
            "reference_seconds": 8.62}


def _bench_pose_graph_100k():
    """Closure-rich capacity row (round 5): 100k-pose chain with 999
    stride-100 closures through the two-level nested elimination
    (chain_nested_solve auto-engages in solve_chain_lm). One timed run —
    the solve is short (~1.5 s) but the compile is a minute; a second
    run buys little."""
    from rust_robotics_tpu.demos.pose_graph_bench import (
        run_large_benchmark)

    seconds, err, iters = run_large_benchmark(100000,
                                              device_resident=True)
    return {"seconds": seconds, "rmse": err, "lm_iterations": iters,
            "solver": "nested"}


def _bench_pose_graph_serving():
    """Batched small-graph serving (VERDICT r4 #5): 256 distinct 200-pose
    graphs solved concurrently by the vmapped device-resident LM. Two
    captures: lock-step (one vmapped while_loop; converged lanes ride
    until the slowest lane exits) and round-compaction (converged
    instances leave the batch between 6-iteration rounds). Measured
    verdict: at this size lock-step is effectively free — the whole
    256-graph batch costs ~8 ms per LM iteration, less than one
    round's host gather/compact round-trip, so compaction LOSES (~2x).
    The round-4 '164 graphs/s' row was a timing-harness artifact (a
    fetch-program compile inside the timed region — see
    run_batched_benchmark); the true lock-step rate is ~1350 graphs/s."""
    from rust_robotics_tpu.demos.pose_graph_bench import (
        run_batched_benchmark,
        run_batched_compaction_benchmark,
    )

    runs = [run_batched_benchmark(size=200, batch=256, max_iterations=25)
            for _ in range(2)]
    seconds, worst, rate = min(runs, key=lambda r: r[0])
    c_seconds, c_worst, c_rate, profile = \
        run_batched_compaction_benchmark(tolerance=1e-6)
    return {
        "lockstep": {"seconds": seconds, "worst_rmse": worst,
                     "graphs_per_s": rate},
        "compaction": {"seconds": c_seconds, "worst_rmse": c_worst,
                       "graphs_per_s": c_rate,
                       "rounds": [list(map(int, p)) for p in profile]},
        "batch": 256, "size": 200,
    }


if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # noqa: BLE001 — always emit a line for the driver
        print(json.dumps({"metric": "batched EKF filter updates/s/chip",
                          "value": 0.0, "unit": "updates/s",
                          "vs_baseline": 0.0, "error": str(e)}))
        sys.exit(1)
