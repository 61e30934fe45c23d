"""N-device scaling-efficiency report (SURVEY §7.2 M6).

The reference has nothing to compare here (it is single-threaded); the
BASELINE.json target is "≥80% 4-host scaling efficiency" on the new TPU
architecture. This module is the measurement harness: it runs the flagship
sharded training step (train.py: DP batch sharding + TP landmark sharding
with explicit psum collectives) at weak scale — per-device workload held
constant while the mesh grows — and reports steps/s, items/s, and
efficiency vs the 1-device run.

On the CI "fake cluster" (XLA_FLAGS=--xla_force_host_platform_device_count,
all virtual devices sharing one CPU) the efficiency numbers measure only
that the sharded program COMPILES, RUNS, and keeps per-device math constant
— they are not hardware throughput. On a real slice the same harness emits
the honest report (mesh axes spanning hosts ride DCN, inner axes ICI).

Usage: python -m rust_robotics_tpu.demos.scaling_report [--sizes 1,2,4,8]
"""

from __future__ import annotations

import time
from typing import Sequence

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

__all__ = ["run_scaling_report"]


def _one_mesh_run(n_devices: int, per_device_batch: int, steps: int,
                  reps: int):
    from rust_robotics_tpu.parallel.mesh import make_mesh
    from rust_robotics_tpu.train import make_training_step, synthesize_batch

    mesh = make_mesh(n_devices)
    n_data = mesh.shape["data"]
    n_model = mesh.shape["model"]
    batch = per_device_batch * n_data
    num_landmarks = max(16, 8 * n_model)
    controls, meas, ranges, landmarks, init_mean = synthesize_batch(
        jax.random.PRNGKey(0), batch=batch, steps=steps,
        num_landmarks=num_landmarks)
    controls = jax.device_put(controls, NamedSharding(mesh, P("data")))
    meas = jax.device_put(meas, NamedSharding(mesh, P("data")))
    ranges = jax.device_put(ranges,
                            NamedSharding(mesh, P("data", None, "model")))
    landmarks = jax.device_put(landmarks, NamedSharding(mesh, P("model")))
    init_mean = jax.device_put(init_mean, NamedSharding(mesh, P("data")))

    init_fn, step_fn = make_training_step(mesh)
    params, opt = init_fn()
    params, opt, loss = step_fn(params, opt, controls, meas, ranges,
                                landmarks, init_mean)
    jax.block_until_ready(loss)

    t0 = time.perf_counter()
    for _ in range(reps):
        params, opt, loss = step_fn(params, opt, controls, meas, ranges,
                                    landmarks, init_mean)
    jax.block_until_ready(loss)
    dt = (time.perf_counter() - t0) / reps
    return {
        "devices": n_devices,
        "mesh": f"{n_data}x{n_model}",
        "global_batch": batch,
        "step_s": dt,
        "items_per_s": batch * steps / dt,
        "items_per_s_per_device": batch * steps / dt / n_devices,
        "loss": float(loss),
    }


def run_scaling_report(sizes: Sequence[int] = (1, 2, 4, 8),
                       per_device_batch: int = 8, steps: int = 16,
                       reps: int = 5):
    """Weak-scaling sweep; returns rows with `efficiency` = per-device
    throughput normalized to the 1-device (or smallest) run."""
    avail = len(jax.devices())
    rows = []
    for n in sizes:
        if n > avail:
            continue
        rows.append(_one_mesh_run(n, per_device_batch, steps, reps))
    if rows:
        base = rows[0]["items_per_s_per_device"]
        for r in rows:
            r["efficiency"] = r["items_per_s_per_device"] / base
    return rows


def run_chain_weak_scaling(sizes: Sequence[int] = (1, 2, 4, 8),
                           poses_per_device: int = 2048,
                           max_iterations: int = 8, reps: int = 3):
    """Weak-scaling rows for the FLAGSHIP workload: the SPIKE-partitioned
    chain LM (parallel/sharded_tridiag) at `poses_per_device` poses per
    device. Per-device work is constant; the interface system grows only
    as 2·D·t. Reports solve seconds, poses/s, and efficiency vs the
    smallest mesh (same virtual-device caveat as run_scaling_report)."""
    import numpy as np
    from jax.sharding import Mesh

    from rust_robotics_tpu.demos.pose_graph_bench import (
        rmse,
        synthesize_chain,
    )
    from rust_robotics_tpu.nlls.tridiag import classify_chain_edges
    from rust_robotics_tpu.parallel.sharded_tridiag import (
        make_sharded_chain_solver,
    )
    from rust_robotics_tpu.slam.pose_graph import (
        se2_edge_residual,
        se2_retract,
    )

    avail = len(jax.devices())
    rows = []
    f = jnp.float32
    for n_dev in sizes:
        if n_dev > avail:
            continue
        n_poses = poses_per_device * n_dev
        truth, initial, ef, et, meas, info = synthesize_chain(n_poses)
        (c_meas, c_info, l_ef, l_et, l_meas,
         l_info) = classify_chain_edges(n_poses, ef, et, meas, info)
        fixed = jnp.zeros((n_poses,), bool).at[0].set(True)
        mesh = Mesh(np.asarray(jax.devices()[:n_dev]), ("data",))
        solver = make_sharded_chain_solver(
            mesh, "data", residual_fn=se2_edge_residual,
            retract_fn=se2_retract, tdim=3,
            max_iterations=max_iterations, gradient_tolerance=1e-8,
            step_tolerance=1e-8, cost_tolerance=1e-16)
        args = (jnp.asarray(initial, f), jnp.asarray(c_meas, f),
                jnp.asarray(c_info, f), jnp.asarray(l_ef, jnp.int32),
                jnp.asarray(l_et, jnp.int32), jnp.asarray(l_meas, f),
                jnp.asarray(l_info, f), fixed)
        out, _ = solver(*args)  # compile + settle
        t0 = time.perf_counter()
        for _ in range(reps):
            out, _ = solver(*args)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / reps
        rows.append({
            "devices": n_dev,
            "poses": n_poses,
            "solve_s": dt,
            "poses_per_s": n_poses / dt,
            "poses_per_s_per_device": n_poses / dt / n_dev,
            "rmse": rmse(np.asarray(out), truth),
        })
    if rows:
        base = rows[0]["poses_per_s_per_device"]
        for r in rows:
            r["efficiency"] = r["poses_per_s_per_device"] / base
    return rows


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="1,2,4,8")
    ap.add_argument("--per-device-batch", type=int, default=8)
    ap.add_argument("--chain", action="store_true",
                    help="also run the flagship chain weak-scaling sweep")
    args = ap.parse_args()
    sizes = [int(s) for s in args.sizes.split(",")]
    rows = run_scaling_report(sizes, args.per_device_batch)
    print("devices,mesh,global_batch,step_s,items_per_s,efficiency")
    for r in rows:
        print(f"{r['devices']},{r['mesh']},{r['global_batch']},"
              f"{r['step_s']:.6f},{r['items_per_s']:.1f},"
              f"{r['efficiency']:.3f}")
    if args.chain:
        rows = run_chain_weak_scaling(sizes)
        print("devices,poses,solve_s,poses_per_s,rmse,efficiency")
        for r in rows:
            print(f"{r['devices']},{r['poses']},{r['solve_s']:.4f},"
                  f"{r['poses_per_s']:.1f},{r['rmse']:.2e},"
                  f"{r['efficiency']:.3f}")
