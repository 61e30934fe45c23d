"""Multi-process "fake cluster" worker (SURVEY §4/§7.2 M6).

The reference has no distributed tests (nothing distributed exists to
test); the TPU build adds them: this worker runs the flagship sharded
training step under `jax.distributed.initialize` with the CPU gloo
collectives backend, one device per process — the same code path that
spans hosts over DCN on a real slice. The test harness
(tests/test_fake_cluster.py) launches N of these processes and checks
that (a) collectives complete, (b) every process computes the SAME global
loss, and (c) it matches the single-process value on an equivalent
virtual mesh.

Run directly:  python -m rust_robotics_tpu.parallel.fake_cluster \
                   <coordinator> <num_processes> <process_id>
"""

from __future__ import annotations

import sys


def run_worker(coordinator: str, num_processes: int, process_id: int,
               batch_per_proc: int = 4, steps: int = 8):
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(coordinator, num_processes=num_processes,
                               process_id=process_id)

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from rust_robotics_tpu.train import make_training_step, synthesize_batch

    devices = np.asarray(jax.devices())
    assert len(devices) == num_processes, devices
    mesh = Mesh(devices.reshape(num_processes, 1), ("data", "model"))

    batch = batch_per_proc * num_processes
    controls, meas, ranges, landmarks, init_mean = synthesize_batch(
        jax.random.PRNGKey(0), batch=batch, steps=steps, num_landmarks=16)

    def put(x, spec):
        return jax.device_put(np.asarray(x), NamedSharding(mesh, spec))

    controls = put(controls, P("data"))
    meas = put(meas, P("data"))
    ranges = put(ranges, P("data", None, "model"))
    landmarks = put(landmarks, P("model"))
    init_mean = put(init_mean, P("data"))

    init_fn, step_fn = make_training_step(mesh)
    params, opt = init_fn()
    loss = None
    for _ in range(2):
        params, opt, loss = step_fn(params, opt, controls, meas, ranges,
                                    landmarks, init_mean)
    # loss is fully replicated — every process reads the same global value
    print(f"FAKECLUSTER proc={process_id} loss={float(loss):.10f}",
          flush=True)
    jax.distributed.shutdown()


def run_pipeline_worker(coordinator: str, num_processes: int,
                        process_id: int):
    """Cross-process pipeline stage: each process hosts one stage of the
    systolic `pipeline_shard_map`; microbatches hop the process boundary
    via ppermute over gloo (SURVEY §2.12 PP row, multi-host form)."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(coordinator, num_processes=num_processes,
                               process_id=process_id)

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh

    from rust_robotics_tpu.parallel.pipeline import pipeline_shard_map

    devices = np.asarray(jax.devices())
    assert len(devices) == num_processes
    mesh = Mesh(devices, ("pipe",))

    xs = jnp.arange(10.0 * 3).reshape(10, 3) / 7.0

    def stage_fn(stage, x):
        return jnp.tanh(x * (stage + 1.5)) + stage

    ys = pipeline_shard_map(stage_fn, xs, mesh)
    want = xs
    for s in range(num_processes):
        want = jnp.tanh(want * (s + 1.5)) + s
    err = float(jnp.max(jnp.abs(ys - want)))
    print(f"FAKEPIPE proc={process_id} err={err:.3e} "
          f"sum={float(jnp.sum(ys)):.10f}", flush=True)
    jax.distributed.shutdown()


def run_spike_worker(coordinator: str, num_processes: int,
                     process_id: int, n_poses: int = 512):
    """Cross-process FLAGSHIP solve: the SPIKE-partitioned chain LM
    (parallel/sharded_tridiag) with each process hosting one mesh slot —
    the ppermute halos, interface all_gather and Woodbury psums all cross
    the process boundary over gloo (the DCN path of a real slice)."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(coordinator, num_processes=num_processes,
                               process_id=process_id)

    import jax.numpy as jnp
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

    devices = np.asarray(jax.devices())
    assert len(devices) == num_processes
    mesh = Mesh(devices, ("data",))

    truth, initial, ef, et, meas, info = synthesize_chain(n_poses)
    cm, ci, lf, lt, lm, li = classify_chain_edges(
        n_poses, ef, et, meas, info)
    fixed = jnp.zeros((n_poses,), bool).at[0].set(True)
    solver = make_sharded_chain_solver(
        mesh, "data", residual_fn=se2_edge_residual,
        retract_fn=se2_retract, tdim=3, max_iterations=12,
        gradient_tolerance=1e-8, step_tolerance=1e-8,
        cost_tolerance=1e-16)
    f = jnp.float32
    out, summ = solver(
        jnp.asarray(initial, f), jnp.asarray(cm, f), jnp.asarray(ci, f),
        jnp.asarray(lf, jnp.int32), jnp.asarray(lt, jnp.int32),
        jnp.asarray(lm, f), jnp.asarray(li, f), fixed)
    # the solution is globally sharded across processes — gather it
    from jax.experimental import multihost_utils

    out_global = multihost_utils.process_allgather(out, tiled=True)
    err = rmse(np.asarray(out_global), truth)
    print(f"FAKESPIKE proc={process_id} rmse={err:.8e} "
          f"cost={float(summ.final_cost):.10f} "
          f"iters={int(summ.iterations)}", flush=True)
    jax.distributed.shutdown()


if __name__ == "__main__":
    if len(sys.argv) > 4 and sys.argv[4] == "pipeline":
        run_pipeline_worker(sys.argv[1], int(sys.argv[2]), int(sys.argv[3]))
    elif len(sys.argv) > 4 and sys.argv[4] == "spike":
        run_spike_worker(sys.argv[1], int(sys.argv[2]), int(sys.argv[3]))
    else:
        run_worker(sys.argv[1], int(sys.argv[2]), int(sys.argv[3]))
