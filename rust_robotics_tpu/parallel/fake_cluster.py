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


if __name__ == "__main__":
    if len(sys.argv) > 4 and sys.argv[4] == "pipeline":
        run_pipeline_worker(sys.argv[1], int(sys.argv[2]), int(sys.argv[3]))
    else:
        run_worker(sys.argv[1], int(sys.argv[2]), int(sys.argv[3]))
