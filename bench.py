"""Benchmark: batched EKF filter updates/s on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline (BASELINE.md): the reference runs 1000 sequential EKF steps in
0.19 ms on one CPU core -> 5.26e6 updates/s. Driver target (BASELINE.json):
>= 1e6 updates/s/chip.

Workload: B=131072 independent EKF localizers (the reference's 4-state
unicycle + GPS problem, ekf.rs:17-24) stepped T=200 times by the fused
Pallas kernel (rust_robotics_tpu/ops/ekf_pallas.py) — the full predict+
update chain runs in VMEM with batch on the lane axis. Measurement uses the
marginal cost of additional calls (first-dispatch latency through the axon
relay is excluded); correctness of the kernel vs the generic jnp path is
pinned by tests/test_ekf_pallas.py.
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
    tile = 1024 if on_tpu else 512
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
        # n kernel executions CANNOT overlap or be elided; the host readback
        # at the end forces completion (block_until_ready alone under-reports
        # through the async axon relay)
        for _ in range(n):
            m, p = ekf_scan_lanes(zs, us, m, p, 0.1, q, r, tile=tile)
        np.asarray(m)  # plain device->host transfer, no new compilation
        return m, p

    m, p = chain(mean0, cov0, 3)  # compile + settle

    reps_a, reps_b = 6, 26
    t0 = time.perf_counter()
    m, p = chain(m, p, reps_a)
    t_a = time.perf_counter() - t0
    t0 = time.perf_counter()
    m, p = chain(m, p, reps_b)
    t_b = time.perf_counter() - t0
    # marginal seconds per call (subtracts constant per-burst overhead)
    per_call = max((t_b - t_a) / (reps_b - reps_a), 1e-9)

    updates_per_s = b * t / per_call
    baseline = 1000 / 0.19e-3  # reference: 1000 EKF steps / 0.19 ms
    print(
        json.dumps(
            {
                "metric": "batched EKF filter updates/s/chip (fused pallas scan)",
                "value": updates_per_s,
                "unit": "updates/s",
                "vs_baseline": updates_per_s / baseline,
            }
        )
    )


if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # noqa: BLE001 — always emit a line for the driver
        print(json.dumps({"metric": "batched EKF filter updates/s/chip",
                          "value": 0.0, "unit": "updates/s",
                          "vs_baseline": 0.0, "error": str(e)}))
        sys.exit(1)
