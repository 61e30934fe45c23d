"""Benchmark: batched EKF filter updates/s on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline (BASELINE.md): the reference runs 1000 sequential EKF steps in
0.19 ms on one CPU core -> 5.26e6 updates/s. `vs_baseline` is our
updates/s/chip divided by that number. Driver target: >= 1e6 updates/s/chip
(trivially) and as far beyond the reference as the chip allows.

Workload: B independent EKF localizers (state dim 4, measurement dim 2,
the reference's unicycle demo problem) stepped T times under one jitted
lax.scan — predict + update per step, f32.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp


def main():
    from rust_robotics_tpu.core.types import GaussianBelief
    from rust_robotics_tpu.filters.kalman import ekf_step, unicycle_position_model

    dev = jax.devices()[0]
    platform = dev.platform
    b = 131072 if platform != "cpu" else 8192
    t = 200
    dtype = jnp.float32

    model = unicycle_position_model()
    q = jnp.diag(jnp.array([0.01, 0.01, 3e-4, 0.01], dtype=dtype))
    r = jnp.eye(2, dtype=dtype)

    mean0 = jnp.zeros((b, 4), dtype=dtype).at[:, 2].set(jnp.pi / 2)
    cov0 = jnp.broadcast_to(jnp.eye(4, dtype=dtype), (b, 4, 4))
    phase = jnp.linspace(0.0, 6.28, b, dtype=dtype)

    @jax.jit
    def rollout(mean, cov, phase):
        belief0 = GaussianBelief(mean, cov)

        def step(belief, k):
            kf = k.astype(dtype)
            u = jnp.stack(
                [1.0 + 0.1 * jnp.sin(0.13 * kf + phase),
                 0.1 + 0.01 * jnp.cos(0.07 * kf + phase)],
                axis=-1,
            )
            z = belief.mean[..., :2] + 0.1 * jnp.sin(kf + phase)[..., None]
            belief = ekf_step(belief, z, u, 0.1, q, r, model)
            return belief, None

        belief, _ = jax.lax.scan(step, belief0, jnp.arange(t))
        return belief.mean

    # warmup/compile
    out = rollout(mean0, cov0, phase)
    out.block_until_ready()

    reps = 5
    start = time.perf_counter()
    for _ in range(reps):
        out = rollout(mean0, cov0, phase)
    out.block_until_ready()
    elapsed = time.perf_counter() - start

    updates_per_s = reps * b * t / elapsed
    baseline = 1000 / 0.19e-3  # reference: 1000 EKF steps / 0.19 ms
    print(
        json.dumps(
            {
                "metric": "batched EKF filter updates/s/chip",
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
