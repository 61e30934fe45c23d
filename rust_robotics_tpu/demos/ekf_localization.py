"""EKF localization demo: deterministic closed-loop sim.

Reproduces the reference gallery demo
(crates/rust_robotics/examples/render_gif_ekf_localization.rs:16-76):
a robot drives a circle (v=1.0, omega=0.1, dt=0.1, 330 steps) starting at
(10, 0, pi/2, 0); odometry and a GPS-like position sensor are corrupted by
the reference's *deterministic* sinusoid pseudo-noise (:21-24), so outputs
are bit-stable and directly comparable across implementations.

TPU-native shape: the whole closed loop is ONE `lax.scan` under jit, and an
optional batch axis runs B independent replicas (phase-shifted noise) in a
single fused program — the "≥10⁶ filter updates/s/chip" workload.
"""

import functools

import jax
import jax.numpy as jnp

from rust_robotics_tpu.core.types import GaussianBelief
from rust_robotics_tpu.filters.kalman import ekf_step, unicycle_position_model


def deterministic_noise(k, scale, phase):
    """`render_gif_ekf_localization.rs:21-24`: scale*sin(0.13 t + phase)
    + 0.5*scale*cos(0.07 t + 1.3*phase)."""
    t = k.astype(jnp.result_type(float)) if hasattr(k, "astype") else float(k)
    return scale * jnp.sin(0.13 * t + phase) + 0.5 * scale * jnp.cos(
        0.07 * t + 1.3 * phase
    )


def default_ekf_noise(dtype=None):
    """EKFConfig::default() (ekf.rs:36-46): Q = diag(0.1², 0.1², (1°)², 0.1²),
    R = I₂."""
    dtype = dtype or jnp.result_type(float)
    q = jnp.diag(
        jnp.array(
            [0.1**2, 0.1**2, jnp.deg2rad(1.0) ** 2, 0.1**2], dtype=dtype
        )
    )
    r = jnp.eye(2, dtype=dtype)
    return q, r


@functools.partial(jax.jit, static_argnames=("steps", "filter_step"))
def run_ekf_localization_demo(
    steps: int = 330,
    dt: float = 0.1,
    v_true: float = 1.0,
    w_true: float = 0.1,
    noise_phase_offset=0.0,
    filter_step=ekf_step,
):
    """Run the closed-loop demo; returns dict of per-step arrays.

    `noise_phase_offset` may be a scalar or a batch vector [B] — in the
    batched case every output gains a leading [B] axis and B independent
    filters run fused (the reference runs exactly one, sequentially).

    Truth integration order matches the reference (:54-57): x,y advance with
    the *old* yaw, then yaw advances.
    """
    q, r = default_ekf_noise()
    model = unicycle_position_model()
    offset = jnp.asarray(noise_phase_offset, dtype=jnp.result_type(float))
    batch_shape = offset.shape

    init_state = jnp.broadcast_to(
        jnp.array([10.0, 0.0, jnp.pi / 2, 0.0], dtype=q.dtype),
        batch_shape + (4,),
    )
    init_cov = jnp.broadcast_to(jnp.eye(4, dtype=q.dtype), batch_shape + (4, 4))
    belief0 = GaussianBelief(init_state, init_cov)

    def step(carry, k):
        truth, belief = carry
        x, y, yaw, _ = truth[..., 0], truth[..., 1], truth[..., 2], truth[..., 3]
        x = x + v_true * jnp.cos(yaw) * dt
        y = y + v_true * jnp.sin(yaw) * dt
        yaw = yaw + w_true * dt
        truth = jnp.stack([x, y, yaw, jnp.full_like(x, v_true)], axis=-1)

        kf = k.astype(q.dtype)
        control = jnp.stack(
            [
                v_true + deterministic_noise(kf, 0.12, 0.2 + offset),
                w_true + deterministic_noise(kf, 0.04, 1.0 + offset),
            ],
            axis=-1,
        )
        z = jnp.stack(
            [
                x + deterministic_noise(kf, 0.6, 2.0 + offset),
                y + deterministic_noise(kf, 0.6, 2.7 + offset),
            ],
            axis=-1,
        )
        belief = filter_step(belief, z, control, dt, q, r, model)
        return (truth, belief), {
            "truth": truth,
            "estimate": belief.mean,
            "measurement": z,
            "cov": belief.cov,
        }

    (_, final_belief), trace = jax.lax.scan(
        step, (init_state, belief0), jnp.arange(steps)
    )
    # scan stacks time first: [T, ...B..., d] -> move time after batch axes
    trace = jax.tree.map(lambda a: jnp.moveaxis(a, 0, len(batch_shape)), trace)
    trace["final_mean"] = final_belief.mean
    trace["final_cov"] = final_belief.cov
    return trace
