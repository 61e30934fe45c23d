"""Flagship differentiable-localization training step.

The reference has no gradient story at all (SURVEY.md §7.3 item 7); this is
the new TPU-first capability that headlines the framework: *system
identification through the filter* — fit process/measurement noise (and any
model parameter) by gradient descent through a batched EKF rollout plus a
landmark-range likelihood, sharded over a ('data', 'model') mesh:

- batch of trajectories  → `data` axis (DP; gradient psum over data)
- landmark table         → `model` axis (TP; partial likelihoods psum over
                            model — the ADMM-consensus-style reduction of
                            SURVEY.md §2.12)

The whole loss is a `shard_map` program: local EKF scan over the local
batch shard, local landmark partial sums over the local landmark shard,
explicit `psum` over both axes. `jax.grad` differentiates through the
shard_map (psum transposes to identity/psum as appropriate), and optax
applies the update on replicated parameters.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from rust_robotics_tpu.core.types import GaussianBelief, pytree_dataclass
from rust_robotics_tpu.ops.smallmat import det_small, solve_spd_small
from rust_robotics_tpu.filters.kalman import (
    ekf_step_with_innovation,
    unicycle_position_model,
)

try:
    from jax import shard_map  # jax >= 0.8 API

    def _shard_map(f, mesh, in_specs, out_specs):
        return shard_map(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs)
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map as _esm

    def _shard_map(f, mesh, in_specs, out_specs):
        return _esm(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs)


@pytree_dataclass
class SysIdParams:
    """Unconstrained noise parameters: diag Q = softplus(log_q)², etc."""

    log_q: Any  # [4]
    log_r: Any  # [2]


def init_params(dtype=jnp.float32):
    return SysIdParams(
        log_q=jnp.log(jnp.array([0.1, 0.1, 0.02, 0.1], dtype=dtype)),
        log_r=jnp.log(jnp.array([1.0, 1.0], dtype=dtype)),
    )


def _noise_matrices(params):
    q = jnp.diag(jax.nn.softplus(params.log_q) ** 2)
    r = jnp.diag(jax.nn.softplus(params.log_r) ** 2)
    return q, r


def ekf_innovation_nll(params, controls, measurements, init_mean, dt=0.1):
    """Mean innovation negative log-likelihood of a batched EKF rollout.

    controls [B, T, 2], measurements [B, T, 2], init_mean [B, 4].
    ½·(yᵀS⁻¹y + logdet S) summed over time, averaged over batch — the
    classic MLE objective for Kalman noise identification. Also returns the
    batch of final means (diagnostics).
    """
    q, r = _noise_matrices(params)
    model = unicycle_position_model()
    b = init_mean.shape[0]
    # derive cov0 from init_mean (0·mean + I) so its sharding/varying axes
    # match the scan carry under shard_map (JAX vma rule)
    cov0 = jnp.eye(4, dtype=init_mean.dtype) + 0.0 * init_mean[..., :, None]
    belief0 = GaussianBelief(init_mean, cov0)

    def step(belief, zu):
        z, u = zu
        belief, y, s = ekf_step_with_innovation(belief, z, u, dt, q, r, model)
        sol = solve_spd_small(s, y[..., None])[..., 0]
        nll = 0.5 * (
            jnp.sum(y * sol, axis=-1)
            + jnp.log(jnp.clip(det_small(s), 1e-30, None))
        )
        return belief, (nll, belief.mean[..., :2])

    zs = jnp.moveaxis(measurements, 1, 0)
    us = jnp.moveaxis(controls, 1, 0)
    _, (nlls, xy) = jax.lax.scan(step, belief0, (zs, us))
    # [B], [B, T, 2]
    return jnp.sum(nlls, axis=0), jnp.moveaxis(xy, 0, 1)


def landmark_range_sq_error(est_xy, landmarks, observed_ranges):
    """Σ over (T, L) of (‖xy − lm‖ − r_obs)² for the local landmark shard.

    est_xy [T, 2] (or [B, T, 2]), landmarks [L, 2],
    observed_ranges [..., T, L].
    """
    d = jnp.linalg.norm(est_xy[..., None, :] - landmarks, axis=-1)
    return jnp.sum((d - observed_ranges) ** 2, axis=(-2, -1))


def make_loss(mesh, dt=0.1, landmark_weight=0.01):
    """Build the shard_mapped scalar loss over the ('data','model') mesh."""

    def local_loss(params, controls, measurements, ranges, landmarks, init_mean):
        # local shards: controls/measurements/init_mean carry the data-shard,
        # landmarks the model-shard, ranges both.
        nll, xy = ekf_innovation_nll(params, controls, measurements, init_mean, dt)
        b_local = init_mean.shape[0]
        dtype = xy.dtype
        b_total = jax.lax.psum(jnp.asarray(b_local, dtype), "data")
        # nll is identical on every model shard (inputs replicated over
        # 'model'), so reduce over 'data' only.
        nll_total = jax.lax.psum(jnp.sum(nll), "data")
        lm_total = jax.lax.psum(
            jnp.sum(landmark_range_sq_error(xy, landmarks, ranges)),
            ("data", "model"),
        )
        return nll_total / b_total + landmark_weight * lm_total / b_total

    return _shard_map(
        local_loss,
        mesh,
        in_specs=(
            P(),            # params replicated
            P("data"),      # controls [B, T, 2]
            P("data"),      # measurements [B, T, 2]
            P("data", None, "model"),  # ranges [B, T, L]
            P("model"),     # landmarks [L, 2]
            P("data"),      # init_mean [B, 4]
        ),
        out_specs=P(),
    )


def make_training_step(mesh, learning_rate=1e-2, dt=0.1, landmark_weight=0.01):
    """Returns (init_fn, step_fn): a jitted sharded SGD/Adam step."""
    loss_fn = make_loss(mesh, dt=dt, landmark_weight=landmark_weight)
    tx = optax.adam(learning_rate)

    def init_fn(dtype=jnp.float32):
        params = init_params(dtype)
        return params, tx.init(params)

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step_fn(params, opt_state, controls, measurements, ranges, landmarks,
                init_mean):
        loss, grads = jax.value_and_grad(loss_fn)(
            params, controls, measurements, ranges, landmarks, init_mean
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return init_fn, step_fn


def synthesize_batch(key, batch=8, steps=16, num_landmarks=16, dt=0.1,
                     dtype=jnp.float32):
    """Tiny synthetic dataset for smoke tests / the multichip dryrun."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    init_mean = jnp.zeros((batch, 4), dtype=dtype).at[:, 0].set(
        jax.random.uniform(k1, (batch,), dtype=dtype)
    )
    controls = jnp.stack(
        [
            jnp.ones((batch, steps), dtype=dtype),
            0.1 * jnp.ones((batch, steps), dtype=dtype),
        ],
        axis=-1,
    )
    # crude truth rollouts for measurements
    t = jnp.arange(steps, dtype=dtype) * dt
    x = init_mean[:, :1] + t[None, :]
    y = jnp.broadcast_to(0.05 * t[None, :] ** 2, x.shape)
    meas = jnp.stack([x, y], axis=-1) + 0.1 * jax.random.normal(
        k2, (batch, steps, 2), dtype=dtype
    )
    landmarks = 10.0 * jax.random.normal(k3, (num_landmarks, 2), dtype=dtype)
    truth_xy = jnp.stack([x, y], axis=-1)
    ranges = jnp.linalg.norm(
        truth_xy[:, :, None, :] - landmarks[None, None], axis=-1
    ) + 0.1 * jax.random.normal(k4, (batch, steps, num_landmarks), dtype=dtype)
    return controls, meas, ranges, landmarks, init_mean
