"""Motion models for the shared 2D unicycle demo problem.

Reference: the motion model every localizer in the reference shares
(localization/src/ekf.rs:203-212 `motion_model`, :214-233 `jacobian_f`):

    x' = x + dt * v * cos(yaw)
    y' = y + dt * v * sin(yaw)
    yaw' = yaw + dt * omega
    v' = v                      (velocity is overwritten by the control)

State is [x, y, yaw, v]; control is [v, omega]. All functions here are pure,
batched over leading dims, and differentiable; the Jacobian is analytic and
matches the reference's F (note the zeroed last row: v' = u_v, so dv'/dx = 0
for every state component — ekf.rs:214-233).
"""

import jax
import jax.numpy as jnp


def unicycle_propagate(state, control, dt):
    """State [..., 4], control [..., 2] -> next state [..., 4]. `ekf.rs:203`."""
    x, y, yaw = state[..., 0], state[..., 1], state[..., 2]
    v, omega = control[..., 0], control[..., 1]
    parts = jnp.broadcast_arrays(
        x + dt * v * jnp.cos(yaw),
        y + dt * v * jnp.sin(yaw),
        yaw + dt * omega,
        v,
    )
    return jnp.stack(parts, axis=-1)


def unicycle_jacobian(state, control, dt):
    """Analytic dF/dstate [..., 4, 4] evaluated like the reference.

    The reference evaluates the Jacobian at the *predicted* state
    (ekf.rs:318-321: `jacobian_f(&x_pred, ...)`); callers here follow the
    same convention. Last row is zero (v' depends only on the control).
    """
    yaw = state[..., 2]
    v = control[..., 0]
    z = jnp.zeros_like(yaw)
    one = jnp.ones_like(yaw)
    row0 = jnp.stack([one, z, -dt * v * jnp.sin(yaw), z], axis=-1)
    row1 = jnp.stack([z, one, dt * v * jnp.cos(yaw), z], axis=-1)
    row2 = jnp.stack([z, z, one, z], axis=-1)
    row3 = jnp.stack([z, z, z, z], axis=-1)
    return jnp.stack([row0, row1, row2, row3], axis=-2)


def unicycle_jacobian_autodiff(state, control, dt):
    """Autodiff Jacobian (sanity check against the analytic form)."""
    return jax.jacobian(lambda s: unicycle_propagate(s, control, dt))(state)
