"""Iterative linear MPC closed-loop tracking test (mpc.rs
run_mpc_simulation shape)."""

import jax
import jax.numpy as jnp
import numpy as np

from rust_robotics_tpu.control.mpc import (
    MPCConfig,
    bicycle_model,
    calc_ref_trajectory,
    calc_speed_profile,
    mpc_control,
    nearest_index,
)
from rust_robotics_tpu.planning.curves import calc_spline_course


def test_mpc_tracks_course():
    cfg = MPCConfig()
    wx = jnp.array([0.0, 15.0, 30.0, 50.0, 60.0])
    wy = jnp.array([0.0, 8.0, -4.0, 6.0, 0.0])
    cx, cy, cyaw, ck, s = calc_spline_course(wx, wy, ds=1.0)
    sp = calc_speed_profile(cyaw, 10.0 / 3.6)

    state = jnp.array([0.0, -1.0, 0.0, float(cyaw[0])])
    u = jnp.zeros((cfg.horizon, 2))
    ind = jnp.asarray(0)

    @jax.jit
    def step(state, u, ind):
        ind = nearest_index(state, cx, cy, ind)
        xref = calc_ref_trajectory(state, cx, cy, cyaw, sp, ind, cfg)
        # reference layout [x, y, v, yaw]
        xref = jnp.stack(
            [xref[:, 0], xref[:, 1], xref[:, 2], xref[:, 3]], axis=-1
        )
        u_new, xs, _ = mpc_control(state, xref, u, cfg)
        state = bicycle_model(state, u_new[0], cfg.dt, cfg.wheelbase)
        u_shift = jnp.concatenate([u_new[1:], u_new[-1:]])
        return state, u_shift, ind

    traj = []
    for _ in range(150):
        state, u, ind = step(state, u, ind)
        traj.append(np.asarray(state))
    traj = np.stack(traj)

    # vehicle reaches cruise speed and follows the course
    assert traj[:, 2].max() > 2.0
    assert traj[-1, 0] > 30.0, traj[-1]
    # cross-track error after settling
    d = np.sqrt(
        (traj[50:, 0:1] - np.asarray(cx)[None, :]) ** 2
        + (traj[50:, 1:2] - np.asarray(cy)[None, :]) ** 2
    ).min(axis=1)
    assert d.mean() < 1.0, d.mean()


def test_mpc_respects_control_limits():
    cfg = MPCConfig()
    xref = jnp.zeros((cfg.horizon + 1, 4)).at[:, 0].set(
        jnp.linspace(0, 20, cfg.horizon + 1)
    ).at[:, 2].set(5.0)
    u, xs, _ = mpc_control(jnp.zeros(4), xref, jnp.zeros((cfg.horizon, 2)), cfg)
    assert float(jnp.max(jnp.abs(u[:, 0]))) <= cfg.max_accel + 1e-9
    assert float(jnp.max(jnp.abs(u[:, 1]))) <= cfg.max_steer + 1e-9
    # accelerates toward the fast reference
    assert float(u[0, 0]) > 0.5
