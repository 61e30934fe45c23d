"""Aerial control: quintic 3D trajectory segments + PD quadrotor tracking,
minimum-snap trajectories.

Reference (crates/rust_robotics_control/src/): drone_3d_trajectory.rs
(931 LoC: per-axis quintic segments between waypoints + PD attitude/thrust
tracking of a point-mass quadrotor), minimum_snap_trajectory.rs (318:
7th-order minimum-snap segment solve).

TPU-native: per-axis polynomial solves batch over (segments × axes); the
quadrotor sim is a `lax.scan`.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from rust_robotics_tpu.planning.curves import QuinticPolynomial


def quintic_3d_segments(waypoints, segment_time):
    """Rest-to-rest quintic per segment per axis (drone_3d_trajectory.rs).
    waypoints [N, 3]; returns coeffs [N-1, 3, 6]."""
    wp = jnp.asarray(waypoints)

    def seg(a, b):
        return jax.vmap(
            lambda xs, xe: QuinticPolynomial.boundary(
                xs, 0.0, 0.0, xe, 0.0, 0.0, segment_time
            ).coeffs
        )(a, b)

    return jax.vmap(seg)(wp[:-1], wp[1:])


def eval_quintic_3d(coeffs, seg_idx, t):
    """Position/velocity/accel of segment `seg_idx` at local time t."""
    c = coeffs[seg_idx]  # [3, 6]
    powers = jnp.stack([t**k for k in range(6)])
    dpow = jnp.stack(
        [jnp.zeros_like(t), jnp.ones_like(t), 2 * t, 3 * t**2, 4 * t**3, 5 * t**4]
    )
    ddpow = jnp.stack(
        [jnp.zeros_like(t), jnp.zeros_like(t), 2 * jnp.ones_like(t), 6 * t,
         12 * t**2, 20 * t**3]
    )
    return c @ powers, c @ dpow, c @ ddpow


@dataclasses.dataclass(frozen=True)
class QuadPDConfig:
    kp: float = 8.0
    kd: float = 5.0
    mass: float = 1.0
    gravity: float = 9.81


def quad_pd_accel(pos, vel, pos_ref, vel_ref, acc_ref,
                  cfg: QuadPDConfig = QuadPDConfig()):
    """Desired world acceleration command (PD + feedforward)
    (drone_3d_trajectory.rs PD tracking)."""
    return (
        acc_ref
        + cfg.kp * (pos_ref - pos)
        + cfg.kd * (vel_ref - vel)
        + jnp.array([0.0, 0.0, cfg.gravity])
    )


def simulate_quadrotor(coeffs, segment_time, dt=0.02,
                       cfg: QuadPDConfig = QuadPDConfig()):
    """Point-mass quadrotor following the quintic segments; returns
    (positions [K, 3], refs [K, 3])."""
    n_seg = coeffs.shape[0]
    total = n_seg * segment_time
    steps = int(total / dt)

    def step(carry, k):
        pos, vel = carry
        t = k * dt
        si = jnp.minimum((t / segment_time).astype(jnp.int32), n_seg - 1)
        tl = t - si * segment_time
        p_ref, v_ref, a_ref = eval_quintic_3d(coeffs, si, tl)
        acc_cmd = quad_pd_accel(pos, vel, p_ref, v_ref, a_ref, cfg)
        acc = acc_cmd - jnp.array([0.0, 0.0, cfg.gravity])  # thrust minus g
        vel = vel + acc * dt
        pos = pos + vel * dt
        return (pos, vel), (pos, p_ref)

    p0, _, _ = eval_quintic_3d(coeffs, jnp.asarray(0), jnp.asarray(0.0))
    (_, _), (ps, refs) = jax.lax.scan(
        step, (p0, jnp.zeros(3)), jnp.arange(steps, dtype=jnp.result_type(float))
    )
    return ps, refs


def minimum_snap_coeffs(waypoints_1d, segment_times):
    """Single-axis minimum-snap through waypoints: 7th-order per segment
    with continuity of derivatives up to snap at interior knots
    (minimum_snap_trajectory.rs). Dense constraint solve."""
    w = jnp.asarray(waypoints_1d)
    ts = jnp.asarray(segment_times)
    m = w.shape[0] - 1  # segments
    nc = 8 * m

    rows = []
    rhs = []

    def poly_row(t, order):
        r = jnp.zeros((8,))
        for k in range(order, 8):
            coeff = 1.0
            for j in range(order):
                coeff *= k - j
            r = r.at[k].set(coeff * t ** (k - order))
        return r

    mat = jnp.zeros((nc, nc))
    vec = jnp.zeros((nc,))
    row = 0
    for i in range(m):
        # endpoint positions
        mat = mat.at[row, 8 * i : 8 * i + 8].set(poly_row(jnp.asarray(0.0), 0))
        vec = vec.at[row].set(w[i])
        row += 1
        mat = mat.at[row, 8 * i : 8 * i + 8].set(poly_row(ts[i], 0))
        vec = vec.at[row].set(w[i + 1])
        row += 1
    # start/end rest (vel, acc, jerk)
    for order in (1, 2, 3):
        mat = mat.at[row, 0:8].set(poly_row(jnp.asarray(0.0), order))
        row += 1
        mat = mat.at[row, 8 * (m - 1) : 8 * m].set(poly_row(ts[m - 1], order))
        row += 1
    # interior continuity of derivatives 1..6
    for i in range(m - 1):
        for order in range(1, 7):
            r = jnp.zeros((nc,))
            r = r.at[8 * i : 8 * i + 8].set(poly_row(ts[i], order))
            r = r.at[8 * (i + 1) : 8 * (i + 1) + 8].add(
                -poly_row(jnp.asarray(0.0), order)
            )
            mat = mat.at[row].set(r)
            row += 1
    assert row == nc, (row, nc)
    sol = jnp.linalg.solve(mat, vec)
    return sol.reshape(m, 8)


def eval_poly8(coeffs_seg, t, order=0):
    """Evaluate an 8-coefficient segment (or its derivative)."""
    k = jnp.arange(8)
    c = coeffs_seg
    for _ in range(order):
        c = c[1:] * jnp.arange(1, c.shape[0])
    powers = t ** jnp.arange(c.shape[0])
    return jnp.sum(c * powers)
