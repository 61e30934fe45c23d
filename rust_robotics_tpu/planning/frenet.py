"""Frenet optimal trajectory planning.

Reference: crates/rust_robotics_planning/src/frenet_optimal_trajectory.rs
(2,217 LoC; PythonRobotics-faithful): sample lateral quintics over road
widths × horizon times and longitudinal quartics over target speeds; rank
by jerk/time/deviation costs (K_J=0.1, K_T=0.1, K_D=1, lat/lon weights
:9-29); reject samples violating speed/accel/curvature limits or colliding
with circular obstacles; convert the winner to global coordinates along a
cubic-spline reference line.

TPU-native: ALL (d, T, v) candidates evaluate as one batched polynomial
tensor — no per-candidate loops; validity + cost reduce with a masked
argmin. The whole planner is one jittable function.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from rust_robotics_tpu.planning.curves import QuinticPolynomial, Spline2D


@dataclasses.dataclass(frozen=True)
class FrenetConfig:
    """frenet_optimal_trajectory.rs:9-29."""

    max_speed: float = 50.0 / 3.6
    max_accel: float = 5.0
    max_curvature: float = 1.0
    max_road_width: float = 7.0
    d_road_w: float = 1.0
    dt: float = 0.2
    max_t: float = 5.0
    min_t: float = 4.0
    target_speed: float = 30.0 / 3.6
    d_t_s: float = 5.0 / 3.6
    n_s_sample: int = 1
    robot_radius: float = 2.0
    k_j: float = 0.1
    k_t: float = 0.1
    k_d: float = 1.0
    k_lat: float = 1.0
    k_lon: float = 1.0


def _quartic_coeffs(xs, vxs, axs, vxe, axe, t):
    """Velocity-keeping quartic (no end-position constraint)."""
    a0, a1, a2 = xs, vxs, axs / 2.0
    m = jnp.stack(
        [
            jnp.stack([3 * t**2, 4 * t**3]),
            jnp.stack([6 * t, 12 * t**2]),
        ]
    )
    b = jnp.stack([vxe - a1 - 2 * a2 * t, axe - 2 * a2])
    a34 = jnp.linalg.solve(m, b)
    return jnp.stack([a0, a1, a2, a34[0], a34[1]])


def _poly4_eval(c, t):
    return c[0] + c[1] * t + c[2] * t**2 + c[3] * t**3 + c[4] * t**4


def _poly4_d(c, t):
    return c[1] + 2 * c[2] * t + 3 * c[3] * t**2 + 4 * c[4] * t**3


def _poly4_dd(c, t):
    return 2 * c[2] + 6 * c[3] * t + 12 * c[4] * t**2


def _poly4_ddd(c, t):
    return 6 * c[3] + 24 * c[4] * t


def frenet_optimal_plan(csp: Spline2D, s0, c_speed, c_d, c_d_d, c_d_dd,
                        obstacles, cfg: FrenetConfig = FrenetConfig(),
                        num_steps: int = 26):
    """One planning cycle: returns dict with the best trajectory's global
    path [K, 2], s/d profiles, cost, and validity mask diagnostics.

    num_steps = max_t/dt + 1 (static sample count along each candidate).
    """
    f = jnp.result_type(float)
    di = jnp.arange(
        -cfg.max_road_width, cfg.max_road_width + 1e-9, cfg.d_road_w, dtype=f
    )
    ti = jnp.arange(cfg.min_t, cfg.max_t + 1e-9, cfg.dt, dtype=f)
    tv = cfg.target_speed + cfg.d_t_s * jnp.arange(
        -cfg.n_s_sample, cfg.n_s_sample + 1, dtype=f
    )
    ts = jnp.arange(num_steps, dtype=f) * cfg.dt  # sample grid

    def one(d_target, t_total, v_target):
        lat = QuinticPolynomial.boundary(
            c_d, c_d_d, c_d_dd, d_target, 0.0, 0.0, t_total
        )
        lon_c = _quartic_coeffs(s0, c_speed, 0.0, v_target, 0.0, t_total)
        tmask = ts <= t_total + 1e-9
        tt = jnp.minimum(ts, t_total)
        d = lat.calc_point(tt)
        d_d = lat.calc_first_derivative(tt)
        d_dd = lat.calc_second_derivative(tt)
        d_ddd = lat.calc_third_derivative(tt)
        s = _poly4_eval(lon_c, tt)
        s_d = _poly4_d(lon_c, tt)
        s_dd = _poly4_dd(lon_c, tt)
        s_ddd = _poly4_ddd(lon_c, tt)

        jp = jnp.sum(jnp.where(tmask, d_ddd**2, 0.0))
        js = jnp.sum(jnp.where(tmask, s_ddd**2, 0.0))
        ds_cost = (cfg.target_speed - s_d[-1]) ** 2
        cd = cfg.k_j * jp + cfg.k_t * t_total + cfg.k_d * d[-1] ** 2
        cv = cfg.k_j * js + cfg.k_t * t_total + cfg.k_d * ds_cost
        cost = cfg.k_lat * cd + cfg.k_lon * cv

        # global conversion along the reference spline
        s_clip = jnp.clip(s, 0.0, csp.length - 1e-6)
        rx, ry = csp.calc_position(s_clip)
        ryaw = csp.calc_yaw(s_clip)
        x = rx - d * jnp.sin(ryaw)
        y = ry + d * jnp.cos(ryaw)
        dx = jnp.diff(x)
        dy = jnp.diff(y)
        yaw = jnp.arctan2(dy, dx)
        seg = jnp.hypot(dx, dy)
        curv = jnp.diff(yaw) / jnp.clip(seg[:-1], 1e-9, None)

        ok_speed = jnp.all(jnp.where(tmask, s_d, 0.0) <= cfg.max_speed)
        ok_accel = jnp.all(jnp.where(tmask, jnp.abs(s_dd), 0.0) <= cfg.max_accel)
        ok_curv = jnp.all(
            jnp.where(tmask[2:], jnp.abs(curv), 0.0) <= cfg.max_curvature
        )
        pts = jnp.stack([x, y], axis=-1)
        dobs = jnp.linalg.norm(
            pts[:, None, :] - obstacles[None, :, :], axis=-1
        )
        ok_coll = jnp.all(
            jnp.where(tmask[:, None], dobs, jnp.inf) > cfg.robot_radius
        )
        valid = ok_speed & ok_accel & ok_curv & ok_coll
        return cost, valid, pts, s, d

    dd, tt_g, vv = jnp.meshgrid(di, ti, tv, indexing="ij")
    cand = jax.vmap(one)(dd.ravel(), tt_g.ravel(), vv.ravel())
    costs, valids, paths, ss, dds = cand
    masked = jnp.where(valids, costs, jnp.inf)
    best = jnp.argmin(masked)
    return {
        "path": paths[best],
        "s": ss[best],
        "d": dds[best],
        "cost": masked[best],
        "any_valid": jnp.any(valids),
        "num_valid": jnp.sum(valids),
        "best_index": best,
    }
