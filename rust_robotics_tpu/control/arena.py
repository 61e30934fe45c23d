"""Controller arena: deterministic tracker comparison.

Reference: crates/rust_robotics_control/src/controller_arena.rs (542 LoC) —
`run_controller_arena` (control/src/lib.rs:103-107): run PurePursuit,
Stanley, and LQR-steer on the same deterministic course and report
comparable metrics (cross-track RMSE, progress, goal reached).

TPU-native: all three controllers roll out as jitted `lax.scan`s over the
same course; the arena emits a gate-conformant CSV (wall-clock columns
suffixed `_ms` so the regression gate ignores them — BENCHMARKS.md:10-22).
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from rust_robotics_tpu.control.trackers import (
    LQRSteerConfig,
    bicycle_kinematics,
    lqr_steer_control,
    pure_pursuit_control,
    stanley_control,
)


def _course():
    xs = jnp.linspace(0.0, 60.0, 601)
    ys = 3.0 * jnp.sin(xs / 8.0)
    return jnp.stack([xs, ys], axis=-1), jnp.ones(601)


def _metrics(traj, pts):
    traj = np.asarray(traj)
    p = np.asarray(pts)
    d = np.sqrt(
        ((traj[:, 0:1] - p[None, :, 0]) ** 2)
        + ((traj[:, 1:2] - p[None, :, 1]) ** 2)
    ).min(axis=1)
    settle = len(traj) // 5
    return {
        "cross_track_rmse": float(np.sqrt(np.mean(d[settle:] ** 2))),
        "max_cross_track": float(d[settle:].max()),
        "progress": float(traj[-1, 0]),
        "goal_reached": bool(np.linalg.norm(traj[-1, :2] - p[-1]) < 2.5),
    }


def run_controller_arena(steps: int = 600, dt: float = 0.1,
                         target_speed: float = 3.0):
    """Returns {controller: metrics} + a CSV (header, rows) pair."""
    pts, mask = _course()
    state0 = jnp.array([0.0, -1.0, 0.2, 0.0])
    results = {}
    rows = []

    goal = pts[-1]

    def freeze(state, new_state):
        done = jnp.linalg.norm(state[:2] - goal) < 2.0
        return jnp.where(done, state, new_state)

    def rollout_simple(control_fn):
        def step(state, _):
            accel, steer, _ = control_fn(state)
            new = freeze(state, bicycle_kinematics(state, accel, steer, dt, 2.9))
            return new, new

        _, traj = jax.lax.scan(step, state0, None, length=steps)
        return traj

    t0 = time.perf_counter()
    traj = rollout_simple(lambda s: pure_pursuit_control(s, pts, mask, target_speed))
    pp_ms = (time.perf_counter() - t0) * 1e3
    results["pure_pursuit"] = _metrics(traj, pts)

    t0 = time.perf_counter()
    traj = rollout_simple(lambda s: stanley_control(s, pts, mask, target_speed))
    st_ms = (time.perf_counter() - t0) * 1e3
    results["stanley"] = _metrics(traj, pts)

    cfg = LQRSteerConfig(wheelbase=2.9)

    def lqr_step(carry, _):
        state, (pe, pth) = carry
        accel, steer, (e, th) = lqr_steer_control(
            state, pts, mask, target_speed, pe, pth, cfg
        )
        new = freeze(state, bicycle_kinematics(state, accel, steer, dt, 2.9))
        return (new, (e, th)), new

    t0 = time.perf_counter()
    (_, _), traj = jax.lax.scan(
        lqr_step, (state0, (jnp.asarray(0.0), jnp.asarray(0.0))), None,
        length=steps,
    )
    lqr_ms = (time.perf_counter() - t0) * 1e3
    results["lqr_steer"] = _metrics(traj, pts)

    header = [
        "controller", "cross_track_rmse", "max_cross_track", "progress",
        "goal_reached", "elapsed_ms",
    ]
    for name, ms in (
        ("pure_pursuit", pp_ms), ("stanley", st_ms), ("lqr_steer", lqr_ms)
    ):
        m = results[name]
        rows.append(
            [name, m["cross_track_rmse"], m["max_cross_track"], m["progress"],
             str(m["goal_reached"]).lower(), ms]
        )
    return results, (header, rows)
