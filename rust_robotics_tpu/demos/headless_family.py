"""The full headless demo family — CI-runnable deterministic closed-loop
sims mirroring the reference's 26 `headless_*` examples
(crates/rust_robotics/Cargo.toml:60-470; SURVEY.md §2.11).

Three demos live in `demos/headless.py` (navigation loop, mission
recovery, EuRoC VIO); this module adds the remaining 23 and a registry
`HEADLESS` mapping reference example name -> zero-arg callable returning
a metrics dict. Every demo follows the gallery convention: fixed PRNG
keys and sinusoid pseudo-noise so outputs are bit-deterministic
(render_gif_ekf_localization.rs:21-24), and each returns the same summary
metrics its reference counterpart prints.

Per-demo reference citations sit on the docstrings below.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["HEADLESS", "run_headless"]

_f = None


def _ftype():
    return jnp.result_type(float)


# ---------------------------------------------------------------------------
# Localization / estimation


def headless_localizers(steps: int = 150):
    """Shared-sim localizer comparison (headless_localizers.rs): EKF, UKF,
    CKF and a range-landmark particle filter track the same unicycle truth;
    reports per-filter position RMSE."""
    from rust_robotics_tpu.core.types import GaussianBelief
    from rust_robotics_tpu.filters.kalman import ckf_step, ekf_step, ukf_step
    from rust_robotics_tpu.filters.particle import init_particles, pf_step
    from rust_robotics_tpu.models.motion import unicycle_propagate

    f = _ftype()
    dt = 0.1
    q = jnp.diag(jnp.array([0.1, 0.1, 0.017, 0.3], f)) ** 2
    r = jnp.diag(jnp.array([0.3, 0.3], f)) ** 2
    landmarks = jnp.array([[10.0, 0.0], [0.0, 10.0], [10.0, 10.0],
                           [-5.0, 5.0]], f)

    truth = jnp.zeros(4, f)
    beliefs = {name: GaussianBelief(jnp.zeros(4, f), jnp.eye(4, dtype=f))
               for name in ("ekf", "ukf", "ckf")}
    steppers = {"ekf": ekf_step, "ukf": ukf_step, "ckf": ckf_step}
    pf = init_particles(jax.random.PRNGKey(0), jnp.zeros(4, f),
                        jnp.array([0.5, 0.5, 0.2, 0.2], f), 512)
    key = jax.random.PRNGKey(1)

    sq = {name: 0.0 for name in ("ekf", "ukf", "ckf", "pf")}
    for k in range(steps):
        control = jnp.array([1.0, 0.35 * jnp.sin(0.08 * k)], f)
        truth = unicycle_propagate(truth, control, dt)
        z = truth[:2] + 0.3 * jnp.array(
            [jnp.sin(1.3 * k), jnp.cos(0.9 * k)], f)
        for name in ("ekf", "ukf", "ckf"):
            beliefs[name] = steppers[name](beliefs[name], z, control, dt, q, r)
            sq[name] += float(jnp.sum((beliefs[name].mean[:2] - truth[:2]) ** 2))
        ranges = jnp.linalg.norm(landmarks - truth[:2], axis=-1)
        ranges = ranges + 0.2 * jnp.sin(0.7 * k + jnp.arange(4))
        key, sub = jax.random.split(key)
        pf, est = pf_step(pf, control, ranges, landmarks, dt, sub,
                          control_noise_std=jnp.array([0.2, 0.1], f),
                          range_noise=0.3)
        sq["pf"] += float(jnp.sum((est.mean[:2] - truth[:2]) ** 2))
    out = {f"{n}_rmse": float(np.sqrt(sq[n] / steps)) for n in sq}
    out["best"] = min(("ekf", "ukf", "ckf", "pf"), key=lambda n: sq[n])
    return out


# ---------------------------------------------------------------------------
# Grid planners


def headless_grid_planners():
    """Grid planner sweep on one map (headless_grid_planners.rs): optimal
    wavefront 4/8-conn, ARA* bound, beam search; reports path costs and the
    anytime suboptimality ordering."""
    from rust_robotics_tpu.planning.grid import grid_from_raster
    from rust_robotics_tpu.planning.incremental import (
        ara_star_plan, beam_search_costs, octile_heuristic)
    from rust_robotics_tpu.planning.wavefront import goal_raster, plan_grid

    blocked = np.zeros((48, 48), bool)
    blocked[12:40, 16] = True
    blocked[8, 16:40] = True
    blocked[30, 24:46] = True
    free = jnp.asarray(~blocked)
    grid = grid_from_raster(jnp.asarray(blocked), resolution=1.0)
    start, goal = (2.0, 2.0), (45.0, 45.0)
    out = {}
    for conn in (4, 8):
        _, cost = plan_grid(grid, start, goal, connectivity=conn)
        out[f"wavefront_{conn}_cost"] = float(cost)
    _, stage_costs, stage_bounds = ara_star_plan(
        free, jnp.array([2, 2]), jnp.array([45, 45]), stages=3,
        sweeps_per_stage=16)
    out["ara_final_cost"] = float(stage_costs[-1])
    out["ara_final_bound"] = float(stage_bounds[-1])
    goals = goal_raster(free.shape, jnp.array([45, 45]))
    hmap = octile_heuristic(free.shape, jnp.array([2, 2]))
    d_beam, _ = beam_search_costs(free, goals, hmap, beam_width=96)
    out["beam_cost"] = float(d_beam[2, 2])
    out["beam_ge_optimal"] = bool(out["beam_cost"] >=
                                  out["wavefront_8_cost"] - 1e-6)
    return out


# ---------------------------------------------------------------------------
# MPPI family (headless_mppi_*.rs)


def _mppi_loop(stage, terminal, x0, steps, cfg, key=None, dynamics=None,
               shift=True):
    from rust_robotics_tpu.control.mppi import (
        double_integrator_dynamics, mppi_plan, shift_nominal)

    dyn = dynamics or double_integrator_dynamics
    key = jax.random.PRNGKey(0) if key is None else key
    u = jnp.zeros((cfg.horizon, len(cfg.noise_sigma)), _ftype())
    state = jnp.asarray(x0, _ftype())
    states, costs, ess = [np.asarray(state)], [], []
    for _ in range(steps):
        key, sub = jax.random.split(key)
        u, u0, diag = mppi_plan(sub, dyn, stage, terminal, state, u, cfg)
        state = dyn(state, u0, cfg.dt)
        if shift:
            u = shift_nominal(u)
        states.append(np.asarray(state))
        costs.append(float(stage(state, u0)))
        ess.append(float(diag.effective_sample_size))
    return np.stack(states), np.array(costs), np.array(ess)


def headless_mppi_double_integrator(steps: int = 60):
    """Vanilla MPPI on the double integrator (headless_mppi_double_integrator.rs):
    drive to the goal, report final distance + mean ESS."""
    from rust_robotics_tpu.control.mppi import MPPIConfig, make_goal_costs

    goal = jnp.array([4.0, 3.0], _ftype())
    stage, terminal = make_goal_costs(goal)
    cfg = MPPIConfig(horizon=25, num_samples=256)
    tr, costs, ess = _mppi_loop(stage, terminal, [0.0, 0.0, 0.0, 0.0],
                                steps, cfg)
    return {
        "final_distance": float(np.linalg.norm(tr[-1, :2] - np.asarray(goal))),
        "mean_ess": float(ess.mean()),
        "goal_reached": bool(np.linalg.norm(tr[-1, :2] - np.asarray(goal)) < 0.3),
    }


def _wall_obstacles():
    ys = np.linspace(-2.0, 2.2, 9)
    return jnp.asarray(np.stack([np.full(9, 2.0), ys], axis=-1))


def headless_mppi_terminal_value(steps: int = 70):
    """Terminal-value-grid MPPI behind a wall (headless_mppi_terminal_value.rs,
    mppi.rs:362): the myopic quadratic terminal stalls at the wall; the
    wavefront-derived value grid routes around its top. Same geometry as
    the pinned mppi-value benchmark."""
    from rust_robotics_tpu.control.mppi import MPPIConfig, make_goal_costs
    from rust_robotics_tpu.control.mppi_value import (
        TerminalValueGrid, make_value_terminal_cost)
    from rust_robotics_tpu.planning.wavefront import (
        goal_raster, wavefront_costs)

    f = _ftype()
    res, origin, w, h = 0.25, (-2.0, -4.0), 48, 48
    goal = jnp.array([6.0, 0.0], f)
    free = np.ones((w, h), bool)
    wall_x = int((2.5 - origin[0]) / res)
    wall_top = int((2.0 - origin[1]) / res)
    free[wall_x:wall_x + 2, :wall_top] = False
    free = jnp.asarray(free)
    goal_idx = jnp.asarray([int((goal[0] - origin[0]) / res),
                            int((goal[1] - origin[1]) / res)])
    grid = TerminalValueGrid(
        jnp.asarray(origin, f), jnp.asarray(res, f),
        wavefront_costs(free, goal_raster((w, h), goal_idx)) * res)
    obstacle_pts = (np.argwhere(~np.asarray(free)) * res
                    + np.asarray(origin) + res / 2)
    stage, naive_terminal = make_goal_costs(
        goal, obstacles=jnp.asarray(obstacle_pts), obstacle_radius=0.4,
        obstacle_weight=500.0)
    value_terminal = make_value_terminal_cost(grid, weight=30.0)
    cfg = MPPIConfig(horizon=25, num_samples=512, noise_sigma=(0.8, 0.8))
    x0 = [0.0, 0.0, 0.0, 0.0]
    tr_n, _, _ = _mppi_loop(stage, naive_terminal, x0, steps, cfg,
                            key=jax.random.PRNGKey(7))
    tr_v, _, _ = _mppi_loop(stage, value_terminal, x0, steps, cfg,
                            key=jax.random.PRNGKey(7))
    dn = float(np.linalg.norm(tr_n[-1, :2] - np.asarray(goal)))
    dv = float(np.linalg.norm(tr_v[-1, :2] - np.asarray(goal)))
    return {"naive_final_distance": dn, "value_final_distance": dv,
            "value_wins": bool(dv <= dn + 1e-6)}


def headless_mppi_value_learning(episodes: int = 4, steps: int = 45):
    """TD value learning from rollouts (headless_mppi_value_learning.rs,
    mppi.rs:715): episode rollouts update the terminal-value grid; episode
    cost decreases from first to last."""
    from rust_robotics_tpu.control.mppi import MPPIConfig, make_goal_costs
    from rust_robotics_tpu.control.mppi_value import (
        TerminalValueGrid, ValueUpdateConfig, make_value_terminal_cost,
        update_grid_from_rollout)

    f = _ftype()
    goal = jnp.array([4.5, 0.0], f)
    obstacles = _wall_obstacles()
    stage, _ = make_goal_costs(goal, obstacles, obstacle_radius=0.45)
    grid = TerminalValueGrid(values=jnp.zeros((48, 48), f),
                             origin=jnp.array([-1.0, -3.0], f),
                             resolution=jnp.asarray(0.15, f))
    vc = ValueUpdateConfig(learning_rate=0.4, discount=0.97)
    cfg = MPPIConfig(horizon=24, num_samples=256, noise_sigma=(0.8, 0.8))
    ep_costs, deltas = [], []
    for ep in range(episodes):
        terminal = make_value_terminal_cost(grid, weight=1.0)
        tr, costs, _ = _mppi_loop(stage, terminal,
                                  [-0.5, 0.0, 0.0, 0.0], steps, cfg,
                                  key=jax.random.PRNGKey(ep))
        stage_costs = jnp.asarray(
            [float(stage(jnp.asarray(tr[t + 1]), jnp.zeros(2, f)))
             for t in range(steps)], f)
        grid, rep = update_grid_from_rollout(grid, jnp.asarray(tr[1:], f),
                                             stage_costs, vc)
        ep_costs.append(float(stage_costs.sum()))
        deltas.append(float(rep["mean_abs_delta"]))
    return {"first_episode_cost": ep_costs[0],
            "last_episode_cost": ep_costs[-1],
            "first_td_delta": deltas[0],
            "last_td_delta": deltas[-1],
            # TD updates converge: per-visit value corrections shrink
            "improved": bool(deltas[-1] <= deltas[0])}


def headless_mppi_replay_value_learning(episodes: int = 4, steps: int = 40):
    """Replay-buffer value learning (headless_mppi_replay_value_learning.rs,
    mppi.rs:715): rollouts land in a fixed-capacity ring; batched replay
    updates train the value grid across episodes."""
    from rust_robotics_tpu.control.mppi import MPPIConfig, make_goal_costs
    from rust_robotics_tpu.control.mppi_value import (
        TerminalValueGrid, ValueUpdateConfig, make_replay_buffer,
        make_value_terminal_cost, replay_push, replay_update_grid)

    f = _ftype()
    goal = jnp.array([4.0, 0.5], f)
    stage, _ = make_goal_costs(goal, _wall_obstacles(), obstacle_radius=0.45)
    grid = TerminalValueGrid(values=jnp.zeros((48, 48), f),
                             origin=jnp.array([-1.0, -3.0], f),
                             resolution=jnp.asarray(0.15, f))
    buf = make_replay_buffer(capacity=8, horizon=steps, state_dim=4)
    vc = ValueUpdateConfig(learning_rate=0.3, discount=0.97)
    cfg = MPPIConfig(horizon=22, num_samples=256, noise_sigma=(0.8, 0.8))
    ep_costs, deltas = [], []
    for ep in range(episodes):
        terminal = make_value_terminal_cost(grid, weight=1.0)
        tr, _, _ = _mppi_loop(stage, terminal, [-0.5, 0.0, 0.0, 0.0],
                              steps, cfg, key=jax.random.PRNGKey(10 + ep))
        stage_costs = jnp.asarray(
            [float(stage(jnp.asarray(tr[t + 1]), jnp.zeros(2, f)))
             for t in range(steps)], f)
        buf = replay_push(buf, jnp.asarray(tr[1:], f), stage_costs)
        grid, rep = replay_update_grid(buf, grid, vc)
        ep_costs.append(float(stage_costs.sum()))
        deltas.append(float(rep["mean_abs_delta"]))
    return {"episodes": episodes, "buffer_count": int(buf.count),
            "first_episode_cost": ep_costs[0],
            "last_episode_cost": ep_costs[-1],
            "first_td_delta": deltas[0],
            "last_td_delta": deltas[-1],
            "improved": bool(deltas[-1] <= deltas[0])}


def headless_mppi_adaptive_temperature(steps: int = 50):
    """ESS-servoed temperature (headless_mppi_adaptive_temperature.rs):
    λ is raised when the effective sample size collapses below the target
    band and lowered when diffuse; reports the λ trace and final ESS
    fraction vs the fixed-λ run."""
    from rust_robotics_tpu.control.mppi import (
        MPPIConfig, double_integrator_dynamics, make_goal_costs, mppi_plan,
        shift_nominal)

    f = _ftype()
    goal = jnp.array([4.0, 3.0], f)
    stage, terminal = make_goal_costs(goal, _wall_obstacles(),
                                      obstacle_radius=0.45)

    def run(adaptive):
        lam = 1.0
        cfg = MPPIConfig(horizon=25, num_samples=256, temperature=lam)
        u = jnp.zeros((cfg.horizon, 2), f)
        state = jnp.array([-0.5, 0.0, 0.0, 0.0], f)
        key = jax.random.PRNGKey(3)
        ess_frac, lams = [], []
        target = 0.25 * cfg.num_samples
        for _ in range(steps):
            key, sub = jax.random.split(key)
            u, u0, diag = mppi_plan(sub, double_integrator_dynamics, stage,
                                    terminal, state, u, cfg)
            state = double_integrator_dynamics(state, u0, cfg.dt)
            u = shift_nominal(u)
            ess = float(diag.effective_sample_size)
            ess_frac.append(ess / cfg.num_samples)
            lams.append(lam)
            if adaptive:
                lam = float(np.clip(
                    lam * (1.25 if ess < target else 0.9), 0.05, 20.0))
                cfg = MPPIConfig(horizon=25, num_samples=256,
                                 temperature=lam)
        return np.array(ess_frac), np.array(lams), state

    ef_a, lam_a, s_a = run(True)
    ef_f, _, _ = run(False)
    return {"mean_ess_fraction_adaptive": float(ef_a.mean()),
            "mean_ess_fraction_fixed": float(ef_f.mean()),
            "lambda_final": float(lam_a[-1]),
            "lambda_changed": bool(abs(lam_a[-1] - lam_a[0]) > 1e-9),
            "final_distance": float(np.linalg.norm(
                np.asarray(s_a)[:2] - np.asarray(goal)))}


def headless_mppi_constraint_discount(steps: int = 55):
    """Constraint-discounted MPPI (headless_mppi_constraint_discount.rs):
    obstacle penalty decays along the horizon (near-term constraint
    violations cost more than far-future ones), letting rollouts consider
    late passages through the narrow gap; compares against uniform weight."""
    from rust_robotics_tpu.control.mppi import (
        MPPIConfig, double_integrator_dynamics, make_goal_costs)

    f = _ftype()
    goal = jnp.array([4.5, 0.0], f)
    obstacles = _wall_obstacles()[:-2]  # open a gap at the top
    cfg = MPPIConfig(horizon=28, num_samples=320, noise_sigma=(0.8, 0.8))

    def dyn_t(state, u, dt):
        # carry the horizon index in state[-1] so the stage cost can
        # discount by lookahead depth (time is static under jit).
        core = double_integrator_dynamics(state[..., :4], u, dt)
        return jnp.concatenate([core, state[..., 4:] + 1.0], axis=-1)

    def make_stage(discount):
        def stage(state, u):
            pos = state[..., :2]
            t = state[..., 4]
            d = jnp.linalg.norm(pos[..., None, :] - obstacles, axis=-1)
            pen = jnp.sum(jnp.maximum(0.0, 0.45 - d) ** 2, axis=-1)
            w = 400.0 * discount ** t
            return (jnp.sum((pos - goal) ** 2, axis=-1)
                    + w * pen + 0.01 * jnp.sum(u ** 2, axis=-1))
        return stage

    def terminal(state):
        return 10.0 * jnp.sum((state[..., :2] - goal) ** 2, axis=-1)

    out = {}
    for name, disc in (("uniform", 1.0), ("discounted", 0.92)):
        tr, _, _ = _mppi_loop(make_stage(disc), terminal,
                              [-0.5, 0.0, 0.0, 0.0, 0.0], steps, cfg,
                              dynamics=dyn_t)
        d = np.linalg.norm(tr[:, None, :2] - np.asarray(obstacles)[None],
                           axis=-1)
        out[f"{name}_final_distance"] = float(
            np.linalg.norm(tr[-1, :2] - np.asarray(goal)))
        out[f"{name}_min_clearance"] = float(d.min())
    out["discount_helps_progress"] = bool(
        out["discounted_final_distance"] <= out["uniform_final_distance"] + 0.5)
    return out


def headless_mppi_track_progress(steps: int = 70):
    """Waypoint-track progress MPPI (headless_mppi_track_progress.rs,
    mppi.rs:362 track grids): terminal value = remaining arc length to the
    track end; reports progress fraction and max lateral error."""
    from rust_robotics_tpu.control.mppi import MPPIConfig
    from rust_robotics_tpu.control.mppi_value import (
        make_track, make_value_terminal_cost, track_project,
        track_terminal_value_grid, track_total_length)

    f = _ftype()
    wps = jnp.asarray(np.stack([np.linspace(0.0, 8.0, 9),
                                np.sin(np.linspace(0.0, 8.0, 9))], -1), f)
    track = make_track(wps)
    grid = track_terminal_value_grid(track, 64, 48, (-1.0, -3.0), 0.15,
                                     progress_weight=4.0, lateral_weight=2.0)
    terminal = make_value_terminal_cost(grid, weight=3.0)

    def stage(state, u):
        arc, lat, _ = track_project(track, state[..., :2])
        return (2.0 * lat ** 2 + 0.01 * jnp.sum(u ** 2, axis=-1)
                + 0.5 * jnp.maximum(0.0, 1.5 - state[..., 2]) ** 2)

    cfg = MPPIConfig(horizon=25, num_samples=320, noise_sigma=(0.7, 0.7))
    tr, _, _ = _mppi_loop(stage, terminal, [0.0, 0.0, 0.0, 0.0], steps, cfg)
    arc, lat, _ = track_project(track, jnp.asarray(tr[:, :2], f))
    total = float(track_total_length(track))
    return {"progress_fraction": float(arc[-1]) / total,
            "max_lateral_error": float(jnp.max(jnp.abs(lat))),
            "track_length": total,
            "completed": bool(float(arc[-1]) / total > 0.8)}


def headless_mppi_racing_gate_progress():
    """Powertrain-aware gate race (headless_mppi_racing_gate_progress.rs):
    motor-level quadrotor MPPI through two gates; reports gates passed,
    lap fraction, saturation and SOC (racing.rs powertrain family)."""
    from rust_robotics_tpu.control.racing import (
        GatePlane, PowertrainParams, simulate_gate_race)

    gates = [GatePlane(center=(3.0, 0.0, 1.5), normal=(1.0, 0.0, 0.0),
                       half_width=1.2, half_height=1.2),
             GatePlane(center=(6.0, 0.0, 1.5), normal=(1.0, 0.0, 0.0),
                       half_width=1.2, half_height=1.2)]
    p = PowertrainParams(motor_tau=0.05, discharge_rate=0.05, sag_coeff=0.15)
    rep = simulate_gate_race(jax.random.PRNGKey(0), gates, p, steps=90,
                             num_samples=128, horizon=15, aware=True)
    return {"gates_passed": int(rep["gates_passed"]),
            "lap_fraction": float(rep["lap_fraction"]),
            "mean_speed": float(rep["mean_speed"]),
            "saturation_fraction": float(rep["saturation_fraction"]),
            "final_soc": float(rep["final_soc"])}


def headless_adap_rpf_mppi(steps: int = 34):
    """Adaptive following-point person-following MPPI
    (headless_adap_rpf_mppi.rs): a pedestrian occupies the fixed trailing
    point; the adaptive sampler scores candidate following points by
    occlusion + proximity and MPPI tracks the winner. Reports both runs'
    final distance / clearance / occlusion."""
    from rust_robotics_tpu.control.mppi import MPPIConfig
    from rust_robotics_tpu.control.mppi_variants import (
        make_person_following_costs)

    f = _ftype()
    dt = 0.1
    cfg = MPPIConfig(horizon=16, num_samples=360, dt=dt,
                     noise_sigma=(0.6, 0.6))
    ks = np.arange(steps + cfg.horizon + 1)
    target = np.stack([0.6 * ks * dt + 1.5, np.zeros_like(ks, float)], -1)
    pedestrian = np.array([0.0, 0.0]) + target - np.array([1.5, 0.0])

    def segment_point_dist(a, b, p):
        ab = b - a
        t = np.clip(np.dot(p - a, ab) / max(np.dot(ab, ab), 1e-9), 0.0, 1.0)
        return float(np.linalg.norm(a + t * ab - p))

    def run(adaptive):
        standoff = 1.5
        offsets = ([np.array([-standoff, 0.0]),
                    np.array([-standoff * 0.7, standoff * 0.7]),
                    np.array([-standoff * 0.7, -standoff * 0.7])]
                   if adaptive else [np.array([-standoff, 0.0])])
        state = jnp.array([-2.0, 1.0, 0.0, 0.0], f)
        u = jnp.zeros((cfg.horizon, 2), f)
        key = jax.random.PRNGKey(5)
        occl, prox, ess, clear = [], [], [], []
        for k in range(steps):
            ped = pedestrian[k]
            tgt = target[k]
            # score candidate following points: occlusion = pedestrian near
            # the robot->target sight line; proximity = pedestrian distance
            best, best_score = None, None
            pos = np.asarray(state[:2])
            for off in offsets:
                fp = tgt + off
                o = max(0.0, 1.2 - segment_point_dist(fp, tgt, ped))
                p = max(0.0, 1.2 - np.linalg.norm(fp - ped))
                score = o + p + 0.1 * np.linalg.norm(fp - pos)
                if best_score is None or score < best_score:
                    best, best_score, bo, bp = fp, score, o, p
            occl.append(bo)
            prox.append(bp)
            fp_traj = jnp.asarray(
                target[k:k + cfg.horizon] + (best - tgt), f)
            stage, terminal = make_person_following_costs(
                fp_traj, standoff=0.0)
            from rust_robotics_tpu.control.mppi import (
                double_integrator_dynamics, mppi_plan, shift_nominal)
            key, sub = jax.random.split(key)
            u, u0, diag = mppi_plan(sub, double_integrator_dynamics, stage,
                                    terminal, state, u, cfg)
            state = double_integrator_dynamics(state, u0, dt)
            u = shift_nominal(u)
            ess.append(float(diag.effective_sample_size))
            clear.append(float(np.linalg.norm(np.asarray(state[:2]) - ped)))
        return {"final_distance": float(np.linalg.norm(
                    np.asarray(state[:2]) - target[steps])),
                "min_clearance": float(np.min(clear)),
                "mean_occlusion": float(np.mean(occl)),
                "mean_proximity": float(np.mean(prox)),
                "mean_ess": float(np.mean(ess))}

    fixed = run(False)
    adap = run(True)
    return {**{f"fixed_{k}": v for k, v in fixed.items()},
            **{f"adaptive_{k}": v for k, v in adap.items()},
            "adaptive_less_occluded": bool(
                adap["mean_occlusion"] <= fixed["mean_occlusion"] + 1e-9)}


# ---------------------------------------------------------------------------
# Factor-graph stack


def headless_factor_graph_stack():
    """End-to-end Lie/factor-graph smoke (headless_factor_graph_stack.rs):
    g2o SE(2) pose graph terminal error, stationary IMU drift, BA mean
    point error, point-to-plane ICP transform error."""
    from rust_robotics_tpu.slam.bundle_adjustment import (
        CameraIntrinsics, bundle_adjust)
    from rust_robotics_tpu.slam.g2o import parse_g2o, se2_arrays
    from rust_robotics_tpu.slam.imu import (
        Preintegrated, predict_nav_state, preintegrate)
    from rust_robotics_tpu.slam.pose_graph import optimize_pose_graph_2d
    from rust_robotics_tpu.slam.scan_matching import point_to_plane_icp

    f = _ftype()
    g = parse_g2o(
        "VERTEX_SE2 0 0 0 0\n"
        "VERTEX_SE2 1 1.12 -0.08 0.05\n"
        "VERTEX_SE2 2 2.15 0.12 -0.04\n"
        "EDGE_SE2 0 1 1 0 0 100 0 0 100 0 100\n"
        "EDGE_SE2 1 2 1 0 0 100 0 0 100 0 100\n"
        "EDGE_SE2 0 2 2 0 0 100 0 0 100 0 100\n")
    poses, ef, et, meas, info = se2_arrays(g)
    opt, _ = optimize_pose_graph_2d(poses, ef, et, meas, info)
    pg_err = float(jnp.linalg.norm(opt[2, :2] - jnp.array([2.0, 0.0], f)))

    # stationary IMU: gravity-cancelling accel, zero gyro -> no drift
    n = 50
    accels = jnp.tile(jnp.array([0.0, 0.0, 9.81], f), (n, 1))
    gyros = jnp.zeros((n, 3), f)
    dts = jnp.full((n,), 0.01, f)
    pre = preintegrate(accels, gyros, dts, jnp.zeros(6, f), 1e-3, 1e-4)
    nav1 = predict_nav_state(pre, jnp.zeros(9, f), jnp.zeros(6, f))
    imu_drift = float(jnp.linalg.norm(nav1[3:9]))

    # four-camera BA over 8 points, perturbed second camera + points
    from rust_robotics_tpu.core.lie import se3_exp
    intr = CameraIntrinsics(500.0, 500.0, 320.0, 240.0)
    pts = jnp.asarray(np.array(
        [[0.0, 0.0, 5.0], [1.0, 0.5, 6.0], [-1.0, 0.2, 5.5],
         [0.5, -0.8, 7.0], [-0.6, 0.9, 6.5], [0.2, 0.3, 5.2],
         [0.9, -0.4, 5.8], [-0.8, -0.6, 6.2]]), f)
    tangents = jnp.asarray([[0.0] * 6, [0.3, 0.0, 0.0, 0.0, 0.02, 0.0]], f)
    cams = se3_exp(tangents)  # [2, 4, 4] camera-to-world

    def project(cam, pw):
        inv_r = cam[:3, :3].T
        pc = inv_r @ (pw - cam[:3, 3])
        return jnp.array([intr.fx * pc[0] / pc[2] + intr.cx,
                          intr.fy * pc[1] / pc[2] + intr.cy], f)

    cam_idx, pt_idx, pix = [], [], []
    for ci in range(2):
        for pi in range(pts.shape[0]):
            cam_idx.append(ci)
            pt_idx.append(pi)
            pix.append(project(cams[ci], pts[pi]))
    noisy = pts + 0.05 * jnp.sin(jnp.arange(pts.size, dtype=f)).reshape(
        pts.shape)
    _, ba_pts, summary = bundle_adjust(
        cams, noisy, jnp.asarray(cam_idx, jnp.int32),
        jnp.asarray(pt_idx, jnp.int32), jnp.stack(pix), intr)
    ba_err = float(jnp.mean(jnp.linalg.norm(ba_pts - pts, axis=-1)))

    # point-to-plane ICP with a known SE(3) offset: cur = exp(-xi) prev,
    # so the previous-from-current estimate recovers +xi
    key = jax.random.PRNGKey(2)
    k1, k2 = jax.random.split(key)
    prev = jax.random.uniform(k1, (160, 3), f, -2.0, 2.0)
    raw_n = jax.random.normal(k2, (160, 3), f)
    normals = raw_n / jnp.linalg.norm(raw_n, axis=-1, keepdims=True)
    xi_true = jnp.array([0.0, 0.0, 0.03, 0.02, -0.015, 0.05], f)
    T = se3_exp(-xi_true)
    cur = prev @ T[:3, :3].T + T[:3, 3]
    xi_est, _ = point_to_plane_icp(prev, normals, cur)
    icp_err = float(jnp.linalg.norm(xi_est - xi_true))

    return {"pose_graph_terminal_error": pg_err,
            "stationary_imu_drift": imu_drift,
            "bundle_adjustment_mean_point_error": ba_err,
            "point_to_plane_icp_transform_error": icp_err,
            "status_ok": bool(pg_err < 0.2 and imu_drift < 1e-6
                              and ba_err < 0.1)}


# ---------------------------------------------------------------------------
# Temporal / multi-agent planners


def headless_conformal_sipp():
    """Conformal-SIPP replay (headless_conformal_sipp.rs): plan through a
    predicted crossing obstacle at 0.9 confidence; report arrival, min
    confidence and the violation bound."""
    from rust_robotics_tpu.planning.conformal import conformal_sipp_plan

    w = h = 12
    blocked = np.zeros((w, h), bool)
    t_len = 16
    ts = np.arange(t_len)
    pred = np.stack([np.full(t_len, 6.0), ts.astype(float)], -1)[None]
    errs = jnp.full((t_len, 8), 0.5)
    out = conformal_sipp_plan(jnp.asarray(blocked), jnp.asarray(pred), errs,
                              (2, 0), (5, 11), required_confidence=0.9,
                              obstacle_radius=0.6)
    assert out is not None
    return {"arrival": int(out["arrival"]),
            "min_confidence": float(out["min_confidence"]),
            "trajectory_violation_bound":
                float(out["trajectory_violation_bound"]),
            "feasible": True}


def _corridor_map(w=16, h=9):
    free = np.ones((w, h), bool)
    free[6, 2:7] = False
    free[10, 0:5] = False
    return free


def headless_stl_cbs_multi_robot():
    """STL-CBS multi-robot plan (headless_stl_cbs_multi_robot.rs): three
    robots with crossing routes, separation >= 1; reports makespan, total
    cost and min pairwise separation."""
    from rust_robotics_tpu.planning.stl import stl_cbs_plan

    free = _corridor_map()
    starts = [(0, 1), (0, 7), (15, 4)]
    goals = [(15, 7), (15, 1), (0, 4)]
    out = stl_cbs_plan(jnp.asarray(free), starts, goals, t_max=28,
                       min_separation=1.0)
    paths = np.asarray(out["paths"], float)
    seps = []
    for i in range(len(starts)):
        for j in range(i + 1, len(starts)):
            seps.append(np.min(np.linalg.norm(paths[i] - paths[j], axis=-1)))
    arrivals = np.asarray(out["arrivals"])
    return {"success": bool(np.all(arrivals >= 0)),
            "makespan": int(arrivals.max()),
            "conflicts_resolved": int(out["conflicts_resolved"]),
            "separation_robustness":
                float(out["min_pairwise_separation_robustness"]),
            "min_separation": float(np.min(seps))}


def headless_kinodynamic_stl_cbs():
    """Kinodynamic STL-CBS (headless_kinodynamic_stl_cbs.rs): speed-2 moves
    reach the goal faster than the speed-1 baseline under the same STL
    avoid region."""
    from rust_robotics_tpu.planning.stl import (
        StlRectangle, kinodynamic_stl_cbs_plan, stl_cbs_plan)

    free = _corridor_map()
    avoid = ((StlRectangle(4.0, 6.0, 3.0, 5.0), (0, 25)),)
    slow = stl_cbs_plan(jnp.asarray(free), [(0, 1)], [(15, 1)], t_max=26,
                        avoid_regions=avoid)
    fast = kinodynamic_stl_cbs_plan(jnp.asarray(free), [(0, 1)], [(15, 1)],
                                    t_max=26, avoid_regions=avoid)
    a_slow = int(slow["arrivals"][0])
    a_fast = int(fast["arrivals"][0])
    return {"slow_arrival": a_slow,
            "fast_arrival": a_fast,
            "speedup": bool(0 <= a_fast <= a_slow),
            "both_succeed": bool(a_slow >= 0 and a_fast >= 0),
            "fast_avoid_robustness": float(fast["avoid_robustness"][0])}


def headless_hierarchical_mapf_replanning():
    """Hierarchical MAPF with replanning (headless_hierarchical_mapf_replanning.rs):
    region-level plan, then a corridor closure forces a replan whose
    makespan is >= the original."""
    from rust_robotics_tpu.planning.stl import hierarchical_mapf_plan

    free = np.ones((24, 24), bool)
    free[12, 0:20] = False  # wall with a door at columns 20-23
    starts = [(2, 2), (2, 21)]
    goals = [(21, 21), (21, 2)]
    base = hierarchical_mapf_plan(jnp.asarray(free), starts, goals,
                                  t_max=64, region_size=8)
    closed = free.copy()
    closed[12, 20:22] = False  # narrow the door -> forced replanning detour
    re = hierarchical_mapf_plan(jnp.asarray(closed), starts, goals,
                                t_max=64, region_size=8)
    b_arr = np.asarray(base["arrivals"])
    r_arr = np.asarray(re["arrivals"])
    return {"base_makespan": int(b_arr.max()),
            "replan_makespan": int(r_arr.max()),
            "base_success": bool(np.all(b_arr >= 0)),
            "replan_success": bool(np.all(r_arr >= 0)),
            "region_conflicts": int(base["region_conflicts"]),
            "replan_not_shorter": bool(r_arr.max() >= b_arr.max())}


# ---------------------------------------------------------------------------
# Risk-graph family


def _ridge_elevation(w=15, h=9):
    x = np.arange(w)[:, None]
    y = np.arange(h)[None, :]
    z = 0.8 * np.exp(-0.5 * ((x - 7) / 1.5) ** 2) * np.ones_like(
        y, dtype=float)
    z[7, 4] += 1.5  # a blocking step on the ridge crest
    return z


def headless_traversal_risk_graph():
    """Traversal-risk graph planning (headless_traversal_risk_graph.rs):
    plan across ridge terrain at low vs high risk weight; the risk-averse
    path is longer but accumulates less risk."""
    from rust_robotics_tpu.planning.risk_graph import (
        combined_cell_risk, plan_risk_path, terrain_risk_from_elevation)

    risk = terrain_risk_from_elevation(jnp.asarray(_ridge_elevation()),
                                       blocking_step_height=1.0)
    total = np.asarray(combined_cell_risk(risk))
    out = {}
    for name, w in (("direct", 0.0), ("risk_averse", 8.0)):
        idx, mask, cost = plan_risk_path(risk, (0, 4), (14, 4),
                                         risk_weight=w)
        p = np.asarray(idx)[np.asarray(mask)]
        out[f"{name}_cells"] = int(p.shape[0])
        out[f"{name}_cost"] = float(cost)
        out[f"{name}_accumulated_risk"] = float(
            total[p[:, 0], p[:, 1]].sum())
    out["risk_averse_safer"] = bool(out["risk_averse_accumulated_risk"]
                                    <= out["direct_accumulated_risk"])
    return out


def headless_clearance_risk_graph():
    """Clearance-exposure risk planning (headless_clearance_risk_graph.rs):
    adding a clearance channel pushes the path away from walls; reports
    min wall distance with and without the exposure weight."""
    from rust_robotics_tpu.planning.risk_graph import (
        RiskChannels, add_clearance_exposure_risk, clearance_map,
        plan_risk_path)

    w, h = 17, 11
    blocked = np.zeros((w, h), bool)
    blocked[5:12, 5] = True
    f = _ftype()
    base = RiskChannels(blocked=jnp.asarray(blocked),
                        traversability=jnp.zeros((w, h), f),
                        stability=jnp.zeros((w, h), f),
                        exposure=jnp.zeros((w, h), f))
    clear = clearance_map(jnp.asarray(blocked))
    risky = add_clearance_exposure_risk(base, minimum_clearance=3.0)
    out = {}
    for name, risk, ew in (("greedy", base, 0.0), ("clearance", risky, 4.0)):
        idx, mask, cost = plan_risk_path(risk, (2, 5), (15, 5),
                                         exposure_weight=ew)
        p = np.asarray(idx)[np.asarray(mask)]
        d = np.asarray(clear)[p[:, 0], p[:, 1]]
        out[f"{name}_min_clearance"] = float(d.min())
        out[f"{name}_cost"] = float(cost)
    out["clearance_improved"] = bool(out["clearance_min_clearance"]
                                     >= out["greedy_min_clearance"])
    return out


def headless_elevation_risk_graph():
    """Elevation-derived risk planning (headless_elevation_risk_graph.rs):
    slope/roughness risk from a DEM; the blocking step is untraversable and
    the planner reports slope exposure of the chosen path."""
    from rust_robotics_tpu.planning.risk_graph import (
        combined_cell_risk, plan_risk_path, terrain_risk_from_elevation)

    z = _ridge_elevation()
    risk = terrain_risk_from_elevation(jnp.asarray(z), slope_risk_scale=8.0,
                                       blocking_step_height=1.0)
    idx, mask, cost = plan_risk_path(risk, (0, 0), (14, 8), risk_weight=2.0)
    p = np.asarray(idx)[np.asarray(mask)]
    total = combined_cell_risk(risk)
    path_risk = float(np.asarray(total)[p[:, 0], p[:, 1]].sum())
    return {"path_cells": int(p.shape[0]),
            "cost": float(cost),
            "blocked_cells": int(np.asarray(risk.blocked).sum()),
            "path_accumulated_risk": path_risk,
            "avoids_blocked": bool(not np.asarray(risk.blocked)[
                p[:, 0], p[:, 1]].any())}


def headless_risk_map_smoothing():
    """Risk-map smoothing (headless_risk_map_smoothing.rs): isolated
    high-risk sensor-noise cells make the planner zigzag; smoothing the
    risk field first shortens the path at comparable accumulated risk."""
    from rust_robotics_tpu.planning.risk_graph import (
        RiskChannels, plan_risk_path, smooth_terrain_risk)

    w, h = 13, 7
    f = _ftype()
    r = np.zeros((w, h))
    for (x, y, v) in [(3, 3, 8.0), (6, 3, 8.0), (9, 3, 8.0),
                      (5, 2, 3.0), (7, 4, 3.0)]:
        r[x, y] = v
    blocked = np.zeros((w, h), bool)
    blocked[2, 0] = True
    blocked[10, 6] = True
    raw = RiskChannels(blocked=jnp.asarray(blocked),
                       traversability=jnp.asarray(r, f),
                       stability=jnp.zeros((w, h), f),
                       exposure=jnp.zeros((w, h), f))
    smooth = smooth_terrain_risk(raw, radius_cells=1, iterations=2)
    out = {}
    for name, risk in (("raw", raw), ("smoothed", smooth)):
        idx, mask, cost = plan_risk_path(risk, (0, 3), (12, 3),
                                         risk_weight=3.0)
        p = np.asarray(idx)[np.asarray(mask)]
        turns = int(np.sum(np.any(
            np.diff(np.diff(p, axis=0), axis=0) != 0, axis=-1)))
        out[f"{name}_cells"] = int(p.shape[0])
        out[f"{name}_turns"] = turns
        out[f"{name}_cost"] = float(cost)
    out["smoothing_straightens"] = bool(out["smoothed_turns"]
                                        <= out["raw_turns"])
    return out


def headless_adaptive_costmap_namo():
    """Adaptive costmap NAMO (headless_adaptive_costmap_namo.rs): a movable
    obstacle starts as soft cost so the plan takes the center corridor;
    repeated stuck observations raise it to lethal and the same query
    replans around it."""
    from rust_robotics_tpu.planning.risk_graph import (
        NAMO_MOVABLE, NAMO_STATIC, NamoConfig, namo_new, namo_set_state,
        namo_to_risk, namo_update_movable, plan_risk_path)

    cfg = NamoConfig()
    cm = namo_new(9, 5)
    # the reference demo's map: movable row blocking the center corridor,
    # two sparse static obstacles; going around is possible but longer
    cm = namo_set_state(cm, jnp.asarray([[1, 0], [7, 4]]), NAMO_STATIC, cfg)
    movable = jnp.asarray([[3, 2], [4, 2], [5, 2]])
    cm = namo_set_state(cm, movable, NAMO_MOVABLE, cfg)

    risk0 = namo_to_risk(cm, block_lethal_movable=True, cfg=cfg)
    idx0, m0, c0 = plan_risk_path(risk0, (0, 2), (8, 2), risk_weight=0.005)
    p0 = np.asarray(idx0)[np.asarray(m0)]
    through0 = bool(((p0[:, 0] == 4) & (p0[:, 1] == 2)).any())

    stuck = 0
    while float(cm[1][4, 2]) < cfg.lethal_cost:
        cm, _ = namo_update_movable(cm, movable, commanded_speed=0.5,
                                    actual_speed=0.01, odom_delta=0.0,
                                    cfg=cfg)
        stuck += 1
    risk1 = namo_to_risk(cm, block_lethal_movable=True, cfg=cfg)
    idx1, m1, c1 = plan_risk_path(risk1, (0, 2), (8, 2), risk_weight=0.005)
    p1 = np.asarray(idx1)[np.asarray(m1)]
    through1 = bool(((p1[:, 0] == 4) & (p1[:, 1] == 2)).any())
    return {"initial_through_corridor": through0,
            "stuck_observations_to_lethal": stuck,
            "replanned_through_corridor": through1,
            "replanned_around": bool(not through1 and m1.any()),
            "initial_cost": float(c0), "replanned_cost": float(c1)}


# ---------------------------------------------------------------------------
# Driving / rigid-body


def headless_branchout_multimodal_driving():
    """Branchout multimodal driving (headless_branchout_multimodal_driving.rs):
    closed-loop overtake around a slow obstacle; reports completion, TTC
    margin and comfort from `simulate_closed_loop`."""
    from rust_robotics_tpu.planning.branchout import (
        BranchOutScene, simulate_closed_loop)

    scene = BranchOutScene.simple_overtake()
    rep = simulate_closed_loop(scene, obstacle_velocities=((0.4, 0.0),),
                               steps=40)
    return {"route_completion": float(rep["route_completion"]),
            "reached_goal": bool(rep["reached_goal"]),
            "no_collision_rate": float(rep["no_collision_rate"]),
            "min_clearance": float(rep["min_clearance"]),
            "min_time_to_collision": float(rep["min_time_to_collision"]),
            "mean_comfort_cost": float(rep["mean_comfort_cost"]),
            "modes_used": len(set(rep["mode_sequence"]))}


def headless_rigid_body_mip_planning():
    """Rigid-body MIP-style planning (headless_rigid_body_mip_planning.rs):
    SE(2) lattice plan with per-pose separation certificates through a slot
    between two boxes; reports plan length, min margin, certificate count."""
    from rust_robotics_tpu.planning.rigid_body import (
        RigidBodyConfig, aabb_obstacle, rigid_body_lattice_plan)

    cfg = RigidBodyConfig(position_step=0.5, heading_count=8)
    # two boxes leaving a 1.2-wide horizontal slot at y in [4.4, 5.6]
    obstacles = (aabb_obstacle(3.0, 4.5, 0.0, 4.4),
                 aabb_obstacle(3.0, 4.5, 5.6, 10.0))
    out = rigid_body_lattice_plan((1.0, 5.0, 0.0), (9.0, 5.0, 0.0),
                                  obstacles, cfg)
    poses = np.asarray(out["poses"])
    return {"reached": bool(np.isfinite(out["total_cost"])),
            "plan_poses": int(poses.shape[0]),
            "path_length": float(out["path_length"]),
            "heading_change": float(out["heading_change"]),
            "min_separation_margin": float(out["min_separation_margin"]),
            "certified": bool(out["min_separation_margin"]
                              > cfg.clearance - 1e-9),
            "cost": float(out["total_cost"])}


# ---------------------------------------------------------------------------
# Registry


def _existing():
    from rust_robotics_tpu.demos.headless import (
        headless_euroc_vio, headless_mission_recovery,
        headless_navigation_loop)
    return {"headless_navigation_loop": headless_navigation_loop,
            "headless_mission_recovery": headless_mission_recovery,
            "headless_euroc_vio": headless_euroc_vio}


HEADLESS = {
    "headless_localizers": headless_localizers,
    "headless_grid_planners": headless_grid_planners,
    "headless_mppi_double_integrator": headless_mppi_double_integrator,
    "headless_mppi_terminal_value": headless_mppi_terminal_value,
    "headless_mppi_value_learning": headless_mppi_value_learning,
    "headless_mppi_replay_value_learning": headless_mppi_replay_value_learning,
    "headless_mppi_adaptive_temperature": headless_mppi_adaptive_temperature,
    "headless_mppi_constraint_discount": headless_mppi_constraint_discount,
    "headless_mppi_track_progress": headless_mppi_track_progress,
    "headless_mppi_racing_gate_progress": headless_mppi_racing_gate_progress,
    "headless_adap_rpf_mppi": headless_adap_rpf_mppi,
    "headless_factor_graph_stack": headless_factor_graph_stack,
    "headless_conformal_sipp": headless_conformal_sipp,
    "headless_stl_cbs_multi_robot": headless_stl_cbs_multi_robot,
    "headless_kinodynamic_stl_cbs": headless_kinodynamic_stl_cbs,
    "headless_hierarchical_mapf_replanning":
        headless_hierarchical_mapf_replanning,
    "headless_traversal_risk_graph": headless_traversal_risk_graph,
    "headless_clearance_risk_graph": headless_clearance_risk_graph,
    "headless_elevation_risk_graph": headless_elevation_risk_graph,
    "headless_risk_map_smoothing": headless_risk_map_smoothing,
    "headless_adaptive_costmap_namo": headless_adaptive_costmap_namo,
    "headless_branchout_multimodal_driving":
        headless_branchout_multimodal_driving,
    "headless_rigid_body_mip_planning": headless_rigid_body_mip_planning,
}


def run_headless(name):
    """Run one headless demo by reference example name."""
    table = dict(HEADLESS)
    table.update(_existing())
    return table[name]()
