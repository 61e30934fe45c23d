"""BranchOut-lite multimodal driving planner.

Reference: crates/rust_robotics_planning/src/branchout_multimodal.rs —
lane-aligned scene (lane_center/nearest_lane_index :109-:117), per-mode
rollouts (smoothstep lateral blend to the mode's target lane, first-order
speed law 0.35·(v_des − v), yield_speed ramp to a stop 1.25 m before the
nearest ahead obstacle :469-:619), cost = progress·w + collision·w +
lane·w + comfort·w + route·w with the exact clearance potential
(1−c)² inside / 0.03/(c+0.3) outside (:519-:551), softmax mixture
probabilities exp(−(cost−min)/T) (:561), multimodal metrics (pairwise
final distance & discrete Fréchet, min-GT Fréchet, final-pose mixture NLL
with σ=0.75, speed JSD over 8 bins, expected route completion :655-:710),
TTC by quadratic root (:760), and a receding-horizon closed loop that
re-plans each step, tracks the winning mode's lane with bounded lateral
rate, and accumulates clearance/TTC/comfort metrics (:335-:460).

TPU-native shape: ALL modes roll out as one batched [M, T+1, 3] scan
(mode-dependence enters via per-mode target lanes and yield flags, not
control flow); metrics are reductions; the discrete Fréchet DP is a
row-scan. The closed loop re-plans by calling the batched rollout each
step inside a host loop (the scene mutates arbitrarily — the per-step
plan itself is one fused device program).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "BranchOutScene",
    "BranchOutConfig",
    "MODES",
    "branchout_plan",
    "evaluate_multimodal",
    "simulate_closed_loop",
    "discrete_frechet",
    "time_to_collision",
]

EPS = 1e-9
MODES = ("keep-lane", "yield", "lane-change-left", "lane-change-right")


@dataclasses.dataclass(frozen=True)
class BranchOutScene:
    """BranchOutDrivingScene2D; obstacles [K, 3] = (x, y, radius)."""

    start: tuple = (0.0, 0.0, 2.2)  # x, y, speed
    lane_width: float = 1.2
    lane_count_each_side: int = 1
    route_length: float = 9.0
    desired_speed: float = 2.2
    obstacles: tuple = ((4.1, 0.0, 0.42),)

    @staticmethod
    def simple_overtake():
        return BranchOutScene()

    @staticmethod
    def wide_overtake():
        return BranchOutScene(lane_width=1.6)

    @staticmethod
    def forced_yield():
        return BranchOutScene(lane_count_each_side=0)


@dataclasses.dataclass(frozen=True)
class BranchOutConfig:
    horizon_steps: int = 28
    dt: float = 0.12
    ego_radius: float = 0.32
    probability_temperature: float = 4.0
    progress_weight: float = 1.4
    collision_weight: float = 80.0
    lane_weight: float = 12.0
    comfort_weight: float = 0.35
    route_weight: float = 0.12


def _smoothstep(t):
    t = jnp.clip(t, 0.0, 1.0)
    return t * t * (3.0 - 2.0 * t)


def _nearest_lane(y, lane_width, n_side):
    return jnp.clip(jnp.round(y / lane_width), -n_side, n_side)


def _mode_target_lanes(start_lane, n_side):
    """[4] target lane per mode: keep, yield, left (+1), right (−1)."""
    return jnp.stack([
        start_lane,
        start_lane,
        jnp.minimum(start_lane + 1, n_side),
        jnp.maximum(start_lane - 1, -n_side),
    ])


def _yield_speed(obstacles, start_x, desired_speed, ego_x):
    """yield_speed (branchout_multimodal.rs:608): ramp to stop 1.25 before
    the nearest obstacle ahead of the scene start."""
    ahead = obstacles[:, 0] >= start_x
    ox = jnp.min(jnp.where(ahead, obstacles[:, 0], jnp.inf))
    stop_x = ox - 1.25
    dist = jnp.maximum(stop_x - ego_x, 0.0)
    v = jnp.minimum(0.75 * desired_speed, dist)
    v = jnp.where(ego_x >= stop_x, 0.0, v)
    return jnp.where(jnp.isfinite(ox), v, desired_speed)


@functools.partial(jax.jit, static_argnames=("cfg", "n_side"))
def _rollout_all_modes(start, obstacles, lane_width, n_side, route_length,
                       desired_speed, cfg: BranchOutConfig):
    """Batched [4, T+1, 3] rollouts + per-mode cost terms."""
    f = jnp.result_type(float)
    start = jnp.asarray(start, f)
    obstacles = jnp.asarray(obstacles, f)
    start_lane = _nearest_lane(start[1], lane_width, n_side)
    targets = _mode_target_lanes(start_lane, n_side) * lane_width  # [4]
    is_yield = jnp.array([False, True, False, False])
    t_steps = cfg.horizon_steps

    def step(pose, k):
        # pose [4, 3]
        phase = (k + 1).astype(f) / t_steps
        smooth = _smoothstep(phase)
        vy = jax.vmap(
            lambda x: _yield_speed(obstacles, start[0], desired_speed, x)
        )(pose[:, 0])
        v_des = jnp.where(is_yield, vy, desired_speed)
        speed = pose[:, 2] + 0.35 * (v_des - pose[:, 2])
        x = pose[:, 0] + speed * cfg.dt
        y = start[1] + (targets - start[1]) * smooth
        new = jnp.stack([x, y, speed], axis=-1)
        return new, new

    pose0 = jnp.broadcast_to(start, (4, 3))
    _, traj = jax.lax.scan(step, pose0, jnp.arange(t_steps))
    poses = jnp.concatenate([pose0[None], traj], axis=0)  # [T+1, 4, 3]
    poses = jnp.swapaxes(poses, 0, 1)  # [4, T+1, 3]

    # cost terms (branchout_multimodal.rs:519)
    road_half = (n_side + 0.5) * lane_width
    d = jnp.linalg.norm(
        poses[:, :, None, :2] - obstacles[None, None, :, :2], axis=-1
    )
    clearance = d - obstacles[None, None, :, 2] - cfg.ego_radius
    pot = jnp.where(clearance < 0.0, (1.0 - clearance) ** 2,
                    0.03 / (clearance + 0.3))
    collision_risk = jnp.sum(pot, axis=(1, 2))  # [4]
    lane_pen = jnp.sum(
        jnp.where(jnp.abs(poses[:, :, 1]) > road_half,
                  (jnp.abs(poses[:, :, 1]) - road_half) ** 2, 0.0),
        axis=1,
    )
    ay = jnp.diff(poses[:, :, 1], axis=1)
    jerk = jnp.diff(ay, axis=1) ** 2 / (cfg.dt * cfg.dt)
    dv = jnp.diff(poses[:, :, 2], axis=1)[:, 1:] ** 2
    comfort = jnp.sum(jerk + dv, axis=1)

    final = poses[:, -1]
    progress_err = jnp.maximum(route_length - final[:, 0], 0.0)
    completion = jnp.clip(final[:, 0] / route_length, 0.0, 1.0)
    route_dev = jnp.abs(final[:, 1] - start_lane * lane_width)
    cost = (cfg.progress_weight * progress_err
            + cfg.collision_weight * collision_risk
            + cfg.lane_weight * lane_pen
            + cfg.comfort_weight * comfort
            + cfg.route_weight * route_dev)
    prob = jnp.exp(-(cost - jnp.min(cost)) / cfg.probability_temperature)
    prob = prob / jnp.sum(prob)
    return {
        "poses": poses,
        "cost": cost,
        "probability": prob,
        "collision_risk": collision_risk,
        "comfort_cost": comfort,
        "route_completion": completion,
    }


def branchout_plan(scene: BranchOutScene, cfg: BranchOutConfig = BranchOutConfig()):
    """One trajectory per decision mode with mixture probabilities.
    Returns the dict of `_rollout_all_modes` plus mode labels."""
    out = _rollout_all_modes(
        jnp.asarray(scene.start), jnp.asarray(scene.obstacles),
        scene.lane_width, scene.lane_count_each_side, scene.route_length,
        scene.desired_speed, cfg,
    )
    out["modes"] = MODES
    return out


def discrete_frechet(a, b):
    """Discrete Fréchet distance between [N, 2] and [M, 2] (the reference's
    DP :735) as a row-scan."""
    a = jnp.asarray(a, float)
    b = jnp.asarray(b, float)
    d = jnp.linalg.norm(a[:, None] - b[None], axis=-1)  # [N, M]

    def first_row(carry, dij):
        v = jnp.maximum(carry, dij)
        return v, v

    _, row0 = jax.lax.scan(first_row, -jnp.inf, d[0])

    def row(prev_row, drow):
        def cell(carry, x):
            left = carry
            up, diag, dij = x
            v = jnp.maximum(jnp.minimum(jnp.minimum(up, diag), left), dij)
            return v, v

        diag = jnp.concatenate([jnp.array([jnp.inf]), prev_row[:-1]])
        # first cell: only 'up' path
        first = jnp.maximum(prev_row[0], drow[0])
        rest, vals = jax.lax.scan(cell, first, (prev_row[1:], diag[1:],
                                                drow[1:]))
        new_row = jnp.concatenate([jnp.array([first]), vals])
        return new_row, None

    last, _ = jax.lax.scan(row, row0, d[1:])
    return last[-1]


def time_to_collision(ego, ego_v, obs, obs_v, radius_sum):
    """Quadratic-root TTC (branchout_multimodal.rs:760); inf when
    separating, 0 when already overlapping."""
    p = jnp.asarray(obs, float) - jnp.asarray(ego, float)
    v = jnp.asarray(obs_v, float) - jnp.asarray(ego_v, float)
    d2 = jnp.sum(p * p)
    r2 = radius_sum * radius_sum
    a = jnp.sum(v * v)
    b = 2.0 * jnp.sum(p * v)
    c = d2 - r2
    disc = b * b - 4 * a * c
    root = (-b - jnp.sqrt(jnp.clip(disc, 0.0, None))) / (2.0 * jnp.maximum(a, EPS))
    ttc = jnp.where((disc >= 0) & (root >= 0) & (a > EPS), root, jnp.inf)
    return jnp.where(d2 <= r2, 0.0, ttc)


def evaluate_multimodal(plan, ground_truths, sigma: float = 0.75,
                        bins: int = 8, max_speed: float = 4.0):
    """BranchOutMultimodalMetrics2D (branchout_multimodal.rs:282):
    distributional metrics against [G, T+1, 3] ground-truth trajectories."""
    poses = plan["poses"]  # [4, T+1, 3]
    prob = plan["probability"]
    gts = jnp.asarray(ground_truths, float)
    m = poses.shape[0]

    finals = poses[:, -1, :2]
    iu = np.triu_indices(m, k=1)
    pair_final = jnp.linalg.norm(finals[iu[0]] - finals[iu[1]], axis=-1)
    pair_frech = jnp.stack([
        discrete_frechet(poses[i, :, :2], poses[j, :, :2])
        for i, j in zip(*iu)
    ])
    gt_frech = jnp.stack([
        jnp.min(jnp.stack([
            discrete_frechet(poses[i, :, :2], g[:, :2]) for i in range(m)
        ]))
        for g in gts
    ])
    var = sigma * sigma
    norm = 2.0 * jnp.pi * var
    gt_finals = gts[:, -1, :2]
    d2 = jnp.sum((finals[None] - gt_finals[:, None]) ** 2, axis=-1)  # [G, 4]
    lik = jnp.maximum(
        jnp.sum(prob[None] * jnp.exp(-0.5 * d2 / var) / norm, axis=1), EPS
    )
    nll = -jnp.mean(jnp.log(lik))

    def speed_hist(speeds, weights):
        b = jnp.clip(
            jnp.floor(jnp.clip(speeds, 0, max_speed) / max_speed * bins),
            0, bins - 1,
        ).astype(jnp.int32)
        h = jnp.zeros((bins,)).at[b].add(weights)
        return h / jnp.maximum(jnp.sum(h), EPS)

    pred = speed_hist(poses[:, :, 2].reshape(-1),
                      jnp.repeat(prob, poses.shape[1]))
    truth = speed_hist(gts[:, :, 2].reshape(-1),
                       jnp.ones(gts.shape[0] * gts.shape[1]))
    mix = 0.5 * (pred + truth)

    def kl(p, q):
        ok = p > EPS
        return jnp.sum(jnp.where(ok, p * jnp.log(
            jnp.maximum(p, EPS) / jnp.maximum(q, EPS)), 0.0))

    jsd = 0.5 * kl(pred, mix) + 0.5 * kl(truth, mix)
    return {
        "mode_count": m,
        "mean_pairwise_final_distance": float(jnp.mean(pair_final)),
        "mean_pairwise_frechet": float(jnp.mean(pair_frech)),
        "min_ground_truth_frechet": float(jnp.mean(gt_frech)),
        "negative_log_likelihood": float(nll),
        "speed_jsd": float(jsd),
        "expected_route_completion": float(
            jnp.sum(prob * plan["route_completion"])
        ),
    }


def simulate_closed_loop(scene: BranchOutScene, obstacle_velocities,
                         cfg: BranchOutConfig = BranchOutConfig(),
                         steps: int = 40, ttc_threshold: float = 1.5,
                         goal_completion: float = 0.95,
                         max_lateral_speed: float = 0.9):
    """Receding-horizon closed loop (branchout_multimodal.rs:335): re-plan
    each step, track the winning mode's lane at bounded lateral rate,
    advance obstacles, accumulate clearance/TTC/comfort metrics."""
    ego = np.asarray(scene.start, float)
    obstacles = np.asarray(scene.obstacles, float).copy()
    vels = np.asarray(obstacle_velocities, float)
    dt = cfg.dt
    n_side = scene.lane_count_each_side
    executed = [ego.copy()]
    mode_seq = []
    collision_steps = 0
    min_clear = np.inf
    min_ttc = np.inf
    risky = 0
    comfort = []

    for _ in range(steps):
        plan = _rollout_all_modes(
            jnp.asarray(ego), jnp.asarray(obstacles), scene.lane_width,
            n_side, scene.route_length, scene.desired_speed, cfg,
        )
        mode = int(jnp.argmax(plan["probability"]))
        mode_seq.append(MODES[mode])
        start_lane = float(np.clip(np.round(ego[1] / scene.lane_width),
                                   -n_side, n_side))
        tlanes = np.array([start_lane, start_lane,
                           min(start_lane + 1, n_side),
                           max(start_lane - 1, -n_side)])
        target_y = tlanes[mode] * scene.lane_width
        if MODES[mode] == "yield":
            v_des = float(_yield_speed(jnp.asarray(obstacles), ego[0],
                                       scene.desired_speed, ego[0]))
        else:
            v_des = scene.desired_speed
        nxt = ego.copy()
        nxt[2] += 0.35 * (v_des - ego[2])
        nxt[0] += nxt[2] * dt
        dy = np.clip(target_y - ego[1], -max_lateral_speed * dt,
                     max_lateral_speed * dt)
        nxt[1] += dy
        ego_v = ((nxt[0] - ego[0]) / dt, (nxt[1] - ego[1]) / dt)
        obstacles[:, :2] += vels * dt

        step_clear = np.inf
        step_ttc = np.inf
        for ob, v in zip(obstacles, vels):
            rs = ob[2] + cfg.ego_radius
            c = np.hypot(nxt[0] - ob[0], nxt[1] - ob[1]) - rs
            step_clear = min(step_clear, c)
            t = float(time_to_collision(nxt[:2], ego_v, ob[:2], v, rs))
            step_ttc = min(step_ttc, t)
        min_clear = min(min_clear, step_clear)
        if step_clear < 0:
            collision_steps += 1
        min_ttc = min(min_ttc, step_ttc)
        if step_ttc < ttc_threshold:
            risky += 1
        if len(executed) >= 2:
            ay0 = executed[-1][1] - executed[-2][1]
            ay1 = nxt[1] - executed[-1][1]
            comfort.append((ay1 - ay0) ** 2 / (dt * dt)
                           + (nxt[2] - executed[-1][2]) ** 2)
        ego = nxt
        executed.append(ego.copy())

    completion = float(np.clip(ego[0] / scene.route_length, 0.0, 1.0))
    return {
        "steps": steps,
        "route_completion": completion,
        "reached_goal": completion >= goal_completion,
        "collision_steps": collision_steps,
        "no_collision_rate": 1.0 - collision_steps / steps,
        "min_clearance": min_clear,
        "mean_comfort_cost": float(np.mean(comfort)) if comfort else 0.0,
        "min_time_to_collision": min_ttc,
        "risky_ttc_steps": risky,
        "executed_path": np.stack(executed),
        "mode_sequence": mode_seq,
    }
