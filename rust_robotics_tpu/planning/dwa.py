"""Dynamic Window Approach local planner.

Reference: crates/rust_robotics_planning/src/dwa.rs — DWAConfig defaults
(:88-108), dynamic window = velocity box ∩ acceleration box (:356-377),
trajectory rollout with yaw-first integration (:379-400), costs: goal
heading |wrap(target_angle − yaw_f)| (:402-414), speed (max_speed − v_f)
(:416-422), obstacle 1/min_dist with collision → ∞ (:424-460); total =
Σ gains·costs, best (v, ω) wins (try_step :507).

TPU-native inversion: the reference's nested for-loops over the (v, ω) grid
with per-sample rollouts become ONE batched `lax.scan` over a static
n_v × n_w sample lattice (the window itself stays dynamic; sampling density
adapts instead of sample count — config.v_samples/w_samples replace
v_resolution/yaw_rate_resolution so shapes are static for XLA). All
rollouts and all obstacle distances evaluate in parallel on the VPU.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from rust_robotics_tpu.core.angles import normalize_angle


@dataclasses.dataclass(frozen=True)
class DWAConfig:
    """dwa.rs:88-108 defaults; resolutions replaced by static sample counts."""

    max_speed: float = 1.0
    min_speed: float = -0.5
    max_yaw_rate: float = 0.6981317007977318  # 40°
    max_accel: float = 0.2
    max_delta_yaw_rate: float = 0.6981317007977318
    v_samples: int = 11
    w_samples: int = 41
    dt: float = 0.1
    predict_time: float = 3.0
    to_goal_cost_gain: float = 0.15
    speed_cost_gain: float = 1.0
    obstacle_cost_gain: float = 1.0
    robot_radius: float = 1.0
    goal_threshold: float = 1.0

    @property
    def horizon(self) -> int:
        return int(self.predict_time / self.dt) + 1


def dwa_motion(state, v, w, dt):
    """state [..., 5] = [x, y, yaw, v, ω]; yaw-first integration
    (dwa.rs:340-354, PythonRobotics order)."""
    yaw = state[..., 2] + w * dt
    x = state[..., 0] + v * jnp.cos(yaw) * dt
    y = state[..., 1] + v * jnp.sin(yaw) * dt
    return jnp.stack([x, y, yaw, v + 0 * x, w + 0 * x], axis=-1)


def dynamic_window(state, cfg: DWAConfig):
    """(v_min, v_max, w_min, w_max) (dwa.rs:356-377)."""
    v, w = state[..., 3], state[..., 4]
    v_min = jnp.maximum(cfg.min_speed, v - cfg.max_accel * cfg.dt)
    v_max = jnp.minimum(cfg.max_speed, v + cfg.max_accel * cfg.dt)
    w_min = jnp.maximum(-cfg.max_yaw_rate, w - cfg.max_delta_yaw_rate * cfg.dt)
    w_max = jnp.minimum(cfg.max_yaw_rate, w + cfg.max_delta_yaw_rate * cfg.dt)
    return v_min, v_max, w_min, w_max


def rollout(state, v, w, cfg: DWAConfig):
    """Predict trajectories for control samples v, w [...]: returns states
    [..., H+1, 5] including the initial state (dwa.rs:379-400)."""

    def step(s, _):
        s2 = dwa_motion(s, v, w, cfg.dt)
        return s2, s2

    _, traj = jax.lax.scan(step, state, None, length=cfg.horizon)
    traj = jnp.moveaxis(traj, 0, -2)
    return jnp.concatenate([state[..., None, :], traj], axis=-2)


def dwa_step(state, goal, obstacles, cfg: DWAConfig = DWAConfig(),
             obstacle_mask=None):
    """One DWA planning step (dwa.rs try_step :507).

    state [5]; goal [2]; obstacles [M, 2] (+ optional mask). Returns
    (best_control [2], next_state [5], best_trajectory [H+1, 5], best_cost).
    Batch over leading dims with vmap.
    """
    v_min, v_max, w_min, w_max = dynamic_window(state, cfg)
    f = state.dtype
    vs = v_min + (v_max - v_min) * jnp.linspace(0.0, 1.0, cfg.v_samples, dtype=f)
    ws = w_min + (w_max - w_min) * jnp.linspace(0.0, 1.0, cfg.w_samples, dtype=f)
    vv, ww = jnp.meshgrid(vs, ws, indexing="ij")
    vv, ww = vv.ravel(), ww.ravel()  # [K]

    trajs = rollout(
        jnp.broadcast_to(state, vv.shape + state.shape), vv, ww, cfg
    )  # [K, H+1, 5]
    final = trajs[..., -1, :]

    # goal-heading cost (dwa.rs:402-414)
    target_angle = jnp.arctan2(goal[1] - final[..., 1], goal[0] - final[..., 0])
    goal_cost = jnp.abs(normalize_angle(target_angle - final[..., 2]))

    speed_cost = cfg.max_speed - final[..., 3]

    # obstacle cost (dwa.rs:424-460): min distance over (traj states × obs)
    d = jnp.linalg.norm(
        trajs[..., :, None, :2] - obstacles[None, None, :, :], axis=-1
    )  # [K, H+1, M]
    if obstacle_mask is not None:
        d = jnp.where(obstacle_mask[None, None, :], d, jnp.inf)
    min_dist = jnp.min(d, axis=(-2, -1))
    collided = min_dist <= cfg.robot_radius
    obstacle_cost = jnp.where(collided, jnp.inf, 1.0 / min_dist)

    total = (
        cfg.to_goal_cost_gain * goal_cost
        + cfg.speed_cost_gain * speed_cost
        + cfg.obstacle_cost_gain * obstacle_cost
    )
    best = jnp.argmin(total)
    best_control = jnp.stack([vv[best], ww[best]])
    next_state = dwa_motion(state, vv[best], ww[best], cfg.dt)
    return best_control, next_state, trajs[best], total[best]


def goal_reached(state, goal, cfg: DWAConfig = DWAConfig()):
    return jnp.linalg.norm(state[..., :2] - goal) <= cfg.goal_threshold
