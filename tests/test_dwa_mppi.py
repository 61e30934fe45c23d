"""DWA + MPPI behavior tests (reference headless_navigation_loop shape)."""

import jax
import jax.numpy as jnp
import numpy as np

from rust_robotics_tpu.control.mppi import (
    MPPIConfig,
    double_integrator_dynamics,
    make_goal_costs,
    mppi_plan,
    shift_nominal,
)
from rust_robotics_tpu.planning.dwa import DWAConfig, dwa_step, goal_reached


OBSTACLES = jnp.array(
    [[4.0, 2.0], [2.0, 4.5], [6.5, 8.5], [8.5, 6.0], [5.0, 4.0]]
)


def test_dwa_navigates_to_goal():
    """Mirror of headless_navigation_loop.rs:11-63: 120 steps, DWA toward a
    goal among obstacles, never colliding."""
    cfg = DWAConfig()
    goal = jnp.array([9.0, 9.0])
    state = jnp.array([0.0, 0.0, jnp.pi / 8, 0.0, 0.0])

    min_obstacle_dist = np.inf
    for _ in range(180):
        if bool(goal_reached(state, goal, cfg)):
            break
        _, state, _, cost = dwa_step(state, goal, OBSTACLES, cfg)
        d = float(jnp.min(jnp.linalg.norm(OBSTACLES - state[:2], axis=-1)))
        min_obstacle_dist = min(min_obstacle_dist, d)
    assert float(jnp.linalg.norm(state[:2] - goal)) <= cfg.goal_threshold + 0.5
    assert min_obstacle_dist > cfg.robot_radius * 0.9


def test_dwa_respects_dynamic_window():
    cfg = DWAConfig()
    state = jnp.array([0.0, 0.0, 0.0, 0.5, 0.0])
    control, _, _, _ = dwa_step(state, jnp.array([5.0, 0.0]), OBSTACLES, cfg)
    assert abs(float(control[0]) - 0.5) <= cfg.max_accel * cfg.dt + 1e-6
    assert abs(float(control[1])) <= cfg.max_delta_yaw_rate * cfg.dt + 1e-6


def test_mppi_reaches_goal_double_integrator():
    """mppi.rs double-integrator demo shape (:892-1010)."""
    cfg = MPPIConfig(horizon=25, num_samples=512, temperature=0.5,
                     noise_sigma=(0.8, 0.8))
    goal = jnp.array([5.0, 3.0])
    stage, terminal = make_goal_costs(goal)
    state = jnp.zeros(4)
    u = jnp.zeros((cfg.horizon, 2))
    key = jax.random.PRNGKey(0)

    @jax.jit
    def step(state, u, key):
        key, sub = jax.random.split(key)
        u, u0, diag = mppi_plan(
            sub, double_integrator_dynamics, stage, terminal, state, u, cfg
        )
        state = double_integrator_dynamics(state, u0, cfg.dt)
        return state, shift_nominal(u), key, diag

    for _ in range(120):
        state, u, key, diag = step(state, u, key)
    assert float(jnp.linalg.norm(state[:2] - goal)) < 0.3
    assert float(diag.effective_sample_size) > 1.0


def test_mppi_avoids_obstacle():
    cfg = MPPIConfig(horizon=30, num_samples=1024, temperature=0.3,
                     noise_sigma=(0.8, 0.8))
    goal = jnp.array([6.0, 0.0])
    obstacles = jnp.array([[3.0, 0.0]])
    stage, terminal = make_goal_costs(goal, obstacles, obstacle_radius=1.0)
    state = jnp.zeros(4)
    u = jnp.zeros((cfg.horizon, 2))
    key = jax.random.PRNGKey(1)

    @jax.jit
    def step(state, u, key):
        key, sub = jax.random.split(key)
        u, u0, _ = mppi_plan(
            sub, double_integrator_dynamics, stage, terminal, state, u, cfg
        )
        state = double_integrator_dynamics(state, u0, cfg.dt)
        return state, shift_nominal(u), key

    min_d = np.inf
    for _ in range(150):
        state, u, key = step(state, u, key)
        min_d = min(min_d, float(jnp.linalg.norm(state[:2] - obstacles[0])))
    assert float(jnp.linalg.norm(state[:2] - goal)) < 0.5
    assert min_d > 0.6, min_d
