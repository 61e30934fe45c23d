"""MPPI terminal-value machinery tests.

Mirrors the reference's inline suites (mppi.rs tests
:1698 terminal_value_grid_interpolates_and_clamps,
:1709 waypoint_track_projects_points_to_progress,
:1724 waypoint_track_returns_point_at_progress,
:1739 waypoint_track_terminal_grid_prefers_progress_and_low_lateral_error,
plus the updater/replay semantics :682-:793) and the VERDICT acceptance:
value-guided MPPI beats vanilla on the double-integrator task.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rust_robotics_tpu.control.mppi import (
    MPPIConfig,
    double_integrator_dynamics,
    make_goal_costs,
    mppi_plan,
    shift_nominal,
)
from rust_robotics_tpu.control.mppi_value import (
    ReplayBuffer,
    TerminalValueGrid,
    ValueUpdateConfig,
    discounted_cost_to_go,
    grid_from_goal_distance,
    grid_value_at,
    make_replay_buffer,
    make_track,
    make_value_terminal_cost,
    nearest_cell_indices,
    replay_push,
    replay_update_grid,
    track_project,
    track_remaining_distance,
    track_terminal_value_grid,
    track_total_length,
    update_grid_from_rollout,
)


def test_goal_distance_grid_and_bilinear_interpolation():
    g = grid_from_goal_distance(5, 4, origin=(0.0, 0.0), resolution=1.0,
                                goal=(4.0, 0.0))
    assert g.values.shape == (5, 4)
    np.testing.assert_allclose(float(g.values[4, 0]), 0.0, atol=1e-12)
    np.testing.assert_allclose(float(g.values[0, 0]), 4.0, atol=1e-12)
    # bilinear midpoint
    v = float(grid_value_at(g, jnp.array([3.5, 0.0])))
    np.testing.assert_allclose(v, 0.5 * (1.0 + 0.0) + 0.5 * 0.0, atol=1e-6)
    # out-of-bounds clamps to the edge (mppi.rs:416-421)
    v_out = float(grid_value_at(g, jnp.array([-10.0, -10.0])))
    np.testing.assert_allclose(v_out, float(g.values[0, 0]), atol=1e-12)
    # batched lookup
    vs = grid_value_at(g, jnp.array([[4.0, 0.0], [0.0, 0.0]]))
    np.testing.assert_allclose(np.asarray(vs), [0.0, 4.0], atol=1e-6)


def test_nearest_cell_indices_rounds_and_clamps():
    g = grid_from_goal_distance(5, 4, (0.0, 0.0), 0.5, (1.0, 1.0))
    idx = np.asarray(nearest_cell_indices(g, jnp.array([[0.74, 0.0],
                                                        [9.0, -3.0]])))
    np.testing.assert_array_equal(idx, [[1, 0], [4, 0]])


def test_track_projection_and_progress():
    track = make_track([[0.0, 0.0], [4.0, 0.0], [4.0, 3.0]])
    np.testing.assert_allclose(float(track_total_length(track)), 7.0)
    progress, lateral, closest = track_project(track, jnp.array([2.0, 1.0]))
    np.testing.assert_allclose(float(progress), 2.0, atol=1e-6)
    np.testing.assert_allclose(float(lateral), 1.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(closest), [2.0, 0.0], atol=1e-6)
    # beyond the last waypoint projects to the endpoint
    rem = float(track_remaining_distance(track, jnp.array([4.0, 5.0])))
    np.testing.assert_allclose(rem, 0.0, atol=1e-6)


def test_track_terminal_grid_prefers_progress_and_low_lateral():
    track = make_track([[0.0, 0.0], [6.0, 0.0]])
    g = track_terminal_value_grid(track, 7, 5, (0.0, -2.0), 1.0,
                                  progress_weight=1.0, lateral_weight=1.0)
    on_track_far = float(grid_value_at(g, jnp.array([1.0, 0.0])))
    on_track_near = float(grid_value_at(g, jnp.array([5.0, 0.0])))
    off_track = float(grid_value_at(g, jnp.array([5.0, 2.0])))
    assert on_track_near < on_track_far
    assert on_track_near < off_track
    np.testing.assert_allclose(on_track_near, 1.0, atol=1e-6)
    np.testing.assert_allclose(off_track, 1.0 + 2.0, atol=1e-6)


def test_discounted_cost_to_go_matches_loop():
    costs = jnp.array([1.0, 2.0, 3.0, 4.0])
    got = np.asarray(discounted_cost_to_go(costs, 0.9))
    want = np.zeros(4)
    acc = 0.0
    for i in range(3, -1, -1):
        acc = float(costs[i]) + 0.9 * acc
        want[i] = acc
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_update_from_rollout_sequential_duplicate_cells():
    """Duplicate-cell visits must compose sequentially (mppi.rs:682-713)."""
    g = TerminalValueGrid(jnp.zeros(2), jnp.asarray(1.0),
                          jnp.zeros((3, 3)))
    # two visits to cell (1,1) then one to (2,2)
    states = jnp.array([[1.0, 1.0, 0, 0], [1.1, 0.9, 0, 0],
                        [2.0, 2.0, 0, 0]])
    costs = jnp.array([4.0, 2.0, 1.0])
    cfg = ValueUpdateConfig(learning_rate=0.5, discount=1.0)
    g2, rep = update_grid_from_rollout(g, states, costs, cfg)
    # targets: [7, 3, 1]
    np.testing.assert_allclose(float(rep["start_target"]), 7.0)
    np.testing.assert_allclose(float(rep["terminal_target"]), 1.0)
    # cell (1,1): 0 -> 0+0.5*(7-0)=3.5 -> 3.5+0.5*(3-3.5)=3.25
    np.testing.assert_allclose(float(g2.values[1, 1]), 3.25, atol=1e-6)
    np.testing.assert_allclose(float(g2.values[2, 2]), 0.5, atol=1e-6)
    assert int(rep["updates"]) == 3
    # values never go negative (clamp, mppi.rs:489)
    g3, _ = update_grid_from_rollout(
        g, states, jnp.array([0.0, 0.0, 0.0]), cfg)
    assert float(jnp.min(g3.values)) >= 0.0


def test_replay_buffer_fifo_and_replay_matches_sequential():
    cfg = ValueUpdateConfig(learning_rate=0.3, discount=0.95)
    h, n = 4, 4
    rng = np.random.default_rng(0)
    rollouts = [
        (jnp.asarray(rng.uniform(0, 2.9, (h, n))),
         jnp.asarray(rng.uniform(0.1, 2.0, (h,))))
        for _ in range(5)
    ]
    buf = make_replay_buffer(capacity=3, horizon=h, state_dim=n)
    for s, c in rollouts:
        buf = replay_push(buf, s, c)
    assert int(buf.count) == 3  # oldest two evicted (FIFO, mppi.rs:754)

    g0 = TerminalValueGrid(jnp.zeros(2), jnp.asarray(1.0), jnp.zeros((3, 3)))
    got, rep = replay_update_grid(buf, g0, cfg)
    # sequential oracle over the 3 newest rollouts, oldest first
    g = g0
    for s, c in rollouts[2:]:
        g, _ = update_grid_from_rollout(g, s, c, cfg)
    np.testing.assert_allclose(np.asarray(got.values), np.asarray(g.values),
                               atol=1e-6)
    assert int(rep["rollouts"]) == 3


def test_value_guided_mppi_beats_vanilla_behind_wall():
    """VERDICT acceptance: a wavefront-derived terminal value grid steers
    the double integrator around a wall that traps vanilla MPPI's
    straight-line quadratic terminal."""
    from rust_robotics_tpu.planning.wavefront import (
        goal_raster,
        wavefront_costs,
    )

    res = 0.25
    origin = (-2.0, -4.0)
    w, h = 48, 48  # covers [-2, 10] x [-4, 8]
    goal = jnp.array([6.0, 0.0])
    # wall at x≈2.5 spanning y in [-4, 2] — must be rounded from above
    free = np.ones((w, h), bool)
    wall_x = int((2.5 - origin[0]) / res)
    wall_top = int((2.0 - origin[1]) / res)
    free[wall_x:wall_x + 2, :wall_top] = False
    free = jnp.asarray(free)

    goal_idx = jnp.asarray([int((goal[0] - origin[0]) / res),
                            int((goal[1] - origin[1]) / res)])
    costs = wavefront_costs(free, goal_raster((w, h), goal_idx))
    vgrid = TerminalValueGrid(jnp.asarray(origin), jnp.asarray(res),
                              costs * res)

    obstacle_pts = (np.argwhere(~np.asarray(free)) * res
                    + np.asarray(origin) + res / 2)
    stage, quad_terminal = make_goal_costs(
        goal, obstacles=jnp.asarray(obstacle_pts), obstacle_radius=0.4,
        obstacle_weight=500.0)
    value_terminal = make_value_terminal_cost(vgrid, weight=30.0)

    cfg = MPPIConfig(horizon=25, num_samples=512, noise_sigma=(0.8, 0.8))

    def run(terminal, steps=70):
        state = jnp.array([0.0, 0.0, 0.0, 0.0])
        u = jnp.zeros((cfg.horizon, 2))
        key = jax.random.PRNGKey(7)
        for _ in range(steps):
            key, sk = jax.random.split(key)
            u, first, _ = mppi_plan(sk, double_integrator_dynamics, stage,
                                    terminal, state, u, cfg)
            state = double_integrator_dynamics(state, first, cfg.dt)
            u = shift_nominal(u)
        return float(jnp.linalg.norm(state[:2] - goal))

    d_value = run(value_terminal)
    d_vanilla = run(quad_terminal)
    assert d_value < d_vanilla - 0.5, (d_value, d_vanilla)
    assert d_value < 1.0, d_value


def test_replay_learning_raises_value_in_high_cost_region():
    """Replay-buffer learning shapes the grid: repeated expensive rollouts
    through a region raise its stored value (mppi.rs:715 capability)."""
    g = grid_from_goal_distance(10, 10, (0.0, 0.0), 1.0, (9.0, 9.0))
    before = float(grid_value_at(g, jnp.array([2.0, 2.0])))
    h = 6
    states = jnp.tile(jnp.array([2.0, 2.0, 0.0, 0.0]), (h, 1))
    costs = jnp.full((h,), 50.0)
    buf = make_replay_buffer(4, h, 4)
    for _ in range(3):
        buf = replay_push(buf, states, costs)
    g2, rep = replay_update_grid(buf, g)
    after = float(grid_value_at(g2, jnp.array([2.0, 2.0])))
    assert after > before + 10.0, (before, after)
    assert float(rep["max_abs_delta"]) > 0.0
