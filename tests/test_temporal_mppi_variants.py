"""Time-expanded planning (SIPP-family) + MPPI variant tests."""

import jax
import jax.numpy as jnp
import numpy as np

from rust_robotics_tpu.control.mppi import (
    MPPIConfig,
    double_integrator_dynamics,
    mppi_plan,
    shift_nominal,
)
from rust_robotics_tpu.control.mppi_variants import (
    lap_progress,
    make_person_following_costs,
    make_racing_costs,
)
from rust_robotics_tpu.planning.temporal import (
    earliest_arrival,
    extract_time_path,
    moving_obstacle_mask,
    prioritized_multi_agent,
    time_expanded_costs,
)


class TestTimeExpanded:
    def test_static_equals_grid_distance(self):
        free = jnp.ones((10, 10), dtype=bool)
        free_t = jnp.broadcast_to(free, (20, 10, 10))
        costs = time_expanded_costs(free_t, jnp.array([0, 0]))
        t, c = earliest_arrival(costs, jnp.array([6, 6]))
        assert int(t) == 6  # diagonal moves, one per step
        np.testing.assert_allclose(float(c), 6 * 1.4142135623730951, atol=1e-6)

    def test_waits_for_moving_obstacle(self):
        # corridor with an obstacle sweeping through; agent must wait
        free = np.ones((7, 3), dtype=bool)
        free[:, 0] = free[:, 2] = False  # 1-wide corridor along x at y=1
        free[:, 1] = True
        static = jnp.asarray(free)
        t_max = 14
        # obstacle moves from (6,1) to (0,1) one cell per step
        traj = np.stack(
            [np.clip(6 - np.arange(t_max), 0, 6), np.ones(t_max, int)], -1
        )[None]
        free_t = moving_obstacle_mask(static, jnp.asarray(traj), t_max)
        costs = time_expanded_costs(free_t, jnp.array([0, 1]))
        t, c = earliest_arrival(costs, jnp.array([6, 1]))
        assert int(t) > 6  # head-on corridor: must wait for the swap window
        path = extract_time_path(costs, jnp.array([6, 1]), int(t))
        # never collides
        ft = np.asarray(free_t)
        for tt in range(int(t)):
            x, y = path[tt]
            assert ft[tt, x, y]

    def test_prioritized_multi_agent_no_conflicts(self):
        free = jnp.ones((8, 8), dtype=bool)
        starts = [np.array([0, 0]), np.array([7, 0]), np.array([0, 7])]
        goals = [np.array([7, 7]), np.array([0, 7]), np.array([7, 0])]
        paths, arrivals = prioritized_multi_agent(free, starts, goals, 30)
        assert (arrivals >= 0).all()
        # pairwise vertex-conflict free
        for t in range(30):
            cells = {tuple(paths[a, t]) for a in range(3)}
            assert len(cells) == 3


class TestMPPIVariants:
    def test_person_following_keeps_standoff(self):
        cfg = MPPIConfig(horizon=20, num_samples=512, temperature=0.4,
                         noise_sigma=(0.6, 0.6))
        # target walks +x
        t = jnp.arange(20.0) * 0.1
        key = jax.random.PRNGKey(0)
        state = jnp.array([0.0, 2.5, 0.0, 0.0])
        u = jnp.zeros((cfg.horizon, 2))
        dists = []
        for k in range(80):
            target_traj = jnp.stack(
                [0.5 * (k * 0.1 + t), jnp.zeros_like(t)], axis=-1
            )
            stage, term = make_person_following_costs(target_traj, standoff=1.5)
            key, sub = jax.random.split(key)
            u, u0, _ = mppi_plan(
                sub, double_integrator_dynamics, stage, term, state, u, cfg
            )
            state = double_integrator_dynamics(state, u0, cfg.dt)
            u = shift_nominal(u)
            if k > 40:
                d = float(
                    jnp.linalg.norm(state[:2] - target_traj[0])
                )
                dists.append(d)
        assert 0.7 < np.mean(dists) < 2.6, np.mean(dists)

    def test_racing_makes_lap_progress(self):
        th = jnp.linspace(0, 2 * jnp.pi, 100, endpoint=False)
        centerline = jnp.stack([5 * jnp.cos(th), 5 * jnp.sin(th)], axis=-1)
        stage, term = make_racing_costs(centerline, half_width=1.0)
        cfg = MPPIConfig(horizon=25, num_samples=512, temperature=0.4,
                         noise_sigma=(0.8, 0.8), control_min=(-3, -3),
                         control_max=(3, 3))
        state = jnp.array([5.0, 0.0, 0.0, 0.5])
        u = jnp.zeros((cfg.horizon, 2))
        key = jax.random.PRNGKey(1)
        traj = [state]
        for _ in range(120):
            key, sub = jax.random.split(key)
            u, u0, _ = mppi_plan(
                sub, double_integrator_dynamics, stage, term, state, u, cfg
            )
            state = double_integrator_dynamics(state, u0, cfg.dt)
            u = shift_nominal(u)
            traj.append(state)
        traj = jnp.stack(traj)
        prog = float(lap_progress(traj, centerline))
        assert prog > 0.25, prog  # made a good fraction of the lap
        # stayed near the track corridor
        d = jnp.min(
            jnp.linalg.norm(traj[:, None, :2] - centerline[None], axis=-1),
            axis=-1,
        )
        assert float(jnp.max(d)) < 2.0