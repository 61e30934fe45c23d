"""Frenet planner + potential/flow field + coverage tests."""

import jax.numpy as jnp
import numpy as np

from rust_robotics_tpu.planning.curves import Spline2D
from rust_robotics_tpu.planning.fields import (
    boustrophedon_sweep,
    coverage_ratio,
    descend_field,
    flow_field,
    potential_field,
)
from rust_robotics_tpu.planning.frenet import FrenetConfig, frenet_optimal_plan
from rust_robotics_tpu.planning.grid import grid_from_raster
from rust_robotics_tpu.planning.wavefront import goal_raster


class TestFrenet:
    def setup_method(self):
        # the reference's demo course (frenet_optimal_trajectory.rs:978)
        wx = jnp.array([0.0, 10.0, 20.5, 35.0, 70.5])
        wy = jnp.array([0.0, -6.0, 5.0, 6.5, 0.0])
        self.csp = Spline2D.fit(wx, wy)
        self.obstacles = jnp.array(
            [[20.0, 10.0], [30.0, 6.0], [30.0, 8.0], [35.0, 8.0], [50.0, 3.0]]
        )

    def test_produces_valid_plan(self):
        out = frenet_optimal_plan(
            self.csp, s0=0.0, c_speed=10.0 / 3.6, c_d=2.0, c_d_d=0.0,
            c_d_dd=0.0, obstacles=self.obstacles,
        )
        assert bool(out["any_valid"])
        assert np.isfinite(float(out["cost"]))
        path = np.asarray(out["path"])
        # starts near the initial offset position
        rx, ry = self.csp.calc_position(jnp.array(0.0))
        assert np.hypot(path[0, 0] - float(rx), path[0, 1] - float(ry)) < 3.0
        # clears all obstacles
        d = np.linalg.norm(
            path[:, None, :] - np.asarray(self.obstacles), axis=-1
        )
        assert d.min() > 2.0

    def test_replanning_converges_to_centerline(self):
        s0, speed, d, dd, ddd = 0.0, 10.0 / 3.6, 2.0, 0.0, 0.0
        for _ in range(8):
            out = frenet_optimal_plan(
                self.csp, s0, speed, d, dd, ddd, self.obstacles
            )
            s0 = float(out["s"][1])
            d = float(out["d"][1])
        assert abs(d) < 2.0  # lateral offset shrinking toward the line


class TestFields:
    def test_potential_field_descent_reaches_goal(self):
        blocked = np.zeros((30, 30), dtype=bool)
        blocked[12:18, 10:12] = True
        free = jnp.asarray(~blocked)
        goal = jnp.array([25, 15])
        field = potential_field(free, goal)
        # goal has (near-)minimal attractive potential
        assert float(field[25, 15]) < float(field[0, 0])
        idx, mask, _ = descend_field(field, free, jnp.array([2, 15]), max_len=256)
        end = np.asarray(idx)[np.asarray(mask)][-1]
        # plain gradient descent can stall in local minima; this field is
        # benign enough to reach the goal's vicinity
        assert np.linalg.norm(end - np.asarray(goal)) < 6.0

    def test_flow_field_multi_agent(self):
        free = jnp.ones((20, 20), dtype=bool)
        field = flow_field(free, goal_raster((20, 20), jnp.array([10, 10])))
        # every agent descends the SAME field
        for start in ([0, 0], [19, 19], [0, 19]):
            idx, mask, cost = descend_field(field, free, jnp.asarray(start), max_len=64)
            end = np.asarray(idx)[np.asarray(mask)][-1]
            np.testing.assert_array_equal(end, [10, 10])

    def test_boustrophedon_covers_free_space(self):
        blocked = np.zeros((8, 6), dtype=bool)
        blocked[3, 1:5] = True
        free = jnp.asarray(~blocked)
        cells, valid = boustrophedon_sweep(free)
        visited = np.zeros_like(blocked)
        c = np.asarray(cells)[np.asarray(valid)]
        visited[c[:, 0], c[:, 1]] = True
        ratio = coverage_ratio(jnp.asarray(visited), free)
        assert float(ratio) == 1.0
        # serpentine: within each column, visit order is monotonic and the
        # direction alternates with column parity
        for col in range(8):
            ys = c[c[:, 0] == col, 1]
            if len(ys) > 1:
                d = np.diff(ys)
                assert (d > 0).all() if col % 2 == 0 else (d < 0).all()
