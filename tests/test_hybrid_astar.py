"""Hybrid A* (SE(2) lattice wavefront) tests."""

import jax.numpy as jnp
import numpy as np

from rust_robotics_tpu.planning.hybrid_astar import (
    extract_hybrid_path,
    hybrid_astar_costs,
)


def test_reaches_goal_with_feasible_arcs():
    free = jnp.ones((40, 40), dtype=bool)
    goal = jnp.array([30, 20])
    costs = hybrid_astar_costs(free, goal, goal_theta_bin=0)
    # start facing +x at (5, 20): straight shot
    assert np.isfinite(float(costs[0, 5, 20]))
    states, mask, cost = extract_hybrid_path(
        costs, free, jnp.array([5, 20]), start_theta_bin=0
    )
    assert (states[-1][:2] == [30, 20]).all()
    assert states[-1][2] == 0
    assert cost >= 25.0 - 1e-6  # at least the straight distance


def test_heading_flip_requires_turning():
    free = jnp.ones((40, 40), dtype=bool)
    goal = jnp.array([30, 20])
    straight = hybrid_astar_costs(free, goal, goal_theta_bin=0)
    flipped = hybrid_astar_costs(free, goal, goal_theta_bin=8)  # face -x
    # arriving reversed costs more than arriving aligned (turn or reverse)
    assert float(flipped[0, 5, 20]) > float(straight[0, 5, 20])


def test_obstacle_detour():
    blocked = np.zeros((40, 40), dtype=bool)
    blocked[18:22, 5:35] = True
    free = jnp.asarray(~blocked)
    goal = jnp.array([20, 38])
    costs = hybrid_astar_costs(free, goal, goal_theta_bin=4)
    c = float(costs[4, 20, 2])
    assert np.isfinite(c)
    assert c > 36.0  # must detour around the wall
    states, mask, _ = extract_hybrid_path(
        costs, free, jnp.array([20, 2]), start_theta_bin=4
    )
    # path never enters blocked cells
    for x, y, k in states:
        assert not blocked[int(x), int(y)]
