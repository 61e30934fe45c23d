"""RRT / RRT* tests: feasibility, obstacle clearance, RRT* optimality gain,
batched forests."""

import jax
import jax.numpy as jnp
import numpy as np

from rust_robotics_tpu.planning.rrt import (
    RRTConfig,
    extract_rrt_path,
    rrt_plan,
)

OBSTACLES = jnp.array([[5.0, 5.0], [3.0, 6.0], [7.0, 5.0], [5.0, 8.0]])
RADII = jnp.array([1.0, 1.5, 1.0, 1.0])
START = jnp.array([0.0, 0.0])
GOAL = jnp.array([9.0, 9.0])


def path_clear(pts, mask):
    p = pts[np.asarray(mask)]
    for a, b in zip(p[:-1], p[1:]):
        for t in np.linspace(0, 1, 20):
            q = a + t * (b - a)
            d = np.linalg.norm(np.asarray(OBSTACLES) - q, axis=-1)
            if (d <= np.asarray(RADII) - 1e-6).any():
                return False
    return True


def test_rrt_finds_feasible_path():
    cfg = RRTConfig(max_nodes=600, expand_dis=0.8)
    tree, best, cost = rrt_plan(
        jax.random.PRNGKey(0), START, GOAL, OBSTACLES, RADII, cfg
    )
    assert float(cost) < 1e17, "no path found"
    pts, mask = extract_rrt_path(tree, best)
    p = np.asarray(pts)[np.asarray(mask)]
    np.testing.assert_allclose(p[-1], START, atol=1e-6)  # root last
    assert np.linalg.norm(p[0] - np.asarray(GOAL)) < cfg.goal_threshold + cfg.expand_dis
    assert path_clear(np.asarray(pts), np.asarray(mask))


def test_rrt_star_shortens_path():
    cfg = RRTConfig(max_nodes=600, expand_dis=0.8)
    key = jax.random.PRNGKey(1)
    _, _, cost_rrt = rrt_plan(key, START, GOAL, OBSTACLES, RADII, cfg)
    _, _, cost_star = rrt_plan(key, START, GOAL, OBSTACLES, RADII, cfg, star=True)
    assert float(cost_star) < 1e17
    # RRT* should not be worse given the same samples
    assert float(cost_star) <= float(cost_rrt) + 1e-6
    # and reasonably close to the straight-line lower bound
    assert float(cost_star) < 2.0 * float(jnp.linalg.norm(GOAL - START))


def test_rrt_forest_vmap():
    cfg = RRTConfig(max_nodes=300)
    keys = jax.random.split(jax.random.PRNGKey(2), 4)
    trees, bests, costs = jax.vmap(
        lambda k: rrt_plan(k, START, GOAL, OBSTACLES, RADII, cfg, star=True)
    )(keys)
    assert trees.nodes.shape == (4, 300, 2)
    assert (np.asarray(costs) < 1e17).sum() >= 3  # most trees find the goal
