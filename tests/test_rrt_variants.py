"""Geometric sampling-planner variants (informed RRT*, connect, RRG, FMT*,
BIT*, Sobol, shortcutting) — behavior tests in the reference's style:
planners find collision-free paths on a known obstacle course, anytime
variants improve monotonically, deterministic variants reproduce exactly.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rust_robotics_tpu.planning.rrt import RRTConfig, extract_rrt_path
from rust_robotics_tpu.planning.rrt_variants import (
    BIG,
    GraphPlannerConfig,
    bidirectional_rrt_plan,
    bit_star_plan,
    extract_graph_path,
    fmt_star_plan,
    graph_shortest_path,
    informed_rrt_star_plan,
    rrg_plan,
    rrt_connect_plan,
    rrt_sobol_plan,
    shortcut_path,
    sobol_sequence_2d,
)

START = jnp.array([0.0, 0.0])
GOAL = jnp.array([10.0, 10.0])
OBS = jnp.array([[5.0, 5.0], [3.0, 6.0], [7.0, 4.0]])
RAD = jnp.array([1.0, 0.8, 0.8])
CFG = RRTConfig(expand_dis=1.0, max_nodes=300, connect_radius=2.5,
                goal_threshold=1.0)


def path_is_free(pts, mask, checks=30):
    pts = np.asarray(pts)[np.asarray(mask)]
    for a, b in zip(pts[:-1], pts[1:]):
        for t in np.linspace(0, 1, checks):
            p = a + t * (b - a)
            d = np.linalg.norm(p - np.asarray(OBS), axis=-1)
            assert np.all(d > np.asarray(RAD) - 1e-9), (p, d)


def test_informed_rrt_star_finds_path_and_not_worse_than_straight_line():
    key = jax.random.PRNGKey(0)
    tree, best, cost = informed_rrt_star_plan(key, START, GOAL, OBS, RAD, CFG)
    assert float(cost) < BIG / 2
    pts, mask = extract_rrt_path(tree, best)
    path_is_free(pts, mask)
    # optimal is >= straight-line distance
    assert float(cost) >= float(jnp.linalg.norm(GOAL - START)) - 1e-6
    assert float(cost) < 2.2 * float(jnp.linalg.norm(GOAL - START))


def test_rrt_connect_joins_trees():
    key = jax.random.PRNGKey(1)
    trees, link, cost = rrt_connect_plan(key, START, GOAL, OBS, RAD, CFG)
    assert float(cost) < BIG / 2
    a, b = int(link[0]), int(link[1])
    pa, ma = extract_rrt_path(
        jax.tree.map(lambda x: x[0] if x.ndim else x,
                     trees), jnp.asarray(a))
    # tree pytree has leading axis 2 on arrays, scalar count is [2]
    assert bool(ma[0])


def test_bidirectional_rrt_joins():
    key = jax.random.PRNGKey(2)
    trees, link, cost = bidirectional_rrt_plan(key, START, GOAL, OBS, RAD, CFG)
    assert float(cost) < BIG / 2


def test_graph_shortest_path_matches_dijkstra_small():
    # hand graph: 0-1 (1), 1-2 (2), 0-2 (4) -> d(2)=3
    w = jnp.full((3, 3), BIG)
    w = w.at[0, 1].set(1.0).at[1, 0].set(1.0)
    w = w.at[1, 2].set(2.0).at[2, 1].set(2.0)
    w = w.at[0, 2].set(4.0).at[2, 0].set(4.0)
    d = graph_shortest_path(w, 0)
    np.testing.assert_allclose(np.asarray(d), [0.0, 1.0, 3.0])
    idx, mask = extract_graph_path(w, d, 0, 2, max_len=8)
    got = [int(i) for i, m in zip(idx, mask) if m]
    assert got == [0, 1, 2]


def test_fmt_star_plans_free_path():
    key = jax.random.PRNGKey(3)
    cfg = GraphPlannerConfig(num_samples=256, connect_radius=2.5)
    nodes, idx, mask, cost = fmt_star_plan(key, START, GOAL, OBS, RAD, cfg)
    assert float(cost) < BIG / 2
    pts = nodes[idx]
    path_is_free(pts, mask)


def test_rrg_plans_free_path():
    key = jax.random.PRNGKey(4)
    nodes, idx, mask, cost = rrg_plan(key, START, GOAL, OBS, RAD, CFG)
    assert float(cost) < BIG / 2
    path_is_free(nodes[idx], mask)


def test_bit_star_monotone_improvement():
    key = jax.random.PRNGKey(5)
    cfg = GraphPlannerConfig(num_samples=0, connect_radius=3.0,
                             batches=4, batch_size=96)
    nodes, idx, mask, cost, history = bit_star_plan(key, START, GOAL, OBS,
                                                    RAD, cfg)
    h = np.asarray(history)
    assert float(cost) < BIG / 2
    # anytime contract: per-batch best cost is nonincreasing
    assert np.all(np.diff(h) <= 1e-9)
    path_is_free(nodes[idx], mask)


def test_sobol_sequence_low_discrepancy_and_deterministic():
    s = np.asarray(sobol_sequence_2d(256))
    assert s.shape == (256, 2)
    assert np.all((s >= 0) & (s < 1))
    # mean of a Sobol sequence converges fast to 0.5
    np.testing.assert_allclose(s.mean(axis=0), [0.5, 0.5], atol=0.01)
    # first points of the standard sequence: 0.5, then 0.75/0.25, ...
    np.testing.assert_allclose(s[0], [0.5, 0.5], atol=1e-7)
    s2 = np.asarray(sobol_sequence_2d(256))
    np.testing.assert_array_equal(s, s2)


def test_rrt_sobol_deterministic_plan():
    tree, best, cost = rrt_sobol_plan(START, GOAL, OBS, RAD, CFG)
    tree2, best2, cost2 = rrt_sobol_plan(START, GOAL, OBS, RAD, CFG)
    assert float(cost) < BIG / 2
    assert float(cost) == float(cost2)
    pts, mask = extract_rrt_path(tree, best)
    path_is_free(pts, mask)


def test_shortcut_path_reduces_length():
    # deliberately wiggly collision-free path around the obstacles
    pts = jnp.array([
        [0.0, 0.0], [0.0, 3.0], [1.0, 8.0], [2.0, 9.5], [5.0, 9.8],
        [8.0, 9.9], [10.0, 10.0],
    ])
    mask = jnp.ones((7,), bool)
    key = jax.random.PRNGKey(6)
    before = float(jnp.sum(jnp.linalg.norm(jnp.diff(pts, axis=0), axis=-1)))
    _, keep, after = shortcut_path(key, pts, mask, OBS, RAD, iters=64)
    assert bool(keep[0]) and bool(keep[-1])  # endpoints survive
    assert float(after) <= before + 1e-9
    kept = np.asarray(pts)[np.asarray(keep)]
    path_is_free(kept, np.ones(len(kept), bool))
