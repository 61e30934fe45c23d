"""JPS jump rules: cost parity with the wavefront optimum + the
node-pruning win (jps.rs; Harabor & Grastien 2011/2014).

The jump graph must preserve optimal octile distances under the strict
no-corner-cutting convention, while carrying far fewer edges than the
8-connected cell graph — the reference's 512×512 benchmark claim.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from rust_robotics_tpu.data.fixtures import reference_benchdata_root
from rust_robotics_tpu.planning.jps import (
    jps_costs, jps_plan, jump_distances, jump_point_mask)
from rust_robotics_tpu.planning.wavefront import goal_raster, wavefront_costs

BASE = reference_benchdata_root()


def _random_map(seed, w=40, h=40, p=0.25):
    rng = np.random.default_rng(seed)
    free = rng.random((w, h)) > p
    free[1, 1] = free[w - 2, h - 2] = True
    return free


def _optimal(free, start, goal):
    goals = goal_raster(free.shape, jnp.asarray(goal))
    return float(wavefront_costs(jnp.asarray(free), goals)[start[0],
                                                           start[1]])


def test_forced_neighbor_rule_wall_end():
    # travelling east along a wall: the cell where the wall ends above is
    # a jump point, interior wall cells are not
    free = np.ones((8, 4), bool)
    free[2:5, 2] = False  # wall segment above the y=1 corridor
    m = np.asarray(jump_point_mask(jnp.asarray(free), 1, 0))
    assert m[5, 1]  # wall just ended behind-left -> forced neighbor up
    assert not m[3, 1] and not m[4, 1]  # wall still alongside
    assert not m[1, 1]  # before the wall


@pytest.mark.parametrize("seed", range(6))
def test_cost_parity_random_maps(seed):
    free = _random_map(seed)
    start, goal = (1, 1), (free.shape[0] - 2, free.shape[1] - 2)
    opt = _optimal(free, start, goal)
    cost, _, _ = jps_costs(jnp.asarray(free), jnp.asarray(start),
                           jnp.asarray(goal))
    if np.isfinite(opt):
        np.testing.assert_allclose(float(cost), opt, atol=1e-6)
    else:
        assert not np.isfinite(float(cost))


def test_degenerate_queries():
    free = np.ones((12, 12), bool)
    cost, _, _ = jps_costs(jnp.asarray(free), jnp.asarray((3, 3)),
                           jnp.asarray((3, 3)))
    assert float(cost) == 0.0
    free[:, 6] = False  # full wall -> unreachable
    out = jps_plan(free, (1, 1), (10, 10))
    assert not out["found"]


def test_open_grid_single_jump_to_goal():
    free = np.ones((32, 32), bool)
    dists = jump_distances(jnp.asarray(free),
                           goal_raster((32, 32), jnp.asarray((31, 1))))
    # no obstacles -> no jump points; the only finite straight ray from
    # the start row is the one that hits the goal
    d_east = np.asarray(dists[(1, 0)])
    assert d_east[1, 1] == 30  # straight shot start->goal
    assert d_east[1, 2] >= 1e9  # parallel ray never stops
    out = jps_plan(free, (1, 1), (31, 1))
    np.testing.assert_allclose(out["cost"], 30.0, atol=1e-9)


def test_jump_graph_is_sparse():
    free = _random_map(3, 64, 64, p=0.2)
    out = jps_plan(free, (1, 1), (62, 62))
    assert out["jump_edges"] < out["cell_edges"]
    assert out["edge_fraction"] < 0.5


@pytest.mark.slow
@pytest.mark.skipif(BASE is None, reason="reference benchdata absent")
def test_cost_parity_movingai_512():
    """The reference benchmarks JPS on its 512×512 MovingAI maps
    (jps.rs module docs): pin cost parity with the .scen octile optima."""
    from rust_robotics_tpu.data.moving_ai import load_map, load_scenarios

    m = load_map(f"{BASE}/dao/arena2.map")
    scens = load_scenarios(f"{BASE}/dao/arena2.map.scen")
    grid = m.to_grid()
    free = grid.free()
    chosen = [s for s in scens if s.bucket in (10, 25)][:6]
    assert chosen
    for s in chosen:
        sx, sy = m.planning_point(s.start_x, s.start_y)
        gx, gy = m.planning_point(s.goal_x, s.goal_y)
        start = np.asarray(grid.world_to_index(jnp.array([sx, sy])))
        goal = np.asarray(grid.world_to_index(jnp.array([gx, gy])))
        cost, _, stats = jps_costs(jnp.asarray(free), jnp.asarray(start),
                                   jnp.asarray(goal))
        np.testing.assert_allclose(float(cost), s.optimal_length,
                                   atol=1e-4)
        assert int(stats["jump_edges"]) < int(stats["cell_edges"]) // 3
