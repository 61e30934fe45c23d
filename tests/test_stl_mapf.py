"""STL robustness metrics, STL-CBS, kinodynamic CBS, hierarchical MAPF,
STL-shielded decoding."""

import jax.numpy as jnp
import numpy as np

from rust_robotics_tpu.planning.stl import (
    StlRectangle,
    always_avoid_robustness,
    eventually_reach_robustness,
    first_conflict,
    hierarchical_mapf_plan,
    kinodynamic_stl_cbs_plan,
    pairwise_separation_robustness,
    safe_decode_nav,
    stl_cbs_plan,
)


def test_robustness_primitives_match_reference_semantics():
    rect = StlRectangle(2.0, 6.0, 2.0, 6.0)
    # path sits at (4, 4) for t in [0, 3] then leaves to (10, 10)
    path = jnp.array([[4, 4], [4, 4], [4, 4], [4, 4], [10, 10]])
    # inside robustness at center (4,4): min(2,2,2,2)=2
    np.testing.assert_allclose(
        float(eventually_reach_robustness(path, rect.as_array(), (0, 3))), 2.0
    )
    # always-avoid violated while inside: min of -inside = -2
    np.testing.assert_allclose(
        float(always_avoid_robustness(path, rect.as_array(), (0, 3))), -2.0
    )
    # after leaving, avoid holds with margin 4 (x=10 vs max_x=6)
    np.testing.assert_allclose(
        float(always_avoid_robustness(path, rect.as_array(), (4, 4))), 4.0
    )
    paths = jnp.array([[[0, 0], [1, 0]], [[3, 0], [3, 0]]])
    rho = pairwise_separation_robustness(paths, 1.0, (0, 1))
    np.testing.assert_allclose(float(rho), 1.0)  # min dist 2 - 1


def test_first_conflict_vertex_and_edge():
    a = np.array([[0, 0], [1, 0], [2, 0]])
    b = np.array([[2, 0], [1, 0], [0, 0]])
    t, i, j, kind = first_conflict(np.stack([a, b]))
    assert (t, i, j, kind) == (1, 0, 1, 0)
    a = np.array([[0, 0], [1, 0]])
    b = np.array([[1, 0], [0, 0]])
    t, i, j, kind = first_conflict(np.stack([a, b]))
    assert kind == 1 and t == 1


def test_stl_cbs_resolves_head_on_conflict():
    free = np.ones((9, 3), bool)
    free[:, 0] = free[:, 2] = True  # full corridor world, 3 rows
    starts = [(0, 1), (8, 1)]
    goals = [(8, 1), (0, 1)]
    out = stl_cbs_plan(jnp.asarray(free), starts, goals, t_max=20)
    assert first_conflict(out["paths"]) is None
    assert all(out["arrivals"] >= 0)
    assert out["conflicts_resolved"] >= 1
    assert out["min_pairwise_separation_robustness"] >= -1.0 + 1e-9
    # both reach their goals
    assert tuple(out["paths"][0, -1]) == goals[0]
    assert tuple(out["paths"][1, -1]) == goals[1]


def test_stl_cbs_hard_avoid_region_is_respected():
    free = np.ones((12, 12), bool)
    rect = StlRectangle(4.0, 7.0, 4.0, 7.0)
    out = stl_cbs_plan(
        jnp.asarray(free), [(0, 5)], [(11, 5)], t_max=30,
        avoid_regions=((rect, (0, 29)),),
    )
    assert out["arrivals"][0] >= 0
    rho = always_avoid_robustness(out["paths"][0], rect.as_array(), (0, 29))
    assert float(rho) >= 0.0  # never enters the geofence
    assert out["avoid_robustness"][0] >= 0.0


def test_kinodynamic_speed_reaches_faster():
    free = np.ones((16, 3), bool)
    slow = stl_cbs_plan(jnp.asarray(free), [(0, 1)], [(15, 1)], t_max=24,
                        speed=1)
    fast = kinodynamic_stl_cbs_plan(jnp.asarray(free), [(0, 1)], [(15, 1)],
                                    t_max=24, speed=3)
    assert int(fast["arrivals"][0]) < int(slow["arrivals"][0])
    # speed bound respected: per-step Chebyshev displacement <= 3
    steps = np.abs(np.diff(fast["paths"][0], axis=0)).max()
    assert steps <= 3


def test_hierarchical_mapf_replans_only_conflicting_group():
    free = np.ones((10, 10), bool)
    # agents 0/1 cross in region (0,0); agent 2 is far away
    starts = [(0, 0), (3, 0), (9, 9)]
    goals = [(3, 0), (0, 0), (9, 0)]
    out = hierarchical_mapf_plan(jnp.asarray(free), starts, goals, t_max=16,
                                 region_size=5)
    assert out["region_conflicts"] >= 1
    assert out["groups_replanned"] >= 1
    assert first_conflict(out["paths"][:2]) is None
    assert tuple(out["paths"][2, -1]) == goals[2]


def test_safe_decode_shield_overrides_greedy():
    free = np.ones((12, 12), bool)
    hazard = StlRectangle(3.0, 8.0, 3.0, 8.0)
    out = safe_decode_nav(
        free, (0, 0), (11, 11), t_max=30,
        avoid_regions=((hazard, (0, 29)),),
    )
    # greedy cuts the diagonal straight through the hazard
    assert out["greedy_avoid_robustness"] < 0
    # shielded path never enters it, so robustness gain is positive
    assert out["shielded_avoid_robustness"] >= 0
    assert out["robustness_gain"] > 0
    assert out["overrides"] >= 1
    assert tuple(out["shielded_path"][-1]) == (11, 11)
