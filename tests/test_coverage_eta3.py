"""Coverage planners (wavefront CPP, Spiral-STC, spiral) + η³ splines."""

import jax.numpy as jnp
import numpy as np

from rust_robotics_tpu.planning.coverage import (
    WavefrontCppConfig,
    coverage_metrics,
    obstacle_distance_transform,
    spiral_coverage,
    spiral_stc_plan,
    wavefront_cpp,
)
from rust_robotics_tpu.planning.eta3 import (
    eta3_coefficients,
    eta3_derivatives,
    eta3_path_coefficients,
    eta3_path_sample,
    eta3_point,
    eta3_segment_length,
    eta3_trajectory_sample,
)


def test_wavefront_cpp_covers_open_grid():
    blocked = np.zeros((8, 8), bool)
    path, covered = wavefront_cpp(blocked, (0, 0), (7, 7))
    m = coverage_metrics(path, blocked)
    assert m["coverage_ratio"] == 1.0
    assert tuple(path[0]) == (0, 0) and tuple(path[-1]) == (7, 7)
    # consecutive cells are 8-adjacent
    d = np.abs(np.diff(path, axis=0)).max(axis=1)
    assert (d <= 1).all()


def test_wavefront_cpp_with_obstacles_covers_reachable():
    blocked = np.zeros((10, 10), bool)
    blocked[4:6, 2:8] = True
    path, covered = wavefront_cpp(blocked, (0, 0), (9, 9))
    m = coverage_metrics(path, blocked)
    assert m["coverage_ratio"] == 1.0
    assert not blocked[path[:, 0], path[:, 1]].any()


def test_wavefront_cpp_path_transform_differs():
    blocked = np.zeros((10, 10), bool)
    blocked[5, 3:7] = True
    p1, _ = wavefront_cpp(blocked, (0, 0), (9, 9),
                          WavefrontCppConfig(transform_type="distance"))
    p2, _ = wavefront_cpp(blocked, (0, 0), (9, 9),
                          WavefrontCppConfig(transform_type="path",
                                             alpha=0.5))
    assert coverage_metrics(p2, blocked)["coverage_ratio"] == 1.0
    od = np.asarray(obstacle_distance_transform(jnp.asarray(blocked)))
    assert od[5, 3] == 0.0 and od[0, 0] > 2


def test_spiral_stc_visits_all_mega_cells():
    free = np.ones((8, 8), bool)
    out = spiral_stc_plan(free, (0, 0))
    route = out["route"]
    mega = {tuple(r) for r in route}
    assert len(mega) == 16  # all 4x4 merged cells
    # spanning tree has V-1 edges
    assert len(out["edges"]) == 15
    segs = out["path_segments"]
    assert segs.shape[1:] == (2, 2)
    # all segment endpoints are in-bounds original-resolution cells
    assert segs.min() >= 0 and segs.max() <= 7


def test_spiral_stc_obstacle_blocks_mega_cell():
    free = np.ones((8, 8), bool)
    free[4, 4] = False  # kills merged cell (2, 2)
    out = spiral_stc_plan(free, (0, 0))
    mega = {tuple(r) for r in out["route"]}
    assert (2, 2) not in mega
    assert len(mega) == 15


def test_spiral_coverage_open_grid():
    blocked = np.zeros((6, 6), bool)
    path = spiral_coverage(blocked, (0, 0))
    m = coverage_metrics(path, blocked)
    assert m["coverage_ratio"] == 1.0
    assert m["revisits"] == 0


# ---------------------------------------------------------------------------
# eta3


def test_eta3_endpoint_interpolation_and_heading():
    start = jnp.array([0.0, 0.0, 0.0])
    end = jnp.array([4.0, 2.0, np.pi / 4])
    c = eta3_coefficients(start, end, eta=jnp.array([4.0, 4.0, 0, 0, 0, 0]))
    p0 = np.asarray(eta3_point(c, 0.0))
    p1 = np.asarray(eta3_point(c, 1.0))
    np.testing.assert_allclose(p0, [0.0, 0.0], atol=1e-9)
    np.testing.assert_allclose(p1, [4.0, 2.0], atol=1e-6)
    # tangent at endpoints matches the poses' headings
    v0, _ = eta3_derivatives(c, jnp.asarray(0.0))
    v1, _ = eta3_derivatives(c, jnp.asarray(1.0))
    np.testing.assert_allclose(np.arctan2(v0[1], v0[0]), 0.0, atol=1e-6)
    np.testing.assert_allclose(np.arctan2(v1[1], v1[0]), np.pi / 4,
                               atol=1e-6)


def test_eta3_straight_segment_length():
    start = jnp.array([0.0, 0.0, 0.0])
    end = jnp.array([5.0, 0.0, 0.0])
    c = eta3_coefficients(start, end, eta=jnp.array([5.0, 5.0, 0, 0, 0, 0]))
    L = float(eta3_segment_length(c))
    np.testing.assert_allclose(L, 5.0, rtol=1e-6)


def test_eta3_path_chain_continuous():
    poses = jnp.array([
        [0.0, 0.0, 0.0],
        [4.0, 0.0, 0.0],
        [7.0, 3.0, np.pi / 2],
    ])
    chain = eta3_path_coefficients(poses)
    pts = np.asarray(eta3_path_sample(chain, 200))
    # passes through all knots
    for p in np.asarray(poses):
        assert np.min(np.linalg.norm(pts - p[:2], axis=1)) < 0.08
    # C0 continuity: no jumps
    steps = np.linalg.norm(np.diff(pts, axis=0), axis=1)
    assert steps.max() < 0.3


def test_eta3_trajectory_trapezoid():
    poses = jnp.array([[0.0, 0.0, 0.0], [10.0, 0.0, 0.0]])
    chain = eta3_path_coefficients(poses)
    out = eta3_trajectory_sample(chain, max_vel=2.0, max_accel=1.0,
                                 num_points=100)
    st = np.asarray(out["states"])
    v = st[:, 3]
    assert abs(v.max() - 2.0) < 1e-6  # reaches cruise speed
    assert v[0] < 0.25 and v[-1] < 0.25  # ramps
    # arc length is monotone and ends at the total length
    s = st[:, 4]
    assert (np.diff(s) >= -1e-9).all()
    np.testing.assert_allclose(s[-1], float(out["total_length"]), rtol=1e-3)
    np.testing.assert_allclose(st[-1, 0], 10.0, atol=0.05)
