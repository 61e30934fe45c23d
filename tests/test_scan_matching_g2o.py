"""Robust/geometric ICP, correlative matching, graph SLAM, g2o I/O tests."""

import jax
import jax.numpy as jnp
import numpy as np

from rust_robotics_tpu.slam.g2o import parse_g2o, se2_arrays, write_g2o
from rust_robotics_tpu.slam.scan_matching import (
    correlative_scan_match,
    graph_slam_from_landmarks,
    point_to_line_icp,
    robust_icp,
)


def make_scan(key, n=200):
    # wall-like structured scan (lines) so point-to-line is well posed
    t = jnp.linspace(0.0, 6.0, n // 2)
    wall1 = jnp.stack([t, jnp.zeros_like(t)], axis=-1)
    wall2 = jnp.stack([jnp.zeros_like(t), t], axis=-1)
    pts = jnp.concatenate([wall1, wall2])
    return pts + 0.01 * jax.random.normal(key, pts.shape, jnp.float64)


def transform(pts, pose):
    c, s = np.cos(pose[2]), np.sin(pose[2])
    r = np.array([[c, -s], [s, c]])
    return np.asarray(pts) @ r.T + pose[:2]


class TestRobustICP:
    def test_recovers_pose_with_outliers(self):
        prev = make_scan(jax.random.PRNGKey(0))
        true_pose = np.array([0.3, -0.2, 0.1])
        # current scan = inverse-transformed prev (so that applying pose maps
        # cur onto prev), plus gross outliers
        inv = np.array(
            [
                -np.cos(true_pose[2]) * true_pose[0] - np.sin(true_pose[2]) * true_pose[1],
                np.sin(true_pose[2]) * true_pose[0] - np.cos(true_pose[2]) * true_pose[1],
                -true_pose[2],
            ]
        )
        cur = jnp.asarray(transform(prev, inv))
        cur = cur.at[::25].add(5.0)  # outliers
        pose, err = robust_icp(prev, cur, huber_delta=0.3)
        np.testing.assert_allclose(np.asarray(pose), true_pose, atol=0.03)

    def test_point_to_line_precise(self):
        prev = make_scan(jax.random.PRNGKey(1))
        true_pose = np.array([0.15, 0.1, 0.05])
        inv = np.array(
            [
                -np.cos(true_pose[2]) * true_pose[0] - np.sin(true_pose[2]) * true_pose[1],
                np.sin(true_pose[2]) * true_pose[0] - np.cos(true_pose[2]) * true_pose[1],
                -true_pose[2],
            ]
        )
        cur = jnp.asarray(transform(prev, inv))
        pose, err = point_to_line_icp(prev, cur)
        np.testing.assert_allclose(np.asarray(pose), true_pose, atol=0.02)


def test_correlative_scan_match():
    from rust_robotics_tpu.mapping.gaussian_map import gaussian_grid_map

    key = jax.random.PRNGKey(2)
    pts = make_scan(key, 100)
    lik, min_x, min_y = gaussian_grid_map(
        pts[:, 0], pts[:, 1], 0.2, 0.3, extend=3.0
    )
    true_pose = np.array([0.4, -0.3, 0.12])
    inv_rot = np.array([[np.cos(true_pose[2]), np.sin(true_pose[2])],
                        [-np.sin(true_pose[2]), np.cos(true_pose[2])]])
    scan = (np.asarray(pts) - true_pose[:2]) @ inv_rot.T
    best, score, scores = correlative_scan_match(
        jnp.asarray(scan), lik, float(min_x), float(min_y), 0.2,
        search_xy=0.8, search_theta=0.3, n_xy=17, n_theta=13,
    )
    np.testing.assert_allclose(np.asarray(best), true_pose, atol=0.12)


def test_graph_slam_improves_poses():
    rng = np.random.default_rng(0)
    n = 15
    truth = np.stack(
        [np.linspace(0, 7, n), 0.5 * np.sin(np.linspace(0, 3, n)),
         0.2 * np.ones(n)], axis=-1
    )
    landmarks = np.array([[3.0, 4.0], [6.0, -2.0], [1.0, -3.0]])
    obs = np.zeros((n, 3, 2))
    mask = np.ones((n, 3), dtype=bool)
    for i in range(n):
        d = landmarks - truth[i, :2]
        obs[i, :, 0] = np.linalg.norm(d, axis=-1)
        obs[i, :, 1] = np.arctan2(d[:, 1], d[:, 0]) - truth[i, 2]
    noisy = truth.copy()
    noisy[1:, :2] += 0.2 * rng.standard_normal((n - 1, 2))
    poses, summary = graph_slam_from_landmarks(
        jnp.asarray(noisy), jnp.asarray(obs), jnp.asarray(mask)
    )
    err_before = np.abs(noisy[:, :2] - truth[:, :2]).mean()
    err_after = np.abs(np.asarray(poses)[:, :2] - truth[:, :2]).mean()
    assert err_after < err_before


def test_g2o_roundtrip():
    text = """VERTEX_SE2 0 0 0 0
VERTEX_SE2 1 1 0.5 0.2
EDGE_SE2 0 1 1 0.5 0.2 100 0 0 100 0 25
VERTEX_SE3:QUAT 0 0 0 0 0 0 0 1
VERTEX_SE3:QUAT 1 1 2 3 0 0 0 1
EDGE_SE3:QUAT 0 1 1 2 3 0 0 0 1 100 0 0 0 0 0 100 0 0 0 0 100 0 0 0 25 0 0 25 0 25
"""
    g = parse_g2o(text)
    assert len(g.vertices_se2) == 2
    assert len(g.edges_se2) == 1
    assert g.edges_se2[0][3][2, 2] == 25
    assert len(g.vertices_se3) == 2
    out = write_g2o(g)
    g2 = parse_g2o(out)
    np.testing.assert_allclose(g2.vertices_se2[1], g.vertices_se2[1])
    np.testing.assert_allclose(g2.edges_se3[0][4], g.edges_se3[0][4])
    poses, ef, et, meas, info = se2_arrays(g)
    assert poses.shape == (2, 3)


def test_g2o_optimize_integration():
    # build a small noisy chain, write/parse g2o, optimize
    from rust_robotics_tpu.demos.pose_graph_bench import rmse, synthesize_chain
    from rust_robotics_tpu.slam.g2o import G2oGraph
    from rust_robotics_tpu.slam.pose_graph import optimize_pose_graph_2d

    truth, initial, ef, et, meas, info = synthesize_chain(30)
    g = G2oGraph(
        {i: initial[i] for i in range(len(initial))},
        [(int(ef[k]), int(et[k]), meas[k], info[k]) for k in range(len(ef))],
        {}, [],
    )
    text = write_g2o(g)
    g2 = parse_g2o(text)
    poses, ef2, et2, meas2, info2 = se2_arrays(g2)
    solved, _ = optimize_pose_graph_2d(
        jnp.asarray(poses), ef2, et2, jnp.asarray(meas2), jnp.asarray(info2),
        max_iterations=25, tolerance=1e-8,
    )
    assert rmse(solved, truth) < 1e-4
