"""Reeds-Shepp, PRM, line extraction, IMLS, FastSLAM 2.0 tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rust_robotics_tpu.mapping.lines import (
    imls_distance,
    imls_project,
    segments_from_breaks,
    split_and_merge,
)
from rust_robotics_tpu.planning.reeds_shepp import (
    reeds_shepp_path,
    sample_reeds_shepp,
)
from rust_robotics_tpu.planning.roadmap import prm_plan


class TestReedsShepp:
    @pytest.mark.parametrize(
        "goal",
        [
            (3.0, 0.0, 0.0),
            (-0.5, 0.0, 0.0),       # pure reverse
            (0.0, 0.0, 3.1),        # turn in place-ish
            (-2.0, 1.0, 1.5),
            (1.0, -1.0, -2.0),
            (0.3, 0.3, 1.2),
        ],
    )
    def test_endpoint_reached(self, goal):
        start = jnp.array([0.0, 0.0, 0.0])
        segs, steers, total = reeds_shepp_path(start, jnp.asarray(goal))
        assert np.isfinite(float(total)), goal
        pts = sample_reeds_shepp(start, segs, steers, num_points=300)
        end = np.asarray(pts[-1])
        np.testing.assert_allclose(end[:2], goal[:2], atol=1e-5)
        aerr = abs(np.arctan2(np.sin(end[2] - goal[2]), np.cos(end[2] - goal[2])))
        assert aerr < 1e-5

    def test_reverse_shorter_than_forward_turnaround(self):
        # going 0.5 back should cost ~0.5, not a forward loop
        start = jnp.array([0.0, 0.0, 0.0])
        _, _, total = reeds_shepp_path(start, jnp.array([-0.5, 0.0, 0.0]))
        np.testing.assert_allclose(float(total), 0.5, atol=1e-9)


class TestPRM:
    def test_plans_around_obstacles(self):
        obstacles = jnp.array([[5.0, 5.0], [5.0, 3.0], [5.0, 7.0]])
        radii = jnp.array([1.2, 1.2, 1.2])
        pts, mask, cost = prm_plan(
            jax.random.PRNGKey(3), jnp.array([1.0, 5.0]), jnp.array([9.0, 5.0]),
            obstacles, radii, num_samples=200, connect_radius=2.5,
        )
        assert float(cost) < 1e17, "no path found"
        p = np.asarray(pts)[np.asarray(mask)]
        np.testing.assert_allclose(p[0], [1, 5], atol=1e-9)
        np.testing.assert_allclose(p[-1], [9, 5], atol=1e-9)
        # straight line is blocked: path must exceed direct distance
        assert float(cost) > 8.0 + 0.2
        for a, b in zip(p[:-1], p[1:]):
            for t in np.linspace(0, 1, 15):
                q = a + t * (b - a)
                assert (np.linalg.norm(np.asarray(obstacles) - q, axis=-1)
                        > np.asarray(radii) - 1e-6).all()


class TestLines:
    def test_split_and_merge_l_shape(self):
        n1 = jnp.linspace(0.0, 4.0, 20)
        seg1 = jnp.stack([n1, jnp.zeros_like(n1)], axis=-1)
        n2 = jnp.linspace(0.0, 3.0, 15)
        seg2 = jnp.stack([jnp.full_like(n2, 4.0), n2], axis=-1)
        pts = jnp.concatenate([seg1, seg2])
        breaks = split_and_merge(pts, split_threshold=0.05)
        segs = segments_from_breaks(pts, breaks)
        assert 2 <= len(segs) <= 3
        # corner point detected near (4, 0)
        b = np.asarray(pts)[np.asarray(breaks)]
        assert np.min(np.linalg.norm(b - [4.0, 0.0], axis=-1)) < 0.3

    def test_imls_plane(self):
        xs = jnp.linspace(-2, 2, 30)
        points = jnp.stack([xs, jnp.zeros_like(xs)], axis=-1)
        normals = jnp.broadcast_to(jnp.array([0.0, 1.0]), points.shape)
        d_above = imls_distance(jnp.array([[0.3, 0.7]]), points, normals)
        d_below = imls_distance(jnp.array([[0.3, -0.7]]), points, normals)
        np.testing.assert_allclose(float(d_above[0]), 0.7, atol=0.05)
        np.testing.assert_allclose(float(d_below[0]), -0.7, atol=0.05)
        proj = imls_project(jnp.array([0.3, 0.7]), points, normals)
        assert abs(float(proj[1])) < 0.02


def test_fastslam2_tracks():
    from rust_robotics_tpu.slam.fastslam import (
        estimate,
        fastslam2_step,
        init_fastslam,
    )

    LANDMARKS = np.array([[10.0, -2.0], [15.0, 10.0], [3.0, 15.0]])
    DT = 0.1
    rng = np.random.default_rng(0)
    particles = init_fastslam(num_particles=80, num_landmarks=3)
    chol = jnp.diag(jnp.array([0.3, 0.0305]) ** 0.5)
    r = jnp.diag(jnp.array([0.1, 0.05]))
    keys = jax.random.split(jax.random.PRNGKey(0), 200)

    @jax.jit
    def jit_step(p, u, obs, mask, key):
        return fastslam2_step(p, u, obs, mask, DT, chol, r, key)

    truth = np.zeros(3)
    u = np.array([1.0, 0.1])
    for k in range(200):
        truth[0] += u[0] * DT * np.cos(truth[2])
        truth[1] += u[0] * DT * np.sin(truth[2])
        truth[2] = (truth[2] + u[1] * DT + np.pi) % (2 * np.pi) - np.pi
        d = LANDMARKS - truth[:2]
        rngs = np.linalg.norm(d, axis=-1)
        brg = (np.arctan2(d[:, 1], d[:, 0]) - truth[2] + np.pi) % (2 * np.pi) - np.pi
        obs = np.stack(
            [rngs + 0.05 * rng.standard_normal(3),
             brg + 0.01 * rng.standard_normal(3),
             np.arange(3)], -1,
        )
        particles = jit_step(
            particles, jnp.asarray(u), jnp.asarray(obs), jnp.ones(3, bool),
            keys[k],
        )
    pose, best = estimate(particles)
    assert np.linalg.norm(np.asarray(pose[:2]) - truth[:2]) < 2.0
    lm = np.asarray(particles.lm_mean[int(best)])
    for i in range(3):
        assert np.linalg.norm(lm[i] - LANDMARKS[i]) < 1.5, (i, lm[i])


def test_visibility_roadmap_plans():
    from rust_robotics_tpu.planning.roadmap import (
        extract_roadmap_path,
        roadmap_shortest_path,
        visibility_roadmap,
    )

    obstacles = jnp.array([[5.0, 5.0]])
    radii = jnp.array([1.5])
    verts, w = visibility_roadmap(
        jnp.array([1.0, 5.0]), jnp.array([9.0, 5.0]), obstacles, radii
    )
    cost, dist = roadmap_shortest_path(w)
    assert float(cost) < 1e17
    assert float(cost) > 8.0  # detour around the circle
    pts, mask = extract_roadmap_path(verts, w, dist)
    p = np.asarray(pts)[np.asarray(mask)]
    np.testing.assert_allclose(p[-1], [9.0, 5.0], atol=1e-9)


def test_voronoi_roadmap_max_clearance():
    import jax

    from rust_robotics_tpu.planning.roadmap import (
        roadmap_shortest_path,
        voronoi_roadmap,
    )

    blocked = np.zeros((40, 40), dtype=bool)
    blocked[:, :3] = True
    blocked[:, 37:] = True  # corridor walls along y
    verts, w = voronoi_roadmap(
        jnp.array([2.0, 20.0]), jnp.array([38.0, 20.0]), jnp.asarray(blocked),
        0.0, 0.0, 1.0,
    )
    cost, dist = roadmap_shortest_path(w)
    assert float(cost) < 1e17
    np.testing.assert_allclose(float(cost), 36.0, atol=1.0)
    # connected ridge vertices hug the corridor centerline (y ≈ 20)
    connected = (np.asarray(w) < 1e17).sum(axis=1) > 1
    v = np.asarray(verts)[2:][connected[2:]]
    assert len(v) > 10
    mid = np.abs(v[:, 1] - 20.0)
    assert np.median(mid) < 2.0
