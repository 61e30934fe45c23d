"""Mapping subsystem tests (distance_map.rs inline-test style + behavior)."""

import jax
import jax.numpy as jnp
import numpy as np

from rust_robotics_tpu.core.types import GridSpec2D
from rust_robotics_tpu.mapping.cluster import (
    dbscan,
    estimate_normals,
    farthest_point_sample,
    fit_circle,
    fit_rectangle,
    kmeans,
    voxel_sample_mask,
)
from rust_robotics_tpu.mapping.distance import compute_sdf, compute_udf
from rust_robotics_tpu.mapping.gaussian_map import gaussian_grid_map
from rust_robotics_tpu.mapping.gp import gp_regression
from rust_robotics_tpu.mapping.ndt import ndt_grid, ndt_score
from rust_robotics_tpu.mapping.occupancy import (
    lidar_to_grid,
    occupancy_probability,
)


class TestDistance:
    def test_udf_known_values(self):
        obs = np.zeros((7, 7), dtype=bool)
        obs[3, 3] = True
        udf = np.asarray(compute_udf(jnp.asarray(obs)))
        assert udf[3, 3] == 0.0
        np.testing.assert_allclose(udf[3, 4], 1.0)
        np.testing.assert_allclose(udf[4, 4], np.sqrt(2.0))
        np.testing.assert_allclose(udf[0, 3], 3.0)
        np.testing.assert_allclose(udf[0, 0], np.sqrt(18.0))

    def test_sdf_signs(self):
        obs = np.zeros((9, 9), dtype=bool)
        obs[3:6, 3:6] = True
        sdf = np.asarray(compute_sdf(jnp.asarray(obs)))
        assert sdf[4, 4] < 0  # interior
        assert sdf[0, 0] > 0  # exterior
        np.testing.assert_allclose(sdf[4, 6], 1.0)  # one cell outside
        # scipy golden check
        try:
            from scipy import ndimage

            golden = ndimage.distance_transform_edt(~obs)
            np.testing.assert_allclose(
                np.asarray(compute_udf(jnp.asarray(obs))), golden, atol=1e-9
            )
        except ImportError:
            pass


class TestOccupancy:
    def test_lidar_to_grid_carves_and_marks(self):
        spec = GridSpec2D(min_x=-5.0, min_y=-5.0, resolution=0.5, width=20, height=20)
        origin = jnp.array([0.0, 0.0])
        angles = jnp.linspace(0, 2 * jnp.pi, 16, endpoint=False)
        ranges = jnp.full((16,), 3.0)
        grid = lidar_to_grid(origin, angles, ranges, spec, max_range=4.0)
        p = np.asarray(occupancy_probability(grid))
        # origin cell is free
        assert p[10, 10] < 0.4
        # endpoint along +x at (3, 0) -> cell (16, 10) occupied
        assert p[16, 10] > 0.6
        # cells beyond the hit stay at prior
        assert abs(p[19, 10] - 0.5) < 1e-6


class TestGaussianMap:
    def test_peak_at_obstacle(self):
        prob, min_x, min_y = gaussian_grid_map(
            jnp.array([0.0, 4.0]), jnp.array([0.0, 0.0]), 1.0, 1.0, extend=5.0
        )
        p = np.asarray(prob)
        # cell at the obstacle has the max probability
        ix = int(round((0.0 - float(min_x)) / 1.0))
        iy = int(round((0.0 - float(min_y)) / 1.0))
        assert p[ix, iy] == p.max()
        assert p.min() >= 0.0 and p.max() <= 0.5 + 1e-9


class TestNDT:
    def test_cell_statistics(self):
        key = jax.random.PRNGKey(0)
        pts = jnp.array([[0.2, 0.2], [0.3, 0.25], [0.25, 0.31], [0.21, 0.27],
                         [5.1, 5.2]])
        mean, cov, count, valid = ndt_grid(pts, (0.0, 0.0), 1.0, 8, 8)
        assert int(count[0, 0]) == 4
        assert bool(valid[0, 0])
        assert not bool(valid[5, 5])  # single point below min_points
        np.testing.assert_allclose(
            np.asarray(mean[0, 0]), np.mean(np.asarray(pts[:4]), axis=0),
            atol=1e-6,
        )
        score_good = ndt_score(pts[:4], mean, cov, valid, (0.0, 0.0), 1.0)
        score_bad = ndt_score(pts[:4] + 3.3, mean, cov, valid, (0.0, 0.0), 1.0)
        assert float(score_good) > float(score_bad)


class TestGP:
    def test_interpolates(self):
        x = jnp.linspace(0, 6, 20)[:, None]
        y = jnp.sin(x[:, 0])
        q = jnp.array([[1.5], [3.3]])
        mean, var = gp_regression(x, y, q, length_scale=1.0, noise_var=1e-4)
        np.testing.assert_allclose(np.asarray(mean), np.sin([1.5, 3.3]), atol=0.05)
        far = gp_regression(x, y, jnp.array([[30.0]]), noise_var=1e-4)[1]
        assert float(far[0]) > float(var.max())


class TestCluster:
    def test_kmeans_separates_blobs(self):
        key = jax.random.PRNGKey(0)
        a = jax.random.normal(key, (40, 2)) * 0.2
        b = jax.random.normal(key, (40, 2)) * 0.2 + 5.0
        pts = jnp.concatenate([a, b])
        centers, labels = kmeans(pts, jnp.array([[0.5, 0.5], [4.0, 4.0]]))
        la = np.asarray(labels)
        assert (la[:40] == la[0]).all()
        assert (la[40:] == la[40]).all()
        assert la[0] != la[40]

    def test_dbscan_clusters_and_noise(self):
        a = jnp.array([[0.0, 0.0], [0.1, 0.0], [0.0, 0.1], [0.1, 0.1]])
        b = a + 5.0
        noise = jnp.array([[10.0, -10.0]])
        pts = jnp.concatenate([a, b, noise])
        labels = np.asarray(dbscan(pts, eps=0.5, min_points=3))
        assert labels[8] == -1
        assert (labels[:4] == labels[0]).all() and labels[0] >= 0
        assert (labels[4:8] == labels[4]).all()
        assert labels[0] != labels[4]

    def test_fit_circle(self):
        th = jnp.linspace(0, 2 * jnp.pi, 50)
        pts = jnp.stack(
            [2.0 + 1.5 * jnp.cos(th), -1.0 + 1.5 * jnp.sin(th)], axis=-1
        )
        cx, cy, r = fit_circle(pts)
        np.testing.assert_allclose(
            [float(cx), float(cy), float(r)], [2.0, -1.0, 1.5], atol=1e-6
        )

    def test_fit_rectangle(self):
        th = 0.4
        rot = jnp.array(
            [[jnp.cos(th), -jnp.sin(th)], [jnp.sin(th), jnp.cos(th)]]
        )
        xs = jnp.linspace(0, 2, 20)
        ys = jnp.linspace(0, 1, 10)
        edge1 = jnp.stack([xs, jnp.zeros_like(xs)], axis=-1)
        edge2 = jnp.stack([jnp.zeros_like(ys), ys], axis=-1)
        pts = jnp.concatenate([edge1, edge2]) @ rot.T
        theta, corners = fit_rectangle(pts)
        assert abs(float(theta) - th) < 0.05 or abs(float(theta) - th + jnp.pi / 2) < 0.05
        # corners should cover the L extents
        assert corners.shape == (4, 2)

    def test_normals_of_plane(self):
        key = jax.random.PRNGKey(1)
        xy = jax.random.uniform(key, (50, 2)) * 4
        pts = jnp.concatenate([xy, jnp.zeros((50, 1))], axis=-1)
        normals = estimate_normals(pts, k=6)
        nz = np.abs(np.asarray(normals)[:, 2])
        assert (nz > 0.99).all()

    def test_sampling(self):
        key = jax.random.PRNGKey(2)
        pts = jax.random.uniform(key, (100, 2)) * 10
        mask = voxel_sample_mask(pts, 2.0)
        assert 10 <= int(mask.sum()) <= 60
        idx = farthest_point_sample(pts, 10)
        assert len(np.unique(np.asarray(idx))) == 10
