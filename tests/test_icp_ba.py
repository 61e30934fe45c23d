"""ICP + bundle adjustment tests (reference inline-test style: recover known
transforms; BA drives reprojection error to ~0 and Schur matches dense)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rust_robotics_tpu.core.lie import se3_exp, se3_log
from rust_robotics_tpu.slam.bundle_adjustment import (
    CameraIntrinsics,
    bundle_adjust,
)
from rust_robotics_tpu.slam.icp import icp_matching, svd_motion_estimation


def make_cloud(key, n=200, d=2, scale=5.0):
    return scale * jax.random.normal(key, (n, d), dtype=jnp.float64)


class TestICP:
    def test_svd_motion_estimation_exact(self):
        prev = make_cloud(jax.random.PRNGKey(0))
        th = 0.3
        r_true = jnp.array(
            [[jnp.cos(th), -jnp.sin(th)], [jnp.sin(th), jnp.cos(th)]]
        )
        t_true = jnp.array([1.0, -2.0])
        cur = prev @ r_true.T + t_true  # cur = R prev + t
        r, t = svd_motion_estimation(prev, cur)
        # recovered transform maps cur back onto prev
        np.testing.assert_allclose(r @ r_true, jnp.eye(2), atol=1e-10)
        np.testing.assert_allclose(r @ t_true + t, 0.0, atol=1e-9)

    def test_icp_recovers_small_transform_2d(self):
        prev = make_cloud(jax.random.PRNGKey(1), n=300)
        th = 0.08
        r_true = jnp.array(
            [[jnp.cos(th), -jnp.sin(th)], [jnp.sin(th), jnp.cos(th)]]
        )
        t_true = jnp.array([0.3, -0.2])
        cur = prev @ r_true.T + t_true
        res = icp_matching(prev, cur)
        assert bool(res.converged)
        aligned = cur @ np.asarray(res.transform)[:2, :2].T + np.asarray(
            res.transform
        )[:2, 2]
        np.testing.assert_allclose(aligned, prev, atol=1e-6)
        assert float(res.inlier_ratio_5cm) > 0.99
        assert float(res.final_error_mean) < 1e-6

    def test_icp_3d(self):
        prev = make_cloud(jax.random.PRNGKey(2), n=300, d=3)
        xi = jnp.array([0.2, -0.1, 0.15, 0.05, -0.04, 0.06])
        m = se3_exp(xi)
        cur = prev @ m[:3, :3].T + m[:3, 3]
        res = icp_matching(prev, cur)
        aligned = cur @ np.asarray(res.transform)[:3, :3].T + np.asarray(
            res.transform
        )[:3, 3]
        np.testing.assert_allclose(aligned, prev, atol=1e-5)

    def test_icp_batched_vmap(self):
        prev = make_cloud(jax.random.PRNGKey(3), n=100)
        ths = jnp.array([0.05, -0.07])
        curs = jnp.stack(
            [
                prev @ jnp.array(
                    [[jnp.cos(t), -jnp.sin(t)], [jnp.sin(t), jnp.cos(t)]]
                ).T
                + 0.1
                for t in ths
            ]
        )
        res = jax.vmap(lambda c: icp_matching(prev, c))(curs)
        assert res.transform.shape == (2, 3, 3)
        assert np.asarray(res.converged).all()


class TestBundleAdjustment:
    def setup_method(self):
        key = jax.random.PRNGKey(7)
        k1, k2 = jax.random.split(key)
        self.intr = CameraIntrinsics(400.0, 400.0, 320.0, 240.0)
        npts, ncams = 24, 4
        self.points = jnp.asarray(
            np.random.default_rng(0).uniform(-1, 1, (npts, 3)) + [0, 0, 5.0]
        )
        tangents = []
        for i in range(ncams):
            tangents.append([0.4 * i, 0.1 * i, 0.0, 0.0, 0.02 * i, 0.0])
        self.cams = se3_exp(jnp.asarray(tangents, dtype=jnp.float64))
        obs_c, obs_p, pix = [], [], []
        for c in range(ncams):
            inv = np.linalg.inv(np.asarray(self.cams[c]))
            for p in range(npts):
                pc = inv[:3, :3] @ np.asarray(self.points[p]) + inv[:3, 3]
                pix.append(
                    [400 * pc[0] / pc[2] + 320, 400 * pc[1] / pc[2] + 240]
                )
                obs_c.append(c)
                obs_p.append(p)
        self.obs_c = np.array(obs_c, dtype=np.int32)
        self.obs_p = np.array(obs_p, dtype=np.int32)
        self.pix = jnp.asarray(np.array(pix))

    def _perturbed(self):
        rng = np.random.default_rng(3)
        cams_t = np.array(se3_log(self.cams))
        cams_t[1:] += 0.01 * rng.normal(size=cams_t[1:].shape)
        pts = np.asarray(self.points) + 0.05 * rng.normal(
            size=self.points.shape
        )
        return jnp.asarray(se3_exp(jnp.asarray(cams_t))), jnp.asarray(pts)

    def _reproj_rmse(self, cams, pts):
        err = []
        for c, p, z in zip(self.obs_c, self.obs_p, np.asarray(self.pix)):
            inv = np.linalg.inv(np.asarray(cams[c]))
            pc = inv[:3, :3] @ np.asarray(pts[p]) + inv[:3, 3]
            uv = [400 * pc[0] / pc[2] + 320, 400 * pc[1] / pc[2] + 240]
            err.append(np.sum((np.array(uv) - z) ** 2))
        return np.sqrt(np.mean(err))

    @pytest.mark.parametrize("use_schur", [False, True])
    def test_ba_converges(self, use_schur):
        cams0, pts0 = self._perturbed()
        assert self._reproj_rmse(cams0, pts0) > 1.0
        cams, pts, summary = bundle_adjust(
            cams0, pts0, self.obs_c, self.obs_p, self.pix, self.intr,
            use_schur=use_schur,
        )
        rmse = self._reproj_rmse(np.asarray(cams), np.asarray(pts))
        assert rmse < 1e-6, rmse
        assert summary.final_cost < 1e-10

    def test_schur_matches_dense(self):
        cams0, pts0 = self._perturbed()
        cams_d, pts_d, _ = bundle_adjust(
            cams0, pts0, self.obs_c, self.obs_p, self.pix, self.intr,
            use_schur=False,
        )
        cams_s, pts_s, _ = bundle_adjust(
            cams0, pts0, self.obs_c, self.obs_p, self.pix, self.intr,
            use_schur=True,
        )
        np.testing.assert_allclose(cams_d, cams_s, atol=1e-7)
        np.testing.assert_allclose(pts_d, pts_s, atol=1e-7)
