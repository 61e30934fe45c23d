"""Experiment suites: ukf_ckf_accuracy, path_tracking_accuracy,
drone_trajectory_quality — deterministic, harness-integrated."""

import numpy as np
import pytest

from rust_robotics_tpu.experiments import (
    run_drone_trajectory_quality,
    run_path_tracking_accuracy,
    run_ukf_ckf_accuracy,
)
from rust_robotics_tpu.experiments.ukf_ckf_accuracy import SCENARIO_FAMILIES


@pytest.mark.slow
def test_ukf_ckf_accuracy_suite_deterministic_and_structured():
    fams = {k: SCENARIO_FAMILIES[k] for k in ("nominal", "aggressive_yaw")}
    out1 = run_ukf_ckf_accuracy(seed=0, families=fams, steps=60,
                                n_scenarios=8, buckets=(4, 8))
    out2 = run_ukf_ckf_accuracy(seed=0, families=fams, steps=60,
                                n_scenarios=8, buckets=(4, 8))
    assert set(out1) == {"full_coverage", "strided_2", "strided_4",
                        "head_8", "escalating"}
    rows = out1["full_coverage"]
    assert len(rows) == 2 * 2  # families × buckets
    for a, b in zip(rows, out2["full_coverage"]):
        assert a.ukf_bucket_median_rmse == b.ukf_bucket_median_rmse
        assert a.winner() in ("UKF", "CKF")
        assert 0 < a.coverage_ratio() <= 1.0
        assert np.isfinite(a.ukf_over_ckf())
        assert a.ukf_min_rmse <= a.ukf_bucket_median_rmse <= a.ukf_max_rmse
    # strided variants select fewer slots
    full = {r.comparison_key(): r for r in out1["full_coverage"]}
    s4 = {r.comparison_key(): r for r in out1["strided_4"]}
    for k in s4:
        assert len(s4[k].selected_slots) <= len(full[k].selected_slots)
    # both filters actually track (RMSE bounded on the nominal family)
    nom = [r for r in rows if r.family_name == "nominal"]
    assert nom[0].ukf_bucket_median_rmse < 1.0
    assert nom[0].ckf_bucket_median_rmse < 1.0


@pytest.mark.slow
def test_path_tracking_suite():
    reports = run_path_tracking_accuracy(seeds=(0, 1), steps=300)
    names = {r.variant.name for r in reports}
    assert names == {"pure_pursuit", "stanley", "lqr_steer"}
    for r in reports:
        assert len(r.observations) == 2 * 3  # seeds × courses
        assert r.summary["mean_cross_track_rmse"] < 3.0
        assert 0.0 <= r.summary["goal_rate"] <= 1.0
        assert "mean_cross_track_rmse" in r.reference_deltas
    ref = next(r for r in reports if r.variant.name == "pure_pursuit")
    assert ref.reference_deltas["mean_cross_track_rmse"] == 0.0


@pytest.mark.slow
def test_drone_quality_suite_min_snap_smoother():
    reports = run_drone_trajectory_quality(seeds=(0, 1))
    by = {r.variant.name: r for r in reports}
    assert set(by) == {"quintic", "min_snap"}
    for r in reports:
        assert np.isfinite(r.summary["mean_tracking_rmse"])
        assert r.summary["mean_tracking_rmse"] < 5.0
    # minimum-snap reference trajectories have no larger jerk integral
    assert (by["min_snap"].summary["mean_jerk"]
            <= by["quintic"].summary["mean_jerk"] * 5.0)


class TestPointCloudSamplingQuality:
    """experiments/point_cloud_sampling_quality (mod.rs:503 suite runner,
    :1071-:1129 sampler scoring, variant files) parity."""

    SMALL = None

    @classmethod
    def _reports(cls):
        if cls.SMALL is None:
            from rust_robotics_tpu.experiments.point_cloud_sampling import (
                CloudCase, run_point_cloud_sampling_quality)
            problems = {
                "point_cloud_sampling": [
                    CloudCase("plane_baseline", (24,), base_point_count=96)],
                "density_shift": [
                    CloudCase("twin_density", (24,), kind="twin_cluster",
                              base_point_count=96,
                              corruption="density_shift",
                              corruption_axis=0, corruption_center=-7.0,
                              corruption_half_width=4.0,
                              dense_duplicate_probability=0.5,
                              sparse_keep_probability=0.55)],
            }
            cls.SMALL = run_point_cloud_sampling_quality(
                0, problems=problems, scenarios_per_bucket=4, max_iter=256)
        return cls.SMALL

    def test_variant_roster_and_reference_annotation(self):
        reports = self._reports()
        assert set(reports) == {"full-bucket", "first-scenario",
                                "sampled-bucket", "percentile-bucket",
                                "variance-triggered"}
        full = reports["full-bucket"]
        assert full["agreement_vs_reference"] == 1.0
        assert full["mean_ratio_error_vs_reference"] == 0.0
        assert full["average_coverage_ratio"] == 1.0
        assert reports["first-scenario"]["average_coverage_ratio"] == 0.25

    def test_observation_fields(self):
        reports = self._reports()
        for rep in reports.values():
            for o in rep["observations"]:
                assert o.total_scenarios == 4
                assert len(o.selected_slots) >= 1
                assert all(np.isfinite(o.median_scores))
                assert o.winner() in ("Voxel", "FarthestPoint",
                                      "PoissonDisk")
                assert o.runner_up_over_best() >= 1.0
                assert sum(o.wins) == len(o.selected_slots)
                # min <= median <= max per method
                for lo, md, hi in zip(o.min_scores, o.median_scores,
                                      o.max_scores):
                    assert lo <= md <= hi + 1e-12

    def test_deterministic_rerun(self):
        from rust_robotics_tpu.experiments.point_cloud_sampling import (
            CloudCase, slot_scores_for_cell)
        import jax
        case = CloudCase("ring_det", (16,), kind="ring", base_point_count=64)
        a = slot_scores_for_cell(jax.random.PRNGKey(3), case, 16, 3,
                                 max_iter=128)
        b = slot_scores_for_cell(jax.random.PRNGKey(3), case, 16, 3,
                                 max_iter=128)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_sampler_scores_prefer_good_subsets(self):
        """score_sample_quality must rank an even subset above a clumped
        one (mod.rs:1108 weighting)."""
        import jax.numpy as jnp
        from rust_robotics_tpu.experiments.point_cloud_sampling import (
            score_sample_quality)
        pts = jnp.stack(jnp.meshgrid(jnp.linspace(-5, 5, 8),
                                     jnp.linspace(-5, 5, 8)),
                        -1).reshape(-1, 2)
        pts = jnp.concatenate([pts, jnp.zeros((64, 1))], axis=1)
        valid = jnp.ones((64,), bool)
        even = jnp.arange(64) % 4 == 0   # spread, 16 points
        clump = jnp.arange(64) < 16      # one corner strip, 16 points
        s_even = float(score_sample_quality(pts, valid, even, 16))
        s_clump = float(score_sample_quality(pts, valid, clump, 16))
        assert s_even < s_clump


class TestPoissonDiskSampler:
    def test_min_distance_respected(self):
        import jax, jax.numpy as jnp
        from rust_robotics_tpu.mapping.cluster import poisson_disk_sample
        pts = jax.random.uniform(jax.random.PRNGKey(0), (80, 3)) * 10
        sel = poisson_disk_sample(jax.random.PRNGKey(1), pts, 20, 1.4, 400)
        s = np.asarray(pts[np.asarray(sel)])
        assert 2 <= len(s) <= 20
        d = np.linalg.norm(s[:, None] - s[None, :], axis=-1)
        d += np.eye(len(s)) * 1e9
        assert d.min() >= 1.4

    def test_valid_mask_excludes(self):
        import jax, jax.numpy as jnp
        from rust_robotics_tpu.mapping.cluster import poisson_disk_sample
        pts = jax.random.uniform(jax.random.PRNGKey(2), (60, 3)) * 10
        valid = jnp.arange(60) < 30
        sel = poisson_disk_sample(jax.random.PRNGKey(3), pts, 10, 0.5, 300,
                                  valid=valid)
        assert not bool(jnp.any(sel & ~valid))

    def test_fps_valid_mask(self):
        import jax, jax.numpy as jnp
        from rust_robotics_tpu.mapping.cluster import farthest_point_sample
        pts = jnp.concatenate([
            jax.random.uniform(jax.random.PRNGKey(4), (40, 3)),
            jnp.full((10, 3), 100.0),  # far-away invalid decoys
        ])
        valid = jnp.arange(50) < 40
        idx = farthest_point_sample(pts, 8, valid=valid)
        assert bool(jnp.all(idx < 40))
