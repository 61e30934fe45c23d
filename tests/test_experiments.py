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
