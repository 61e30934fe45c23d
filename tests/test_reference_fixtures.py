"""Output parity against the reference's own checked-in dataset fixtures.

The round-1 suites ran the EuRoC/KITTI pipelines only on self-generated
synthetic layouts (fixture_gen.py). These tests consume the reference's
actual artifacts —
crates/rust_robotics_slam/tests/fixtures/{euroc_mini,kitti_mini} — and
replay the exact acceptance experiment of
crates/rust_robotics/examples/headless_euroc_vio.rs:22-58: perturb the
sidecar landmarks by (+0.02, -0.01, +0.04), run the full VIO pipeline, and
require the terminal SE(3) pose error against ground truth to be below the
reference's 5e-2 gate (plus much tighter pinned goldens of our own).

Skipped (not failed) when the read-only reference checkout is absent.
"""

import dataclasses

import numpy as np
import pytest

from rust_robotics_tpu.data.euroc import EurocDataset, quat_to_rot
from rust_robotics_tpu.data.fixtures import reference_fixture_root
from rust_robotics_tpu.data.kitti import KittiSequence

EUROC = reference_fixture_root("euroc_mini")
KITTI = reference_fixture_root("kitti_mini")

needs_euroc = pytest.mark.skipif(EUROC is None, reason="reference euroc_mini absent")
needs_kitti = pytest.mark.skipif(KITTI is None, reason="reference kitti_mini absent")


@needs_euroc
def test_euroc_mini_loader_matches_reference_layout():
    """dataset.rs:107-191 layout contract on the reference's own files."""
    ds = EurocDataset.load(EUROC)
    assert ds.imu.timestamps.shape == (5,)
    assert ds.imu.timestamps[0] == 1_000_000_000
    # stationary-frame IMU: zero gyro, +9.81 z accel (gravity reaction)
    np.testing.assert_allclose(ds.imu.gyro, 0.0)
    np.testing.assert_allclose(ds.imu.accel[:, 2], 9.81)

    assert ds.cam is not None
    assert ds.cam.timestamps.shape == (3,)
    np.testing.assert_allclose(
        ds.cam.intrinsics, [458.654, 457.296, 367.215, 248.375]
    )
    np.testing.assert_allclose(ds.cam.t_bs, np.eye(4))
    assert ds.cam.resolution == (752, 480)

    gt = ds.ground_truth
    assert gt is not None and gt.timestamps.shape == (3,)
    np.testing.assert_allclose(gt.positions[:, 0], [0.0, 0.01, 0.02])
    np.testing.assert_allclose(gt.velocities, [[1, 0, 0]] * 3)
    np.testing.assert_allclose(gt.quaternions, [[1, 0, 0, 0]] * 3)

    # imu_between interval contract (dataset.rs:146): (t0, t1] samples
    accel, gyro, dts = ds.imu_between(1_000_000_000, 1_010_000_000)
    assert accel.shape == (2, 3)
    np.testing.assert_allclose(dts, [0.005, 0.005])

    tracks = ds.load_feature_tracks()
    assert tracks is not None
    assert tracks.landmarks.shape == (4, 3)
    assert tracks.obs_pixels.shape == (12, 2)
    np.testing.assert_allclose(tracks.landmarks[0], [-0.40, -0.20, 4.00])


@needs_euroc
def test_euroc_mini_vio_replay_meets_reference_acceptance():
    """The headless_euroc_vio.rs experiment on the reference fixture:
    landmarks perturbed by (+0.02,-0.01,+0.04) (headless_euroc_vio.rs:34-36),
    terminal SE(3) error vs (world_from_body · body_from_sensor) at the last
    ground-truth state must beat the 5e-2 gate (:56)."""
    from rust_robotics_tpu.slam.vio import (
        nav_to_se3,
        pose_error_se3,
        run_vio_pipeline,
    )

    ds = EurocDataset.load(EUROC)
    tracks = ds.load_feature_tracks()
    assert len(ds.ground_truth.timestamps) == len(ds.cam.timestamps)

    perturbed = dataclasses.replace(
        tracks, landmarks=tracks.landmarks + np.array([0.02, -0.01, 0.04])
    )
    res = run_vio_pipeline(ds, perturbed)

    fused = np.asarray(res.fused_poses)
    assert fused.shape == (3, 4, 4)

    # expected terminal camera pose = world_from_body @ body_from_sensor
    gt = ds.ground_truth
    wfb = np.eye(4)
    wfb[:3, :3] = quat_to_rot(gt.quaternions[-1])
    wfb[:3, 3] = gt.positions[-1]
    expected_cam = wfb @ np.asarray(ds.cam.t_bs)

    actual_cam = fused[-1] @ np.asarray(ds.cam.t_bs)
    terminal = float(pose_error_se3(actual_cam, expected_cam))
    assert terminal <= 5.0e-2, terminal

    # pinned goldens (ours, tighter than the gate): with exact gt init and
    # noiseless constant-velocity IMU, dead reckoning and fusion both track
    # the 1 m/s x-translation
    gt_pos = gt.positions
    np.testing.assert_allclose(fused[:, :3, 3], gt_pos, atol=2e-3)
    dead = np.asarray(nav_to_se3(res.dead_reckoned))
    np.testing.assert_allclose(dead[:, :3, 3], gt_pos, atol=1e-6)
    # BA pulls the perturbed landmarks back toward the sidecar truth
    ba_points = np.asarray(res.ba_points)
    pulled = np.abs(ba_points - tracks.landmarks).max()
    assert pulled < 0.04, pulled


@needs_kitti
def test_kitti_mini_loader_matches_reference_layout():
    """dataset.rs:231-256 KITTI layout on the reference's own files."""
    seq = KittiSequence.load(KITTI, "00")
    assert seq.poses.shape == (3, 4, 4)
    # 1 m/frame pure x-translation
    np.testing.assert_allclose(seq.poses[:, 0, 3], [0.0, 1.0, 2.0])
    np.testing.assert_allclose(seq.poses[:, :3, :3], [np.eye(3)] * 3)
    rel = seq.relative_pose(0, 2)
    np.testing.assert_allclose(rel[:3, 3], [2.0, 0.0, 0.0], atol=1e-12)
    np.testing.assert_allclose(seq.calib["P0"][0], [700, 0, 600, 0])
    np.testing.assert_allclose(seq.calib["P1"][0, 3], -350.0)
    np.testing.assert_allclose(seq.calib["Tr"], np.eye(4)[:3])
    assert seq.times.shape == (3,)
