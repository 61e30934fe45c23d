"""Dataset loaders + end-to-end VIO pipeline test on synthetic fixtures
(the reference's euroc_mini/kitti_mini pattern, headless_euroc_vio.rs)."""

import numpy as np
import pytest

from fixture_gen import make_euroc_fixture, make_kitti_fixture

from rust_robotics_tpu.data.euroc import EurocDataset
from rust_robotics_tpu.data.kitti import KittiSequence


@pytest.fixture(scope="module")
def euroc_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("euroc_mini")
    truth, landmarks, t_bs = make_euroc_fixture(str(root))
    return str(root), truth, landmarks


def test_euroc_loader(euroc_root):
    root, truth, landmarks = euroc_root
    ds = EurocDataset.load(root)
    assert ds.imu.timestamps.shape[0] == len(truth["ts_ns"])
    np.testing.assert_allclose(ds.imu.accel[0], truth["accel"][0])
    assert ds.cam is not None
    assert ds.cam.intrinsics is not None
    assert ds.ground_truth is not None
    accel, gyro, dts = ds.imu_between(
        int(truth["ts_ns"][0]), int(truth["ts_ns"][10])
    )
    assert accel.shape[0] == 10
    np.testing.assert_allclose(dts.sum(), (truth["ts_ns"][10] - truth["ts_ns"][0]) / 1e9)
    tracks = ds.load_feature_tracks()
    assert tracks is not None
    assert tracks.landmarks.shape == landmarks.shape
    np.testing.assert_allclose(tracks.landmarks, landmarks)


def test_kitti_loader(tmp_path):
    poses = make_kitti_fixture(str(tmp_path))
    seq = KittiSequence.load(str(tmp_path), "00")
    assert seq.poses.shape == (12, 4, 4)
    np.testing.assert_allclose(seq.poses[:, :3, :], poses, atol=1e-12)
    rel = seq.relative_pose(0, 1)
    np.testing.assert_allclose(rel[:3, 3], poses[1][:3, 3] - poses[0][:3, 3],
                               atol=1e-6)
    assert "P0" in seq.calib


def test_vio_pipeline_end_to_end(euroc_root):
    from rust_robotics_tpu.slam.vio import pose_error, run_vio_pipeline

    root, truth, landmarks = euroc_root
    ds = EurocDataset.load(root)
    tracks = ds.load_feature_tracks()
    res = run_vio_pipeline(ds, tracks, max_keyframes=10, point_init_noise=0.05)
    cam_idx = truth["cam_idx"][:10]
    gt_pos = truth["pos"][cam_idx]
    from rust_robotics_tpu.slam.vio import nav_to_se3

    dead_poses = np.asarray(nav_to_se3(res.dead_reckoned))
    err_dead = pose_error(dead_poses, gt_pos)
    err_fused = pose_error(np.asarray(res.fused_poses), gt_pos)
    # noise-free synthetic: both should be accurate; fusion must be at least
    # as good as dead reckoning and absolutely tight
    assert err_fused < 0.05, (err_fused, err_dead)
    assert res.summaries["ba"].final_cost < res.summaries["ba"].initial_cost or (
        res.summaries["ba"].initial_cost < 1e-6
    )
    # BA recovered the landmarks perturbed at init — judged on landmarks
    # with enough observations to be triangulable (weakly-observed ones
    # legitimately keep their init noise at zero reprojection cost)
    ds2 = EurocDataset.load(root)
    tr = ds2.load_feature_tracks()
    sel_ts = np.isin(tr.obs_timestamps, np.asarray(ds2.cam.timestamps[:10]))
    counts = np.bincount(tr.obs_landmark_ids[sel_ts], minlength=len(landmarks))
    well = counts >= 4
    assert well.sum() > 5
    lm_err = np.abs(np.asarray(res.ba_points)[well] - landmarks[well]).max()
    assert lm_err < 0.02, lm_err
