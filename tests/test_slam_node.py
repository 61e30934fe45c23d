"""SLAM-node pipeline tests (ros2_nodes/slam_node/src/main.rs parity):
quality-gated ICP blending, submap budget, stride subsampling, and the
headless closed loop (the ros2-smoke / SLAM ICP acceptance capability)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rust_robotics_tpu.slam.slam_node import (
    IcpGatingParams,
    REASONS,
    append_and_prune,
    blend_motion_delta,
    compute_icp_blend_decision,
    ramp_up_weight,
    ramp_weight,
    run_slam_node_loop,
    scan_to_points,
    subsample_stride,
)

R = {name: i for i, name in enumerate(REASONS)}
P = IcpGatingParams()


def _decide(odom, icp, converged=True, iters=4, err=0.005,
            p=P):
    return compute_icp_blend_decision(
        jnp.asarray(odom, jnp.float64), jnp.asarray(icp, jnp.float64),
        jnp.asarray(converged), jnp.asarray(iters), jnp.asarray(err), p)


class TestBlendDecision:
    """main.rs:1379-:1520 unit tests re-expressed."""

    def test_accepts_healthy_match(self):
        d = _decide([0.1, 0.0, 0.0], [0.11, 0.0, 0.01])
        assert float(d["alpha_xy"]) == pytest.approx(P.blend_alpha)
        assert REASONS[int(d["reason_xy"])] == "accepted"

    def test_rejects_high_error(self):
        # main.rs:1433 compute_icp_blend_decision_rejects_high_error
        d = _decide([0.1, 0.0, 0.0], [0.11, 0.0, 0.01], err=10.0)
        assert float(d["alpha_xy"]) == 0.0
        assert REASONS[int(d["reason_xy"])] == "high_error"

    def test_rejects_not_converged_and_invalid_error(self):
        d = _decide([0.1, 0.0, 0.0], [0.11, 0.0, 0.0], converged=False)
        assert float(d["alpha_xy"]) == 0.0 and float(d["alpha_yaw"]) == 0.0
        assert REASONS[int(d["reason_xy"])] == "not_converged"
        d = _decide([0.1, 0.0, 0.0], [0.11, 0.0, 0.0], err=float("nan"))
        assert REASONS[int(d["reason_xy"])] == "invalid_error"

    def test_attenuates_low_motion(self):
        # main.rs:1455 compute_icp_blend_decision_attenuates_low_motion:
        # sub-threshold translation motion down-weights the XY axis
        d = _decide([0.02, 0.0, 0.02], [0.03, 0.0, 0.03])
        assert 0.0 < float(d["alpha_xy"]) < P.blend_alpha
        assert REASONS[int(d["reason_xy"])] == "attenuated_low_motion"
        # yaw axis uses max(translation, yaw motion) — 0.02 yaw is also
        # attenuated but less so
        assert float(d["alpha_yaw"]) > 0.0

    def test_rejects_translation_outlier(self):
        d = _decide([0.1, 0.0, 0.0], [0.4, 0.0, 0.0])
        assert float(d["alpha_xy"]) == 0.0
        assert REASONS[int(d["reason_xy"])] == "translation_outlier"

    def test_rejects_zero_motion(self):
        d = _decide([0.0, 0.0, 0.0], [0.02, 0.0, 0.0])
        assert float(d["alpha_xy"]) == 0.0
        assert REASONS[int(d["reason_xy"])] == "low_motion"

    def test_slow_convergence(self):
        d = _decide([0.1, 0.0, 0.0], [0.11, 0.0, 0.0], iters=50)
        assert float(d["alpha_xy"]) == 0.0
        assert REASONS[int(d["reason_xy"])] == "slow_convergence"

    def test_ramp_weights(self):
        assert float(ramp_weight(jnp.asarray(0.005), 0.007, 0.011)) == 1.0
        assert float(ramp_weight(jnp.asarray(0.02), 0.007, 0.011)) == 0.0
        assert 0.0 < float(ramp_weight(jnp.asarray(0.009), 0.007,
                                       0.011)) < 1.0
        assert float(ramp_up_weight(jnp.asarray(0.01), 0.0125, 0.05)) == 0.0
        assert float(ramp_up_weight(jnp.asarray(0.06), 0.0125, 0.05)) == 1.0

    def test_blend_clamps_corrections(self):
        # main.rs:1411-:1430 blend test: big ICP delta gets clamped
        odom = jnp.array([0.1, 0.0, 0.0])
        icp = jnp.array([5.0, -5.0, 3.0])
        out = blend_motion_delta(odom, icp, 0.35, 0.35)
        assert float(out[0]) == pytest.approx(
            0.1 + 0.35 * P.max_translation_correction)
        assert float(out[1]) == pytest.approx(
            -0.35 * P.max_translation_correction)
        assert abs(float(out[2])) <= 0.35 * P.max_yaw_correction + 1e-12


class TestScanAndSubmap:
    def test_scan_to_points_masks_invalid(self):
        ranges = jnp.array([1.0, jnp.inf, 0.01, 5.0, jnp.nan, 2.0])
        pts, valid = scan_to_points(ranges, 0.0, 0.5, 0.05, 10.0)
        assert pts.shape == (6, 2)
        np.testing.assert_array_equal(
            np.asarray(valid), [True, False, False, True, False, True])
        np.testing.assert_allclose(np.asarray(pts[0]), [1.0, 0.0],
                                   atol=1e-12)

    def test_subsample_stride(self):
        valid = jnp.array([True] * 10)
        keep = subsample_stride(None, valid, 3)
        assert int(keep.sum()) == 4  # ranks 0,3,6,9
        # falls back to full set when too few survive (main.rs MIN_ICP_POINTS)
        few = jnp.array([True, True, True, False, False, False])
        keep = subsample_stride(None, few, 4)
        assert int(keep.sum()) == 3

    def test_append_and_prune_radius_and_budget(self):
        cap = 16
        pts = jnp.zeros((cap, 2))
        valid = jnp.zeros((cap,), bool)
        anchor = jnp.array([0.0, 0.0, 0.0])
        near = jnp.stack([jnp.linspace(0, 1, 8), jnp.zeros(8)], -1)
        far = near + jnp.array([100.0, 0.0])
        both = jnp.concatenate([near, far])
        pts, valid = append_and_prune(pts, valid, both,
                                      jnp.ones((16,), bool), anchor,
                                      max_radius=5.0, max_points=12)
        assert int(valid.sum()) == 8  # far half pruned by radius
        kept = np.asarray(pts)[np.asarray(valid)]
        assert np.all(np.linalg.norm(kept, axis=1) <= 5.0)
        # budget: append 8 more; newest survive, count capped at 12
        newer = jnp.stack([jnp.zeros(8), jnp.linspace(0, 1, 8)], -1)
        pts, valid = append_and_prune(pts, valid, newer,
                                      jnp.ones((8,), bool), anchor,
                                      max_radius=5.0, max_points=12)
        assert int(valid.sum()) == 12
        kept = np.asarray(pts)[np.asarray(valid)]
        # all 8 newest (y-axis) points survive; 4 oldest dropped
        assert (np.abs(kept[:, 0]) < 1e-9).sum() >= 8


@pytest.mark.slow
def test_slam_node_loop_beats_raw_odometry():
    """The ros2-smoke acceptance: gated ICP blending reduces pose error vs
    dead-reckoned odometry under systematic drift; diagnostics populated."""
    out = run_slam_node_loop(steps=50)
    d = out["diagnostics"]
    final_pose = float(d.pose_error[-1])
    final_odom = float(d.odom_error[-1])
    assert final_pose < final_odom * 0.8
    assert int(d.submap_points[-1]) <= 800
    assert bool(jnp.all(jnp.isfinite(d.icp_error)))
    reasons = {REASONS[int(r)] for r in np.asarray(d.reason_xy)}
    assert reasons <= {"accepted", "attenuated_error",
                       "attenuated_iterations", "attenuated_low_motion",
                       "attenuated_translation"}


@pytest.mark.slow
def test_slam_node_loop_rejects_with_strict_gate():
    """With an iteration gate below the solver's fixed iteration count,
    every match is rejected as slow_convergence — the node must fall back
    to pure odometry (the quality-gate fallback behavior, main.rs:592)."""
    out = run_slam_node_loop(
        steps=20, gating=IcpGatingParams(full_weight_iterations=5.0,
                                         reject_iterations=20.0))
    d = out["diagnostics"]
    assert all(REASONS[int(r)] == "slow_convergence"
               for r in np.asarray(d.reason_xy))
    np.testing.assert_allclose(np.asarray(d.pose_error),
                               np.asarray(d.odom_error), atol=1e-9)
