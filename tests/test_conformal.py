"""CP-SIPP: calibration scores, conformal quantiles, confidence fields,
confidence-filtered planning."""

import jax.numpy as jnp
import numpy as np

from rust_robotics_tpu.planning.conformal import (
    calibration_errors_from_trajectories,
    confidence_field,
    conformal_radius_at,
    conformal_sipp_plan,
    empirical_quantile,
)


def test_calibration_errors_shape_and_values():
    pred = jnp.zeros((3, 5, 2))
    obs = jnp.ones((3, 5, 2))
    errs = calibration_errors_from_trajectories(pred, obs)
    assert errs.shape == (5, 3)
    np.testing.assert_allclose(np.asarray(errs), np.sqrt(2.0), atol=1e-12)


def test_empirical_quantile_matches_reference_rank_rule():
    scores = jnp.array([1.0, 2.0, 3.0, 4.0])
    # rank = ceil(0.5 * 4) = 2 -> second smallest
    np.testing.assert_allclose(float(empirical_quantile(scores, 0.5)), 2.0)
    np.testing.assert_allclose(float(empirical_quantile(scores, 1.0)), 4.0)
    np.testing.assert_allclose(float(empirical_quantile(scores, 0.01)), 1.0)
    errs = jnp.broadcast_to(scores, (3, 4))
    r = conformal_radius_at(errs, 1, 0.75, obstacle_radius=0.5)
    np.testing.assert_allclose(float(r), 3.5)


def test_confidence_field_semantics():
    # one obstacle fixed at (5, 5); scores all 1.0
    pred = jnp.array([[[5.0, 5.0]] * 3])
    mask = jnp.ones((1, 3), bool)
    errs = jnp.ones((3, 4))
    conf = confidence_field(pred, mask, errs, obstacle_radius=1.0,
                            width=12, height=12)
    c = np.asarray(conf)
    assert c[0, 5, 5] == 0.0  # inside footprint
    # margin at (5, 8): dist 3 - 1 = 2 >= all scores (1.0) -> full coverage
    assert c[0, 5, 8] == 1.0
    # margin at (5, 7): 2 - 1 = 1 >= 1.0 -> covered
    assert c[0, 5, 7] == 1.0
    # margin at (5, 6): 1 - 1 = 0 < 1.0 -> no scores covered
    assert c[0, 5, 6] == 0.0
    # masked-out horizon -> confidence 1 everywhere
    conf2 = confidence_field(pred, jnp.zeros((1, 3), bool), errs, 1.0,
                             12, 12)
    assert np.all(np.asarray(conf2) == 1.0)


def test_conformal_sipp_plans_around_predicted_crossing():
    w = h = 12
    blocked = np.zeros((w, h), bool)
    t_len = 16
    # obstacle predicted to sweep down column 6 and exit the grid while we
    # cross row 5 (start offset so t=0 is outside the conformal band)
    ts = np.arange(t_len)
    pred = np.stack([np.full(t_len, 6.0), ts.astype(float)], axis=-1)
    pred = pred[None]  # [1, T, 2]
    errs = jnp.full((t_len, 8), 0.5)
    out = conformal_sipp_plan(
        jnp.asarray(blocked), jnp.asarray(pred), errs,
        (2, 0), (5, 11), required_confidence=0.9, obstacle_radius=0.6,
    )
    assert out is not None
    assert out["min_confidence"] >= 0.9
    assert 0.0 <= out["trajectory_violation_bound"] <= 1.0
    # the realized path keeps the conformal radius from the moving obstacle
    path = out["path"]
    for t in range(out["arrival"] + 1):
        d = np.hypot(path[t, 0] - pred[0, t, 0], path[t, 1] - pred[0, t, 1])
        assert d >= 0.6 + 0.5 - 1e-9  # footprint + all calibration scores


def test_conformal_sipp_infeasible_when_confidence_unreachable():
    w = h = 6
    blocked = np.zeros((w, h), bool)
    t_len = 8
    # obstacle parked on the goal forever with huge calibration errors
    pred = np.tile(np.array([3.0, 3.0]), (t_len, 1))[None]
    errs = jnp.full((t_len, 4), 50.0)
    out = conformal_sipp_plan(
        jnp.asarray(blocked), jnp.asarray(pred), errs, (0, 0), (3, 3),
        required_confidence=0.9, obstacle_radius=0.5,
    )
    assert out is None
