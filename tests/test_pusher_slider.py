"""Pusher-slider quasi-static pushing: limit-surface physics, contact
modes, two-contact couple, MPPI closed loop."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rust_robotics_tpu.control.pusher_slider import (
    MODE_STICK,
    MODE_SEPARATED,
    PusherMppiConfig,
    PusherSliderParams,
    contact_frame,
    pusher_step,
    pusher_twist,
    simulate_push,
    two_contact_twist,
)

P = PusherSliderParams(half_extent=0.5, char_len=0.35, pusher_friction=0.3)


def test_center_push_translates_straight():
    # push through the center of face 0 (left face, inward normal +x)
    twist, mode = pusher_twist(P, 0, 0.0, 0.4, 0.0)
    assert int(mode) == MODE_STICK
    np.testing.assert_allclose(float(twist[0]), 0.4, atol=1e-9)
    np.testing.assert_allclose(float(twist[1]), 0.0, atol=1e-9)
    np.testing.assert_allclose(float(twist[2]), 0.0, atol=1e-9)


def test_offset_push_rotates():
    twist, mode = pusher_twist(P, 0, 0.3, 0.4, 0.0)
    assert float(twist[2]) != 0.0
    # pushing at +y offset on the left face turns the slider negative-ω?
    # p × f with p = (-b, +0.3), f ≈ (+, small): ω = (px·fy − py·fx)/c² < 0
    assert float(twist[2]) < 0.0


def test_no_push_is_separated():
    twist, mode = pusher_twist(P, 0, 0.0, 0.0, 0.5)
    assert int(mode) == MODE_SEPARATED
    np.testing.assert_allclose(np.asarray(twist), 0.0)


def test_large_tangent_slides_and_normal_speed_preserved():
    # heavy tangential command exceeds the friction cone -> slide
    twist, mode = pusher_twist(P, 0, 0.0, 0.3, 1.5)
    assert int(mode) in (2, 3)
    # the contact-point normal velocity still matches the push speed
    p, d, t = contact_frame(0, 0.0, P.half_extent)
    v = twist[:2]
    om = twist[2]
    cv = jnp.array([v[0] - om * p[1], v[1] + om * p[0]])
    np.testing.assert_allclose(float(cv @ d), 0.3, atol=1e-9)


def test_all_faces_symmetric():
    # center pushes on each face translate along that face's inward normal
    for face in range(4):
        twist, mode = pusher_twist(P, face, 0.0, 0.5, 0.0)
        _, d, _ = contact_frame(face, 0.0, P.half_extent)
        np.testing.assert_allclose(np.asarray(twist[:2]),
                                   0.5 * np.asarray(d), atol=1e-9)


def test_step_integrates_in_world_frame():
    pose = jnp.array([0.0, 0.0, np.pi / 2])  # slider rotated 90°
    new, mode = pusher_step(P, pose, 0, 0.0, 0.4, 0.0, dt=1.0)
    # body +x maps to world +y
    np.testing.assert_allclose(float(new[0]), 0.0, atol=1e-9)
    np.testing.assert_allclose(float(new[1]), 0.4, atol=1e-9)


def test_two_contact_couple_spins_in_place():
    # opposing contacts on faces 0 and 2 with opposite tangential speeds:
    # a couple -> pure rotation (the single-contact model cannot do this)
    twist, modes, valid = two_contact_twist(
        P, faces=(0, 2), contacts=(0.0, 0.0),
        push_speeds=(0.05, 0.05), tangent_speeds=(0.5, 0.5),
    )
    assert bool(valid)
    assert abs(float(twist[2])) > 0.1  # spins
    # translation stays at the order of the small normal feed (0.05),
    # far below the tangential drive (0.5) that produces the couple
    assert abs(float(twist[0])) <= 0.1 and abs(float(twist[1])) <= 0.1


def test_two_contact_symmetric_squeeze_translates_nothing():
    twist, modes, valid = two_contact_twist(
        P, faces=(0, 2), contacts=(0.0, 0.0),
        push_speeds=(0.0, 0.0), tangent_speeds=(0.0, 0.0),
    )
    np.testing.assert_allclose(np.asarray(twist), 0.0, atol=1e-9)


@pytest.mark.slow
def test_mppi_push_reaches_translation_goal():
    rep = simulate_push(
        jax.random.PRNGKey(0), P,
        start=jnp.array([0.0, 0.0, 0.0]),
        goal=jnp.array([1.2, 0.6, 0.0]),
        steps=60,
        cfg=PusherMppiConfig(horizon=15, num_samples=96),
        goal_tol=0.12,
    )
    assert rep["final_position_error"] < 0.25
    assert len(rep["faces"]) > 0
    # face switching is available; the trajectory is finite
    assert np.all(np.isfinite(rep["trajectory"]))
