"""Nonlinear controllers, aerial trajectories, arm kinematics tests."""

import jax
import jax.numpy as jnp
import numpy as np

from rust_robotics_tpu.control.aerial import (
    eval_poly8,
    minimum_snap_coeffs,
    quintic_3d_segments,
    simulate_quadrotor,
)
from rust_robotics_tpu.control import arm as arm3d
from rust_robotics_tpu.control.arm import (
    arm_collides,
    end_effector,
    forward_kinematics,
    joint_space_plan,
    resolved_rate_ik,
    two_joint_ik,
)
from rust_robotics_tpu.control.nonlinear import (
    backstepping_control,
    feedback_linearization_control,
    sliding_mode_control,
)


def test_sliding_mode_converges():
    x, xd = 2.0, 0.0
    dt = 0.01
    for _ in range(2000):
        u, s = sliding_mode_control(jnp.asarray(x), jnp.asarray(xd))
        xdd = float(u)  # double integrator
        xd += xdd * dt
        x += xd * dt
    assert abs(x) < 0.05 and abs(xd) < 0.2


def test_feedback_linearization_tracks_circle():
    pose = jnp.array([1.2, 0.0, jnp.pi / 2])
    dt = 0.02
    errs = []
    for k in range(1500):
        t = k * dt
        target = jnp.array([jnp.cos(t), jnp.sin(t)])
        tvel = jnp.array([-jnp.sin(t), jnp.cos(t)])
        v, w = feedback_linearization_control(pose, target, tvel)
        pose = jnp.array(
            [
                pose[0] + v * jnp.cos(pose[2]) * dt,
                pose[1] + v * jnp.sin(pose[2]) * dt,
                pose[2] + w * dt,
            ]
        )
        if k > 700:
            errs.append(float(jnp.linalg.norm(pose[:2] - target)))
    assert np.mean(errs) < 0.25, np.mean(errs)


def test_backstepping_tracks_line():
    pose = jnp.array([0.0, 1.0, 0.0])
    dt = 0.02
    for k in range(1500):
        t = k * dt
        ref = jnp.array([t, 0.0, 0.0])
        v, w = backstepping_control(pose, ref, 1.0, 0.0)
        pose = jnp.array(
            [
                pose[0] + v * jnp.cos(pose[2]) * dt,
                pose[1] + v * jnp.sin(pose[2]) * dt,
                pose[2] + w * dt,
            ]
        )
    assert abs(float(pose[1])) < 0.05
    assert abs(float(pose[0]) - 1500 * dt) < 0.5


class TestAerial:
    def test_quadrotor_follows_quintic_course(self):
        wps = jnp.array(
            [[0.0, 0.0, 1.0], [2.0, 1.0, 2.0], [4.0, -1.0, 1.5], [6.0, 0.0, 1.0]]
        )
        coeffs = quintic_3d_segments(wps, 2.0)
        ps, refs = simulate_quadrotor(coeffs, 2.0)
        err = np.linalg.norm(np.asarray(ps - refs), axis=-1)
        assert err.max() < 0.3, err.max()
        np.testing.assert_allclose(np.asarray(ps[-1]), wps[-1], atol=0.2)

    def test_minimum_snap_interpolates(self):
        w = jnp.array([0.0, 1.0, -0.5, 2.0])
        ts = jnp.array([1.0, 1.0, 1.5])
        c = minimum_snap_coeffs(w, ts)
        for i in range(3):
            np.testing.assert_allclose(
                float(eval_poly8(c[i], jnp.asarray(0.0))), float(w[i]), atol=1e-7
            )
            np.testing.assert_allclose(
                float(eval_poly8(c[i], ts[i])), float(w[i + 1]), atol=1e-7
            )
        # continuity of velocity at interior knots
        v_end = eval_poly8(c[0], ts[0], order=1)
        v_start = eval_poly8(c[1], jnp.asarray(0.0), order=1)
        np.testing.assert_allclose(float(v_end), float(v_start), atol=1e-6)
        # rest-to-rest
        np.testing.assert_allclose(
            float(eval_poly8(c[0], jnp.asarray(0.0), order=1)), 0.0, atol=1e-8
        )


class TestArm:
    LENGTHS = jnp.array([1.0, 0.8, 0.5])

    def test_fk_straight(self):
        pts = forward_kinematics(jnp.zeros(3), self.LENGTHS)
        np.testing.assert_allclose(np.asarray(pts[-1]), [2.3, 0.0], atol=1e-12)

    def test_two_joint_ik_exact(self):
        target = jnp.array([1.1, 0.6])
        th = two_joint_ik(target, 1.0, 0.8)
        pts = forward_kinematics(th, jnp.array([1.0, 0.8]))
        np.testing.assert_allclose(np.asarray(pts[-1]), target, atol=1e-9)

    def test_resolved_rate_ik(self):
        target = jnp.array([1.2, 1.0])
        th = resolved_rate_ik(jnp.array([0.3, 0.3, 0.3]), target, self.LENGTHS)
        ee = end_effector(th, self.LENGTHS)
        np.testing.assert_allclose(np.asarray(ee), target, atol=1e-4)

    def test_collision_and_plan(self):
        obstacles = jnp.array([[1.0, 0.5]])
        radii = jnp.array([0.3])
        hit = arm_collides(jnp.array([0.5, 0.0, 0.0]), self.LENGTHS, obstacles, radii)
        assert bool(hit)
        clear = arm_collides(jnp.array([-1.2, 0.0, 0.0]), self.LENGTHS, obstacles, radii)
        assert not bool(clear)
        configs, free = joint_space_plan(
            jnp.array([-1.2, 0.0, 0.0]), jnp.array([1.2, 0.5, 0.2]),
            self.LENGTHS, obstacles, radii,
        )
        assert configs.shape == (100, 3)
        assert bool(free[0]) and not bool(free.all())


class TestArm3D:
    """n_joint_arm_3d.rs + rrt_star_seven_joint_arm.rs parity."""

    def test_fk_3d_straight(self):
        # zero angles: every link extends along +X
        pts = arm3d.forward_kinematics_3d(jnp.zeros(4), jnp.ones(4))
        np.testing.assert_allclose(np.asarray(pts[-1]), [4.0, 0.0, 0.0],
                                   atol=1e-12)

    def test_fk_3d_yaw_pitch_convention(self):
        # joint0 (yaw about Z) = pi/2 turns the whole chain to +Y;
        # joint1 (pitch about Y) = -pi/2 then lifts link2 to +Z
        # (n_joint_arm_3d.rs:65 joint convention).
        pts = arm3d.forward_kinematics_3d(
            jnp.array([jnp.pi / 2, -jnp.pi / 2]), jnp.ones(2))
        np.testing.assert_allclose(np.asarray(pts[1]), [0.0, 1.0, 0.0],
                                   atol=1e-7)
        np.testing.assert_allclose(np.asarray(pts[2]), [0.0, 1.0, 1.0],
                                   atol=1e-7)

    def test_jacobian_matches_fd(self):
        angles = jnp.array([0.3, -0.4, 0.7, 0.1, -0.2])
        lengths = jnp.array([1.0, 0.8, 0.6, 0.5, 0.4])
        j = arm3d.jacobian_3d(angles, lengths)
        eps = 1e-4
        for k in range(5):
            ap = angles.at[k].add(eps)
            am = angles.at[k].add(-eps)
            fd = (arm3d.end_effector_3d(ap, lengths)
                  - arm3d.end_effector_3d(am, lengths)) / (2 * eps)
            np.testing.assert_allclose(np.asarray(j[:, k]), np.asarray(fd),
                                       atol=1e-3)

    def test_ik_3d_converges(self):
        lengths = jnp.ones(7)
        target = jnp.array([2.0, 1.5, 1.0])
        th, err = arm3d.inverse_kinematics_3d(
            jnp.full(7, 0.1), target, lengths, iterations=300)
        assert float(err) < 1e-3
        np.testing.assert_allclose(
            np.asarray(arm3d.end_effector_3d(th, lengths)),
            np.asarray(target), atol=2e-3)

    def test_collision_3d(self):
        lengths = jnp.ones(3)
        centers = jnp.array([[1.5, 0.0, 0.0]])
        radii = jnp.array([0.4])
        assert bool(arm3d.arm_collides_3d(jnp.zeros(3), lengths, centers,
                                          radii))
        # arm folded up along +Y misses the sphere on +X
        up = jnp.array([jnp.pi / 2, 0.0, 0.0])
        assert not bool(arm3d.arm_collides_3d(up, lengths, centers, radii))

    def test_rrt_star_arm_plans_7dof(self):
        lengths = jnp.ones(7) * 0.5
        centers = jnp.array([[1.2, 0.6, 0.3], [0.8, -0.8, 0.5]])
        radii = jnp.array([0.25, 0.25])
        start = jnp.zeros(7)
        goal = jnp.full(7, 0.6)
        out = jax.jit(
            lambda k: arm3d.rrt_star_arm_plan(
                k, start, goal, lengths, centers, radii,
                max_nodes=192, step_size=0.5, rewire_radius=1.2,
                edge_checks=6, path_len=32)
        )(jax.random.PRNGKey(0))
        assert bool(out["found"])
        wps = np.asarray(out["waypoints"])
        mask = np.asarray(out["mask"])
        assert mask.any()
        first = np.argmax(mask)
        np.testing.assert_allclose(wps[first], np.zeros(7), atol=1e-6)
        np.testing.assert_allclose(wps[-1], np.asarray(goal), atol=1e-6)
        # every consecutive masked pair is collision-free and cost is the
        # masked joint-space length
        path = wps[mask]
        seg = np.linalg.norm(np.diff(path, axis=0), axis=1)
        assert abs(seg.sum() - float(out["cost"])) < 1e-3
        for q in path:
            assert not bool(arm3d.arm_collides_3d(
                jnp.asarray(q), lengths, centers, radii))

    def test_rrt_star_arm_blocked_reports_not_found(self):
        lengths = jnp.ones(2)
        # goal configuration itself collides
        centers = jnp.array([[2.0, 0.0, 0.0]])
        radii = jnp.array([0.3])
        out = arm3d.rrt_star_arm_plan(
            jax.random.PRNGKey(1), jnp.array([jnp.pi / 2, 0.0]),
            jnp.zeros(2), lengths, centers, radii,
            max_nodes=64, path_len=16)
        assert not bool(out["found"])
        assert not bool(out["mask"].any())
