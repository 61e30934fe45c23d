"""Curve primitive tests: interpolation exactness, derivative consistency,
Dubins endpoint correctness (the reference's inline-test contracts)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rust_robotics_tpu.core.angles import normalize_angle
from rust_robotics_tpu.planning.curves import (
    CubicSpline1D,
    QuinticPolynomial,
    Spline2D,
    bezier_path,
    bspline_course,
    calc_spline_course,
    catmull_rom_course,
    dubins_shortest_path,
)


class TestCubicSpline:
    def test_interpolates_knots(self):
        t = jnp.array([0.0, 1.0, 2.5, 4.0, 6.0])
        y = jnp.array([1.0, 2.0, 0.0, -1.0, 3.0])
        sp = CubicSpline1D.fit(t, y)
        np.testing.assert_allclose(sp.calc(t), y, atol=1e-10)

    def test_matches_scipy(self):
        from scipy.interpolate import CubicSpline as SciSpline

        t = np.array([0.0, 1.0, 2.0, 3.5, 5.0])
        y = np.array([0.0, 2.0, 1.0, -1.0, 0.5])
        sp = CubicSpline1D.fit(jnp.asarray(t), jnp.asarray(y))
        sci = SciSpline(t, y, bc_type="natural")
        q = np.linspace(0, 5, 50)
        np.testing.assert_allclose(sp.calc(jnp.asarray(q)), sci(q), atol=1e-9)

    def test_course_properties(self):
        x = jnp.array([0.0, 2.0, 4.0, 6.0, 8.0])
        y = jnp.array([0.0, 1.5, 0.0, -1.5, 0.0])
        px, py, yaw, k, s = calc_spline_course(x, y, ds=0.1)
        np.testing.assert_allclose(px[0], 0.0, atol=1e-12)
        np.testing.assert_allclose(py[0], 0.0, atol=1e-9)
        # course passes near all waypoints
        for wx, wy in zip(np.asarray(x), np.asarray(y)):
            d = np.min(np.hypot(np.asarray(px) - wx, np.asarray(py) - wy))
            assert d < 0.06
        assert np.all(np.isfinite(np.asarray(k)))


class TestQuintic:
    def test_boundary_conditions(self):
        qp = QuinticPolynomial.boundary(0.0, 1.0, 0.2, 5.0, -0.5, 0.1, 4.0)
        np.testing.assert_allclose(float(qp.calc_point(0.0)), 0.0, atol=1e-12)
        np.testing.assert_allclose(float(qp.calc_first_derivative(0.0)), 1.0, atol=1e-12)
        np.testing.assert_allclose(float(qp.calc_second_derivative(0.0)), 0.2, atol=1e-12)
        np.testing.assert_allclose(float(qp.calc_point(4.0)), 5.0, atol=1e-9)
        np.testing.assert_allclose(float(qp.calc_first_derivative(4.0)), -0.5, atol=1e-9)
        np.testing.assert_allclose(float(qp.calc_second_derivative(4.0)), 0.1, atol=1e-9)


class TestBezier:
    def test_endpoints_and_tangents(self):
        start = (0.0, 0.0, 0.0)
        goal = (6.0, 3.0, jnp.pi / 4)
        path, cp = bezier_path(start, goal)
        p = np.asarray(path)
        np.testing.assert_allclose(p[0], [0, 0], atol=1e-6)
        np.testing.assert_allclose(p[-1], [6, 3], atol=1e-6)
        tangent0 = p[1] - p[0]
        assert abs(np.arctan2(tangent0[1], tangent0[0])) < 0.05


class TestCatmullRomBspline:
    def test_catmull_rom_passes_through_interior(self):
        pts = jnp.array(
            [[0.0, 0.0], [1.0, 2.0], [3.0, 3.0], [5.0, 0.0], [7.0, 1.0]]
        )
        course = np.asarray(catmull_rom_course(pts, 25))
        for wp in np.asarray(pts[1:-1]):
            assert np.min(np.linalg.norm(course - wp, axis=-1)) < 1e-6

    def test_bspline_stays_near_polygon(self):
        pts = jnp.array(
            [[0.0, 0.0], [1.0, 2.0], [3.0, 3.0], [5.0, 0.0], [7.0, 1.0],
             [9.0, 2.0]]
        )
        course = np.asarray(bspline_course(pts, 20))
        assert course.shape[0] == 60
        # approximation property: every sample close to the control polygon hull
        for c in course[::7]:
            assert np.min(np.linalg.norm(np.asarray(pts) - c, axis=-1)) < 2.5


class TestDubins:
    @pytest.mark.parametrize(
        "goal",
        [
            (4.0, 0.0, 0.0),
            (3.0, 3.0, jnp.pi / 2),
            (-2.0, 1.0, jnp.pi),
            (0.5, -0.5, -jnp.pi / 2),
            (10.0, 2.0, 0.3),
        ],
    )
    def test_endpoint_reached(self, goal):
        start = jnp.array([0.0, 0.0, 0.0])
        pts, total, word = dubins_shortest_path(
            start, jnp.asarray(goal), curvature=1.0, num_points=400
        )
        end = np.asarray(pts[-1])
        np.testing.assert_allclose(end[:2], goal[:2], atol=1e-4)
        assert abs(float(normalize_angle(end[2] - goal[2]))) < 1e-4
        assert float(total) >= np.hypot(goal[0], goal[1]) - 1e-6

    def test_straight_line_is_shortest(self):
        start = jnp.array([0.0, 0.0, 0.0])
        goal = jnp.array([5.0, 0.0, 0.0])
        pts, total, word = dubins_shortest_path(start, goal)
        np.testing.assert_allclose(float(total), 5.0, atol=1e-9)
