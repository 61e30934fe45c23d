"""Curve and trajectory primitives: cubic spline, quintic polynomial,
Bézier, Catmull-Rom, uniform B-spline, Dubins paths.

Reference: crates/rust_robotics_planning/src/ — cubic_spline_planner.rs
(natural cubic spline, tridiagonal c-system :92-117, Spline2D arc-length
parameterization :131-187, calc_spline_course :189), quintic_polynomials.rs
(boundary-condition 3×3 solve :27-78), bezier_path.rs (Bernstein
evaluation), catmull_rom_spline.rs, bspline_path.rs, dubins_path.rs (six
word types, shortest wins).

TPU-native: splines are coefficient arrays evaluated by *vectorized segment
lookup* (searchsorted + gather) — one call evaluates an entire sample grid;
Dubins evaluates all six words in parallel and argmins (no branching).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from rust_robotics_tpu.core.angles import normalize_angle
from rust_robotics_tpu.core.types import pytree_dataclass


# ---------------------------------------------------------------------------
# Natural cubic spline (cubic_spline_planner.rs:18-129)
# ---------------------------------------------------------------------------

@pytree_dataclass
class CubicSpline1D:
    """Natural cubic spline: y = a + b·dt + c·dt² + d·dt³ per segment."""

    t: Any  # knots [N]
    a: Any  # [N]
    b: Any  # [N-1]
    c: Any  # [N]
    d: Any  # [N-1]

    @staticmethod
    def fit(t, y):
        """Natural spline coefficients (cubic_spline_planner.rs:28-61):
        tridiagonal system for c with free ends."""
        t = jnp.asarray(t)
        y = jnp.asarray(y)
        n = t.shape[0]
        h = jnp.diff(t)
        # matrix A (cubic_spline_planner.rs:92-107)
        mat = jnp.zeros((n, n), t.dtype)
        mat = mat.at[0, 0].set(1.0).at[n - 1, n - 1].set(1.0)
        rows = jnp.arange(1, n - 1)
        mat = mat.at[rows, rows - 1].set(h[:-1])
        mat = mat.at[rows, rows].set(2.0 * (h[:-1] + h[1:]))
        mat = mat.at[rows, rows + 1].set(h[1:])
        rhs = jnp.zeros((n,), t.dtype)
        rhs = rhs.at[rows].set(
            3.0 * (y[2:] - y[1:-1]) / h[1:] - 3.0 * (y[1:-1] - y[:-2]) / h[:-1]
        )
        c = jnp.linalg.solve(mat, rhs)
        b = (y[1:] - y[:-1]) / h - h * (c[1:] + 2.0 * c[:-1]) / 3.0
        d = (c[1:] - c[:-1]) / (3.0 * h)
        return CubicSpline1D(t, y, b, c, d)

    def _seg(self, q):
        i = jnp.clip(jnp.searchsorted(self.t, q, side="right") - 1, 0,
                     self.t.shape[0] - 2)
        return i, q - self.t[i]

    def calc(self, q):
        i, dt = self._seg(q)
        return self.a[i] + self.b[i] * dt + self.c[i] * dt**2 + self.d[i] * dt**3

    def calc_d(self, q):
        i, dt = self._seg(q)
        return self.b[i] + 2.0 * self.c[i] * dt + 3.0 * self.d[i] * dt**2

    def calc_dd(self, q):
        i, dt = self._seg(q)
        return 2.0 * self.c[i] + 6.0 * self.d[i] * dt


@pytree_dataclass
class Spline2D:
    """Arc-length parameterized 2D spline (cubic_spline_planner.rs:131)."""

    s: Any
    sx: CubicSpline1D
    sy: CubicSpline1D

    @staticmethod
    def fit(x, y):
        x = jnp.asarray(x)
        y = jnp.asarray(y)
        ds = jnp.hypot(jnp.diff(x), jnp.diff(y))
        s = jnp.concatenate([jnp.zeros((1,), x.dtype), jnp.cumsum(ds)])
        return Spline2D(s, CubicSpline1D.fit(s, x), CubicSpline1D.fit(s, y))

    @property
    def length(self):
        return self.s[-1]

    def calc_position(self, q):
        return self.sx.calc(q), self.sy.calc(q)

    def calc_yaw(self, q):
        return jnp.arctan2(self.sy.calc_d(q), self.sx.calc_d(q))

    def calc_curvature(self, q):
        dx, ddx = self.sx.calc_d(q), self.sx.calc_dd(q)
        dy, ddy = self.sy.calc_d(q), self.sy.calc_dd(q)
        return (ddy * dx - ddx * dy) / jnp.clip(
            (dx**2 + dy**2) ** 1.5, 1e-12, None
        )


def calc_spline_course(x, y, ds=0.1, num_points=None):
    """Sampled course (cubic_spline_planner.rs:189): returns
    (x, y, yaw, curvature, s) arrays. `num_points` fixes the static sample
    count (default ceil(length/ds) computed host-side from concrete input)."""
    sp = Spline2D.fit(x, y)
    if num_points is None:
        num_points = int(float(sp.length) / ds) + 1
    s = jnp.minimum(jnp.arange(num_points) * ds, sp.length)
    px, py = sp.calc_position(s)
    return px, py, sp.calc_yaw(s), sp.calc_curvature(s), s


# ---------------------------------------------------------------------------
# Quintic polynomial (quintic_polynomials.rs:17-110)
# ---------------------------------------------------------------------------

@pytree_dataclass
class QuinticPolynomial:
    coeffs: Any  # [6] a0..a5

    @staticmethod
    def boundary(xs, vxs, axs, xe, vxe, axe, time):
        """Solve the 3×3 system for a3..a5 (quintic_polynomials.rs:27-78)."""
        t = jnp.asarray(time)
        a0, a1, a2 = jnp.asarray(xs), jnp.asarray(vxs), jnp.asarray(axs) / 2.0
        m = jnp.stack(
            [
                jnp.stack([t**3, t**4, t**5]),
                jnp.stack([3 * t**2, 4 * t**3, 5 * t**4]),
                jnp.stack([6 * t, 12 * t**2, 20 * t**3]),
            ]
        )
        b = jnp.stack(
            [
                xe - a0 - a1 * t - a2 * t**2,
                vxe - a1 - 2 * a2 * t,
                axe - 2 * a2,
            ]
        )
        a345 = jnp.linalg.solve(m, b)
        return QuinticPolynomial(jnp.concatenate([jnp.stack([a0, a1, a2]), a345]))

    def calc_point(self, t):
        p = self.coeffs
        return p[0] + p[1] * t + p[2] * t**2 + p[3] * t**3 + p[4] * t**4 + p[5] * t**5

    def calc_first_derivative(self, t):
        p = self.coeffs
        return p[1] + 2 * p[2] * t + 3 * p[3] * t**2 + 4 * p[4] * t**3 + 5 * p[5] * t**4

    def calc_second_derivative(self, t):
        p = self.coeffs
        return 2 * p[2] + 6 * p[3] * t + 12 * p[4] * t**2 + 20 * p[5] * t**3

    def calc_third_derivative(self, t):
        p = self.coeffs
        return 6 * p[3] + 24 * p[4] * t + 60 * p[5] * t**2


# ---------------------------------------------------------------------------
# Bézier (bezier_path.rs)
# ---------------------------------------------------------------------------

def bezier_point(control_points, t):
    """Bernstein evaluation; control_points [N, d], t [...] in [0, 1]."""
    n = control_points.shape[0] - 1
    k = jnp.arange(n + 1)
    from jax.scipy.special import gammaln

    log_binom = (
        gammaln(n + 1.0) - gammaln(k + 1.0) - gammaln(n - k + 1.0)
    )
    tt = jnp.asarray(t)[..., None]
    # guard 0^0 at the ends
    tt = jnp.clip(tt, 1e-12, 1.0 - 1e-12)
    bern = jnp.exp(
        log_binom + k * jnp.log(tt) + (n - k) * jnp.log(1.0 - tt)
    )
    return bern @ control_points


def bezier_path(start_pose, goal_pose, offset=3.0, num_points=100):
    """4-point Bézier between poses (bezier_path.rs): control points along
    the headings; returns sampled path [num_points, 2]."""
    sx, sy, syaw = start_pose
    gx, gy, gyaw = goal_pose
    d = jnp.hypot(gx - sx, gy - sy) / offset
    cp = jnp.stack(
        [
            jnp.stack([sx, sy]),
            jnp.stack([sx + d * jnp.cos(syaw), sy + d * jnp.sin(syaw)]),
            jnp.stack([gx - d * jnp.cos(gyaw), gy - d * jnp.sin(gyaw)]),
            jnp.stack([gx, gy]),
        ]
    )
    t = jnp.linspace(0.0, 1.0, num_points)
    return bezier_point(cp, t), cp


# ---------------------------------------------------------------------------
# Catmull-Rom (catmull_rom_spline.rs)
# ---------------------------------------------------------------------------

def catmull_rom_point(p0, p1, p2, p3, t):
    """Centripetal-free uniform Catmull-Rom basis."""
    t2, t3 = t * t, t * t * t
    return 0.5 * (
        (2.0 * p1)
        + (-p0 + p2) * t
        + (2.0 * p0 - 5.0 * p1 + 4.0 * p2 - p3) * t2
        + (-p0 + 3.0 * p1 - 3.0 * p2 + p3) * t3
    )


def catmull_rom_course(points, samples_per_segment: int = 20):
    """Sample through all interior segments; points [N, 2] (N ≥ 4)."""
    p = jnp.asarray(points)
    n = p.shape[0]
    seg = jnp.arange(n - 3)
    t = jnp.linspace(0.0, 1.0, samples_per_segment, endpoint=False)

    def one(i):
        return catmull_rom_point(
            p[i][None], p[i + 1][None], p[i + 2][None], p[i + 3][None],
            t[:, None],
        )

    out = jax.vmap(one)(seg).reshape(-1, p.shape[1])
    return jnp.concatenate([out, p[-2][None]], axis=0)


# ---------------------------------------------------------------------------
# Uniform cubic B-spline (bspline_path.rs)
# ---------------------------------------------------------------------------

_BSPLINE_M = jnp.array(
    [
        [-1.0, 3.0, -3.0, 1.0],
        [3.0, -6.0, 3.0, 0.0],
        [-3.0, 0.0, 3.0, 0.0],
        [1.0, 4.0, 1.0, 0.0],
    ]
) / 6.0


def bspline_course(control_points, samples_per_segment: int = 20):
    """Approximating uniform cubic B-spline through the control polygon."""
    p = jnp.asarray(control_points)
    n = p.shape[0]
    t = jnp.linspace(0.0, 1.0, samples_per_segment, endpoint=False)
    tt = jnp.stack([t**3, t**2, t, jnp.ones_like(t)], axis=-1)  # [S, 4]
    basis = tt @ _BSPLINE_M  # [S, 4]

    def one(i):
        ctrl = jax.lax.dynamic_slice_in_dim(p, i, 4, axis=0)  # [4, d]
        return basis @ ctrl

    return jax.vmap(one)(jnp.arange(n - 3)).reshape(-1, p.shape[1])


# ---------------------------------------------------------------------------
# Dubins paths (dubins_path.rs: 6 word types, shortest wins)
# ---------------------------------------------------------------------------

def _mod2pi(x):
    return x - 2.0 * jnp.pi * jnp.floor(x / (2.0 * jnp.pi))


def dubins_path_lengths(start, goal, curvature=1.0):
    """Segment lengths [6, 3] (normalized by curvature) for words
    [LSL, RSR, LSR, RSL, RLR, LRL]; invalid words get inf total.

    Standard closed forms (dubins_path.rs word planners); all six evaluated
    branch-free and in parallel.
    """
    dx = goal[0] - start[0]
    dy = goal[1] - start[1]
    d = jnp.hypot(dx, dy) * curvature
    theta = jnp.arctan2(dy, dx)
    alpha = _mod2pi(start[2] - theta)
    beta = _mod2pi(goal[2] - theta)
    sa, ca = jnp.sin(alpha), jnp.cos(alpha)
    sb, cb = jnp.sin(beta), jnp.cos(beta)
    c_ab = jnp.cos(alpha - beta)
    inf = jnp.asarray(jnp.inf, jnp.result_type(float))

    def guard(p_sq, fn):
        ok = p_sq >= 0
        val = fn(jnp.sqrt(jnp.clip(p_sq, 0.0, None)))
        bad = jnp.full((3,), inf)
        return jnp.where(ok, val, bad)

    # LSL
    p_sq = 2 + d * d - 2 * c_ab + 2 * d * (sa - sb)
    tmp = jnp.arctan2(cb - ca, d + sa - sb)
    lsl = guard(p_sq, lambda p: jnp.stack(
        [_mod2pi(-alpha + tmp), p, _mod2pi(beta - tmp)]
    ))
    # RSR
    p_sq = 2 + d * d - 2 * c_ab + 2 * d * (sb - sa)
    tmp2 = jnp.arctan2(ca - cb, d - sa + sb)
    rsr = guard(p_sq, lambda p: jnp.stack(
        [_mod2pi(alpha - tmp2), p, _mod2pi(-beta + tmp2)]
    ))
    # LSR
    p_sq = -2 + d * d + 2 * c_ab + 2 * d * (sa + sb)
    def lsr_fn(p):
        tmp3 = jnp.arctan2(-ca - cb, d + sa + sb) - jnp.arctan2(-2.0, p)
        return jnp.stack(
            [_mod2pi(-alpha + tmp3), p, _mod2pi(-_mod2pi(beta) + tmp3)]
        )
    lsr = guard(p_sq, lsr_fn)
    # RSL
    p_sq = -2 + d * d + 2 * c_ab - 2 * d * (sa + sb)
    def rsl_fn(p):
        tmp4 = jnp.arctan2(ca + cb, d - sa - sb) - jnp.arctan2(2.0, p)
        return jnp.stack(
            [_mod2pi(alpha - tmp4), p, _mod2pi(beta - tmp4)]
        )
    rsl = guard(p_sq, rsl_fn)
    # RLR
    tmp_rlr = (6.0 - d * d + 2 * c_ab + 2 * d * (sa - sb)) / 8.0
    ok_rlr = jnp.abs(tmp_rlr) <= 1.0
    p_rlr = _mod2pi(2 * jnp.pi - jnp.arccos(jnp.clip(tmp_rlr, -1.0, 1.0)))
    t_rlr = _mod2pi(
        alpha - jnp.arctan2(ca - cb, d - sa + sb) + _mod2pi(p_rlr / 2.0)
    )
    rlr = jnp.where(
        ok_rlr,
        jnp.stack([t_rlr, p_rlr, _mod2pi(alpha - beta - t_rlr + _mod2pi(p_rlr))]),
        jnp.full((3,), inf),
    )
    # LRL
    tmp_lrl = (6.0 - d * d + 2 * c_ab + 2 * d * (sb - sa)) / 8.0
    ok_lrl = jnp.abs(tmp_lrl) <= 1.0
    p_lrl = _mod2pi(2 * jnp.pi - jnp.arccos(jnp.clip(tmp_lrl, -1.0, 1.0)))
    t_lrl = _mod2pi(
        -alpha - jnp.arctan2(ca - cb, d + sa - sb) + p_lrl / 2.0
    )
    lrl = jnp.where(
        ok_lrl,
        jnp.stack([t_lrl, p_lrl, _mod2pi(_mod2pi(beta) - alpha - t_lrl + _mod2pi(p_lrl))]),
        jnp.full((3,), inf),
    )
    return jnp.stack([lsl, rsr, lsr, rsl, rlr, lrl])


DUBINS_WORDS = ("LSL", "RSR", "LSR", "RSL", "RLR", "LRL")
_DUBINS_MODES = jnp.array(
    [
        [1, 0, 1],   # LSL (1=L, 0=S, -1=R)
        [-1, 0, -1],
        [1, 0, -1],
        [-1, 0, 1],
        [-1, 1, -1],
        [1, -1, 1],
    ]
)


def dubins_shortest_path(start, goal, curvature=1.0, num_points=200):
    """Shortest Dubins path: returns (points [num_points, 3], total_length,
    word_index). Sampled by arc-length marching through the 3 segments."""
    lengths = dubins_path_lengths(start, goal, curvature)  # [6, 3]
    totals = jnp.sum(lengths, axis=-1)
    best = jnp.argmin(totals)
    segs = lengths[best] / curvature  # world units
    modes = _DUBINS_MODES[best].astype(segs.dtype)
    total = jnp.sum(segs)
    s = jnp.linspace(0.0, total, num_points)
    c0 = jnp.cumsum(jnp.concatenate([jnp.zeros(1, segs.dtype), segs]))[:3]

    # analytic pose after marching distance `si` through the 3 segments
    def pose_at(si):
        k = jnp.clip(jnp.searchsorted(c0, si, side="right") - 1, 0, 2)
        pose = jnp.asarray(start, dtype=segs.dtype)

        def advance(i, p):
            seg_len = jnp.where(
                i < k, segs[i], jnp.where(i == k, si - c0[i], 0.0)
            )
            seg_len = jnp.clip(seg_len, 0.0, None)
            m = modes[i]
            x, y, yaw = p[0], p[1], p[2]
            straight = jnp.stack(
                [x + seg_len * jnp.cos(yaw), y + seg_len * jnp.sin(yaw), yaw]
            )
            # exact circular arc: dyaw = m·κ·len; center offset form
            r = 1.0 / curvature
            dyaw = m * seg_len * curvature
            turn = jnp.stack(
                [
                    x + m * r * (jnp.sin(yaw + dyaw) - jnp.sin(yaw)),
                    y - m * r * (jnp.cos(yaw + dyaw) - jnp.cos(yaw)),
                    yaw + dyaw,
                ]
            )
            return jnp.where(m == 0, straight, turn)

        return jax.lax.fori_loop(0, 3, advance, pose)

    pts = jax.vmap(pose_at)(s)
    return pts, total, best
