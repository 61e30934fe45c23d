"""η³ spline paths + time-parameterized trajectories.

Reference: crates/rust_robotics_planning/src/eta3_spline.rs — each segment
is a 7th-degree parametric polynomial pair (x(u), y(u)), u ∈ [0, 1],
connecting two poses with shaping parameters η = [η0..η5] and endpoint
curvature parameters κ = [κa, κ̇a, κb, κ̇b]; the closed-form coefficient
table is transcribed at :82-:221. Arc length via Gauss–Legendre of
‖(ẋ, ẏ)‖ (:326); Eta3Path chains segments with a global u ∈ [0, N]
parameter (:333-:374); Eta3Trajectory time-parameterizes the chain with a
trapezoidal (max_vel, max_accel) profile (:582-:693).

TPU-native shape: coefficients for a WHOLE chain of segments build as one
[S, 2, 8] tensor (vmap over segments); evaluation at any batch of u values
is a polyval matmul — sampling an entire multi-segment path is a single
fused program, and derivatives for curvature come from the same
coefficients analytically.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = [
    "eta3_coefficients",
    "eta3_point",
    "eta3_derivatives",
    "eta3_segment_length",
    "eta3_path_coefficients",
    "eta3_path_sample",
    "eta3_trajectory_sample",
]

# 10-point Gauss–Legendre nodes/weights on [0, 1]
_GL_X = jnp.array([
    0.013046735741414, 0.067468316655508, 0.160295215850488,
    0.283302302935376, 0.425562830509184, 0.574437169490816,
    0.716697697064624, 0.839704784149512, 0.932531683344492,
    0.986953264258586,
])
_GL_W = jnp.array([
    0.033335672154344, 0.074725674575290, 0.109543181257991,
    0.134633359654998, 0.147762112357376, 0.147762112357376,
    0.134633359654998, 0.109543181257991, 0.074725674575290,
    0.033335672154344,
])


def eta3_coefficients(start, end, eta=None, kappa=None):
    """[2, 8] polynomial coefficients (x, y) × degree for one segment —
    the exact closed-form table of eta3_spline.rs:82-221."""
    f = jnp.result_type(float)
    start = jnp.asarray(start, f)
    end = jnp.asarray(end, f)
    e = jnp.zeros(6, f) if eta is None else jnp.asarray(eta, f)
    k = jnp.zeros(4, f) if kappa is None else jnp.asarray(kappa, f)
    ca, sa = jnp.cos(start[2]), jnp.sin(start[2])
    cb, sb = jnp.cos(end[2]), jnp.sin(end[2])
    dx = end[0] - start[0]
    dy = end[1] - start[1]

    c = jnp.zeros((2, 8), f)
    c = c.at[0, 0].set(start[0]).at[1, 0].set(start[1])
    c = c.at[0, 1].set(e[0] * ca).at[1, 1].set(e[0] * sa)
    c = c.at[0, 2].set(0.5 * e[2] * ca - 0.5 * e[0] ** 2 * k[0] * sa)
    c = c.at[1, 2].set(0.5 * e[2] * sa + 0.5 * e[0] ** 2 * k[0] * ca)
    cubic = e[0] ** 3 * k[1] + 3.0 * e[0] * e[2] * k[0]
    c = c.at[0, 3].set(e[4] * ca / 6.0 - cubic * sa / 6.0)
    c = c.at[1, 3].set(e[4] * sa / 6.0 + cubic * ca / 6.0)

    a2 = (20.0 * e[0] + 5.0 * e[2] + (2.0 / 3.0) * e[4])
    a3 = (5.0 * e[0] ** 2 * k[0] + (2.0 / 3.0) * e[0] ** 3 * k[1]
          + 2.0 * e[0] * e[2] * k[0])
    a4 = (15.0 * e[1] - 2.5 * e[3] + e[5] / 6.0)
    a5 = (2.5 * e[1] ** 2 * k[2] - e[1] ** 3 * k[3] / 6.0
          - 0.5 * e[1] * e[3] * k[2])
    c = c.at[0, 4].set(35.0 * dx - a2 * ca + a3 * sa - a4 * cb - a5 * sb)
    c = c.at[1, 4].set(35.0 * dy - a2 * sa - a3 * ca - a4 * sb + a5 * cb)

    b2 = (45.0 * e[0] + 10.0 * e[2] + e[4])
    b3 = (10.0 * e[0] ** 2 * k[0] + e[0] ** 3 * k[1]
          + 3.0 * e[0] * e[2] * k[0])
    b4 = (39.0 * e[1] - 7.0 * e[3] + 0.5 * e[5])
    b5 = (7.0 * e[1] ** 2 * k[2] - 0.5 * e[1] ** 3 * k[3]
          - 1.5 * e[1] * e[3] * k[2])
    c = c.at[0, 5].set(-84.0 * dx + b2 * ca - b3 * sa + b4 * cb + b5 * sb)
    c = c.at[1, 5].set(-84.0 * dy + b2 * sa + b3 * ca + b4 * sb - b5 * cb)

    d2 = (36.0 * e[0] + 7.5 * e[2] + (2.0 / 3.0) * e[4])
    d3 = (7.5 * e[0] ** 2 * k[0] + (2.0 / 3.0) * e[0] ** 3 * k[1]
          + 2.0 * e[0] * e[2] * k[0])
    d4 = (34.0 * e[1] - 6.5 * e[3] + 0.5 * e[5])
    d5 = (6.5 * e[1] ** 2 * k[2] - 0.5 * e[1] ** 3 * k[3]
          - 1.5 * e[1] * e[3] * k[2])
    c = c.at[0, 6].set(70.0 * dx - d2 * ca + d3 * sa - d4 * cb - d5 * sb)
    c = c.at[1, 6].set(70.0 * dy - d2 * sa - d3 * ca - d4 * sb + d5 * cb)

    g2 = (10.0 * e[0] + 2.0 * e[2] + e[4] / 6.0)
    g3 = (2.0 * e[0] ** 2 * k[0] + e[0] ** 3 * k[1] / 6.0
          + 0.5 * e[0] * e[2] * k[0])
    g4 = (10.0 * e[1] - 2.0 * e[3] + e[5] / 6.0)
    g5 = (2.0 * e[1] ** 2 * k[2] - e[1] ** 3 * k[3] / 6.0
          - 0.5 * e[1] * e[3] * k[2])
    c = c.at[0, 7].set(-20.0 * dx + g2 * ca - g3 * sa + g4 * cb + g5 * sb)
    c = c.at[1, 7].set(-20.0 * dy + g2 * sa + g3 * ca + g4 * sb - g5 * cb)
    return c


def eta3_point(coeffs, u):
    """(x, y) at parameter u (broadcasts over u)."""
    u = jnp.asarray(u)
    powers = u[..., None] ** jnp.arange(8)
    return jnp.einsum("dk,...k->...d", coeffs, powers)


def eta3_derivatives(coeffs, u):
    """((ẋ, ẏ), (ẍ, ÿ)) at u."""
    u = jnp.asarray(u)
    k = jnp.arange(8)
    d1 = coeffs * k
    p1 = jnp.where(k > 0, u[..., None] ** jnp.maximum(k - 1, 0), 0.0)
    d2 = coeffs * k * jnp.maximum(k - 1, 0)
    p2 = jnp.where(k > 1, u[..., None] ** jnp.maximum(k - 2, 0), 0.0)
    return (jnp.einsum("dk,...k->...d", d1, p1),
            jnp.einsum("dk,...k->...d", d2, p2))


def eta3_segment_length(coeffs):
    """Gauss–Legendre arc length (eta3_spline.rs:326)."""
    v, _ = eta3_derivatives(coeffs, _GL_X)
    return jnp.sum(_GL_W * jnp.linalg.norm(v, axis=-1))


def eta3_path_coefficients(poses, etas=None, kappas=None):
    """Chain coefficients [S, 2, 8] for poses [S+1, 3] — one vmap."""
    poses = jnp.asarray(poses)
    s = poses.shape[0] - 1
    if etas is None:
        # the standard default: η0 = η1 = segment chord length
        chords = jnp.linalg.norm(jnp.diff(poses[:, :2], axis=0), axis=-1)
        etas = jnp.zeros((s, 6)).at[:, 0].set(chords).at[:, 1].set(chords)
    if kappas is None:
        kappas = jnp.zeros((s, 4))
    return jax.vmap(eta3_coefficients)(poses[:-1], poses[1:],
                                       jnp.asarray(etas), jnp.asarray(kappas))


@functools.partial(jax.jit, static_argnames=("num_points",))
def eta3_path_sample(chain_coeffs, num_points: int = 200):
    """Sample the whole chain at the global parameter u ∈ [0, S]
    (Eta3Path::sample): returns points [num_points, 2]."""
    s = chain_coeffs.shape[0]
    u = jnp.linspace(0.0, s - 1e-9, num_points)
    seg = jnp.clip(u.astype(jnp.int32), 0, s - 1)
    local = u - seg
    return jax.vmap(lambda i, t: eta3_point(chain_coeffs[i], t))(seg, local)


@functools.partial(jax.jit, static_argnames=("num_points",))
def eta3_trajectory_sample(chain_coeffs, max_vel: float = 1.0,
                           max_accel: float = 0.5,
                           num_points: int = 200):
    """Trapezoidal time parameterization of the chained path
    (Eta3Trajectory): accelerate at max_accel to max_vel, cruise, decelerate
    — degenerate triangular profile when too short. Returns dict(times,
    states [num_points, 5] = (x, y, yaw, v, s))."""
    lengths = jax.vmap(eta3_segment_length)(chain_coeffs)
    total = jnp.sum(lengths)
    t_ramp = max_vel / max_accel
    s_ramp = 0.5 * max_accel * t_ramp ** 2
    tri = 2.0 * s_ramp > total
    t_ramp_tri = jnp.sqrt(total / max_accel)
    v_peak = jnp.where(tri, max_accel * t_ramp_tri, max_vel)
    t_total = jnp.where(
        tri, 2.0 * t_ramp_tri,
        2.0 * t_ramp + (total - 2.0 * s_ramp) / max_vel,
    )
    times = jnp.linspace(0.0, t_total, num_points)

    def s_of_t(t):
        t_r = jnp.where(tri, t_ramp_tri, t_ramp)
        s_r = 0.5 * max_accel * t_r ** 2
        s_acc = 0.5 * max_accel * t ** 2
        s_cru = s_r + v_peak * (t - t_r)
        td = t_total - t
        s_dec = total - 0.5 * max_accel * td ** 2
        v = jnp.where(t < t_r, max_accel * t,
                      jnp.where(t > t_total - t_r, max_accel * td, v_peak))
        s = jnp.where(t < t_r, s_acc,
                      jnp.where(t > t_total - t_r, s_dec, s_cru))
        return jnp.clip(s, 0.0, total), v

    svals, vvals = jax.vmap(s_of_t)(times)
    # arc length → (segment, local u) via per-segment GL length and a
    # fixed-point refinement of u inside the segment
    cum = jnp.concatenate([jnp.zeros(1), jnp.cumsum(lengths)])
    seg = jnp.clip(jnp.searchsorted(cum, svals, side="right") - 1, 0,
                   chain_coeffs.shape[0] - 1)
    rem = svals - cum[seg]

    def local_u(i, target):
        c = chain_coeffs[i]

        def body(u, _):
            v, _a = eta3_derivatives(c, u)
            speed = jnp.maximum(jnp.linalg.norm(v, axis=-1), 1e-9)
            # arc length from 0 to u via GL on [0, u]
            vv, _aa = eta3_derivatives(c, u * _GL_X)
            alen = u * jnp.sum(_GL_W * jnp.linalg.norm(vv, axis=-1))
            return jnp.clip(u - (alen - target) / speed, 0.0, 1.0), None

        u0 = target / jnp.maximum(eta3_segment_length(c), 1e-9)
        u, _ = jax.lax.scan(body, jnp.clip(u0, 0.0, 1.0), None, length=8)
        return u

    us = jax.vmap(local_u)(seg, rem)
    pts = jax.vmap(lambda i, t: eta3_point(chain_coeffs[i], t))(seg, us)
    vel, _ = jax.vmap(
        lambda i, t: eta3_derivatives(chain_coeffs[i], t)
    )(seg, us)
    yaw = jnp.arctan2(vel[:, 1], vel[:, 0])
    states = jnp.concatenate(
        [pts, yaw[:, None], vvals[:, None], svals[:, None]], axis=1
    )
    return {"times": times, "states": states, "total_time": t_total,
            "total_length": total}
