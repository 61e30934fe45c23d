"""Lie-group operations: SO(2), SE(2), SO(3), SE(3).

Reference surface: crates/rust_robotics_core/src/lie.rs (skew:25, so2:37-43,
so3:48-57, so3_left_jacobian:74-83, se2:97-146, se3:164-228). Redesigned for
TPU: every function is pure jnp over the trailing axes, differentiable, and
vmappable over arbitrary leading batch dims. Small-angle branches use the
"double-where" pattern so both the primal and the gradient are NaN-free at
theta == 0 (the reference branches on an epsilon; XLA needs branchless).

Conventions match the reference:
- SE(2) tangent is [vx, vy, omega]; SE(3) tangent is [rho(3), phi(3)]
  (translation first, rotation last).
- exp uses the left Jacobian: t = V(phi) @ rho.
"""

import jax.numpy as jnp

_EPS = 1e-8


def _safe_div(num, den, fallback, eps=_EPS):
    """num/den where |den| > eps, else fallback — NaN-free in grad too."""
    small = jnp.abs(den) < eps
    safe_den = jnp.where(small, jnp.ones_like(den), den)
    return jnp.where(small, fallback, num / safe_den)


def _safe_theta(theta2, eps2=1e-12):
    """(small, theta) with theta = sqrt(theta2) guarded so that sqrt never
    sees 0 on the taken-gradient path (double-where). Use `small` to select
    the Taylor branch computed directly from theta2."""
    small = theta2 < eps2
    theta = jnp.sqrt(jnp.where(small, jnp.ones_like(theta2), theta2))
    return small, theta


# ---------------------------------------------------------------------------
# SO(2)
# ---------------------------------------------------------------------------

def so2_exp(theta):
    """Angle [...,] -> rotation matrix [..., 2, 2]. `lie.rs:37`."""
    c, s = jnp.cos(theta), jnp.sin(theta)
    return jnp.stack(
        [jnp.stack([c, -s], axis=-1), jnp.stack([s, c], axis=-1)], axis=-2
    )


def so2_log(rot):
    """Rotation matrix [..., 2, 2] -> angle. `lie.rs:43`."""
    return jnp.arctan2(rot[..., 1, 0], rot[..., 0, 0])


# ---------------------------------------------------------------------------
# SO(3)
# ---------------------------------------------------------------------------

def skew(v):
    """[..., 3] -> [..., 3, 3] cross-product matrix. `lie.rs:25`."""
    z = jnp.zeros_like(v[..., 0])
    x, y, w = v[..., 0], v[..., 1], v[..., 2]
    return jnp.stack(
        [
            jnp.stack([z, -w, y], axis=-1),
            jnp.stack([w, z, -x], axis=-1),
            jnp.stack([-y, x, z], axis=-1),
        ],
        axis=-2,
    )


def unskew(m):
    """[..., 3, 3] -> [..., 3]. `lie.rs:32`."""
    return jnp.stack([m[..., 2, 1], m[..., 0, 2], m[..., 1, 0]], axis=-1)


def so3_exp(phi):
    """Rodrigues: axis-angle [..., 3] -> rotation [..., 3, 3]. `lie.rs:48`."""
    theta2 = jnp.sum(phi * phi, axis=-1)
    small, theta = _safe_theta(theta2)
    k = skew(phi)
    k2 = k @ k
    # sin(t)/t and (1-cos(t))/t^2 with Taylor fallbacks at t ~ 0
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / (theta * theta))
    eye = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), k.shape)
    return eye + a[..., None, None] * k + b[..., None, None] * k2


def so3_log(rot):
    """Rotation [..., 3, 3] -> axis-angle [..., 3]. `lie.rs:57`.

    Gradient-safe at the identity (the arccos form has d(arccos)/dx → ∞ at
    x=1, which poisons Gauss-Newton Jacobians exactly when residuals reach
    zero): theta comes from atan2(|antisym|/2, cos) with a Taylor branch for
    tiny angles.
    """
    trace = rot[..., 0, 0] + rot[..., 1, 1] + rot[..., 2, 2]
    cos_theta = jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0)
    # vee of the antisymmetric part = 2 sin(theta) * axis
    w = unskew(rot - jnp.swapaxes(rot, -1, -2))
    s2 = 0.25 * jnp.sum(w * w, axis=-1)  # sin²(theta)
    small = (s2 < 1e-14) & (cos_theta > 0.0)
    # safe sin: 1 on the small branch so sqrt/atan2/divide all stay
    # differentiable; those lanes take the Taylor scale anyway (and w ≈ 0)
    sin_theta = jnp.sqrt(jnp.where(small, jnp.ones_like(s2), s2))
    theta = jnp.arctan2(sin_theta, cos_theta)
    scale = jnp.where(small, 0.5 + s2 / 12.0, theta / (2.0 * sin_theta))
    near_pi = cos_theta < jnp.cos(jnp.pi - 1e-4)
    # Near pi the antisymmetric part vanishes; recover axis from the
    # symmetric part: R + I ~ 2 (I + phi phi^T / theta^2) - ... use diagonal.
    diag = jnp.stack([rot[..., 0, 0], rot[..., 1, 1], rot[..., 2, 2]], axis=-1)
    axis_sq = jnp.clip((diag - cos_theta[..., None]) / jnp.clip(1.0 - cos_theta[..., None], 1e-12, None), 0.0, None)
    # double-where: off the near-pi lanes feed sqrt a 1 so its gradient
    # stays finite (sqrt'(0) = inf would leak NaN through the final where)
    axis_sq = jnp.where(near_pi[..., None], axis_sq, jnp.ones_like(axis_sq))
    axis = jnp.sqrt(axis_sq)
    # fix signs from off-diagonal sums (symmetric part signs)
    s12 = rot[..., 0, 1] + rot[..., 1, 0]
    s13 = rot[..., 0, 2] + rot[..., 2, 0]
    s23 = rot[..., 1, 2] + rot[..., 2, 1]
    sx = axis[..., 0]
    sy = jnp.where(s12 >= 0, axis[..., 1], -axis[..., 1])
    sz = jnp.where(s13 >= 0, axis[..., 2], -axis[..., 2])
    # resolve sy/sz consistency via s23
    flip = (jnp.where(s12 >= 0, 1.0, -1.0) * jnp.where(s13 >= 0, 1.0, -1.0) * s23) < 0
    sz = jnp.where(flip, -sz, sz)
    axis_pi = jnp.stack([sx, sy, sz], axis=-1)
    phi_pi = axis_pi * theta[..., None]
    phi_generic = w * scale[..., None]
    return jnp.where(near_pi[..., None], phi_pi, phi_generic)


def so3_left_jacobian(phi):
    """Left Jacobian J_l(phi) [..., 3, 3]. `lie.rs:74`."""
    theta2 = jnp.sum(phi * phi, axis=-1)
    small, theta = _safe_theta(theta2)
    k = skew(phi)
    k2 = k @ k
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / (theta * theta))
    c = jnp.where(
        small,
        1.0 / 6.0 - theta2 / 120.0,
        (theta - jnp.sin(theta)) / (theta * theta * theta),
    )
    eye = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), k.shape)
    return eye + b[..., None, None] * k + c[..., None, None] * k2


def so3_left_jacobian_inverse(phi):
    """J_l^{-1}(phi) = I - K/2 + coeff * K², coeff = 1/t² − (1+cos t)/(2 t sin t).
    `lie.rs:83`."""
    theta2 = jnp.sum(phi * phi, axis=-1)
    small, theta = _safe_theta(theta2, eps2=1e-8)
    k = skew(phi)
    k2 = k @ k
    coeff = jnp.where(
        small,
        1.0 / 12.0 + theta2 / 720.0,
        1.0 / (theta * theta) - (1.0 + jnp.cos(theta)) / (2.0 * theta * jnp.sin(theta)),
    )
    eye = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), k.shape)
    return eye - 0.5 * k + coeff[..., None, None] * k2


# ---------------------------------------------------------------------------
# SE(2)
# ---------------------------------------------------------------------------

def se2_exp(xi):
    """Tangent [vx, vy, omega] [..., 3] -> homogeneous [..., 3, 3]. `lie.rs:97`."""
    vx, vy, w = xi[..., 0], xi[..., 1], xi[..., 2]
    s, c = jnp.sin(w), jnp.cos(w)
    # V = [[sin w / w, -(1-cos w)/w], [(1-cos w)/w, sin w / w]]
    a = _safe_div(s, w, 1.0 - w * w / 6.0)
    b = _safe_div(1.0 - c, w, w / 2.0 - w**3 / 24.0)
    tx = a * vx - b * vy
    ty = b * vx + a * vy
    z = jnp.zeros_like(w)
    one = jnp.ones_like(w)
    return jnp.stack(
        [
            jnp.stack([c, -s, tx], axis=-1),
            jnp.stack([s, c, ty], axis=-1),
            jnp.stack([z, z, one], axis=-1),
        ],
        axis=-2,
    )


def se2_log(m):
    """Homogeneous [..., 3, 3] -> tangent [vx, vy, omega]. `lie.rs:~120`."""
    w = jnp.arctan2(m[..., 1, 0], m[..., 0, 0])
    tx, ty = m[..., 0, 2], m[..., 1, 2]
    s, c = jnp.sin(w), jnp.cos(w)
    a = _safe_div(s, w, 1.0 - w * w / 6.0)
    b = _safe_div(1.0 - c, w, w / 2.0 - w**3 / 24.0)
    det = a * a + b * b
    inv_det = _safe_div(jnp.ones_like(det), det, jnp.ones_like(det), eps=1e-12)
    vx = inv_det * (a * tx + b * ty)
    vy = inv_det * (-b * tx + a * ty)
    return jnp.stack([vx, vy, w], axis=-1)


def se2_inverse(m):
    """Inverse of homogeneous SE(2) matrix. `lie.rs:~135`."""
    rot_t = jnp.swapaxes(m[..., :2, :2], -1, -2)
    t = m[..., :2, 2:]
    top = jnp.concatenate([rot_t, -rot_t @ t], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 1.0], dtype=m.dtype), top[..., :1, :].shape
    )
    return jnp.concatenate([top, bottom], axis=-2)


def se2_adjoint(m):
    """Adjoint [..., 3, 3] of SE(2): [[R, [ty; -tx]], [0, 1]]. `lie.rs:146`."""
    r = m[..., :2, :2]
    tx, ty = m[..., 0, 2], m[..., 1, 2]
    col = jnp.stack([ty, -tx], axis=-1)[..., :, None]
    top = jnp.concatenate([r, col], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 1.0], dtype=m.dtype), top[..., :1, :].shape
    )
    return jnp.concatenate([top, bottom], axis=-2)


def se2_from_pose(x, y, yaw):
    """Build homogeneous SE(2) from pose components (batched)."""
    c, s = jnp.cos(yaw), jnp.sin(yaw)
    z = jnp.zeros_like(x)
    one = jnp.ones_like(x)
    return jnp.stack(
        [
            jnp.stack([c, -s, x], axis=-1),
            jnp.stack([s, c, y], axis=-1),
            jnp.stack([z, z, one], axis=-1),
        ],
        axis=-2,
    )


def se2_to_pose(m):
    """Homogeneous SE(2) -> (x, y, yaw)."""
    return m[..., 0, 2], m[..., 1, 2], jnp.arctan2(m[..., 1, 0], m[..., 0, 0])


# ---------------------------------------------------------------------------
# SE(3)
# ---------------------------------------------------------------------------

def se3_exp(xi):
    """Tangent [rho(3), phi(3)] [..., 6] -> homogeneous [..., 4, 4]. `lie.rs:164`."""
    rho, phi = xi[..., :3], xi[..., 3:]
    rot = so3_exp(phi)
    t = (so3_left_jacobian(phi) @ rho[..., None])[..., 0]
    top = jnp.concatenate([rot, t[..., None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=xi.dtype), top[..., :1, :].shape
    )
    return jnp.concatenate([top, bottom], axis=-2)


def se3_log(m):
    """Homogeneous [..., 4, 4] -> tangent [rho, phi]. `lie.rs:~185`."""
    phi = so3_log(m[..., :3, :3])
    rho = (so3_left_jacobian_inverse(phi) @ m[..., :3, 3:])[..., 0]
    return jnp.concatenate([rho, phi], axis=-1)


def se3_inverse(m):
    """Inverse of homogeneous SE(3). `lie.rs:~205`."""
    rot_t = jnp.swapaxes(m[..., :3, :3], -1, -2)
    t = m[..., :3, 3:]
    top = jnp.concatenate([rot_t, -rot_t @ t], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=m.dtype), top[..., :1, :].shape
    )
    return jnp.concatenate([top, bottom], axis=-2)


def se3_adjoint(m):
    """Adjoint [..., 6, 6]: [[R, skew(t) R], [0, R]]. `lie.rs:228`."""
    r = m[..., :3, :3]
    t = m[..., :3, 3]
    tr = skew(t) @ r
    zeros = jnp.zeros_like(r)
    top = jnp.concatenate([r, tr], axis=-1)
    bottom = jnp.concatenate([zeros, r], axis=-1)
    return jnp.concatenate([top, bottom], axis=-2)


# ---------------------------------------------------------------------------
# Deviation-space (near-identity) SE(3) calculus
# ---------------------------------------------------------------------------
# Working with E = T − I instead of T keeps RELATIVE precision for
# near-identity transforms: a homogeneous matrix stores 1 + x with
# absolute rounding eps (so log(T) carries ~eps noise no matter how
# small the true tangent is), while the deviation E stores x itself.
# The anchored SE(3) solver composes edge residuals entirely in
# E-space, so the f32 residual-evaluation noise scales DOWN with the
# residual magnitude — the mechanism behind the 10k-pose SE(3) f32
# accuracy fix (slam/pose_graph.py::se3_anchored_edge_residual,
# SURVEY §7.3(5)). Series are plain polynomials: differentiable,
# branch-free, jit/vmap-friendly.

def se3_hat(xi):
    """Tangent [..., 6] -> se(3) algebra matrix [..., 4, 4]
    [[skew(phi), rho], [0, 0]]."""
    rho, phi = xi[..., :3], xi[..., 3:]
    k = skew(phi)
    top = jnp.concatenate([k, rho[..., None]], axis=-1)
    bottom = jnp.zeros(top[..., :1, :].shape, xi.dtype)
    return jnp.concatenate([top, bottom], axis=-2)


def se3_expm1(xi, terms: int = 10):
    """E = exp(hat(xi)) − I via the Horner-evaluated series
    X·(I + X/2·(I + X/3·(…))). Exact to f32 for |xi| ≲ 0.3 at the
    default term count; inputs are small by construction in the
    anchored solver."""
    x = se3_hat(xi)
    eye = jnp.broadcast_to(jnp.eye(4, dtype=xi.dtype), x.shape)
    s = eye
    for k in range(terms, 1, -1):
        s = eye + (x @ s) / k
    return x @ s


def se3_compose_dev(e1, e2):
    """Deviation of the product: (I+E1)(I+E2) − I = E1 + E2 + E1·E2 —
    no near-identity cancellation, absolute accuracy ~eps·|E|."""
    return e1 + e2 + e1 @ e2


def se3_logm1(e, terms: int = 10):
    """Tangent of I+E via the matrix-log series Σ (−1)^{k+1} E^k / k
    (the matrix log of an SE(3) element IS its se(3) algebra element).
    phi is read from the antisymmetrized rotation block, rho from the
    translation column. Valid for ||E|| < 1; the anchored residuals
    keep ||E|| ≲ 0.1."""
    l = e
    p = e
    sign = 1.0
    for k in range(2, terms + 1):
        p = p @ e
        sign = -sign
        l = l + (sign / k) * p
    phi = 0.5 * jnp.stack([
        l[..., 2, 1] - l[..., 1, 2],
        l[..., 0, 2] - l[..., 2, 0],
        l[..., 1, 0] - l[..., 0, 1],
    ], axis=-1)
    rho = l[..., :3, 3]
    return jnp.concatenate([rho, phi], axis=-1)
