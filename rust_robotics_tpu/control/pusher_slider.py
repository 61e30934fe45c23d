"""Quasi-static planar pushing (pusher-slider) with contact modes and MPPI.

Reference: crates/rust_robotics_control/src/pusher_slider.rs — a point
pusher on any of a square slider's four faces, the ellipsoidal
limit-surface model (Goyal/Howe/Mason; Lynch; Hogan–Rodriguez): the
contact-point velocity maps to the contact force through
M = (1/c²)[[c²+p_y², −p_x p_y], [−p_x p_y, c²+p_x²]] (:183-:199); the
contact STICKS when |f_t| ≤ μ f_n and the body twist is the limit-surface
image (v_x, v_y, (p×f)/c²); otherwise it SLIDES with the force on the
friction-cone edge, rescaled so the commanded normal speed is preserved
(:205-:230). Per-face MPPI with lowest-cost face selection and a closed
loop (`simulate_push`, :744-:860); `two_contact_twist` solves two
simultaneous contacts contact-implicitly by enumerating per-contact
stick/slide modes with a padded 4×4 force solve (:275-:359) — a couple can
spin the slider in place.

TPU-native shape: the twist solve is branch-free (`jnp.where` chains over
the mode conditions) so MPPI's [faces × samples × horizon] rollout tensor
evaluates in one fused program; the 9 two-contact mode combinations solve
as one batched 4×4 linear system with validity masks and a priority argmax
(the reference's first-valid enumeration, vectorized).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from rust_robotics_tpu.control.mppi import MPPIConfig, mppi_plan

__all__ = [
    "PusherSliderParams",
    "contact_frame",
    "pusher_twist",
    "pusher_step",
    "two_contact_twist",
    "PusherMppiConfig",
    "pusher_mppi_plan",
    "simulate_push",
    "MODE_SEPARATED",
    "MODE_STICK",
    "MODE_SLIDE_UP",
    "MODE_SLIDE_DOWN",
]

MODE_SEPARATED, MODE_STICK, MODE_SLIDE_UP, MODE_SLIDE_DOWN = 0, 1, 2, 3


@dataclasses.dataclass(frozen=True)
class PusherSliderParams:
    """half_extent b, limit-surface characteristic length c, pusher
    friction μ (pusher_slider.rs:114)."""

    half_extent: float = 0.5
    char_len: float = 0.35
    pusher_friction: float = 0.3


def contact_frame(face, contact, half_extent):
    """Body-frame contact point p, inward normal d, tangent t for face
    0..3 (pusher_slider.rs:156) — branch-free table lookup."""
    b = half_extent
    s = jnp.clip(contact, -b, b)
    face = jnp.asarray(face) % 4
    ps = jnp.stack([
        jnp.stack([-b * jnp.ones_like(s), s], -1),
        jnp.stack([s, b * jnp.ones_like(s)], -1),
        jnp.stack([b * jnp.ones_like(s), s], -1),
        jnp.stack([s, -b * jnp.ones_like(s)], -1),
    ])
    ds = jnp.asarray([[1.0, 0.0], [0.0, -1.0], [-1.0, 0.0], [0.0, 1.0]])
    ts = jnp.asarray([[0.0, 1.0], [1.0, 0.0], [0.0, -1.0], [-1.0, 0.0]])
    return ps[face], ds[face], ts[face]


def pusher_twist(params: PusherSliderParams, face, contact, push_speed,
                 tangent_speed):
    """Body twist [vx, vy, ω] + contact mode for one command — the
    limit-surface solve (pusher_slider.rs:172-:230), fully branch-free."""
    c2 = params.char_len ** 2
    p, d, t = contact_frame(face, contact, params.half_extent)
    px, py = p[..., 0], p[..., 1]
    vn = jnp.maximum(push_speed, 0.0)
    vt = tangent_speed

    wx = vn * d[..., 0] + vt * t[..., 0]
    wy = vn * d[..., 1] + vt * t[..., 1]
    m11 = (c2 + py * py) / c2
    m12 = -(px * py) / c2
    m22 = (c2 + px * px) / c2
    det = m11 * m22 - m12 * m12
    safe = jnp.abs(det) > 1e-15
    fx = jnp.where(safe, (m22 * wx - m12 * wy) / jnp.where(safe, det, 1.0), wx)
    fy = jnp.where(safe, (-m12 * wx + m11 * wy) / jnp.where(safe, det, 1.0), wy)

    fn_ = fx * d[..., 0] + fy * d[..., 1]
    ft = fx * t[..., 0] + fy * t[..., 1]
    mu = params.pusher_friction

    # stick branch
    omega_stick = (px * fy - py * fx) / c2
    stick_twist = jnp.stack([fx, fy, omega_stick], -1)

    # slide branch: cone-edge force rescaled to preserve v_n
    sign = jnp.where(ft > 0, 1.0, -1.0)
    fe = jnp.stack([d[..., 0] + sign * mu * t[..., 0],
                    d[..., 1] + sign * mu * t[..., 1]], -1)
    omega1 = (px * fe[..., 1] - py * fe[..., 0]) / c2
    cv = jnp.stack([fe[..., 0] - omega1 * py, fe[..., 1] + omega1 * px], -1)
    proj = cv[..., 0] * d[..., 0] + cv[..., 1] * d[..., 1]
    k = jnp.where(jnp.abs(proj) > 1e-12, vn / jnp.where(
        jnp.abs(proj) > 1e-12, proj, 1.0), vn)
    k = jnp.maximum(k, 0.0)
    slide_twist = k[..., None] * jnp.concatenate(
        [fe, omega1[..., None]], -1
    )

    sticks = jnp.abs(ft) <= mu * fn_ + 1e-12
    separated = (vn <= 1e-12) | (fn_ <= 0.0)
    twist = jnp.where(sticks[..., None], stick_twist, slide_twist)
    twist = jnp.where(separated[..., None], jnp.zeros_like(twist), twist)
    mode = jnp.where(
        separated, MODE_SEPARATED,
        jnp.where(sticks, MODE_STICK,
                  jnp.where(sign > 0, MODE_SLIDE_UP, MODE_SLIDE_DOWN)),
    )
    return twist, mode


def pusher_step(params: PusherSliderParams, pose, face, contact, push_speed,
                tangent_speed, dt):
    """Advance the slider one quasi-static step (pusher_slider.rs:234)."""
    twist, mode = pusher_twist(params, face, contact, push_speed,
                               tangent_speed)
    th = pose[..., 2]
    c, s = jnp.cos(th), jnp.sin(th)
    vx = c * twist[..., 0] - s * twist[..., 1]
    vy = s * twist[..., 0] + c * twist[..., 1]
    new = jnp.stack([pose[..., 0] + vx * dt, pose[..., 1] + vy * dt,
                     th + twist[..., 2] * dt], -1)
    return new, mode


# ---------------------------------------------------------------------------
# two simultaneous contacts (pusher_slider.rs:275)


def two_contact_twist(params: PusherSliderParams, faces, contacts,
                      push_speeds, tangent_speeds):
    """Contact-implicit two-contact solve: enumerate per-contact
    {stick, slide+, slide−} modes (9 combinations), solve the padded 4×4
    force system, keep the highest-priority valid combination (both-stick
    first). Returns (twist [3], modes [2], valid)."""
    c2 = params.char_len ** 2
    mu = params.pusher_friction
    frames = [contact_frame(faces[i], contacts[i], params.half_extent)
              for i in range(2)]
    p = jnp.stack([f[0] for f in frames])  # [2, 2]
    d = jnp.stack([f[1] for f in frames])
    t = jnp.stack([f[2] for f in frames])
    vn = jnp.maximum(jnp.asarray(push_speeds), 0.0)
    vt = jnp.asarray(tangent_speeds)

    # body twist from forces: v = Σf_i ; ω = Σ (p_i × f_i)/c²
    # contact velocity: u_i = v + ω × p_i = (vx − ω p_iy, vy + ω p_ix)
    def solve_combo(m0, m1):
        """m ∈ {0 stick, +1 slide+, −1 slide−} per contact."""
        modes = (m0, m1)
        # unknown layout z[4]: stick contact i uses 2 slots, slide uses 1,
        # assignment order: contact 0 then contact 1; pad with zeros.
        cols = []  # each col: (force basis [2], contact idx)
        for i, m in enumerate(modes):
            if m == 0:
                cols.append((jnp.array([1.0, 0.0]), i))
                cols.append((jnp.array([0.0, 1.0]), i))
            else:
                e = d[i] + m * mu * t[i]
                cols.append((e, i))
        nz = len(cols)

        def force_of(z):
            f = jnp.zeros((2, 2))
            for k, (basis, i) in enumerate(cols):
                f = f.at[i].add(z[k] * basis)
            return f

        def twist_of(f):
            v = f[0] + f[1]
            om = (p[0, 0] * f[0, 1] - p[0, 1] * f[0, 0]
                  + p[1, 0] * f[1, 1] - p[1, 1] * f[1, 0]) / c2
            return v, om

        def contact_vel(v, om, i):
            return jnp.array([v[0] - om * p[i, 1], v[1] + om * p[i, 0]])

        # equations: per contact normal match; stick adds tangential match
        rows = []
        rhs = []
        for i in range(2):
            rows.append(("n", i))
            rhs.append(vn[i])
        for i in range(2):
            if modes[i] == 0:
                rows.append(("t", i))
                rhs.append(vt[i])
        ne = len(rows)

        a = np.zeros((4, 4))
        b = np.zeros(4)
        amat = jnp.zeros((4, 4))
        bvec = jnp.zeros(4)
        del a, b
        for r, (kind, i) in enumerate(rows):
            axis = d[i] if kind == "n" else t[i]
            for k in range(nz):
                basis, j = cols[k]
                # effect of unit z_k on contact i velocity
                f = jnp.zeros((2, 2)).at[j].set(basis)
                v, om = twist_of(f)
                u = contact_vel(v, om, i)
                amat = amat.at[r, k].set(u @ axis)
            bvec = bvec.at[r].set(rhs[r])
        # pad: force unused unknowns/equations to z=0 via identity
        for k in range(max(ne, nz), 4):
            amat = amat.at[k, k].set(1.0)
        # regularization must sit above machine epsilon for the active
        # dtype: 1e-12 is fine under x64 but vanishes in f32, where a
        # near-singular mode combo then solves to garbage
        eps = 1e-12 if amat.dtype == jnp.float64 else 1e-4
        z = jnp.linalg.solve(amat + eps * jnp.eye(4, dtype=amat.dtype),
                             bvec)
        f = force_of(z)
        v, om = twist_of(f)

        # validity
        valid = jnp.asarray(True)
        for i, m in enumerate(modes):
            fn_i = f[i] @ d[i]
            ft_i = f[i] @ t[i]
            valid &= fn_i >= -1e-9
            if m == 0:
                valid &= jnp.abs(ft_i) <= mu * fn_i + 1e-9
            else:
                u = contact_vel(v, om, i)
                slip = vt[i] - u @ t[i]  # pusher tangential minus body
                valid &= m * slip >= -1e-9  # friction drags along slip
        return jnp.concatenate([v, jnp.array([om])]), valid

    combos = [(0, 0), (0, 1), (0, -1), (1, 0), (-1, 0), (1, 1), (1, -1),
              (-1, 1), (-1, -1)]
    twists, valids = [], []
    for m0, m1 in combos:
        tw, ok = solve_combo(m0, m1)
        twists.append(tw)
        valids.append(ok)
    twists = jnp.stack(twists)
    valids = jnp.stack(valids)
    pick = jnp.argmax(valids)  # first valid in priority order
    any_valid = jnp.any(valids)
    twist = jnp.where(any_valid, twists[pick], jnp.zeros(3))
    mode_codes = jnp.asarray([[m0, m1] for m0, m1 in combos])
    return twist, jnp.where(any_valid, mode_codes[pick],
                            jnp.zeros(2, jnp.int32)), any_valid


def two_contact_step(params, pose, faces, contacts, push_speeds,
                     tangent_speeds, dt):
    twist, modes, valid = two_contact_twist(params, faces, contacts,
                                            push_speeds, tangent_speeds)
    th = pose[..., 2]
    c, s = jnp.cos(th), jnp.sin(th)
    vx = c * twist[0] - s * twist[1]
    vy = s * twist[0] + c * twist[1]
    return jnp.stack([pose[0] + vx * dt, pose[1] + vy * dt,
                      th + twist[2] * dt]), modes, valid


# ---------------------------------------------------------------------------
# per-face MPPI controller (pusher_slider.rs:475-:860)


@dataclasses.dataclass(frozen=True)
class PusherMppiConfig:
    horizon: int = 20
    num_samples: int = 128
    temperature: float = 0.3
    dt: float = 0.1
    push_speed_max: float = 0.6
    tangent_speed_max: float = 0.4
    pos_weight: float = 10.0
    theta_weight: float = 2.0
    control_weight: float = 0.05
    obstacle_weight: float = 50.0
    obstacle_radius: float = 0.8


def pusher_mppi_plan(key, params: PusherSliderParams, pose, goal,
                     cfg: PusherMppiConfig = PusherMppiConfig(),
                     obstacles=None):
    """MPPI per face; returns (best_face, first_command [3], per-face
    costs). Control = (contact offset, push speed, tangent speed)."""
    f = jnp.result_type(float)
    pose = jnp.asarray(pose, f)
    goal = jnp.asarray(goal, f)
    obs = (jnp.asarray(obstacles, f) if obstacles is not None
           else jnp.full((1, 2), 1e6, f))
    b = params.half_extent

    mcfg = MPPIConfig(
        horizon=cfg.horizon, num_samples=cfg.num_samples,
        temperature=cfg.temperature,
        noise_sigma=(0.3 * b, 0.2, 0.15),
        control_min=(-b, 0.0, -cfg.tangent_speed_max),
        control_max=(b, cfg.push_speed_max, cfg.tangent_speed_max),
        dt=cfg.dt,
    )

    def run_face(face, k):
        def dyn(state, u, dt):
            new, _ = pusher_step(params, state, face, u[..., 0], u[..., 1],
                                 u[..., 2], dt)
            return new

        def stage(state, u):
            e = state[..., :2] - goal[:2]
            dth = jnp.arctan2(jnp.sin(state[..., 2] - goal[2]),
                              jnp.cos(state[..., 2] - goal[2]))
            od = jnp.linalg.norm(
                state[..., None, :2] - obs[None, :, :], axis=-1
            ) if state.ndim > 1 else jnp.linalg.norm(
                state[None, :2] - obs, axis=-1
            )
            pen = jnp.sum(
                jnp.maximum(cfg.obstacle_radius - od, 0.0) ** 2, axis=-1
            )
            return (cfg.pos_weight * jnp.sum(e * e, -1)
                    + cfg.theta_weight * dth * dth
                    + cfg.control_weight * jnp.sum(u * u, -1)
                    + cfg.obstacle_weight * pen)

        def terminal(state):
            e = state[..., :2] - goal[:2]
            dth = jnp.arctan2(jnp.sin(state[..., 2] - goal[2]),
                              jnp.cos(state[..., 2] - goal[2]))
            return 5.0 * (cfg.pos_weight * jnp.sum(e * e, -1)
                          + cfg.theta_weight * dth * dth)

        u0 = jnp.zeros((cfg.horizon, 3), f).at[:, 1].set(
            0.5 * cfg.push_speed_max
        )
        _, first, diag = mppi_plan(k, dyn, stage, terminal, pose, u0, mcfg)
        return first, diag.best_cost

    keys = jax.random.split(key, 4)
    firsts, costs = jax.vmap(run_face)(jnp.arange(4), keys)
    best = jnp.argmin(costs)
    return best, firsts[best], costs


def simulate_push(key, params: PusherSliderParams, start, goal,
                  steps: int = 80, cfg: PusherMppiConfig = PusherMppiConfig(),
                  obstacles=None, goal_tol: float = 0.08):
    """Closed-loop push to a goal pose (simulate_push, :794). Returns
    PushReport dict(trajectory [T+1, 3], faces [T], modes [T],
    final_position_error, final_heading_error, reached, steps_used)."""
    pose = jnp.asarray(start, float)
    traj = [np.asarray(pose)]
    faces, modes = [], []
    keys = jax.random.split(key, steps)
    used = steps
    for i in range(steps):
        face, cmd, _ = pusher_mppi_plan(keys[i], params, pose, goal, cfg,
                                        obstacles)
        pose, mode = pusher_step(params, pose, face, cmd[0], cmd[1], cmd[2],
                                 cfg.dt)
        traj.append(np.asarray(pose))
        faces.append(int(face))
        modes.append(int(mode))
        perr = float(jnp.linalg.norm(pose[:2] - jnp.asarray(goal)[:2]))
        herr = float(jnp.abs(jnp.arctan2(
            jnp.sin(pose[2] - goal[2]), jnp.cos(pose[2] - goal[2]))))
        if perr < goal_tol and herr < 0.3:
            used = i + 1
            break
    g = np.asarray(goal, float)
    last = traj[-1]
    return {
        "trajectory": np.stack(traj),
        "faces": np.asarray(faces),
        "modes": np.asarray(modes),
        "final_position_error": float(np.hypot(*(last[:2] - g[:2]))),
        "final_heading_error": float(abs(np.arctan2(
            np.sin(last[2] - g[2]), np.cos(last[2] - g[2])))),
        "reached": used < steps,
        "steps_used": used,
    }
