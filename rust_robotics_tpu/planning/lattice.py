"""Model-predictive trajectory generation + state-lattice planning +
clothoid paths.

Reference (crates/rust_robotics_planning/src/):
model_predictive_trajectory_generator.rs (566: optimize arc-length +
curvature-polynomial parameters so the integrated pose hits a target),
state_lattice/ (motion_model 754 + trajectory_generator + planner 1,073 +
lookup_table.csv: precomputed parameter seeds over a target-pose grid),
clothoid_path.rs (634: linear-curvature segments — the km-only special
case of the same generator).

TPU-native: pose integration is a `lax.scan`; the boundary-value solve is
Gauss-Newton with jax.jacobian through the integrator (the reference
finite-differences it); lookup-table generation vmaps the solver over the
whole target grid at once.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from rust_robotics_tpu.core.angles import normalize_angle

N_INTEGRATE = 60  # integration samples per trajectory


def integrate_curvature_poly(params, k0, num=N_INTEGRATE):
    """params = [s, km, kf]: arc length + mid/final curvature of a quadratic
    curvature profile k(t) through (k0, km, kf) at t = 0, s/2, s. Returns
    poses [num, 3] from the origin (model_predictive_trajectory_generator.rs
    motion model)."""
    s, km, kf = params[0], params[1], params[2]
    ds = s / num
    t = (jnp.arange(num) + 0.5) * ds
    # quadratic through (0, k0), (s/2, km), (s, kf)
    a = k0
    b = (4.0 * km - 3.0 * k0 - kf) / jnp.clip(s, 1e-9, None)
    c = 2.0 * (k0 + kf - 2.0 * km) / jnp.clip(s * s, 1e-9, None)
    k = a + b * t + c * t * t

    def step(carry, kk):
        x, y, yaw = carry
        yaw_new = yaw + kk * ds
        x = x + ds * jnp.cos(yaw_new)
        y = y + ds * jnp.sin(yaw_new)
        return (x, y, yaw_new), jnp.stack([x, y, yaw_new])

    (_, _, _), poses = jax.lax.scan(
        step, (jnp.zeros(()), jnp.zeros(()), jnp.zeros(())), k
    )
    return poses


def optimize_trajectory(target_pose, k0=0.0, init_params=None,
                        iterations: int = 30, damping: float = 1e-6):
    """Solve the boundary-value problem: find [s, km, kf] whose integrated
    endpoint hits target_pose [x, y, yaw] (GN with autodiff Jacobians).
    Returns (params, endpoint_error_norm)."""
    target = jnp.asarray(target_pose)
    if init_params is None:
        d = jnp.hypot(target[0], target[1])
        init_params = jnp.stack([d * 1.2 + 1e-3, target[2] * 0.5, target[2] * 0.5])

    def endpoint(p):
        e = integrate_curvature_poly(p, k0)[-1]
        return e

    def err(p):
        e = endpoint(p) - target
        return e.at[2].set(normalize_angle(e[2]))

    jac = jax.jacobian(err)

    def body(_, p):
        e = err(p)
        j = jac(p)
        h = j.T @ j + damping * jnp.eye(3, dtype=p.dtype)
        delta = -jnp.linalg.solve(h, j.T @ e)
        p_new = p + delta
        return p_new.at[0].set(jnp.clip(p_new[0], 0.1, None))

    p = jax.lax.fori_loop(0, iterations, body, init_params)
    return p, jnp.linalg.norm(err(p))


def generate_lookup_table(target_xs, target_ys, target_yaws, k0=0.0):
    """vmapped boundary-value solves over the target grid
    (state_lattice/lookup_table.csv generation). Returns (params [T, 3],
    errors [T], targets [T, 3])."""
    tx, ty, tyaw = jnp.meshgrid(
        jnp.asarray(target_xs), jnp.asarray(target_ys), jnp.asarray(target_yaws),
        indexing="ij",
    )
    targets = jnp.stack([tx.ravel(), ty.ravel(), tyaw.ravel()], axis=-1)
    params, errs = jax.vmap(lambda t: optimize_trajectory(t, k0))(targets)
    return params, errs, targets


def state_lattice_plan(goal_pose, obstacles, radii, k0=0.0,
                       n_lateral: int = 9, lateral_spread: float = 3.0,
                       n_yaw: int = 5, yaw_spread: float = 0.6):
    """Sample terminal states around the goal, solve all boundary-value
    problems, collision-check every trajectory, return the best
    (state_lattice/planner.rs shape). Returns (poses [num, 3], params,
    cost)."""
    g = jnp.asarray(goal_pose)
    lat = jnp.linspace(-lateral_spread, lateral_spread, n_lateral)
    yaws = g[2] + jnp.linspace(-yaw_spread, yaw_spread, n_yaw)
    nrm = jnp.stack([-jnp.sin(g[2]), jnp.cos(g[2])])
    ll, yy = jnp.meshgrid(lat, yaws, indexing="ij")
    targets = jnp.stack(
        [
            g[0] + ll.ravel() * nrm[0],
            g[1] + ll.ravel() * nrm[1],
            yy.ravel(),
        ],
        axis=-1,
    )

    def one(t):
        p, e = optimize_trajectory(t, k0)
        poses = integrate_curvature_poly(p, k0)
        d = jnp.linalg.norm(
            poses[:, None, :2] - obstacles[None, :, :], axis=-1
        )
        collides = jnp.any(d <= radii)
        goal_dev = jnp.linalg.norm(t[:2] - g[:2])
        cost = jnp.where(
            collides | (e > 0.1), jnp.inf, p[0] + 2.0 * goal_dev
        )
        return cost, p, poses

    costs, params, trajs = jax.vmap(one)(targets)
    best = jnp.argmin(costs)
    return trajs[best], params[best], costs[best]


def clothoid_path(target_pose, iterations: int = 60):
    """G1 clothoid fit (clothoid_path.rs): ONE linear-curvature segment
    k(t) = k0 + c·t reaching [x, y, yaw] from the origin — unknowns
    [s, k0, kf] (initial curvature free, as in the reference's G1 solve).
    Returns (poses [num, 3], params [s, k0, kf], error)."""
    target = jnp.asarray(target_pose)

    def integrate(p3):
        s, k_start, kf = p3[0], p3[1], p3[2]
        km = 0.5 * (k_start + kf)  # exact midpoint of a linear profile
        return integrate_curvature_poly(jnp.stack([s, km, kf]), k_start)

    def err(p3):
        e = integrate(p3)[-1] - target
        return e.at[2].set(normalize_angle(e[2]))

    jac = jax.jacobian(err)
    d = jnp.hypot(target[0], target[1])
    p = jnp.stack([d * 1.2 + 1e-3, target[2] * 0.5, target[2] * 0.5])

    def body(_, p3):
        e = err(p3)
        j = jac(p3)  # [3, 3]
        h = j.T @ j + 1e-9 * jnp.eye(3, dtype=p3.dtype)
        delta = -jnp.linalg.solve(h, j.T @ e)
        p_new = p3 + delta
        return p_new.at[0].set(jnp.clip(p_new[0], 0.1, None))

    p = jax.lax.fori_loop(0, iterations, body, p)
    return integrate(p), p, jnp.linalg.norm(err(p))
