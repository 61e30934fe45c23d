"""Arm control: planar n-joint kinematics, resolved-rate IK, obstacle-aware
joint-space navigation.

Reference (crates/rust_robotics_control/src/): two_joint_arm_control.rs
(362: analytic 2-link IK + tracking), n_joint_arm_control.rs (405: Jacobian
resolved-rate IK), n_joint_arm_3d.rs (266), arm_obstacle_navigation.rs
(569: joint-space planning around circle obstacles),
rrt_star_seven_joint_arm.rs (468).

TPU-native: FK is a cumulative-angle scan; the Jacobian comes from
jax.jacobian of FK (the reference hand-derives it); IK iterations and
joint-space wavefronts batch over configurations.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from rust_robotics_tpu.core.angles import normalize_angle

_BIG = 1e18


def forward_kinematics(angles, lengths):
    """Planar chain FK: joint positions [N+1, 2] (n_joint_arm_control.rs)."""
    cum = jnp.cumsum(angles)
    dx = lengths * jnp.cos(cum)
    dy = lengths * jnp.sin(cum)
    pts = jnp.cumsum(jnp.stack([dx, dy], axis=-1), axis=0)
    return jnp.concatenate([jnp.zeros((1, 2), pts.dtype), pts], axis=0)


def end_effector(angles, lengths):
    return forward_kinematics(angles, lengths)[-1]


def two_joint_ik(target, l1, l2, elbow_up=True):
    """Analytic 2-link IK (two_joint_arm_control.rs)."""
    x, y = target[0], target[1]
    d2 = x * x + y * y
    c2 = jnp.clip((d2 - l1 * l1 - l2 * l2) / (2 * l1 * l2), -1.0, 1.0)
    s2 = jnp.sqrt(jnp.clip(1.0 - c2 * c2, 0.0, None))
    s2 = jnp.where(elbow_up, s2, -s2)
    th2 = jnp.arctan2(s2, c2)
    th1 = jnp.arctan2(y, x) - jnp.arctan2(l2 * s2, l1 + l2 * c2)
    return jnp.stack([normalize_angle(th1), normalize_angle(th2)])


def resolved_rate_ik(angles0, target, lengths, iterations: int = 200,
                     gain: float = 0.5, damping: float = 1e-3):
    """Damped-least-squares resolved-rate IK (n_joint_arm_control.rs):
    θ ← θ + Jᵀ(JJᵀ + λI)⁻¹ (gain·e). Jacobian via autodiff."""
    jac_fn = jax.jacobian(lambda a: end_effector(a, lengths))

    def body(_, a):
        e = target - end_effector(a, lengths)
        j = jac_fn(a)  # [2, N]
        jjt = j @ j.T + damping * jnp.eye(2, dtype=a.dtype)
        return a + j.T @ jnp.linalg.solve(jjt, gain * e)

    return jax.lax.fori_loop(0, iterations, body, angles0)


def arm_collides(angles, lengths, obstacles, radii, samples: int = 8):
    """Any link segment intersects any circle obstacle
    (arm_obstacle_navigation.rs collision check)."""
    pts = forward_kinematics(angles, lengths)
    t = jnp.linspace(0.0, 1.0, samples)
    seg = pts[:-1][:, None, :] + t[None, :, None] * (
        pts[1:] - pts[:-1]
    )[:, None, :]  # [N, S, 2]
    d = jnp.linalg.norm(
        seg[:, :, None, :] - obstacles[None, None, :, :], axis=-1
    )
    return jnp.any(d <= radii)


def _rot_z(a):
    c, s = jnp.cos(a), jnp.sin(a)
    z = jnp.zeros_like(a)
    o = jnp.ones_like(a)
    return jnp.stack([
        jnp.stack([c, -s, z]), jnp.stack([s, c, z]), jnp.stack([z, z, o])
    ])


def _rot_y(a):
    c, s = jnp.cos(a), jnp.sin(a)
    z = jnp.zeros_like(a)
    o = jnp.ones_like(a)
    return jnp.stack([
        jnp.stack([c, z, s]), jnp.stack([z, o, z]), jnp.stack([-s, z, c])
    ])


def forward_kinematics_3d(angles, lengths):
    """3D alternating yaw/pitch chain FK → joint positions [N+1, 3]
    (n_joint_arm_3d.rs:65: even joints rotate about Z, odd about Y; each
    link extends along the accumulated local X). One lax.scan of 3x3
    rotation composes; vmappable over configuration batches."""
    n = angles.shape[0]
    is_yaw = (jnp.arange(n) % 2) == 0

    def step(carry, inp):
        rot = carry
        a, yaw, length = inp
        local = jnp.where(yaw, _rot_z(a), _rot_y(a))
        rot = rot @ local
        return rot, rot[:, 0] * length  # local +X column scaled

    _, deltas = jax.lax.scan(
        step, jnp.eye(3, dtype=angles.dtype), (angles, is_yaw, lengths)
    )
    pts = jnp.cumsum(deltas, axis=0)
    return jnp.concatenate([jnp.zeros((1, 3), pts.dtype), pts], axis=0)


def end_effector_3d(angles, lengths):
    """End-effector position (n_joint_arm_3d.rs:90)."""
    return forward_kinematics_3d(angles, lengths)[-1]


def jacobian_3d(angles, lengths):
    """3xN end-effector Jacobian (n_joint_arm_3d.rs:101 uses central finite
    differences; here exact forward-mode AD of the same FK)."""
    return jax.jacfwd(lambda a: end_effector_3d(a, lengths))(angles)


def inverse_kinematics_3d(angles0, target, lengths, iterations: int = 100,
                          damping: float = 0.5):
    """Damped least-squares (LM) IK (n_joint_arm_3d.rs:134):
    dq = Jᵀ (J Jᵀ + λI)⁻¹ e with λ = DAMPING_LAMBDA = 0.5.
    Returns (angles, converged_error_norm)."""

    def body(_, a):
        e = target - end_effector_3d(a, lengths)
        j = jacobian_3d(a, lengths)  # [3, N]
        jjt = j @ j.T + damping * jnp.eye(3, dtype=a.dtype)
        return a + j.T @ jnp.linalg.solve(jjt, e)

    a = jax.lax.fori_loop(0, iterations, body, angles0)
    err = jnp.linalg.norm(target - end_effector_3d(a, lengths))
    return a, err


def _segment_sphere_hit(p0, p1, centers, radii):
    """Exact min distance from sphere centers to segment p0→p1; True where
    the segment intersects a sphere (rrt_star_seven_joint_arm.rs
    segment_sphere_intersects, closed form instead of sampling)."""
    d = p1 - p0  # [3]
    denom = jnp.maximum(jnp.dot(d, d), 1e-12)
    t = jnp.clip(((centers - p0[None, :]) @ d) / denom, 0.0, 1.0)
    near = p0[None, :] + t[:, None] * d[None, :]
    return jnp.any(jnp.linalg.norm(near - centers, axis=-1) <= radii)


def arm_collides_3d(angles, lengths, centers, radii):
    """Any link segment of the 3D arm hits any sphere obstacle
    (rrt_star_seven_joint_arm.rs:config_collision_free)."""
    pts = forward_kinematics_3d(angles, lengths)
    hits = jax.vmap(
        lambda a, b: _segment_sphere_hit(a, b, centers, radii)
    )(pts[:-1], pts[1:])
    return jnp.any(hits)


def _arm_edge_free(a0, a1, lengths, centers, radii, checks: int):
    """Joint-space edge a0→a1 collision-free: interpolate `checks`
    configurations, FK each, test every link vs every sphere
    (rrt_star_seven_joint_arm.rs:collision_free)."""
    t = jnp.linspace(0.0, 1.0, checks)[:, None]
    configs = a0[None, :] + t * (a1 - a0)[None, :]
    col = jax.vmap(lambda q: arm_collides_3d(q, lengths, centers, radii))(configs)
    return ~jnp.any(col)


def rrt_star_arm_plan(key, start, goal, lengths, centers, radii,
                      joint_lo=-jnp.pi, joint_hi=jnp.pi,
                      max_nodes: int = 512, step_size: float = 0.3,
                      goal_bias: float = 0.1, rewire_radius: float = 1.0,
                      edge_checks: int = 10, path_len: int = 64):
    """Joint-space RRT* for an N-DOF (typically 7) arm among sphere
    obstacles (rrt_star_seven_joint_arm.rs:93 `RRTStarArmPlanner::plan`).

    TPU-native inversion (same engine as planning/rrt.py): fixed-capacity
    [max_nodes, D] node array + parents/costs/active mask grown by one
    fori_loop; nearest/near sets are masked reductions over ALL nodes at
    once; each candidate edge FK-checks `edge_checks` interpolated
    configurations against all spheres in one batched kernel. Goal
    connection mirrors the reference: a node within `step_size` of the
    goal (in joint L2) whose final edge is free updates the incumbent.

    Returns dict(waypoints [path_len, D], mask, cost, found).
    """
    d = start.shape[0]
    nodes = jnp.zeros((max_nodes, d), start.dtype).at[0].set(start)
    parents = jnp.full((max_nodes,), -1, jnp.int32)
    costs = jnp.full((max_nodes,), _BIG).at[0].set(0.0)
    active = jnp.zeros((max_nodes,), bool).at[0].set(True)

    start_free = ~arm_collides_3d(start, lengths, centers, radii)
    goal_free = ~arm_collides_3d(goal, lengths, centers, radii)

    def body(i, carry):
        nodes, parents, costs, active, count, key = carry
        key, k1, k2 = jax.random.split(key, 3)
        rand = jax.random.uniform(k1, (d,), start.dtype, joint_lo, joint_hi)
        sample = jnp.where(jax.random.uniform(k2) < goal_bias, goal, rand)

        dist = jnp.linalg.norm(nodes - sample[None, :], axis=-1)
        dist = jnp.where(active, dist, _BIG)
        ni = jnp.argmin(dist)
        dn = dist[ni]
        ratio = jnp.minimum(1.0, step_size / jnp.maximum(dn, 1e-9))
        new = nodes[ni] + ratio * (sample - nodes[ni])

        free = _arm_edge_free(nodes[ni], new, lengths, centers, radii,
                              edge_checks)

        # choose-parent among near set, then rewire (rrt_star idiom)
        dnew = jnp.linalg.norm(nodes - new[None, :], axis=-1)
        near = active & (dnew < rewire_radius)
        edge_ok = jax.vmap(
            lambda q, m: jnp.where(
                m,
                _arm_edge_free(q, new, lengths, centers, radii, edge_checks),
                False,
            )
        )(nodes, near)
        cand = jnp.where(near & edge_ok, costs + dnew, _BIG)
        base = jnp.where(free, costs[ni] + dnew[ni], _BIG)
        cand = cand.at[ni].min(base)
        parent = jnp.argmin(cand).astype(jnp.int32)
        new_cost = cand[parent]
        ok = new_cost < _BIG / 2

        idx = count
        nodes = nodes.at[idx].set(jnp.where(ok, new, nodes[idx]))
        parents = parents.at[idx].set(jnp.where(ok, parent, parents[idx]))
        costs = costs.at[idx].set(jnp.where(ok, new_cost, costs[idx]))
        active = active.at[idx].set(ok | active[idx])
        count = count + ok.astype(count.dtype)

        # rewire near nodes through the new node
        rew = near & edge_ok & (new_cost + dnew < costs) & ok
        parents = jnp.where(rew, idx, parents)
        costs = jnp.where(rew, new_cost + dnew, costs)
        return nodes, parents, costs, active, count, key

    nodes, parents, costs, active, count, _ = jax.lax.fori_loop(
        0, max_nodes - 2,
        body,
        (nodes, parents, costs, active, jnp.int32(1), key),
    )

    # best goal connection: any active node within step_size with a free edge
    dg = jnp.linalg.norm(nodes - goal[None, :], axis=-1)
    near_goal = active & (dg < step_size)
    goal_edge = jax.vmap(
        lambda q, m: jnp.where(
            m, _arm_edge_free(q, goal, lengths, centers, radii, edge_checks),
            False)
    )(nodes, near_goal)
    total = jnp.where(near_goal & goal_edge, costs + dg, _BIG)
    best = jnp.argmin(total).astype(jnp.int32)
    best_cost = total[best]
    found = (best_cost < _BIG / 2) & start_free & goal_free

    # walk parents from `best`, then append goal
    def step(carry, _):
        idx = carry
        cfg = nodes[jnp.maximum(idx, 0)]
        valid = idx >= 0
        return jnp.where(valid, parents[jnp.maximum(idx, 0)], -1), (cfg, valid)

    _, (rev, rmask) = jax.lax.scan(step, best, None, length=path_len - 1)
    n_valid = jnp.sum(rmask)
    order = jnp.argsort(~rmask, stable=True)  # valid first (tree order reversed)
    rev, rmask = rev[order], rmask[order]
    fwd = jnp.flip(rev, 0)
    fmask = jnp.flip(rmask, 0)
    # shift so path starts at slot 0, goal appended after the last valid
    del fmask
    shift = path_len - 1 - n_valid
    idxs = jnp.clip(jnp.arange(path_len - 1) + shift, 0, path_len - 2)
    waypoints = jnp.concatenate([fwd[idxs], goal[None, :]], axis=0)
    mask = jnp.concatenate(
        [jnp.arange(path_len - 1) < n_valid, jnp.ones((1,), bool)],
        axis=0) & found
    return dict(waypoints=waypoints, mask=mask,
                cost=jnp.where(found, best_cost, jnp.inf), found=found)


def joint_space_plan(start_angles, goal_angles, lengths, obstacles, radii,
                     steps: int = 100):
    """Straight-line joint-space interpolation with collision mask — the
    validity profile feeds higher-level planners (RRT over configurations).
    Returns (configs [steps, N], collision_free [steps])."""
    t = jnp.linspace(0.0, 1.0, steps)[:, None]
    configs = start_angles[None, :] + t * normalize_angle(
        goal_angles - start_angles
    )[None, :]
    free = ~jax.vmap(lambda a: arm_collides(a, lengths, obstacles, radii))(configs)
    return configs, free
