"""Rigid-body planning with MIP-style disjunctive separation certificates.

Reference: crates/rust_robotics_planning/src/rigid_body_mip.rs — a
deterministic SE(2)-lattice planner (position_step × heading_count grid,
translate/turn moves with integer move_cost/turn_cost) where every accepted
pose carries the binary disjunctive certificate of convex-obstacle MILP
formulations: for each obstacle, ONE active half-space (from the obstacle's
CCW edges, a·x + b·y ≤ c containing the interior) separates the whole robot
rectangle with margin > clearance (min signed violation over the 4 rotated
vertices, :357-:430); segment feasibility checks the swept rectangle at
α ∈ {0, ½, 1} (:382). A sampling RRT backend reports the same comparable
outcome metrics (path length, heading change, iterations, min separation
margin, :217-:243).

TPU-native shape: pose feasibility and certificates for the ENTIRE
(heading × x × y) lattice evaluate as one batched tensor program
([H, NX, NY, 4 vertices] × [obstacles × halfspaces] margins); the search is
min-plus wavefront relaxation over the 3D raster (translate shifts +
heading-axis rotations), exactly the hybrid-A* machinery. The certificates
the reference computes per heap pop become two fused einsum-shaped ops.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "RigidBodyConfig",
    "convex_polygon_halfspaces",
    "aabb_obstacle",
    "robot_vertices",
    "separation_margins",
    "pose_certificates",
    "lattice_feasibility",
    "rigid_body_lattice_plan",
    "rigid_body_rrt_plan",
]

BIG = 1e18


@dataclasses.dataclass(frozen=True)
class RigidBodyConfig:
    """RigidBodyMipConfig2D (rigid_body_mip.rs:159)."""

    min_x: float = 0.0
    max_x: float = 10.0
    min_y: float = 0.0
    max_y: float = 10.0
    position_step: float = 0.5
    heading_count: int = 8
    robot_half_length: float = 0.55
    robot_half_width: float = 0.25
    clearance: float = 0.02
    move_cost: float = 10.0
    turn_cost: float = 3.0


def convex_polygon_halfspaces(vertices):
    """CCW polygon → edge half-spaces a·x + b·y ≤ c containing the interior
    (rigid_body_mip.rs:76-118). Returns [E, 3] rows (a, b, c)."""
    v = np.asarray(vertices, float)
    area = 0.5 * np.sum(v[:, 0] * np.roll(v[:, 1], -1)
                        - np.roll(v[:, 0], -1) * v[:, 1])
    if area < 0:
        v = v[::-1]
    nxt = np.roll(v, -1, axis=0)
    d = nxt - v
    # (dy, -dx, dy·x0 − dx·y0): interior (left of CCW edge) satisfies ≤ c
    return jnp.asarray(
        np.stack([d[:, 1], -d[:, 0], d[:, 1] * v[:, 0] - d[:, 0] * v[:, 1]],
                 axis=1)
    )


def aabb_obstacle(min_x, max_x, min_y, max_y):
    return convex_polygon_halfspaces(
        [(min_x, min_y), (max_x, min_y), (max_x, max_y), (min_x, max_y)]
    )


def _stack_obstacles(obstacles):
    """Pad ragged half-space lists to [O, E_max, 3] + validity mask."""
    e_max = max(o.shape[0] for o in obstacles)
    hs = jnp.stack([
        jnp.concatenate([o, jnp.zeros((e_max - o.shape[0], 3), o.dtype)])
        for o in obstacles
    ])
    valid = jnp.stack([
        jnp.arange(e_max) < o.shape[0] for o in obstacles
    ])
    return hs, valid


def robot_vertices(pose, half_length, half_width):
    """4 rotated rectangle corners [..., 4, 2] (rigid_body_mip.rs:357)."""
    pose = jnp.asarray(pose)
    c, s = jnp.cos(pose[..., 2]), jnp.sin(pose[..., 2])
    local = jnp.array([
        (half_length, half_width), (half_length, -half_width),
        (-half_length, -half_width), (-half_length, half_width),
    ])
    x = pose[..., None, 0] + c[..., None] * local[:, 0] - s[..., None] * local[:, 1]
    y = pose[..., None, 1] + s[..., None] * local[:, 0] + c[..., None] * local[:, 1]
    return jnp.stack([x, y], axis=-1)


def separation_margins(vertices, halfspaces, valid):
    """[..., O, E] margins: min over vertices of a·x + b·y − c (positive ⇒
    all vertices outside that half-space). Invalid edge slots → −inf."""
    v = vertices  # [..., V, 2]
    # margins[..., o, e] = min_v (a_oe·x_v + b_oe·y_v − c_oe)
    proj = (jnp.einsum("...vc,oec->...oev", v, halfspaces[:, :, :2])
            - halfspaces[:, :, 2][..., None])
    m = jnp.min(proj, axis=-1)
    return jnp.where(valid, m, -jnp.inf)


def pose_certificates(pose, obstacles_hs, valid, cfg: RigidBodyConfig):
    """Per-obstacle best separating half-space (index, margin) for a pose;
    feasible iff every obstacle has margin > clearance and the rectangle is
    in bounds. Returns (feasible, halfspace_idx [O], margins [O])."""
    v = robot_vertices(pose, cfg.robot_half_length, cfg.robot_half_width)
    inb = jnp.all(
        (v[..., 0] >= cfg.min_x) & (v[..., 0] <= cfg.max_x)
        & (v[..., 1] >= cfg.min_y) & (v[..., 1] <= cfg.max_y), axis=-1
    )
    m = separation_margins(v, obstacles_hs, valid)  # [..., O, E]
    best = jnp.argmax(m, axis=-1)
    margin = jnp.max(m, axis=-1)
    feasible = inb & jnp.all(margin > cfg.clearance, axis=-1)
    return feasible, best, margin


@functools.partial(jax.jit, static_argnames=("cfg", "nx", "ny"))
def lattice_feasibility(obstacles_hs, valid, cfg: RigidBodyConfig, nx: int,
                        ny: int):
    """Feasibility + certificates for the whole [H, NX, NY] lattice in one
    batched program."""
    hs = cfg.heading_count
    th = jnp.arange(hs) * (2.0 * jnp.pi / hs)
    xs = cfg.min_x + jnp.arange(nx) * cfg.position_step
    ys = cfg.min_y + jnp.arange(ny) * cfg.position_step
    poses = jnp.stack(jnp.meshgrid(th, xs, ys, indexing="ij"), axis=-1)
    poses = poses[..., [1, 2, 0]]  # (x, y, theta)
    feasible, best, margin = pose_certificates(poses, obstacles_hs, valid,
                                               cfg)
    return poses, feasible, best, margin


def _relax_se2(free, move_cost, turn_cost, goals, max_iters=None):
    """Min-plus relaxation over [H, NX, NY]: 8 translations at fixed
    heading + ±1 heading turns (wrapping)."""
    f = jnp.result_type(float)
    big = jnp.asarray(jnp.finfo(f).max / 4, f)
    d0 = jnp.where(goals & free, jnp.zeros((), f), big)
    h, nx, ny = free.shape
    if max_iters is None:
        max_iters = 4 * (nx + ny + h)
    moves = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)
             if (dx, dy) != (0, 0)]

    def shift(a, dx, dy, fill):
        p = jnp.pad(a, ((0, 0), (1, 1), (1, 1)), constant_values=fill)
        return p[:, 1 + dx: 1 + dx + nx, 1 + dy: 1 + dy + ny]

    def sweep(d):
        best = d
        for dx, dy in moves:
            cand = shift(d, dx, dy, big) + move_cost
            best = jnp.minimum(best, jnp.where(free, cand, big))
        for r in (1, -1):
            cand = jnp.roll(d, r, axis=0) + turn_cost
            best = jnp.minimum(best, jnp.where(free, cand, big))
        return best

    def body(carry):
        d, _, it = carry
        new = d
        for _ in range(4):
            new = sweep(new)
        return new, jnp.any(new < d), it + 4

    def cond(carry):
        _, changed, it = carry
        return changed & (it < max_iters)

    d, _, _ = jax.lax.while_loop(cond, body, (d0, jnp.asarray(True), 0))
    return jnp.where(d >= big, jnp.inf, d)


def rigid_body_lattice_plan(start, goal, obstacles, cfg: RigidBodyConfig =
                            RigidBodyConfig(),
                            require_goal_heading: bool = True):
    """Deterministic lattice backend (RigidBodyMipPlanner2D::plan):
    min-cost translate/turn path where every pose carries a separation
    certificate. Returns dict(poses [K, 3], certificates (halfspace idx
    [K, O], margins [K, O]), total_cost, path_length, heading_change,
    min_separation_margin, feasible_states)."""
    obstacles_hs, valid = _stack_obstacles(
        [jnp.asarray(o) for o in obstacles]
    )
    nx = int(round((cfg.max_x - cfg.min_x) / cfg.position_step)) + 1
    ny = int(round((cfg.max_y - cfg.min_y) / cfg.position_step)) + 1
    poses, feasible, best_hs, margins = lattice_feasibility(
        obstacles_hs, valid, cfg, nx, ny
    )
    h = cfg.heading_count

    def snap(p):
        ih = int(round((p[2] % (2 * np.pi)) / (2 * np.pi / h))) % h
        ix = int(round((p[0] - cfg.min_x) / cfg.position_step))
        iy = int(round((p[1] - cfg.min_y) / cfg.position_step))
        return ih, ix, iy

    s = snap(np.asarray(start, float))
    g = snap(np.asarray(goal, float))
    goals = jnp.zeros((h, nx, ny), bool)
    if require_goal_heading:
        goals = goals.at[g[0], g[1], g[2]].set(True)
    else:
        goals = goals.at[:, g[1], g[2]].set(True)
    costs = _relax_se2(feasible, cfg.move_cost, cfg.turn_cost, goals)
    if not bool(jnp.isfinite(costs[s[0], s[1], s[2]])):
        return None

    # greedy descent over the SE(2) raster
    d = np.asarray(costs)
    cur = s
    path = [cur]
    for _ in range(d.size):
        if d[cur] <= 0:
            break
        cands = []
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                if (dx, dy) == (0, 0):
                    continue
                q = (cur[0], cur[1] + dx, cur[2] + dy)
                if 0 <= q[1] < nx and 0 <= q[2] < ny:
                    cands.append((d[q] + cfg.move_cost, q))
        for r in (1, -1):
            q = ((cur[0] + r) % h, cur[1], cur[2])
            cands.append((d[q] + cfg.turn_cost, q))
        val, q = min(cands, key=lambda z: z[0])
        if d[q] >= d[cur]:
            break
        cur = q
        path.append(cur)
    idx = np.asarray(path)
    pose_path = np.asarray(poses)[idx[:, 0], idx[:, 1], idx[:, 2]]
    cert_hs = np.asarray(best_hs)[idx[:, 0], idx[:, 1], idx[:, 2]]
    cert_m = np.asarray(margins)[idx[:, 0], idx[:, 1], idx[:, 2]]
    dxy = np.diff(pose_path[:, :2], axis=0)
    dth = np.diff(np.unwrap(pose_path[:, 2]))
    return {
        "backend": "lattice",
        "poses": pose_path,
        "certificate_halfspaces": cert_hs,
        "certificate_margins": cert_m,
        "total_cost": float(d[s]),
        "path_length": float(np.linalg.norm(dxy, axis=1).sum()),
        "heading_change": float(np.abs(dth).sum()),
        "iterations": int(np.asarray(feasible).sum()),
        "min_separation_margin": float(cert_m.min()),
    }


def rigid_body_rrt_plan(key, start, goal, obstacles,
                        cfg: RigidBodyConfig = RigidBodyConfig(),
                        max_nodes: int = 256, expand: float = 0.8):
    """Sampling backend (RigidBodyRrtBackend2D): SE(2) RRT whose edges are
    validated by swept-rectangle certificates at α ∈ {0, ½, 1}
    (rigid_body_mip.rs:382). Same outcome metrics as the lattice backend."""
    obstacles_hs, valid = _stack_obstacles(
        [jnp.asarray(o) for o in obstacles]
    )

    def feasible_pose(p):
        ok, _, _ = pose_certificates(jnp.asarray(p), obstacles_hs, valid, cfg)
        return bool(ok)

    def feasible_segment(a, b):
        mid = 0.5 * (np.asarray(a) + np.asarray(b))
        return all(feasible_pose(p) for p in (a, mid, b))

    # 2**31 overflows int32 maxval when x64 is disabled
    rng = np.random.default_rng(
        int(jax.random.randint(key, (), 0, 2**31 - 1)))
    nodes = [np.asarray(start, float)]
    parents = [-1]
    goal = np.asarray(goal, float)
    it = 0
    for it in range(max_nodes):
        sample = goal if rng.uniform() < 0.1 else np.array([
            rng.uniform(cfg.min_x, cfg.max_x),
            rng.uniform(cfg.min_y, cfg.max_y),
            rng.uniform(-np.pi, np.pi),
        ])
        dists = [np.linalg.norm(n[:2] - sample[:2]) for n in nodes]
        ni = int(np.argmin(dists))
        direction = sample - nodes[ni]
        dist = max(np.linalg.norm(direction[:2]), 1e-9)
        step = min(dist, expand)
        new = nodes[ni] + direction * (step / dist)
        if feasible_segment(nodes[ni], new):
            nodes.append(new)
            parents.append(ni)
            if np.linalg.norm(new[:2] - goal[:2]) < expand and \
                    feasible_segment(new, goal):
                nodes.append(goal)
                parents.append(len(nodes) - 2)
                break
    else:
        return None
    # walk back
    path = []
    cur = len(nodes) - 1
    while cur >= 0:
        path.append(nodes[cur])
        cur = parents[cur]
    pose_path = np.asarray(path[::-1])
    _, _, margins = pose_certificates(jnp.asarray(pose_path), obstacles_hs,
                                      valid, cfg)
    m = np.asarray(jnp.max(margins, axis=-1))
    dxy = np.diff(pose_path[:, :2], axis=0)
    dth = np.diff(np.unwrap(pose_path[:, 2]))
    return {
        "backend": "rrt",
        "poses": pose_path,
        "path_length": float(np.linalg.norm(dxy, axis=1).sum()),
        "heading_change": float(np.abs(dth).sum()),
        "iterations": it + 1,
        "min_separation_margin": float(m.min()),
    }
