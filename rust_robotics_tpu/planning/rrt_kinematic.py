"""Kinematic-edge RRT variants: Dubins/Reeds-Shepp RRT(*), closed-loop
RRT*, LQR-RRT*.

Reference: crates/rust_robotics_planning/src/ — rrt_dubins.rs /
rrt_star_dubins.rs (tree over SE(2) poses, edges are shortest Dubins
connections), rrt_star_reeds_shepp.rs (Reeds-Shepp edges: both gears),
closed_loop_rrt_star.rs (candidate paths validated by simulating a
pursuit+speed tracking loop and collision-checking the *tracked*
trajectory), lqr_rrt_star.rs (LQR cost-to-go as the distance metric and
LQR rollout as the steer function on a double integrator).

TPU-native shape: same fixed-capacity masked trees as `planning/rrt.py`,
but nodes are poses/states and every candidate edge is an analytically
sampled curve. Choose-parent and rewire evaluate the Dubins/RS closed forms
against ALL tree slots at once (vmap over capacity) — the closed forms are
branch-free (`curves.dubins_path_lengths` evaluates all six words in
parallel), so N candidate connections are one batched kernel, not N heap
pops.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from rust_robotics_tpu.core.types import pytree_dataclass
from rust_robotics_tpu.planning.curves import (
    dubins_path_lengths,
    dubins_shortest_path,
)
from rust_robotics_tpu.planning.reeds_shepp import (
    reeds_shepp_path,
    sample_reeds_shepp,
)

BIG = 1e18

__all__ = [
    "KinematicRRTConfig",
    "PoseTree",
    "rrt_dubins_plan",
    "rrt_star_dubins_plan",
    "rrt_star_reeds_shepp_plan",
    "extract_pose_path",
    "closed_loop_rrt_star_plan",
    "lqr_rrt_star_plan",
]


@dataclasses.dataclass(frozen=True)
class KinematicRRTConfig:
    """rrt_dubins.rs / rrt_star_dubins.rs / rrt_star_reeds_shepp.rs surface."""

    curvature: float = 1.0
    goal_sample_rate: float = 0.1
    max_nodes: int = 128
    connect_radius: float = 4.0  # choose-parent/rewire ball (workspace dist)
    edge_samples: int = 24
    area_min: tuple = (-2.0, -2.0)
    area_max: tuple = (12.0, 12.0)
    goal_xy_threshold: float = 0.7
    goal_yaw_threshold: float = 0.6


@pytree_dataclass
class PoseTree:
    poses: "jax.Array"  # [N, 3] (x, y, yaw)
    parents: "jax.Array"  # [N]
    costs: "jax.Array"  # [N] cost-to-come along kinematic edges
    active: "jax.Array"  # [N] bool
    count: "jax.Array"  # scalar


def _dubins_cost(a, b, curvature):
    """Shortest-Dubins length a→b (branch-free over the 6 words)."""
    lengths = dubins_path_lengths(a, b, curvature)
    return jnp.min(jnp.sum(lengths, axis=-1)) / curvature


def _dubins_edge_free(a, b, curvature, obstacles, radii, samples):
    pts, total, _ = dubins_shortest_path(a, b, curvature, num_points=samples)
    d = jnp.linalg.norm(
        pts[:, None, :2] - obstacles[None, :, :], axis=-1
    )
    return jnp.all(d > radii[None, :]) & jnp.isfinite(total)


def _rs_cost(a, b, curvature):
    _, _, total = reeds_shepp_path(a, b, curvature)
    return total


def _rs_edge_free(a, b, curvature, obstacles, radii, samples):
    segs, steers, total = reeds_shepp_path(a, b, curvature)
    pts = sample_reeds_shepp(a, segs, steers, curvature, num_points=samples)
    d = jnp.linalg.norm(pts[:, None, :2] - obstacles[None, :, :], axis=-1)
    return jnp.all(d > radii[None, :]) & jnp.isfinite(total)


def _norm_angle(x):
    return jnp.arctan2(jnp.sin(x), jnp.cos(x))


def _kinematic_rrt(key, start, goal, obstacles, radii, cfg, cost_fn,
                   edge_free_fn, star):
    """Shared grow loop: nodes are SE(2) poses, edges are kinematic
    connections from parent pose to the sampled pose (the reference grows by
    full Dubins/RS connection to the sample, not by a fixed step)."""
    n = cfg.max_nodes
    f = jnp.result_type(float)
    start = jnp.asarray(start, f)
    goal = jnp.asarray(goal, f)
    lo = jnp.asarray(cfg.area_min, f)
    hi = jnp.asarray(cfg.area_max, f)

    tree = PoseTree(
        poses=jnp.zeros((n, 3), f).at[0].set(start),
        parents=jnp.full((n,), -1, jnp.int32),
        costs=jnp.full((n,), BIG).at[0].set(0.0),
        active=jnp.zeros((n,), bool).at[0].set(True),
        count=jnp.asarray(1),
    )
    keys = jax.random.split(key, n)

    cost_v = jax.vmap(lambda p, q: cost_fn(p, q, cfg.curvature))
    free_v = jax.vmap(
        lambda p, q: edge_free_fn(p, q, cfg.curvature, obstacles, radii,
                                  cfg.edge_samples)
    )

    def body(i, tree):
        k1, k2 = jax.random.split(keys[i])
        u = jax.random.uniform(k1, (4,))
        sample = jnp.where(
            u[0] < cfg.goal_sample_rate,
            goal,
            jnp.concatenate([
                lo + u[1:3] * (hi - lo),
                (u[3] * 2.0 - 1.0)[None] * jnp.pi,
            ]),
        )
        tiled = jnp.broadcast_to(sample, (n, 3))
        if star:
            # choose cheapest feasible parent within the workspace ball
            dxy = jnp.linalg.norm(tree.poses[:, :2] - sample[:2], axis=-1)
            near = tree.active & (dxy <= cfg.connect_radius)
            edge = cost_v(tree.poses, tiled)
            free = free_v(tree.poses, tiled)
            cand = jnp.where(near & free, tree.costs + edge, BIG)
            parent = jnp.argmin(cand)
            new_cost = cand[parent]
            ok = new_cost < BIG / 2
        else:
            # nearest by kinematic cost, connect if collision-free
            edge = jnp.where(tree.active, cost_v(tree.poses, tiled), BIG)
            parent = jnp.argmin(edge)
            ok = edge_free_fn(tree.poses[parent], sample, cfg.curvature,
                              obstacles, radii, cfg.edge_samples)
            new_cost = tree.costs[parent] + edge[parent]
            ok = ok & (new_cost < BIG / 2)

        idx = tree.count
        tree = PoseTree(
            tree.poses.at[idx].set(jnp.where(ok, sample, tree.poses[idx])),
            tree.parents.at[idx].set(
                jnp.where(ok, parent.astype(jnp.int32), -1)
            ),
            tree.costs.at[idx].set(jnp.where(ok, new_cost, BIG)),
            tree.active.at[idx].set(ok),
            tree.count + jnp.where(ok, 1, 0),
        )
        if star:
            # rewire: route near nodes through the new node when cheaper
            dxy = jnp.linalg.norm(tree.poses[:, :2] - sample[:2], axis=-1)
            near = tree.active & (dxy <= cfg.connect_radius)
            edge_out = cost_v(jnp.broadcast_to(sample, (n, 3)), tree.poses)
            free_out = free_v(jnp.broadcast_to(sample, (n, 3)), tree.poses)
            through = new_cost + edge_out
            better = ok & near & free_out & (through < tree.costs)
            tree = PoseTree(
                tree.poses,
                jnp.where(better, idx.astype(jnp.int32), tree.parents),
                jnp.where(better, through, tree.costs),
                tree.active,
                tree.count,
            )
        return tree

    tree = jax.lax.fori_loop(0, n - 1, body, tree)
    # goal anchor: cheapest node with a feasible kinematic edge to the goal
    tiled_goal = jnp.broadcast_to(goal, (n, 3))
    edge = cost_v(tree.poses, tiled_goal)
    free = free_v(tree.poses, tiled_goal)
    dxy = jnp.linalg.norm(tree.poses[:, :2] - goal[:2], axis=-1)
    reachable = tree.active & free & (dxy <= cfg.connect_radius)
    total = jnp.where(reachable, tree.costs + edge, BIG)
    best = jnp.argmin(total)
    return tree, best, total[best]


@partial(jax.jit, static_argnames=("cfg",))
def rrt_dubins_plan(key, start, goal, obstacles, radii,
                    cfg: KinematicRRTConfig = KinematicRRTConfig()):
    """RRT with Dubins edges (rrt_dubins.rs). Returns (PoseTree, best, cost)
    where cost includes the final node→goal Dubins connection."""
    return _kinematic_rrt(key, start, goal, obstacles, radii, cfg,
                          _dubins_cost, _dubins_edge_free, star=False)


@partial(jax.jit, static_argnames=("cfg",))
def rrt_star_dubins_plan(key, start, goal, obstacles, radii,
                         cfg: KinematicRRTConfig = KinematicRRTConfig()):
    """RRT* with Dubins edges (rrt_star_dubins.rs): choose-parent + rewire
    over shortest-Dubins connections."""
    return _kinematic_rrt(key, start, goal, obstacles, radii, cfg,
                          _dubins_cost, _dubins_edge_free, star=True)


@partial(jax.jit, static_argnames=("cfg",))
def rrt_star_reeds_shepp_plan(key, start, goal, obstacles, radii,
                              cfg: KinematicRRTConfig = KinematicRRTConfig()):
    """RRT* with Reeds-Shepp edges (rrt_star_reeds_shepp.rs): both gears,
    endpoint-verified words."""
    return _kinematic_rrt(key, start, goal, obstacles, radii, cfg,
                          _rs_cost, _rs_edge_free, star=True)


def extract_pose_path(tree: PoseTree, node, goal, curvature=1.0,
                      max_nodes: int = 32, samples_per_edge: int = 24,
                      reeds_shepp: bool = False):
    """Densely sampled SE(2) path start→…→node→goal: walks parent links,
    then samples each kinematic edge. Returns (poses [L·S, 3], mask)."""

    def walk(carry, _):
        cur, done = carry
        nxt = tree.parents[cur]
        out = jnp.where(done, -1, cur)
        new_done = done | (nxt < 0)
        return (jnp.where(new_done, cur, nxt), new_done), out

    (_, _), idxs = jax.lax.scan(
        walk, (jnp.asarray(node, jnp.int32), jnp.asarray(False)), None,
        length=max_nodes,
    )
    valid = idxs >= 0
    # reverse to root-first order
    order = jnp.argsort(jnp.where(valid, -jnp.arange(max_nodes), max_nodes))
    idxs = jnp.where(valid, idxs, 0)[order]
    valid = valid[order]
    poses = tree.poses[idxs]
    # append goal as final waypoint
    nvalid = jnp.sum(valid)
    waypoints = jnp.concatenate([poses, jnp.asarray(goal)[None]], axis=0)
    wvalid = jnp.concatenate([valid, jnp.array([True])])

    def sample_edge(a, b):
        if reeds_shepp:
            segs, steers, _ = reeds_shepp_path(a, b, curvature)
            return sample_reeds_shepp(a, segs, steers, curvature,
                                      num_points=samples_per_edge)
        pts, _, _ = dubins_shortest_path(a, b, curvature,
                                         num_points=samples_per_edge)
        return pts

    segs = jax.vmap(sample_edge)(waypoints[:-1], waypoints[1:])
    # edge k is real iff waypoints k and k+1 are both valid; the final
    # valid waypoint connects to the goal slot, so shift the goal into the
    # slot after the last valid node:
    # simpler: edge k valid iff wvalid[k] & (k+1 == nvalid or wvalid[k+1])
    k = jnp.arange(max_nodes)
    edge_valid = wvalid[:-1] & (wvalid[1:] | (k + 1 == nvalid))
    # the goal edge: from last valid node (index nvalid-1) to goal slot —
    # re-sample it explicitly and overwrite slot nvalid-1..; easiest: add it
    last = jnp.clip(nvalid - 1, 0, max_nodes - 1)
    goal_seg = sample_edge(waypoints[last], jnp.asarray(goal))
    segs = segs.at[last].set(goal_seg)
    edge_valid = edge_valid.at[last].set(True)
    mask = jnp.repeat(edge_valid, samples_per_edge)
    return segs.reshape(-1, 3), mask


# ---------------------------------------------------------------------------
# closed-loop RRT* (closed_loop_rrt_star.rs)


def closed_loop_rrt_star_plan(key, start, goal, obstacles, radii,
                              cfg: KinematicRRTConfig = KinematicRRTConfig(),
                              target_speed: float = 1.0,
                              wheelbase: float = 0.5,
                              dt: float = 0.1,
                              sim_steps: int = 400):
    """Closed-loop RRT* (closed_loop_rrt_star.rs): plan with Dubins RRT*,
    then validate by *tracking* the geometric path with a pursuit + speed
    controller and collision-checking the simulated trajectory.

    Returns (traj [T, 4] simulated (x, y, yaw, v), tree, plan_cost,
    report dict with tracked feasibility/goal flags)."""
    from rust_robotics_tpu.control.trackers import (
        PurePursuitConfig,
        pure_pursuit_control,
    )

    tree, best, cost = rrt_star_dubins_plan(
        key, start, goal, obstacles, radii, cfg
    )
    poses, mask = extract_pose_path(
        tree, best, goal, cfg.curvature, samples_per_edge=cfg.edge_samples
    )
    points = poses[:, :2]
    pp = PurePursuitConfig(wheelbase=wheelbase, look_ahead_distance=1.0,
                           look_ahead_gain=0.1)
    f = points.dtype
    state0 = jnp.array([start[0], start[1], start[2], 0.0], f)

    def step(state, _):
        accel, steer, _ = pure_pursuit_control(state, points, mask,
                                               jnp.asarray(target_speed, f),
                                               pp)
        x, y, yaw, v = state
        nx = x + v * jnp.cos(yaw) * dt
        ny = y + v * jnp.sin(yaw) * dt
        nyaw = yaw + v / wheelbase * jnp.tan(steer) * dt
        nv = jnp.clip(v + accel * dt, 0.0, 2.0 * target_speed)
        return jnp.stack([nx, ny, nyaw, nv]), jnp.stack([nx, ny, nyaw, nv])

    _, traj = jax.lax.scan(step, state0, None, length=sim_steps)
    d = jnp.linalg.norm(traj[:, None, :2] - obstacles[None, :, :], axis=-1)
    collision_free = jnp.all(d > radii[None, :])
    dist_goal = jnp.linalg.norm(traj[:, :2] - jnp.asarray(goal)[None, :2],
                                axis=-1)
    reached = jnp.min(dist_goal) <= cfg.goal_xy_threshold * 2.0
    report = {
        "tracked_collision_free": collision_free,
        "tracked_goal_reached": reached,
        "min_goal_distance": jnp.min(dist_goal),
    }
    return traj, tree, cost, report


# ---------------------------------------------------------------------------
# LQR-RRT* (lqr_rrt_star.rs)


@dataclasses.dataclass(frozen=True)
class LQRRRTConfig:
    """lqr_rrt_star.rs surface: double-integrator plant, LQR metric."""

    max_nodes: int = 160
    goal_sample_rate: float = 0.15
    steer_steps: int = 12
    dt: float = 0.15
    connect_cost: float = 25.0  # near-set threshold on LQR cost
    area_min: tuple = (-2.0, -2.0)
    area_max: tuple = (12.0, 12.0)
    goal_threshold: float = 0.8
    q_diag: tuple = (1.0, 1.0, 0.3, 0.3)
    r_diag: tuple = (0.1, 0.1)
    edge_checks: int = 8


def _lqr_gain(cfg: LQRRRTConfig):
    from rust_robotics_tpu.control.trackers import solve_dare

    f = jnp.result_type(float)
    dt = cfg.dt
    a = jnp.eye(4, dtype=f).at[0, 2].set(dt).at[1, 3].set(dt)
    b = jnp.zeros((4, 2), f).at[2, 0].set(dt).at[3, 1].set(dt)
    q = jnp.diag(jnp.asarray(cfg.q_diag, f))
    r = jnp.diag(jnp.asarray(cfg.r_diag, f))
    p = solve_dare(a, b, q, r)
    k = jnp.linalg.solve(r + b.T @ p @ b, b.T @ p @ a)
    return a, b, k, p


@partial(jax.jit, static_argnames=("cfg",))
def lqr_rrt_star_plan(key, start, goal, obstacles, radii,
                      cfg: LQRRRTConfig = LQRRRTConfig()):
    """LQR-RRT* (lqr_rrt_star.rs) on a planar double integrator
    [x, y, vx, vy]: the LQR value function xᵀPx is the distance metric
    (nearest + near set), and steering rolls the LQR-controlled plant
    toward the sample for `steer_steps`.

    Returns (tree dict, best, cost) — tree nodes are 4-states; cost is the
    accumulated LQR stage cost (the reference's edge cost)."""
    a, b, k, p = _lqr_gain(cfg)
    n = cfg.max_nodes
    f = jnp.result_type(float)
    start = jnp.asarray(start, f)
    goal = jnp.asarray(goal, f)
    lo = jnp.asarray(cfg.area_min, f)
    hi = jnp.asarray(cfg.area_max, f)
    q = jnp.diag(jnp.asarray(cfg.q_diag, f))
    r = jnp.diag(jnp.asarray(cfg.r_diag, f))

    def lqr_dist(x0, x1):
        e = x1 - x0
        return e @ p @ e

    def steer(x0, x1):
        """Roll x' = Ax + B(−K(x − x1)) for steer_steps; returns
        (final state, accumulated stage cost, trajectory)."""

        def stp(x, _):
            e = x - x1
            u = -(k @ e)
            nx = a @ x + b @ u
            c = e @ q @ e + u @ r @ u
            return nx, (nx, c)

        xf, (traj, cs) = jax.lax.scan(stp, x0, None, length=cfg.steer_steps)
        return xf, jnp.sum(cs), traj

    def traj_free(traj):
        d = jnp.linalg.norm(
            traj[:, None, :2] - obstacles[None, :, :], axis=-1
        )
        return jnp.all(d > radii[None, :])

    nodes0 = jnp.zeros((n, 4), f).at[0].set(start)
    tree = dict(
        nodes=nodes0,
        parents=jnp.full((n,), -1, jnp.int32),
        costs=jnp.full((n,), BIG).at[0].set(0.0),
        active=jnp.zeros((n,), bool).at[0].set(True),
        count=jnp.asarray(1),
    )
    keys = jax.random.split(key, n)

    def body(i, tree):
        u = jax.random.uniform(keys[i], (3,))
        sample = jnp.where(
            u[0] < cfg.goal_sample_rate,
            goal,
            jnp.concatenate([lo + u[1:] * (hi - lo), jnp.zeros(2, f)]),
        )
        dist = jax.vmap(lambda x: lqr_dist(x, sample))(tree["nodes"])
        dist = jnp.where(tree["active"], dist, BIG)
        nearest = jnp.argmin(dist)
        new_state, edge_cost, traj = steer(tree["nodes"][nearest], sample)
        ok = traj_free(traj)

        # choose parent among LQR-near set
        steer_all = jax.vmap(lambda x: steer(x, new_state))(tree["nodes"])
        ends, costs_all, trajs = steer_all
        close = jnp.linalg.norm(ends[:, :2] - new_state[None, :2],
                                axis=-1) < 0.5
        free_all = jax.vmap(traj_free)(trajs)
        near = (
            tree["active"]
            & (jax.vmap(lambda x: lqr_dist(x, new_state))(tree["nodes"])
               <= cfg.connect_cost)
            & close & free_all
        )
        cand = jnp.where(near, tree["costs"] + costs_all, BIG)
        cand = cand.at[nearest].min(
            jnp.where(ok, tree["costs"][nearest] + edge_cost, BIG)
        )
        parent = jnp.argmin(cand)
        new_cost = cand[parent]
        ok = new_cost < BIG / 2

        idx = tree["count"]
        tree = dict(
            nodes=tree["nodes"].at[idx].set(
                jnp.where(ok, new_state, tree["nodes"][idx])
            ),
            parents=tree["parents"].at[idx].set(
                jnp.where(ok, parent.astype(jnp.int32), -1)
            ),
            costs=tree["costs"].at[idx].set(jnp.where(ok, new_cost, BIG)),
            active=tree["active"].at[idx].set(ok),
            count=tree["count"] + jnp.where(ok, 1, 0),
        )
        return tree

    tree = jax.lax.fori_loop(0, n - 1, body, tree)
    dg = jnp.linalg.norm(tree["nodes"][:, :2] - goal[None, :2], axis=-1)
    at_goal = tree["active"] & (dg <= cfg.goal_threshold)
    total = jnp.where(at_goal, tree["costs"], BIG)
    best = jnp.argmin(total)
    return tree, best, total[best]
