"""Small reactive / optimization planners: elastic bands, DMP, PSO,
LQR planner, bug algorithms.

Reference (crates/rust_robotics_planning/src/): elastic_bands.rs (488:
internal spring + external obstacle forces deforming a path),
dynamic_movement_primitives.rs (435: canonical system + learned forcing
term), particle_swarm_optimization.rs (446: global-best PSO over 2D paths),
lqr_planner.rs (252: LQR steering toward a goal as a local planner),
bug_planning.rs / tangent_bug.rs (486+427: boundary-following).

TPU-native: bands relax all waypoints at once per iteration; DMP is a
`lax.scan`; PSO is a fully batched swarm; bug is a scan FSM.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Elastic bands (elastic_bands.rs)
# ---------------------------------------------------------------------------

def elastic_band_optimize(points, obstacles, radii, iterations=100,
                          spring_gain=0.4, repulse_gain=0.8,
                          influence=2.0):
    """Deform a path with internal contraction + obstacle repulsion
    (endpoints fixed). points [N, 2]; returns optimized [N, 2]."""
    n = points.shape[0]
    interior = jnp.arange(n)
    interior_mask = (interior > 0) & (interior < n - 1)

    def body(_, pts):
        internal = 0.5 * (jnp.roll(pts, 1, axis=0) + jnp.roll(pts, -1, axis=0)) - pts
        d = pts[:, None, :] - obstacles[None, :, :]
        dist = jnp.linalg.norm(d, axis=-1)
        # break the collinear degeneracy (path through the obstacle center):
        # when nearly centered, push along the local path normal instead
        tangent = jnp.roll(pts, -1, axis=0) - jnp.roll(pts, 1, axis=0)
        normal = jnp.stack([-tangent[:, 1], tangent[:, 0]], axis=-1)
        normal = normal / jnp.clip(
            jnp.linalg.norm(normal, axis=-1, keepdims=True), 1e-9, None
        )
        degenerate = dist < 1e-3
        direction = jnp.where(
            degenerate[..., None],
            jnp.broadcast_to(normal[:, None, :], d.shape),
            d / jnp.clip(dist[..., None], 1e-6, None),
        )
        mag = jnp.clip(influence - (dist - radii), 0.0, None)
        external = repulse_gain * jnp.sum(mag[..., None] * direction, axis=1)
        step = spring_gain * internal + external * 0.1
        return jnp.where(interior_mask[:, None], pts + step, pts)

    return jax.lax.fori_loop(0, iterations, body, points)


# ---------------------------------------------------------------------------
# Dynamic movement primitives (dynamic_movement_primitives.rs)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class DMPConfig:
    alpha: float = 25.0
    beta: float = 6.25
    alpha_x: float = 3.0
    n_basis: int = 20
    tau: float = 1.0


def dmp_fit(demo, dt, cfg: DMPConfig = DMPConfig()):
    """Learn basis weights from a demonstration [T, D] (locally weighted
    regression on the forcing term)."""
    t = demo.shape[0]
    y = demo
    yd = jnp.gradient(y, dt, axis=0)
    ydd = jnp.gradient(yd, dt, axis=0)
    g = y[-1]
    y0 = y[0]
    x = jnp.exp(-cfg.alpha_x * jnp.arange(t) * dt / cfg.tau)
    f_target = cfg.tau**2 * ydd - cfg.alpha * (
        cfg.beta * (g - y) - cfg.tau * yd
    )
    centers = jnp.exp(-cfg.alpha_x * jnp.linspace(0, 1, cfg.n_basis))
    widths = cfg.n_basis ** 1.5 / centers
    psi = jnp.exp(-widths[None, :] * (x[:, None] - centers[None, :]) ** 2)
    xi = x[:, None] * (g - y0)[None, :]  # [T, D] scaling
    # per-basis, per-dim weighted regression
    num = jnp.einsum("tb,td,td->bd", psi, xi, f_target)
    den = jnp.einsum("tb,td,td->bd", psi, xi, xi) + 1e-10
    return num / den, (y0, g)


def dmp_rollout(weights, y0, g, steps, dt, cfg: DMPConfig = DMPConfig()):
    """Integrate the DMP; returns trajectory [steps, D]."""
    centers = jnp.exp(-cfg.alpha_x * jnp.linspace(0, 1, cfg.n_basis))
    widths = cfg.n_basis ** 1.5 / centers

    def step(carry, _):
        y, yd, x = carry
        psi = jnp.exp(-widths * (x - centers) ** 2)
        f = (psi @ weights) * x * (g - y0) / jnp.clip(jnp.sum(psi), 1e-10, None)
        ydd = (cfg.alpha * (cfg.beta * (g - y) - cfg.tau * yd) + f) / cfg.tau**2
        yd = yd + ydd * dt
        y = y + yd * dt
        x = x + (-cfg.alpha_x * x / cfg.tau) * dt
        return (y, yd, x), y

    (_, _, _), ys = jax.lax.scan(
        step, (y0, jnp.zeros_like(y0), jnp.asarray(1.0)), None, length=steps
    )
    return ys


# ---------------------------------------------------------------------------
# Particle swarm optimization (particle_swarm_optimization.rs)
# ---------------------------------------------------------------------------

def pso_minimize(key, objective, dim, num_particles=64, iterations=100,
                 bounds=(-10.0, 10.0), w=0.7, c1=1.5, c2=1.5):
    """Global-best PSO; objective maps [P, dim] -> [P]. Returns
    (best_x [dim], best_f)."""
    k1, k2 = jax.random.split(key)
    lo, hi = bounds
    x = jax.random.uniform(k1, (num_particles, dim), minval=lo, maxval=hi)
    v = jnp.zeros_like(x)
    f = objective(x)
    pbest, pbest_f = x, f
    gi = jnp.argmin(f)
    gbest, gbest_f = x[gi], f[gi]

    def body(carry, key):
        x, v, pbest, pbest_f, gbest, gbest_f = carry
        r1 = jax.random.uniform(key, x.shape)
        r2 = jax.random.uniform(jax.random.fold_in(key, 1), x.shape)
        v = w * v + c1 * r1 * (pbest - x) + c2 * r2 * (gbest - x)
        x = jnp.clip(x + v, lo, hi)
        f = objective(x)
        better = f < pbest_f
        pbest = jnp.where(better[:, None], x, pbest)
        pbest_f = jnp.where(better, f, pbest_f)
        gi = jnp.argmin(pbest_f)
        return (x, v, pbest, pbest_f, pbest[gi], pbest_f[gi]), None

    keys = jax.random.split(k2, iterations)
    (x, v, pbest, pbest_f, gbest, gbest_f), _ = jax.lax.scan(
        body, (x, v, pbest, pbest_f, gbest, gbest_f), keys
    )
    return gbest, gbest_f


# ---------------------------------------------------------------------------
# LQR planner (lqr_planner.rs)
# ---------------------------------------------------------------------------

def lqr_plan(start_xy, goal_xy, steps=100, dt=0.1):
    """Double-integrator LQR steering toward the goal as a local planner;
    returns the rollout [steps, 2]."""
    from rust_robotics_tpu.control.trajopt import lqr_regulator

    a = jnp.block(
        [[jnp.eye(2), dt * jnp.eye(2)], [jnp.zeros((2, 2)), jnp.eye(2)]]
    )
    b = jnp.concatenate([0.5 * dt * dt * jnp.eye(2), dt * jnp.eye(2)])
    k = lqr_regulator(a, b, jnp.eye(4), 0.1 * jnp.eye(2))
    x0 = jnp.concatenate([start_xy - goal_xy, jnp.zeros(2)])

    def step(x, _):
        u = -(k @ x)
        x = a @ x + b @ u
        return x, x[:2] + goal_xy

    _, traj = jax.lax.scan(step, x0, None, length=steps)
    return traj


# ---------------------------------------------------------------------------
# Bug planning (bug_planning.rs)
# ---------------------------------------------------------------------------

def bug2_plan(blocked, start_idx, goal_idx, max_steps=2000):
    """Bug2 on a raster: march along the start-goal line; on hit, follow
    the obstacle boundary (left-hand rule) until back on the line closer to
    the goal. Host-side FSM (the reference's sequential logic); returns
    (path [K, 2] int cells, reached)."""
    import numpy as np

    blocked = np.asarray(blocked)
    w, h = blocked.shape
    s = np.asarray(start_idx, int)
    g = np.asarray(goal_idx, int)

    def on_line(p):
        d = g - s
        cross = d[0] * (p[1] - s[1]) - d[1] * (p[0] - s[0])
        denom = max(np.hypot(*d), 1e-9)
        return abs(cross) / denom <= 0.71

    dirs4 = [(1, 0), (0, 1), (-1, 0), (0, -1)]

    def free(p):
        return 0 <= p[0] < w and 0 <= p[1] < h and not blocked[p[0], p[1]]

    def line_step(cur):
        # 4-connected march toward the goal, larger axis first
        d = g - cur
        order = ([(np.sign(d[0]), 0), (0, np.sign(d[1]))]
                 if abs(d[0]) >= abs(d[1])
                 else [(0, np.sign(d[1])), (np.sign(d[0]), 0)])
        return [np.asarray(o, int) for o in order if any(o)]

    path = [tuple(s)]
    cur = s.copy()
    mode = "line"
    heading = 0
    hit_dist = np.inf
    for _ in range(max_steps):
        if (cur == g).all():
            return np.array(path), True
        if mode == "line":
            steps = line_step(cur)
            nxt = cur + steps[0]
            if free(nxt):
                cur = nxt
            else:
                mode = "boundary"
                hit_dist = np.hypot(*(g - cur))
                # turn right at the hit: the wall ends up on the LEFT,
                # matching the left-hand try order below
                heading = (dirs4.index(tuple(steps[0])) - 1) % 4
                continue
        else:
            # left-hand wall following: try left, straight, right, back
            moved = False
            for k in (1, 0, -1, -2):
                nd = (heading + k) % 4
                nxt = cur + np.asarray(dirs4[nd])
                if free(nxt):
                    cur = nxt
                    heading = nd
                    moved = True
                    break
            if not moved:
                return np.array(path), False
            if on_line(cur) and np.hypot(*(g - cur)) < hit_dist - 0.5:
                mode = "line"
        path.append(tuple(cur))
    return np.array(path), False


def tangent_bug_plan(blocked, start_idx, goal_idx, sensor_range=6.0,
                     max_steps=2000):
    """Tangent Bug (tangent_bug.rs): motion-to-goal until the next cell is
    blocked, then boundary-following — scan boundary cells within
    `sensor_range`, take the one minimizing distance-to-goal as the tangent
    point, wall-follow toward it; leave when the direct step is free AND
    the current goal distance beats d_reach (recorded at the hit), per
    Kamon & Rivlin (1997). Host-side FSM mirroring bug2_plan; returns
    (path [K, 2] int cells, reached)."""
    import numpy as np

    blocked = np.asarray(blocked)
    w, h = blocked.shape
    s = np.asarray(start_idx, int)
    g = np.asarray(goal_idx, int)
    dirs4 = [(1, 0), (0, 1), (-1, 0), (0, -1)]

    def free(p):
        return 0 <= p[0] < w and 0 <= p[1] < h and not blocked[p[0], p[1]]

    def goal_step(cur):
        d = g - cur
        order = ([(np.sign(d[0]), 0), (0, np.sign(d[1]))]
                 if abs(d[0]) >= abs(d[1])
                 else [(0, np.sign(d[1])), (np.sign(d[0]), 0)])
        return [np.asarray(o, int) for o in order if any(o)]

    def boundary_cells_near(cur):
        """Free 4-neighbors of obstacle cells within sensor range of cur."""
        r = int(np.ceil(sensor_range))
        out = []
        for dx in range(-r, r + 1):
            for dy in range(-r, r + 1):
                p = cur + np.array([dx, dy])
                if dx * dx + dy * dy > sensor_range ** 2 or not free(p):
                    continue
                if any(not free(p + np.asarray(d4)) and
                       0 <= p[0] + d4[0] < w and 0 <= p[1] + d4[1] < h
                       for d4 in dirs4):
                    out.append(p)
        return out

    path = [tuple(s)]
    cur = s.copy()
    mode = "goal"
    heading = 0
    d_reach = np.inf
    for _ in range(max_steps):
        if (cur == g).all():
            return np.array(path), True
        if mode == "goal":
            nxt = cur + goal_step(cur)[0]
            if free(nxt):
                cur = nxt
            else:
                mode = "boundary"
                d_reach = np.hypot(*(g - cur))
                blocked_dir = goal_step(cur)[0]
                # tangent point: sensed boundary cell closest to the goal
                # (tangent_bug.rs step 2) — its side of the blocked
                # direction picks the following hand
                bnd = boundary_cells_near(cur)
                if bnd:
                    dists = [np.hypot(*(g - p)) for p in bnd]
                    tangent = bnd[int(np.argmin(dists))]
                else:
                    tangent = g
                rel = tangent - cur
                cross = blocked_dir[0] * rel[1] - blocked_dir[1] * rel[0]
                hand = 1 if cross >= 0 else -1  # +1 left-hand, −1 right
                heading = (dirs4.index(tuple(blocked_dir)) - hand) % 4
                continue
        else:
            # hand-rule wall following (rounds corners); `hand` chosen
            # toward the tangent point at hit time
            moved = False
            for k in (hand, 0, -hand, -2 * hand):
                nd = (heading + k) % 4
                nxt = cur + np.asarray(dirs4[nd])
                if free(nxt):
                    cur = nxt
                    heading = nd
                    moved = True
                    break
            if not moved:
                return np.array(path), False
            direct_free = free(cur + goal_step(cur)[0]) if \
                goal_step(cur) else False
            if direct_free and np.hypot(*(g - cur)) < d_reach - 0.5:
                mode = "goal"
        path.append(tuple(cur))
    return np.array(path), False
