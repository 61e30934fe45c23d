"""Hybrid A*: kinematically feasible SE(2) planning on a (x, y, θ) lattice.

Reference: crates/rust_robotics_planning/src/hybrid_a_star.rs (902 LoC):
heap-based search over continuous states binned into an (x, y, θ) grid,
expanding steering-angle motion primitives with a holonomic-with-obstacles
heuristic.

TPU-native inversion: the same wavefront relaxation as the 2D planners
(planning/wavefront.py) lifted to THREE dimensions — the cost-to-go field
D[θ, x, y] relaxes over steering primitives that couple the θ-slices (a
min-plus stencil whose neighborhood depends on the heading bin). Expansion
order disappears; kinematic feasibility is preserved because each edge is a
forward/backward arc of the bicycle model quantized to the lattice.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

BIG = 1e18


def _motion_primitives(n_theta: int, step: float, steer_angles,
                       wheelbase: float, reverse: bool, reverse_penalty: float):
    """Per-heading-bin lattice displacements.

    For each heading bin k and steering angle δ: advance `step` along the
    arc; quantize (dx, dy) to cells and dθ to bins. Returns list of
    (dtheta_bins, dx[k], dy[k], cost) with dx/dy arrays indexed by source
    bin.
    """
    import numpy as np

    thetas = 2.0 * np.pi * np.arange(n_theta) / n_theta
    prims = []
    dirs = [1.0, -1.0] if reverse else [1.0]
    for direction in dirs:
        for delta in steer_angles:
            dth = direction * step / wheelbase * np.tan(delta)
            dth_bins = int(round(dth / (2.0 * np.pi / n_theta)))
            # displacement at each source heading (midpoint heading)
            mid = thetas + 0.5 * dth
            dx = np.round(direction * step * np.cos(mid)).astype(int)
            dy = np.round(direction * step * np.sin(mid)).astype(int)
            cost = step * (1.0 if direction > 0 else reverse_penalty)
            cost += 0.3 * abs(delta) * step  # steering penalty
            prims.append((dth_bins, dx, dy, cost))
    return prims


@functools.partial(
    jax.jit,
    static_argnames=("n_theta", "step", "steer_angles", "wheelbase",
                     "reverse", "reverse_penalty", "max_iters", "block"),
)
def hybrid_astar_costs(free, goal_idx, goal_theta_bin, n_theta: int = 16,
                       step: float = 2.0,
                       steer_angles: tuple = (-0.6, -0.3, 0.0, 0.3, 0.6),
                       wheelbase: float = 2.5, reverse: bool = True,
                       reverse_penalty: float = 2.0,
                       max_iters: int = 4096, block: int = 4):
    """Cost-to-go D[θ, x, y] to reach (goal cell, goal heading bin).

    free [W, H]; cell size is implicitly `1` (scale `step`/`wheelbase` into
    cell units). Returns the 3D field; descend it with
    `extract_hybrid_path`.
    """
    import numpy as np

    w, h = free.shape
    f = jnp.result_type(float)
    prims = _motion_primitives(
        n_theta, step, steer_angles, wheelbase, reverse, reverse_penalty
    )

    d0 = jnp.full((n_theta, w, h), BIG, dtype=f)
    d0 = d0.at[goal_theta_bin, goal_idx[0], goal_idx[1]].set(0.0)
    free3 = jnp.broadcast_to(free, (n_theta, w, h))

    def shift3(a, db, dx_arr, dy_arr):
        # relax INTO cell (k, x, y) FROM successor (k+db, x+dx[k], y+dy[k])
        rolled = jnp.roll(a, -db, axis=0)
        out = []
        for k in range(n_theta):
            dx = int(dx_arr[k])
            dy = int(dy_arr[k])
            plane = rolled[k]
            plane = jnp.roll(plane, (-dx, -dy), axis=(0, 1))
            # forbid wraparound: mask borders
            if dx > 0:
                plane = plane.at[w - dx :, :].set(BIG)
            elif dx < 0:
                plane = plane.at[: -dx, :].set(BIG)
            if dy > 0:
                plane = plane.at[:, h - dy :].set(BIG)
            elif dy < 0:
                plane = plane.at[:, : -dy].set(BIG)
            out.append(plane)
        return jnp.stack(out)

    def sweep(d):
        best = d
        for db, dx_arr, dy_arr, cost in prims:
            cand = shift3(d, db, dx_arr, dy_arr) + cost
            best = jnp.minimum(best, jnp.where(free3, cand, BIG))
        return best

    def body(carry):
        d, _, it = carry
        new = d
        for _ in range(block):
            new = sweep(new)
        return new, jnp.any(new < d), it + block

    def cond(carry):
        _, changed, it = carry
        return changed & (it < max_iters)

    d, _, _ = jax.lax.while_loop(cond, body, (d0, jnp.asarray(True), 0))
    return jnp.where(d >= BIG, jnp.inf, d)


def extract_hybrid_path(costs, free, start_idx, start_theta_bin,
                        n_theta: int = 16, step: float = 2.0,
                        steer_angles: tuple = (-0.6, -0.3, 0.0, 0.3, 0.6),
                        wheelbase: float = 2.5, reverse: bool = True,
                        reverse_penalty: float = 2.0, max_len: int = 256):
    """Greedy descent over the 3D cost field; returns (states [L, 3]
    (x, y, θbin), mask [L], cost)."""
    import numpy as np

    prims = _motion_primitives(
        n_theta, step, steer_angles, wheelbase, reverse, reverse_penalty
    )
    w, h = free.shape
    d = np.asarray(costs)
    cur = (int(start_theta_bin), int(start_idx[0]), int(start_idx[1]))
    out = [cur]
    total = d[cur]
    for _ in range(max_len - 1):
        if d[cur] <= 0.0 or not np.isfinite(d[cur]):
            break
        best_next, best_val = None, d[cur]
        k, x, y = cur
        for db, dx_arr, dy_arr, cost in prims:
            nk = (k + db) % n_theta
            nx, ny = x + int(dx_arr[k]), y + int(dy_arr[k])
            if 0 <= nx < w and 0 <= ny < h:
                val = cost + d[nk, nx, ny]
                if val < best_val + 1e-9 and d[nk, nx, ny] < d[cur]:
                    best_val = val
                    best_next = (nk, nx, ny)
        if best_next is None:
            break
        cur = best_next
        out.append(cur)
    states = np.array([[x, y, k] for k, x, y in out])
    mask = np.ones(len(out), dtype=bool)
    return states, mask, float(total)
