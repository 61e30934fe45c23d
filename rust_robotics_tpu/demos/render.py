"""Render demo family: the reference's render_*_svg / render_gif_* media
generators (SURVEY.md §2.11: 15 SVG + 7 GIF examples, all deterministic
closed-loop sims feeding the software rasterizer — §3.2 call stack).

Each function runs a deterministic sim and writes media via
`viz.raster` (Frame/GifRecorder for GIFs, SvgCanvas for SVGs)."""

from __future__ import annotations

import numpy as np

from rust_robotics_tpu.viz.raster import (
    CanvasConfig,
    Frame,
    GifRecorder,
    SvgCanvas,
    save_png,
)

__all__ = [
    "render_gif_ekf_localization",
    "render_svg_path_planning",
    "render_svg_rrt",
]


def render_gif_ekf_localization(path, steps: int = 120, frame_stride: int = 3):
    """GIF of the deterministic EKF localization demo — the §3.2 call
    stack (render_gif_ekf_localization.rs:35-110): truth + estimate traces
    and the covariance ellipse, every `frame_stride` steps."""
    import jax.numpy as jnp

    from rust_robotics_tpu.demos.ekf_localization import (
        run_ekf_localization_demo,
    )

    out = run_ekf_localization_demo(steps=steps)
    truth = np.asarray(out["truth"])
    est = np.asarray(out["estimate"])
    covs = np.asarray(out["cov"])
    cfg = CanvasConfig(width=320, height=320, x_range=(-12, 12),
                       y_range=(-12, 12))
    rec = GifRecorder(path, cfg)
    for k in range(0, steps, frame_stride):
        fr = Frame(cfg)
        fr.draw_path_xy(truth[: k + 1, 0], truth[: k + 1, 1], (0, 0, 255))
        fr.draw_path_xy(est[: k + 1, 0], est[: k + 1, 1], (255, 0, 0))
        # covariance ellipse via eigendecomposition of the 2x2 position
        # block (render_gif_ekf_localization.rs:26-33)
        p = covs[k][:2, :2]
        w, v = np.linalg.eigh(p)
        ang = np.linspace(0, 2 * np.pi, 32)
        ell = (v @ np.diag(np.sqrt(np.maximum(w, 0))) @
               np.stack([np.cos(ang), np.sin(ang)])) * 3.0
        fr.draw_path_xy(est[k, 0] + ell[0], est[k, 1] + ell[1], (0, 160, 0))
        fr.draw_robot(truth[k, 0], truth[k, 1], truth[k, 2], 0.8, (0, 0, 0))
        rec.add_frame(fr)
    return rec.finish()


def render_svg_path_planning(path):
    """SVG of a wavefront plan around obstacles (render_*_svg family)."""
    import jax.numpy as jnp

    from rust_robotics_tpu.planning.grid import grid_from_raster
    from rust_robotics_tpu.planning.wavefront import plan_grid

    blocked = np.zeros((60, 60), bool)
    blocked[20:40, 25] = True
    blocked[20, 25:45] = True
    grid = grid_from_raster(jnp.asarray(blocked), resolution=1.0)
    p, cost = plan_grid(grid, (5.0, 5.0), (55.0, 55.0))
    pts = np.asarray(p.points)[np.asarray(p.mask) > 0]

    cfg = CanvasConfig(width=480, height=480, x_range=(0, 60),
                       y_range=(0, 60))
    svg = SvgCanvas(cfg)
    ox, oy = np.nonzero(blocked)
    svg.draw_points(ox.astype(float), oy.astype(float), (40, 40, 40), 3.0)
    svg.draw_path(pts[:, 0], pts[:, 1], (0, 0, 255), 2.0)
    svg.draw_circle(5.0, 5.0, 1.0, (0, 160, 0), fill=True)
    svg.draw_circle(55.0, 55.0, 1.0, (200, 0, 0), fill=True)
    return svg.save(path)


def render_svg_rrt(path, seed: int = 0):
    """SVG of an RRT* tree + best path."""
    import jax
    import jax.numpy as jnp

    from rust_robotics_tpu.planning.rrt import (
        RRTConfig,
        extract_rrt_path,
        rrt_plan,
    )

    obs = jnp.array([[5.0, 5.0], [3.0, 6.0], [7.0, 4.0]])
    rad = jnp.array([1.0, 0.8, 0.8])
    cfg_r = RRTConfig(expand_dis=1.0, max_nodes=300, connect_radius=2.5,
                      goal_threshold=1.0)
    tree, best, cost = rrt_plan(jax.random.PRNGKey(seed), jnp.zeros(2),
                                jnp.array([10.0, 10.0]), obs, rad, cfg_r,
                                star=True)
    nodes = np.asarray(tree.nodes)
    parents = np.asarray(tree.parents)
    active = np.asarray(tree.active)
    pts, mask = extract_rrt_path(tree, best)
    pts = np.asarray(pts)[np.asarray(mask)]

    cfg = CanvasConfig(width=480, height=480, x_range=(-2, 12),
                       y_range=(-2, 12))
    svg = SvgCanvas(cfg)
    for o, r in zip(np.asarray(obs), np.asarray(rad)):
        svg.draw_circle(o[0], o[1], float(r), (120, 120, 120), fill=True)
    for i in range(len(nodes)):
        if active[i] and parents[i] >= 0:
            a, b = nodes[i], nodes[parents[i]]
            svg.draw_path([a[0], b[0]], [a[1], b[1]], (180, 200, 255), 0.8)
    svg.draw_path(pts[:, 0], pts[:, 1], (255, 0, 0), 2.0)
    return svg.save(path)
