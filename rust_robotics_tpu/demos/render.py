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
    "render_gif_particle_filter",
    "render_gif_dwa_navigation",
    "render_svg_path_planning",
    "render_svg_rrt",
    "render_svg_pose_graph",
    "render_svg_dubins",
    "render_svg_any_angle",
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


def render_gif_particle_filter(path, steps: int = 90, frame_stride: int = 3,
                               num_particles: int = 400):
    """GIF of range-only particle-filter localization (the reference's
    render_gif_particle_filter family): particle cloud, truth, estimate,
    and the four RFID landmarks (particle_filter.rs:26-60 demo problem)."""
    import jax
    import jax.numpy as jnp

    from rust_robotics_tpu.filters.particle import init_particles, pf_step

    f = jnp.result_type(float)
    landmarks = jnp.array([[10.0, 0.0], [10.0, 10.0], [0.0, 15.0],
                           [-5.0, 20.0]], f)
    dt = 0.1
    key = jax.random.PRNGKey(3)
    key, k0 = jax.random.split(key)
    belief = init_particles(k0, jnp.zeros(4, f), 0.5, num_particles)
    truth = jnp.zeros(4, f)
    control = jnp.array([1.0, 0.1], f)

    cfg = CanvasConfig(width=320, height=320, x_range=(-12, 16),
                       y_range=(-6, 22))
    rec = GifRecorder(path, cfg)
    truth_trace, est_trace = [], []
    for k in range(steps):
        yaw, v = truth[2], control[0]
        truth = truth + dt * jnp.array(
            [v * jnp.cos(yaw), v * jnp.sin(yaw), control[1], 0.0], f)
        ranges = jnp.linalg.norm(landmarks - truth[:2], axis=-1)
        ranges = ranges + 0.1 * jnp.sin(0.9 * k + jnp.arange(4))  # sinusoid
        key, sk = jax.random.split(key)
        belief, est = pf_step(belief, control, ranges, landmarks, dt, sk,
                              control_noise_std=jnp.array([0.2, 0.05], f),
                              range_noise=0.3)
        truth_trace.append(np.asarray(truth[:2]))
        est_trace.append(np.asarray(est.mean[:2]))
        if k % frame_stride:
            continue
        fr = Frame(cfg)
        pts = np.asarray(belief.states[:, :2])
        fr.draw_points_xy(pts[:, 0], pts[:, 1], (190, 190, 255), 1.0)
        lm = np.asarray(landmarks)
        fr.draw_points_xy(lm[:, 0], lm[:, 1], (0, 0, 0), 3.0)
        tt = np.stack(truth_trace)
        ee = np.stack(est_trace)
        fr.draw_path_xy(tt[:, 0], tt[:, 1], (0, 0, 255))
        fr.draw_path_xy(ee[:, 0], ee[:, 1], (255, 0, 0))
        fr.draw_robot(float(truth[0]), float(truth[1]), float(truth[2]),
                      0.8, (0, 0, 0))
        rec.add_frame(fr)
    return rec.finish()


def render_gif_dwa_navigation(path, steps: int = 160, frame_stride: int = 4):
    """GIF of the DWA navigation loop (render_gif_dwa family): candidate
    best rollout, obstacle set, traveled path."""
    import jax.numpy as jnp

    from rust_robotics_tpu.planning.dwa import (
        DWAConfig,
        dwa_step,
        goal_reached,
        rollout,
    )

    f = jnp.result_type(float)
    cfg_d = DWAConfig()
    goal = jnp.array([8.0, 8.0], f)
    obstacles = jnp.array([[2.0, 2.5], [4.0, 4.5], [6.0, 5.0], [5.0, 7.0]], f)
    state = jnp.zeros(5, f)

    cfg = CanvasConfig(width=320, height=320, x_range=(-1, 10),
                       y_range=(-1, 10))
    rec = GifRecorder(path, cfg)
    trace = [np.asarray(state[:2])]
    for k in range(steps):
        if bool(goal_reached(state, goal, cfg_d)):
            break
        control, state, _, _ = dwa_step(state, goal, obstacles, cfg_d)
        trace.append(np.asarray(state[:2]))
        if k % frame_stride:
            continue
        fr = Frame(cfg)
        ob = np.asarray(obstacles)
        for o in ob:
            fr.draw_circle(o[0], o[1], 0.5, (120, 120, 120))
        tr = np.stack(trace)
        fr.draw_path_xy(tr[:, 0], tr[:, 1], (0, 0, 255))
        ro = np.asarray(rollout(state, control[0], control[1], cfg_d))
        fr.draw_path_xy(ro[:, 0], ro[:, 1], (0, 160, 0))
        fr.draw_circle(float(goal[0]), float(goal[1]), 0.3, (200, 0, 0))
        fr.draw_robot(float(state[0]), float(state[1]), float(state[2]),
                      0.6, (0, 0, 0))
        rec.add_frame(fr)
    return rec.finish()


def render_svg_pose_graph(path, size: int = 300):
    """Before/after SVG of 2D pose-graph optimization on the reference's
    benchmark chain (render_svg_pose_graph family): perturbed initialization
    in red, optimized chain in blue, truth in grey."""
    import jax.numpy as jnp

    from rust_robotics_tpu.demos.pose_graph_bench import synthesize_chain
    from rust_robotics_tpu.slam.pose_graph import optimize_pose_graph_2d

    truth, initial, ef, et, meas, info = synthesize_chain(size)
    poses, _ = optimize_pose_graph_2d(
        jnp.asarray(initial), jnp.asarray(ef), jnp.asarray(et),
        jnp.asarray(meas), jnp.asarray(info), max_iterations=15)
    poses = np.asarray(poses)

    x_max = float(truth[:, 0].max()) + 1
    cfg = CanvasConfig(width=600, height=300, x_range=(-1, x_max),
                       y_range=(-3, 3))
    svg = SvgCanvas(cfg)
    svg.draw_path(truth[:, 0], truth[:, 1], (160, 160, 160), 1.0)
    svg.draw_path(initial[:, 0], initial[:, 1], (220, 60, 60), 1.0)
    svg.draw_path(poses[:, 0], poses[:, 1], (0, 0, 255), 1.5)
    return svg.save(path)


def render_svg_dubins(path):
    """SVG gallery of Dubins shortest paths for a fan of goal headings
    (render_svg_dubins family)."""
    import jax.numpy as jnp

    from rust_robotics_tpu.planning.curves import dubins_shortest_path

    cfg = CanvasConfig(width=480, height=480, x_range=(-6, 6),
                       y_range=(-6, 6))
    svg = SvgCanvas(cfg)
    start = jnp.array([0.0, 0.0, jnp.pi / 2])
    colors = [(0, 0, 255), (0, 160, 0), (200, 0, 0), (200, 120, 0),
              (120, 0, 200)]
    for i, ang in enumerate(np.linspace(0, 2 * np.pi, 5, endpoint=False)):
        goal = jnp.array([4.0 * np.cos(ang), 4.0 * np.sin(ang), ang])
        pts, length, word = dubins_shortest_path(start, goal, curvature=1.0)
        pts = np.asarray(pts)
        svg.draw_path(pts[:, 0], pts[:, 1], colors[i % len(colors)], 1.5)
        svg.draw_robot(float(goal[0]), float(goal[1]), float(goal[2]), 0.5,
                       (0, 0, 0))
    svg.draw_robot(0.0, 0.0, np.pi / 2, 0.5, (0, 0, 0))
    return svg.save(path)


def render_svg_any_angle(path):
    """SVG comparing the octile grid path, the LOS-shortcut path, and the
    exact corner-visibility optimum on one map (the any-angle family)."""
    import jax.numpy as jnp

    from rust_robotics_tpu.planning.any_angle import VisibilityPlanner
    from rust_robotics_tpu.planning.smoothing import shortcut_path
    from rust_robotics_tpu.planning.wavefront import (
        extract_path,
        goal_raster,
        wavefront_costs,
    )

    free = np.ones((40, 40), bool)
    free[10:12, 0:28] = False
    free[24:26, 12:40] = False
    free = jnp.asarray(free)
    start = jnp.asarray([2, 2])
    goal = jnp.asarray([37, 37])
    costs = wavefront_costs(free, goal_raster((40, 40), goal))
    idx, mask, _ = extract_path(costs, free, start, max_len=256)
    pts = np.asarray(idx)[np.asarray(mask)] + 0.5
    keep, _ = shortcut_path(jnp.asarray(idx, jnp.result_type(float)) + 0.5,
                            mask, ~free, 0.0, 0.0, 1.0, samples=128)
    sc = np.asarray(idx)[np.asarray(keep & mask)] + 0.5
    vp = VisibilityPlanner(free, samples=128)
    opt_path = vp.path(np.asarray(start), np.asarray(goal))

    cfg = CanvasConfig(width=480, height=480, x_range=(0, 40),
                       y_range=(0, 40))
    svg = SvgCanvas(cfg)
    ox, oy = np.nonzero(~np.asarray(free))
    svg.draw_points(ox + 0.5, oy + 0.5, (40, 40, 40), 4.0)
    svg.draw_path(pts[:, 0], pts[:, 1], (160, 160, 160), 1.0)
    svg.draw_path(sc[:, 0], sc[:, 1], (0, 160, 0), 1.5)
    if opt_path is not None:
        svg.draw_path(opt_path[:, 0], opt_path[:, 1], (0, 0, 255), 2.0)
    return svg.save(path)


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
