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


# ---------------------------------------------------------------------------
# Round-2 breadth: the remaining reference render_* families
# (Cargo.toml:60-470 — render_gif_pure_pursuit/rrt/slam,
#  render_controller_arena_svg, render_frontier_navigator_svg,
#  render_mppi_value_grid_svg, render_traversal_risk_graph_svg,
#  render_stl_cbs_multi_robot_svg, render_kinodynamic_stl_cbs_svg,
#  render_safe_decode_nav_svg, render_rigid_body_mip_planning_svg,
#  render_branchout_multimodal_driving_svg, render_euroc_vio_svg,
#  render_mppi_track_progress_svg, render_mppi_racing_gate_progress_svg,
#  render_adap_rpf_mppi_svg, render_hierarchical_mapf_replanning_svg)


def render_gif_pure_pursuit(path, steps: int = 160, frame_stride: int = 4):
    """GIF of pure-pursuit tracking a sinusoid course
    (render_gif_pure_pursuit.rs)."""
    import jax.numpy as jnp

    from rust_robotics_tpu.control.trackers import (
        bicycle_kinematics, pure_pursuit_control)

    xs = jnp.linspace(0.0, 30.0, 301)
    pts = jnp.stack([xs, 2.0 * jnp.sin(xs / 5.0)], axis=-1)
    mask = jnp.ones(301)
    state = jnp.array([0.0, -2.0, 0.3, 1.0])
    traj = [np.asarray(state[:2])]
    for _ in range(steps):
        accel, steer, _ = pure_pursuit_control(state, pts, mask, 3.0)
        state = bicycle_kinematics(state, accel, steer, 0.1, 2.9)
        traj.append(np.asarray(state[:2]))
    traj = np.stack(traj)
    cfg = CanvasConfig(width=480, height=240, x_range=(-2, 32),
                       y_range=(-5, 5))
    rec = GifRecorder(path, cfg)
    course = np.asarray(pts)
    for k in range(0, steps, frame_stride):
        fr = Frame(cfg)
        fr.draw_path_xy(course[:, 0], course[:, 1], (160, 160, 160))
        fr.draw_path_xy(traj[: k + 1, 0], traj[: k + 1, 1], (255, 0, 0))
        fr.draw_robot(traj[k, 0], traj[k, 1],
                      np.arctan2(*(traj[min(k + 1, steps)] -
                                   traj[k])[::-1]) if k < steps else 0.0,
                      0.9, (0, 0, 0))
        rec.add_frame(fr)
    return rec.finish()


def render_gif_rrt(path, seed: int = 0, frame_stride: int = 20):
    """GIF of RRT* tree growth (render_gif_rrt.rs): edges appear in
    insertion order, final best path highlighted."""
    import jax
    import jax.numpy as jnp

    from rust_robotics_tpu.planning.rrt import (
        RRTConfig, extract_rrt_path, rrt_plan)

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
    cfg = CanvasConfig(width=360, height=360, x_range=(-2, 12),
                       y_range=(-2, 12))
    rec = GifRecorder(path, cfg)
    for upto in list(range(frame_stride, len(nodes), frame_stride)) + [
            len(nodes)]:
        fr = Frame(cfg)
        for o, r in zip(np.asarray(obs), np.asarray(rad)):
            fr.draw_circle(o[0], o[1], float(r), (120, 120, 120))
        for i in range(upto):
            if active[i] and 0 <= parents[i] < upto:
                a, b = nodes[i], nodes[parents[i]]
                fr.draw_path_xy([a[0], b[0]], [a[1], b[1]], (150, 180, 255),
                                0.8)
        rec.add_frame(fr)
    fr = Frame(cfg)
    for o, r in zip(np.asarray(obs), np.asarray(rad)):
        fr.draw_circle(o[0], o[1], float(r), (120, 120, 120))
    fr.draw_path_xy(pts[:, 0], pts[:, 1], (255, 0, 0), 2.0)
    rec.add_frame_with_delay(fr, 100)
    return rec.finish()


def render_gif_slam(path, steps: int = 80, frame_stride: int = 4):
    """GIF of EKF-SLAM (render_gif_slam.rs): truth vs estimate traces and
    the growing landmark map with covariance ellipses."""
    import jax.numpy as jnp

    from rust_robotics_tpu.slam.ekf_slam import (
        ekf_slam_step, init_ekf_slam)

    f = np.float64
    landmarks = jnp.asarray(np.array(
        [[6.0, 2.0], [2.0, 6.0], [8.0, 7.0], [-2.0, 3.0], [4.0, -2.0]]))
    belief = init_ekf_slam(landmarks.shape[0])
    truth = jnp.zeros(3)
    dt = 0.2
    t_trace, e_trace = [], []
    frames_data = []
    for k in range(steps):
        control = jnp.array([1.0, 0.25 * np.sin(0.07 * k)])
        # truth unicycle
        truth = truth + dt * jnp.array([
            control[0] * jnp.cos(truth[2]),
            control[0] * jnp.sin(truth[2]), control[1]])
        d = landmarks - truth[:2]
        rng = jnp.linalg.norm(d, axis=-1)
        brg = jnp.arctan2(d[:, 1], d[:, 0]) - truth[2]
        obs = jnp.stack([rng + 0.05 * jnp.sin(0.9 * k + jnp.arange(5)),
                         brg + 0.01 * jnp.cos(1.3 * k + jnp.arange(5))], -1)
        visible = rng < 6.0
        q_slam = jnp.diag(jnp.array([0.2, (5 * np.pi / 180) ** 2]))
        r_slam = jnp.diag(jnp.array([0.05, 0.01]) ** 2 * 25)
        belief = ekf_slam_step(belief, control, obs, visible, dt,
                               q_slam, r_slam)
        t_trace.append(np.asarray(truth[:2], f))
        e_trace.append(np.asarray(belief.mean[:2], f))
        if k % frame_stride == 0:
            frames_data.append((np.asarray(belief.mean).copy(),
                                np.asarray(belief.cov).copy(), k))
    t_trace, e_trace = np.stack(t_trace), np.stack(e_trace)
    cfg = CanvasConfig(width=360, height=360, x_range=(-5, 12),
                       y_range=(-5, 12))
    rec = GifRecorder(path, cfg)
    lm = np.asarray(landmarks)
    for mean, cov, k in frames_data:
        fr = Frame(cfg)
        fr.draw_points_xy(lm[:, 0], lm[:, 1], (0, 0, 0), 3.0)
        fr.draw_path_xy(t_trace[: k + 1, 0], t_trace[: k + 1, 1],
                        (0, 0, 255))
        fr.draw_path_xy(e_trace[: k + 1, 0], e_trace[: k + 1, 1],
                        (255, 0, 0))
        for j in range(lm.shape[0]):
            mx, my = mean[3 + 2 * j], mean[4 + 2 * j]
            p = cov[3 + 2 * j: 5 + 2 * j, 3 + 2 * j: 5 + 2 * j]
            w, v = np.linalg.eigh(p)
            ang = np.linspace(0, 2 * np.pi, 24)
            ell = (v @ np.diag(np.sqrt(np.maximum(w, 0))) @
                   np.stack([np.cos(ang), np.sin(ang)])) * 2.0
            fr.draw_path_xy(mx + ell[0], my + ell[1], (0, 160, 0), 0.8)
        rec.add_frame(fr)
    return rec.finish()


def render_svg_controller_arena(path, steps: int = 300):
    """SVG of the tracker arena (render_controller_arena_svg.rs): the shared
    course and each Tier-1 controller's closed-loop trajectory."""
    import jax
    import jax.numpy as jnp

    from rust_robotics_tpu.control.trackers import (
        bicycle_kinematics, lqr_steer_control, pure_pursuit_control,
        stanley_control)

    xs = jnp.linspace(0.0, 40.0, 401)
    pts = jnp.stack([xs, 2.0 * jnp.sin(xs / 8.0)], axis=-1)
    mask = jnp.ones(401)

    def rollout(fn, aux0=None):
        state = jnp.array([0.0, -1.0, 0.2, 0.0])
        aux = aux0
        traj = [np.asarray(state[:2])]
        for _ in range(steps):
            accel, steer, aux = fn(state, aux)
            state = bicycle_kinematics(state, accel, steer, 0.1, 2.9)
            traj.append(np.asarray(state[:2]))
        return np.stack(traj)

    def stateless(ctl):
        return lambda s, a: (*ctl(s, pts, mask, 3.0)[:2], a)

    runs = {
        "pure_pursuit": (rollout(stateless(pure_pursuit_control)),
                         (255, 0, 0)),
        "stanley": (rollout(stateless(stanley_control)), (0, 160, 0)),
        # LQR threads (e, θe) as controller state (lqr_steer_control.rs)
        "lqr_steer": (rollout(
            lambda s, a: lqr_steer_control(s, pts, mask, 3.0, a[0], a[1]),
            aux0=(0.0, 0.0)), (200, 120, 0)),
    }
    cfg = CanvasConfig(width=640, height=240, x_range=(-2, 42),
                       y_range=(-5, 5))
    svg = SvgCanvas(cfg)
    course = np.asarray(pts)
    svg.draw_path(course[:, 0], course[:, 1], (160, 160, 160), 1.0)
    for name, (traj, color) in runs.items():
        svg.draw_path(traj[:, 0], traj[:, 1], color, 1.2)
    return svg.save(path)


def render_svg_frontier_navigator(path):
    """SVG of frontier exploration (render_frontier_navigator_svg.rs):
    truth obstacles, the final revealed set, and the executed trajectory."""
    import jax.numpy as jnp

    from rust_robotics_tpu.planning.frontier import frontier_navigate

    truth = np.zeros((40, 40), bool)
    truth[15:25, 10:30] = True
    truth[5, 5:35] = True
    out = frontier_navigate(jnp.asarray(truth), (2, 2), (37, 37))
    traj = np.asarray(out["trajectory"], float)
    cfg = CanvasConfig(width=400, height=400, x_range=(0, 40),
                       y_range=(0, 40))
    svg = SvgCanvas(cfg)
    bx, by = np.nonzero(truth)
    svg.draw_points(bx + 0.5, by + 0.5, (120, 120, 120), 4.0)
    svg.draw_path(traj[:, 0] + 0.5, traj[:, 1] + 0.5, (255, 0, 0), 1.5)
    svg.draw_robot(traj[-1, 0] + 0.5, traj[-1, 1] + 0.5, 0.0, 1.0,
                   (0, 0, 255))
    return svg.save(path)


def render_svg_mppi_value_grid(path):
    """SVG of a wavefront terminal-value grid behind a wall with the
    value-guided MPPI trajectory (render_mppi_value_grid_svg.rs): cells
    shaded by cost-to-go band."""
    import jax
    import jax.numpy as jnp

    from rust_robotics_tpu.control.mppi import (
        MPPIConfig, double_integrator_dynamics, make_goal_costs, mppi_plan,
        shift_nominal)
    from rust_robotics_tpu.control.mppi_value import (
        TerminalValueGrid, make_value_terminal_cost)
    from rust_robotics_tpu.planning.wavefront import (
        goal_raster, wavefront_costs)

    res, origin, w, h = 0.25, (-2.0, -4.0), 48, 48
    goal = jnp.array([6.0, 0.0])
    free = np.ones((w, h), bool)
    free[int((2.5 - origin[0]) / res):int((2.5 - origin[0]) / res) + 2,
         :int((2.0 - origin[1]) / res)] = False
    vals = np.asarray(wavefront_costs(
        jnp.asarray(free),
        goal_raster((w, h), jnp.asarray(
            [int((goal[0] - origin[0]) / res),
             int((goal[1] - origin[1]) / res)]))) * res)
    grid = TerminalValueGrid(jnp.asarray(origin), jnp.asarray(res),
                             jnp.asarray(vals))
    stage, _ = make_goal_costs(goal)
    terminal = make_value_terminal_cost(grid, weight=30.0)
    cfg_m = MPPIConfig(horizon=25, num_samples=256, noise_sigma=(0.8, 0.8))
    state = jnp.array([0.0, 0.0, 0.0, 0.0])
    u = jnp.zeros((25, 2))
    key = jax.random.PRNGKey(7)
    traj = [np.asarray(state[:2])]
    for _ in range(50):
        key, sk = jax.random.split(key)
        u, first, _ = mppi_plan(sk, double_integrator_dynamics, stage,
                                terminal, state, u, cfg_m)
        state = double_integrator_dynamics(state, first, cfg_m.dt)
        u = shift_nominal(u)
        traj.append(np.asarray(state[:2]))
    traj = np.stack(traj)
    cfg = CanvasConfig(width=480, height=480, x_range=(-2, 10),
                       y_range=(-4, 8))
    svg = SvgCanvas(cfg)
    finite = np.isfinite(vals)
    bands = np.nanpercentile(vals[finite], [33, 66])
    xs, ys = np.meshgrid(np.arange(w), np.arange(h), indexing="ij")
    wx = xs * res + origin[0] + res / 2
    wy = ys * res + origin[1] + res / 2
    for lo, hi, color in [(-np.inf, bands[0], (200, 230, 200)),
                          (bands[0], bands[1], (250, 230, 160)),
                          (bands[1], np.inf, (250, 190, 190))]:
        m = finite & (vals > lo) & (vals <= hi)
        svg.draw_points(wx[m], wy[m], color, 3.0)
    bx, by = np.nonzero(~free)
    svg.draw_points(bx * res + origin[0] + res / 2,
                    by * res + origin[1] + res / 2, (60, 60, 60), 3.0)
    svg.draw_path(traj[:, 0], traj[:, 1], (255, 0, 0), 2.0)
    svg.draw_circle(float(goal[0]), float(goal[1]), 0.3, (0, 0, 255))
    return svg.save(path)


def render_svg_traversal_risk_graph(path):
    """SVG of risk-aware planning over ridge terrain
    (render_traversal_risk_graph_svg.rs): risk heat bands, blocked cells,
    direct vs risk-averse paths."""
    import jax.numpy as jnp

    from rust_robotics_tpu.demos.headless_family import _ridge_elevation
    from rust_robotics_tpu.planning.risk_graph import (
        combined_cell_risk, plan_risk_path, terrain_risk_from_elevation)

    risk = terrain_risk_from_elevation(jnp.asarray(_ridge_elevation()),
                                       blocking_step_height=1.0)
    total = np.asarray(combined_cell_risk(risk))
    w, h = total.shape
    cfg = CanvasConfig(width=450, height=270, x_range=(0, w),
                       y_range=(0, h))
    svg = SvgCanvas(cfg)
    xs, ys = np.meshgrid(np.arange(w), np.arange(h), indexing="ij")
    for lo, hi, color in [(0.5, 3.0, (250, 230, 160)),
                          (3.0, np.inf, (250, 170, 170))]:
        m = (total > lo) & (total <= hi)
        svg.draw_points(xs[m] + 0.5, ys[m] + 0.5, color, 6.0)
    blk = np.asarray(risk.blocked)
    svg.draw_points(xs[blk] + 0.5, ys[blk] + 0.5, (60, 60, 60), 6.0)
    for weight, color in ((0.0, (200, 0, 0)), (8.0, (0, 0, 255))):
        idx, mask, _ = plan_risk_path(risk, (0, 4), (14, 4),
                                      risk_weight=weight)
        p = np.asarray(idx)[np.asarray(mask)]
        svg.draw_path(p[:, 0] + 0.5, p[:, 1] + 0.5, color, 1.8)
    return svg.save(path)


def render_svg_stl_cbs_multi_robot(path):
    """SVG of the STL-CBS three-robot solution
    (render_stl_cbs_multi_robot_svg.rs)."""
    import jax.numpy as jnp

    from rust_robotics_tpu.demos.headless_family import _corridor_map
    from rust_robotics_tpu.planning.stl import stl_cbs_plan

    free = _corridor_map()
    out = stl_cbs_plan(jnp.asarray(free), [(0, 1), (0, 7), (15, 4)],
                       [(15, 7), (15, 1), (0, 4)], t_max=28,
                       min_separation=1.0)
    w, h = free.shape
    cfg = CanvasConfig(width=480, height=270, x_range=(0, w),
                       y_range=(0, h))
    svg = SvgCanvas(cfg)
    bx, by = np.nonzero(~free)
    svg.draw_points(bx + 0.5, by + 0.5, (60, 60, 60), 8.0)
    colors = [(255, 0, 0), (0, 160, 0), (0, 0, 255)]
    for i, p in enumerate(np.asarray(out["paths"], float)):
        svg.draw_path(p[:, 0] + 0.5, p[:, 1] + 0.5, colors[i], 1.5)
    return svg.save(path)


def render_svg_kinodynamic_stl_cbs(path):
    """SVG comparing speed-1 vs kinodynamic speed-2 STL-CBS paths
    (render_kinodynamic_stl_cbs_svg.rs)."""
    import jax.numpy as jnp

    from rust_robotics_tpu.demos.headless_family import _corridor_map
    from rust_robotics_tpu.planning.stl import (
        StlRectangle, kinodynamic_stl_cbs_plan, stl_cbs_plan)

    free = _corridor_map()
    avoid = ((StlRectangle(4.0, 6.0, 3.0, 5.0), (0, 25)),)
    slow = stl_cbs_plan(jnp.asarray(free), [(0, 1)], [(15, 1)], t_max=26,
                        avoid_regions=avoid)
    fast = kinodynamic_stl_cbs_plan(jnp.asarray(free), [(0, 1)], [(15, 1)],
                                    t_max=26, avoid_regions=avoid)
    w, h = free.shape
    cfg = CanvasConfig(width=480, height=270, x_range=(0, w),
                       y_range=(0, h))
    svg = SvgCanvas(cfg)
    bx, by = np.nonzero(~free)
    svg.draw_points(bx + 0.5, by + 0.5, (60, 60, 60), 8.0)
    # the STL geofence
    rect = np.array([[4, 3], [6, 3], [6, 5], [4, 5], [4, 3]], float)
    svg.draw_path(rect[:, 0], rect[:, 1], (250, 170, 170), 1.5)
    for out, color in ((slow, (200, 120, 0)), (fast, (0, 0, 255))):
        p = np.asarray(out["paths"][0], float)
        a = int(out["arrivals"][0])
        svg.draw_path(p[: a + 1, 0] + 0.5, p[: a + 1, 1] + 0.5, color, 1.5)
    return svg.save(path)


def render_svg_safe_decode_nav(path):
    """SVG of STL-shielded decoding (render_safe_decode_nav_svg.rs): greedy
    vs shielded path around the hazard geofence."""
    from rust_robotics_tpu.planning.stl import StlRectangle, safe_decode_nav

    free = np.ones((12, 12), bool)
    hazard = StlRectangle(3.0, 8.0, 3.0, 8.0)
    out = safe_decode_nav(free, (0, 0), (11, 11), t_max=30,
                          avoid_regions=((hazard, (0, 29)),))
    cfg = CanvasConfig(width=360, height=360, x_range=(0, 12),
                       y_range=(0, 12))
    svg = SvgCanvas(cfg)
    rect = np.array([[3, 3], [8, 3], [8, 8], [3, 8], [3, 3]], float)
    svg.draw_path(rect[:, 0], rect[:, 1], (250, 170, 170), 2.0)
    g = np.asarray(out["greedy_path"], float)
    s = np.asarray(out["shielded_path"], float)
    svg.draw_path(g[:, 0] + 0.5, g[:, 1] + 0.5, (200, 120, 0), 1.2)
    svg.draw_path(s[:, 0] + 0.5, s[:, 1] + 0.5, (0, 0, 255), 1.8)
    return svg.save(path)


def render_svg_rigid_body_mip_planning(path):
    """SVG of the rigid-body lattice plan through the slot
    (render_rigid_body_mip_planning_svg.rs): obstacle boxes and the
    oriented robot footprint along the path."""
    from rust_robotics_tpu.planning.rigid_body import (
        RigidBodyConfig, aabb_obstacle, rigid_body_lattice_plan)

    cfg_rb = RigidBodyConfig(position_step=0.5, heading_count=8)
    obstacles = (aabb_obstacle(3.0, 4.5, 0.0, 4.4),
                 aabb_obstacle(3.0, 4.5, 5.6, 10.0))
    out = rigid_body_lattice_plan((1.0, 5.0, 0.0), (9.0, 5.0, 0.0),
                                  obstacles, cfg_rb)
    poses = np.asarray(out["poses"])
    cfg = CanvasConfig(width=400, height=400, x_range=(0, 10),
                       y_range=(0, 10))
    svg = SvgCanvas(cfg)
    for (x0, x1, y0, y1) in ((3.0, 4.5, 0.0, 4.4), (3.0, 4.5, 5.6, 10.0)):
        box = np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]])
        svg.draw_path(box[:, 0], box[:, 1], (120, 120, 120), 1.5)
    svg.draw_path(poses[:, 0], poses[:, 1], (255, 0, 0), 1.5)
    for p in poses[:: max(1, len(poses) // 10)]:
        svg.draw_robot(p[0], p[1], p[2], 0.55, (0, 0, 255))
    return svg.save(path)


def render_svg_branchout_multimodal_driving(path):
    """SVG of the branchout overtake (render_branchout_multimodal_driving_svg.rs):
    lane lines, obstacle, per-mode candidate trajectories, executed path."""
    import jax.numpy as jnp

    from rust_robotics_tpu.planning.branchout import (
        BranchOutScene, branchout_plan, simulate_closed_loop)

    scene = BranchOutScene.simple_overtake()
    plan = branchout_plan(scene)
    rep = simulate_closed_loop(scene, obstacle_velocities=((0.4, 0.0),),
                               steps=40)
    executed = np.asarray(rep["executed_path"], float)
    cfg = CanvasConfig(width=600, height=240, x_range=(-1, 11),
                       y_range=(-2.5, 2.5))
    svg = SvgCanvas(cfg)
    for lane in (-1, 0, 1):
        y = lane * scene.lane_width
        svg.draw_path([-1, 11], [y, y], (200, 200, 200), 0.8)
    for (ox, oy, orr) in np.asarray(scene.obstacles, float):
        svg.draw_circle(ox, oy, orr, (120, 120, 120), fill=True)
    colors = [(200, 120, 0), (0, 160, 0), (0, 0, 255), (160, 0, 200)]
    trajs = np.asarray(plan["poses"], float)
    for i in range(trajs.shape[0]):
        svg.draw_path(trajs[i, :, 0], trajs[i, :, 1], colors[i % 4], 0.8)
    svg.draw_path(executed[:, 0], executed[:, 1], (255, 0, 0), 2.0)
    return svg.save(path)


def render_svg_euroc_vio(path):
    """SVG of the EuRoC fixture VIO replay (render_euroc_vio_svg.rs):
    ground-truth xy track vs dead-reckoned and fused estimates."""
    import dataclasses

    from rust_robotics_tpu.data.euroc import EurocDataset
    from rust_robotics_tpu.data.fixtures import reference_fixture_root
    from rust_robotics_tpu.slam.vio import nav_to_se3, run_vio_pipeline

    root = reference_fixture_root("euroc_mini")
    if not root:  # reference checkout absent: nothing to draw
        return None
    ds = EurocDataset.load(root)
    tracks = ds.load_feature_tracks()
    res = run_vio_pipeline(ds, tracks)
    gt = np.asarray(ds.ground_truth.positions, float)
    fused = np.asarray(res.fused_poses)[:, :2, 3]
    dead = np.asarray(nav_to_se3(res.dead_reckoned))[:, :2, 3]
    lo = gt[:, :2].min(0) - 0.5
    hi = gt[:, :2].max(0) + 0.5
    cfg = CanvasConfig(width=480, height=480,
                       x_range=(float(lo[0]), float(hi[0])),
                       y_range=(float(lo[1]), float(hi[1])))
    svg = SvgCanvas(cfg)
    svg.draw_path(gt[:, 0], gt[:, 1], (160, 160, 160), 1.5)
    svg.draw_path(dead[:, 0], dead[:, 1], (200, 120, 0), 1.0)
    svg.draw_path(fused[:, 0], fused[:, 1], (0, 0, 255), 1.5)
    return svg.save(path)


def render_svg_mppi_track_progress(path):
    """SVG of track-progress MPPI (render_mppi_track_progress_svg.rs):
    waypoint track and the value-guided rollout."""
    import jax
    import jax.numpy as jnp

    from rust_robotics_tpu.control.mppi import (
        MPPIConfig, double_integrator_dynamics, mppi_plan, shift_nominal)
    from rust_robotics_tpu.control.mppi_value import (
        make_track, make_value_terminal_cost, track_project,
        track_terminal_value_grid)

    wps = jnp.asarray(np.stack([np.linspace(0.0, 8.0, 9),
                                np.sin(np.linspace(0.0, 8.0, 9))], -1))
    track = make_track(wps)
    grid = track_terminal_value_grid(track, 64, 48, (-1.0, -3.0), 0.15,
                                     progress_weight=4.0, lateral_weight=2.0)
    terminal = make_value_terminal_cost(grid, weight=3.0)

    def stage(state, u):
        arc, lat, _ = track_project(track, state[..., :2])
        return 2.0 * lat ** 2 + 0.01 * jnp.sum(u ** 2, axis=-1)

    cfg_m = MPPIConfig(horizon=25, num_samples=256, noise_sigma=(0.7, 0.7))
    state = jnp.array([0.0, 0.0, 0.0, 0.0])
    u = jnp.zeros((25, 2))
    key = jax.random.PRNGKey(0)
    traj = [np.asarray(state[:2])]
    for _ in range(55):
        key, sk = jax.random.split(key)
        u, first, _ = mppi_plan(sk, double_integrator_dynamics, stage,
                                terminal, state, u, cfg_m)
        state = double_integrator_dynamics(state, first, cfg_m.dt)
        u = shift_nominal(u)
        traj.append(np.asarray(state[:2]))
    traj = np.stack(traj)
    cfg = CanvasConfig(width=540, height=300, x_range=(-1, 9),
                       y_range=(-2.5, 2.5))
    svg = SvgCanvas(cfg)
    w = np.asarray(wps)
    svg.draw_path(w[:, 0], w[:, 1], (160, 160, 160), 1.5)
    svg.draw_points(w[:, 0], w[:, 1], (0, 0, 0), 3.0)
    svg.draw_path(traj[:, 0], traj[:, 1], (255, 0, 0), 1.8)
    return svg.save(path)


def render_svg_mppi_racing_gate_progress(path):
    """SVG (xy top-down) of the powertrain-aware gate race
    (render_mppi_racing_gate_progress_svg.rs)."""
    import jax

    from rust_robotics_tpu.control.racing import (
        GatePlane, PowertrainParams, simulate_gate_race)

    gates = [GatePlane(center=(3.0, 0.0, 1.5), normal=(1.0, 0.0, 0.0),
                       half_width=1.2, half_height=1.2),
             GatePlane(center=(6.0, 0.0, 1.5), normal=(1.0, 0.0, 0.0),
                       half_width=1.2, half_height=1.2)]
    p = PowertrainParams(motor_tau=0.05, discharge_rate=0.05,
                         sag_coeff=0.15)
    rep = simulate_gate_race(jax.random.PRNGKey(0), gates, p, steps=60,
                             num_samples=96, horizon=12, aware=True)
    traj = np.asarray(rep["trajectory"], float)
    cfg = CanvasConfig(width=480, height=320, x_range=(-1, 8),
                       y_range=(-3, 3))
    svg = SvgCanvas(cfg)
    for g in gates:
        cx, cy, _ = g.center
        svg.draw_path([cx, cx], [cy - g.half_width, cy + g.half_width],
                      (0, 160, 0), 2.5)
    svg.draw_path(traj[:, 0], traj[:, 1], (255, 0, 0), 1.5)
    svg.draw_robot(traj[-1, 0], traj[-1, 1], 0.0, 0.4, (0, 0, 255))
    return svg.save(path)


def render_svg_adap_rpf_mppi(path):
    """SVG of adaptive following-point person following
    (render_adap_rpf_mppi_svg.rs): target walk, pedestrian, and the robot
    track for fixed vs adaptive sampling."""
    # re-run the headless sim but keep the executed positions
    import jax
    import jax.numpy as jnp

    from rust_robotics_tpu.control.mppi import (
        MPPIConfig, double_integrator_dynamics, mppi_plan, shift_nominal)
    from rust_robotics_tpu.control.mppi_variants import (
        make_person_following_costs)

    steps, dt = 30, 0.1
    cfg_m = MPPIConfig(horizon=16, num_samples=256, dt=dt,
                       noise_sigma=(0.6, 0.6))
    ks = np.arange(steps + 17)
    target = np.stack([0.6 * ks * dt + 1.5, np.zeros_like(ks, float)], -1)

    def run(offset):
        state = jnp.array([-2.0, 1.0, 0.0, 0.0])
        u = jnp.zeros((16, 2))
        key = jax.random.PRNGKey(5)
        traj = [np.asarray(state[:2])]
        for k in range(steps):
            fp_traj = jnp.asarray(target[k:k + 16] + offset)
            stage, terminal = make_person_following_costs(fp_traj,
                                                          standoff=0.0)
            key, sk = jax.random.split(key)
            u, first, _ = mppi_plan(sk, double_integrator_dynamics, stage,
                                    terminal, state, u, cfg_m)
            state = double_integrator_dynamics(state, first, dt)
            u = shift_nominal(u)
            traj.append(np.asarray(state[:2]))
        return np.stack(traj)

    fixed = run(np.array([-1.5, 0.0]))
    adaptive = run(np.array([-1.05, 1.05]))
    cfg = CanvasConfig(width=540, height=270, x_range=(-3, 6),
                       y_range=(-2, 3))
    svg = SvgCanvas(cfg)
    svg.draw_path(target[:steps, 0], target[:steps, 1], (160, 160, 160),
                  1.5)
    ped = target[:steps] - np.array([1.5, 0.0])
    svg.draw_path(ped[:, 0], ped[:, 1], (0, 0, 0), 1.0)
    svg.draw_path(fixed[:, 0], fixed[:, 1], (200, 120, 0), 1.5)
    svg.draw_path(adaptive[:, 0], adaptive[:, 1], (0, 0, 255), 1.5)
    return svg.save(path)


def render_svg_hierarchical_mapf_replanning(path):
    """SVG of the hierarchical MAPF solution with region grid
    (render_hierarchical_mapf_replanning_svg.rs)."""
    import jax.numpy as jnp

    from rust_robotics_tpu.planning.stl import hierarchical_mapf_plan

    free = np.ones((24, 24), bool)
    free[12, 0:20] = False
    out = hierarchical_mapf_plan(jnp.asarray(free), [(2, 2), (2, 21)],
                                 [(21, 21), (21, 2)], t_max=64,
                                 region_size=8)
    cfg = CanvasConfig(width=400, height=400, x_range=(0, 24),
                       y_range=(0, 24))
    svg = SvgCanvas(cfg)
    for r in range(0, 25, 8):  # region boundaries
        svg.draw_path([r, r], [0, 24], (220, 220, 220), 0.6)
        svg.draw_path([0, 24], [r, r], (220, 220, 220), 0.6)
    bx, by = np.nonzero(~free)
    svg.draw_points(bx + 0.5, by + 0.5, (60, 60, 60), 6.0)
    colors = [(255, 0, 0), (0, 0, 255)]
    for i, p in enumerate(np.asarray(out["paths"], float)):
        a = int(out["arrivals"][i])
        svg.draw_path(p[: a + 1, 0] + 0.5, p[: a + 1, 1] + 0.5, colors[i],
                      1.5)
    return svg.save(path)


RENDERS = {
    "render_gif_ekf_localization": render_gif_ekf_localization,
    "render_gif_particle_filter": render_gif_particle_filter,
    "render_gif_dwa_navigation": render_gif_dwa_navigation,
    "render_gif_pure_pursuit": render_gif_pure_pursuit,
    "render_gif_rrt": render_gif_rrt,
    "render_gif_slam": render_gif_slam,
    "render_svg_path_planning": render_svg_path_planning,
    "render_svg_rrt": render_svg_rrt,
    "render_svg_pose_graph": render_svg_pose_graph,
    "render_svg_dubins": render_svg_dubins,
    "render_svg_any_angle": render_svg_any_angle,
    "render_svg_controller_arena": render_svg_controller_arena,
    "render_svg_frontier_navigator": render_svg_frontier_navigator,
    "render_svg_mppi_value_grid": render_svg_mppi_value_grid,
    "render_svg_traversal_risk_graph": render_svg_traversal_risk_graph,
    "render_svg_stl_cbs_multi_robot": render_svg_stl_cbs_multi_robot,
    "render_svg_kinodynamic_stl_cbs": render_svg_kinodynamic_stl_cbs,
    "render_svg_safe_decode_nav": render_svg_safe_decode_nav,
    "render_svg_rigid_body_mip_planning": render_svg_rigid_body_mip_planning,
    "render_svg_branchout_multimodal_driving":
        render_svg_branchout_multimodal_driving,
    "render_svg_euroc_vio": render_svg_euroc_vio,
    "render_svg_mppi_track_progress": render_svg_mppi_track_progress,
    "render_svg_mppi_racing_gate_progress":
        render_svg_mppi_racing_gate_progress,
    "render_svg_adap_rpf_mppi": render_svg_adap_rpf_mppi,
    "render_svg_hierarchical_mapf_replanning":
        render_svg_hierarchical_mapf_replanning,
}
