"""Render demos (GIF/SVG/PNG writers) + property-style robustness sweeps
(the reference's proptest_filters.rs:57-105 analog: filters never produce
non-finite state and respect a travel bound over randomized commands)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rust_robotics_tpu.demos.render import (
    render_gif_dwa_navigation,
    render_gif_ekf_localization,
    render_gif_particle_filter,
    render_svg_any_angle,
    render_svg_dubins,
    render_svg_path_planning,
    render_svg_pose_graph,
    render_svg_rrt,
)


def _assert_gif(p, min_size=500):
    assert os.path.getsize(p) > min_size
    with open(p, "rb") as f:
        assert f.read(6) in (b"GIF87a", b"GIF89a")


def _assert_svg(p):
    text = open(p).read()
    assert text.startswith("<svg")
    assert "polyline" in text
    assert text.rstrip().endswith("</svg>")


def test_render_gif_ekf(tmp_path):
    _assert_gif(render_gif_ekf_localization(tmp_path / "ekf.gif", steps=45))


@pytest.mark.slow
def test_render_gif_family(tmp_path):
    """The reference's render_gif_* gallery analog (Cargo.toml:60-470)."""
    _assert_gif(render_gif_particle_filter(tmp_path / "pf.gif", steps=40,
                                           num_particles=200))
    _assert_gif(render_gif_dwa_navigation(tmp_path / "dwa.gif", steps=60))


def test_render_svg_planners(tmp_path):
    p1 = render_svg_path_planning(tmp_path / "plan.svg")
    p2 = render_svg_rrt(tmp_path / "rrt.svg")
    for p in (p1, p2):
        _assert_svg(p)


@pytest.mark.slow
def test_render_svg_family(tmp_path):
    """render_*_svg gallery analog: pose-graph before/after, Dubins fan,
    any-angle comparison."""
    _assert_svg(render_svg_pose_graph(tmp_path / "pg.svg", size=120))
    _assert_svg(render_svg_dubins(tmp_path / "dubins.svg"))
    _assert_svg(render_svg_any_angle(tmp_path / "aa.svg"))


def test_png_writer(tmp_path):
    from rust_robotics_tpu.viz.raster import CanvasConfig, Frame, save_png

    cfg = CanvasConfig(width=64, height=64)
    fr = Frame(cfg)
    fr.draw_circle(0.0, 0.0, 3.0, (255, 0, 0))
    p = save_png(fr, tmp_path / "t.png")
    with open(p, "rb") as f:
        assert f.read(8)[1:4] == b"PNG"


# ---------------------------------------------------------------------------
# property-style sweeps (proptest_filters.rs analog)


@pytest.mark.parametrize("seed", range(6))
def test_filters_finite_and_bounded_under_random_commands(seed):
    """EKF/UKF/PF over randomized (steps, v, yaw_rate) never produce
    non-finite state and never travel beyond the speed × time bound."""
    from rust_robotics_tpu.core.types import GaussianBelief
    from rust_robotics_tpu.filters.kalman import ekf_step, ukf_step
    from rust_robotics_tpu.filters.particle import (
        init_particles,
        pf_step,
    )
    from rust_robotics_tpu.models.motion import unicycle_propagate

    rng = np.random.default_rng(seed)
    steps = int(rng.integers(5, 40))
    v = float(rng.uniform(0.1, 3.0))
    yaw_rate = float(rng.uniform(-1.0, 1.0))
    dt = 0.1
    q = jnp.diag(jnp.array([0.1, 0.1, 0.02, 0.5])) ** 2
    r = jnp.diag(jnp.array([0.4, 0.4])) ** 2
    u = jnp.array([v, yaw_rate])
    landmarks = jnp.array([[10.0, 0.0], [0.0, 10.0], [-8.0, 4.0]])

    truth = jnp.zeros(4)
    be = GaussianBelief(jnp.zeros(4), jnp.eye(4))
    bu = GaussianBelief(jnp.zeros(4), jnp.eye(4))
    bp = init_particles(jax.random.PRNGKey(seed), jnp.zeros(4), 0.2, 128)
    key = jax.random.PRNGKey(seed + 100)
    for k in range(steps):
        truth = unicycle_propagate(truth, u, dt)
        z = truth[:2] + 0.1 * jnp.array([np.sin(0.7 * k), np.cos(0.9 * k)])
        be = ekf_step(be, z, u, dt, q, r)
        bu = ukf_step(bu, z, u, dt, q, r)
        ranges = jnp.linalg.norm(landmarks - truth[:2], axis=-1)
        key, kk = jax.random.split(key)
        bp, gp = pf_step(bp, u, ranges, landmarks, dt, kk,
                         control_noise_std=jnp.array([0.2, 0.1]),
                         range_noise=0.3)

    bound = v * dt * steps + 3.0  # travel bound + noise slack
    for est in (be.mean, bu.mean, gp.mean):
        a = np.asarray(est)
        assert np.all(np.isfinite(a)), a
        assert np.linalg.norm(a[:2]) <= bound, (a, bound)
    for cov in (be.cov, bu.cov):
        c = np.asarray(cov)
        assert np.all(np.isfinite(c))
        assert np.all(np.linalg.eigvalsh(c) > -1e-8)


@pytest.mark.parametrize("seed", range(4))
def test_planners_never_return_invalid_cells(seed):
    """Wavefront plans over random maps: returned cells are always free and
    8-connected, costs are nonnegative/monotone."""
    from rust_robotics_tpu.planning.wavefront import (
        extract_path,
        goal_raster,
        wavefront_costs,
    )

    rng = np.random.default_rng(seed)
    free = rng.uniform(size=(24, 24)) > 0.25
    free[1, 1] = free[22, 22] = True
    costs = wavefront_costs(jnp.asarray(free),
                            goal_raster((24, 24), jnp.array([22, 22])))
    idx, mask, cost = extract_path(costs, jnp.asarray(free),
                                   jnp.array([1, 1]))
    cells = np.asarray(idx)[np.asarray(mask)]
    assert all(free[tuple(c)] for c in cells)
    d = np.abs(np.diff(cells, axis=0)).max(axis=1)
    assert (d <= 1).all()
    c = np.asarray(costs)
    finite = c[np.isfinite(c)]
    assert (finite >= 0).all()
