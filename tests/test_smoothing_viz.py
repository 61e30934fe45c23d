"""Path smoothing (any-angle) + rasterizer/GIF tests."""

import os

import jax.numpy as jnp
import numpy as np

from rust_robotics_tpu.planning.grid import grid_from_raster
from rust_robotics_tpu.planning.smoothing import relax_path, shortcut_path
from rust_robotics_tpu.planning.wavefront import (
    extract_path,
    goal_raster,
    wavefront_costs,
)
from rust_robotics_tpu.viz.raster import (
    CanvasConfig,
    Frame,
    GifRecorder,
    save_png,
)


def plan_and_smooth():
    blocked = np.zeros((20, 20), dtype=bool)
    blocked[8, 0:14] = True
    g = grid_from_raster(blocked)
    goal = jnp.array([17, 3])
    costs = wavefront_costs(g.free(), goal_raster((20, 20), goal))
    idx, mask, cost = extract_path(costs, g.free(), jnp.array([2, 2]), max_len=64)
    pts = idx.astype(jnp.float64)
    return g, pts, mask, float(cost)


def test_shortcut_reduces_length():
    g, pts, mask, grid_cost = plan_and_smooth()
    keep, total = shortcut_path(
        pts, mask.astype(jnp.float64), g.blocked, g.min_x, g.min_y,
        g.resolution,
    )
    assert float(total) <= grid_cost + 1e-9
    # straight-line lower bound
    valid = np.asarray(mask) > 0
    p = np.asarray(pts)[valid]
    lower = np.linalg.norm(p[-1] - p[0])
    assert float(total) >= lower - 1e-9
    kept = np.asarray(keep)
    assert kept[np.nonzero(valid)[0][0]]
    # fewer vertices than the grid path
    assert kept.sum() < valid.sum()


def test_relax_keeps_endpoints_and_los():
    g, pts, mask, _ = plan_and_smooth()
    relaxed = relax_path(
        pts, mask.astype(jnp.float64), g.blocked, g.min_x, g.min_y,
        g.resolution,
    )
    valid = np.asarray(mask) > 0
    np.testing.assert_allclose(
        np.asarray(relaxed)[0], np.asarray(pts)[0], atol=1e-12
    )
    # relaxed path strictly not longer (it smooths corners)
    def plen(a):
        a = np.asarray(a)[valid]
        return np.linalg.norm(np.diff(a, axis=0), axis=1).sum()

    assert plen(relaxed) <= plen(pts) + 1e-9


def test_raster_and_gif(tmp_path):
    cfg = CanvasConfig(width=120, height=120, x_range=(-5, 5), y_range=(-5, 5))
    rec = GifRecorder(os.path.join(tmp_path, "demo.gif"), cfg)
    for k in range(4):
        fr = Frame(cfg)
        th = np.linspace(0, 2 * np.pi, 50)
        fr.draw_path_xy(3 * np.cos(th), 3 * np.sin(th), (60, 120, 216))
        fr.draw_robot(0.5 * k, 0.0, 0.3 * k, 0.5, (216, 84, 60))
        fr.draw_ellipse(0, 0, 2, 1, 0.4, (0, 128, 0))
        fr.draw_points_xy([1, 2], [-1, -2], (0, 0, 0), 2)
        rec.add_frame(fr)
    out = rec.finish()
    assert os.path.getsize(out) > 500
    png = save_png(fr, os.path.join(tmp_path, "frame.png"))
    assert os.path.getsize(png) > 200
    # drawing actually placed ink
    assert (fr.rgb != 255).any()
