"""Visual frontend tests: corners on a checkerboard, LK on a known shift,
forward-backward gating, triangulation."""

import jax
import jax.numpy as jnp
import numpy as np

from rust_robotics_tpu.core.lie import se3_exp
from rust_robotics_tpu.slam.visual_frontend import (
    detect_corners,
    lk_track,
    shi_tomasi_response,
    track_with_fb_check,
    triangulate_tracks,
)


def smooth_noise(key, h=96, w=128, blur=5):
    img = jax.random.uniform(key, (h, w))
    k = jnp.ones((blur, blur)) / (blur * blur)
    return jax.scipy.signal.convolve2d(img, k, mode="same")


def shift_image(img, dx, dy):
    """Subpixel shift via bilinear resampling (content moves by +dx, +dy)."""
    h, w = img.shape
    yy, xx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float64),
                          jnp.arange(w, dtype=jnp.float64), indexing="ij")
    from rust_robotics_tpu.slam.visual_frontend import _bilinear

    coords = jnp.stack([xx - dx, yy - dy], axis=-1)
    return _bilinear(img, coords)


def test_corners_on_checkerboard():
    tile = 12
    h = w = 8 * tile
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    board = (((yy // tile) + (xx // tile)) % 2).astype(float)
    pts, vals = detect_corners(jnp.asarray(board), max_features=49)
    # corners cluster at tile intersections: distance to nearest lattice
    # crossing is small
    lat = np.arange(tile, h, tile) - 0.5
    p = np.asarray(pts)
    good = 0
    for x, y in p:
        dx = np.min(np.abs(lat - x))
        dy = np.min(np.abs(lat - y))
        if dx < 2.5 and dy < 2.5:
            good += 1
    assert good > 30, good


def test_lk_recovers_shift():
    key = jax.random.PRNGKey(0)
    img0 = smooth_noise(key).astype(jnp.float64)
    shift = (3.3, -2.1)
    img1 = shift_image(img0, *shift)
    pts, _ = detect_corners(img0, max_features=40, border=16)
    new_pts, valid = lk_track(img0, img1, pts.astype(jnp.float64))
    flow = np.asarray(new_pts - pts)[np.asarray(valid)]
    assert len(flow) > 20
    med = np.median(flow, axis=0)
    np.testing.assert_allclose(med, shift, atol=0.25)


def test_forward_backward_gate():
    key = jax.random.PRNGKey(1)
    img0 = smooth_noise(key).astype(jnp.float64)
    img1 = shift_image(img0, 2.0, 1.0)
    pts, _ = detect_corners(img0, max_features=30, border=16)
    fwd, ok, err = track_with_fb_check(img0, img1, pts.astype(jnp.float64))
    assert int(ok.sum()) > 15
    assert float(err[ok].max()) < 1.0


def test_triangulation_recovers_points():
    intr = (300.0, 300.0, 64.0, 48.0)
    tangents = jnp.array(
        [[0.0, 0, 0, 0, 0, 0], [0.5, 0, 0, 0, 0, 0], [1.0, 0.2, 0, 0, 0, 0],
         [1.5, -0.1, 0, 0, 0.05, 0]]
    )
    cams = se3_exp(tangents.astype(jnp.float64))
    rng = np.random.default_rng(0)
    pts3d = np.stack(
        [rng.uniform(-1, 2, 12), rng.uniform(-1, 1, 12), rng.uniform(3, 6, 12)],
        -1,
    )
    pix = np.zeros((12, 4, 2))
    for v in range(4):
        inv = np.linalg.inv(np.asarray(cams[v]))
        for l in range(12):
            pc = inv[:3, :3] @ pts3d[l] + inv[:3, 3]
            pix[l, v] = [300 * pc[0] / pc[2] + 64, 300 * pc[1] / pc[2] + 48]
    mask = np.ones((12, 4), bool)
    got = triangulate_tracks(cams, jnp.asarray(pix), jnp.asarray(mask), intr)
    np.testing.assert_allclose(np.asarray(got), pts3d, atol=1e-6)
