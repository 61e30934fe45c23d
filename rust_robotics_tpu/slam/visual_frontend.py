"""Sparse visual frontend: Shi-Tomasi corners, pyramidal Lucas-Kanade flow,
forward-backward checking, multi-view triangulation.

Reference: slam/src/visual_frontend.rs (656 LoC) — Shi-Tomasi detection
with spatial distribution, pyramidal LK optical flow with forward/backward
consistency (`FeatureTracker::process` :160), IMU-seeded triangulation
(`triangulate_tracks` :260); drives generate_euroc_feature_tracks
(docs/datasets.md:36-49).

TPU-native: gradients/structure tensors are depthwise convolutions;
pyramid levels are strided average pools; LK iterations are batched over
ALL tracked points at once (gather-based bilinear sampling); triangulation
is a batched least-squares solve. Everything jits.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _conv2(img, kernel):
    return jax.scipy.signal.convolve2d(img, kernel, mode="same")


_SOBEL_X = jnp.array([[-1.0, 0.0, 1.0], [-2.0, 0.0, 2.0], [-1.0, 0.0, 1.0]]) / 8.0
_SOBEL_Y = _SOBEL_X.T


def image_gradients(img):
    # convolve2d performs true convolution (kernel flipped); Sobel is
    # antisymmetric, so negate to get the correlation-convention gradient
    return -_conv2(img, _SOBEL_X), -_conv2(img, _SOBEL_Y)


def shi_tomasi_response(img, window: int = 5):
    """Min-eigenvalue corner response (visual_frontend.rs Shi-Tomasi)."""
    ix, iy = image_gradients(img)
    box = jnp.ones((window, window)) / (window * window)
    sxx = _conv2(ix * ix, box)
    syy = _conv2(iy * iy, box)
    sxy = _conv2(ix * iy, box)
    tr = sxx + syy
    det = sxx * syy - sxy * sxy
    disc = jnp.sqrt(jnp.clip(tr * tr / 4.0 - det, 0.0, None))
    return tr / 2.0 - disc  # smaller eigenvalue


def detect_corners(img, max_features: int = 100, nms_radius: int = 5,
                   border: int = 8):
    """Top-K spatially-NMS'd corners; returns (xy [K, 2] float (col, row),
    response [K]). Distribution via strict local-max NMS (the reference's
    per-cell distribution has the same intent)."""
    resp = shi_tomasi_response(img)
    h, w = resp.shape
    k = 2 * nms_radius + 1
    local_max = jax.lax.reduce_window(
        resp, -jnp.inf, jax.lax.max, (k, k), (1, 1), "SAME"
    )
    is_peak = (resp >= local_max) & (resp > 0)
    rr = jax.lax.broadcasted_iota(jnp.int32, resp.shape, 0)
    cc = jax.lax.broadcasted_iota(jnp.int32, resp.shape, 1)
    inb = (rr >= border) & (rr < h - border) & (cc >= border) & (cc < w - border)
    scores = jnp.where(is_peak & inb, resp, -jnp.inf).ravel()
    vals, idx = jax.lax.top_k(scores, max_features)
    ys = (idx // w).astype(jnp.float32)
    xs = (idx % w).astype(jnp.float32)
    return jnp.stack([xs, ys], axis=-1), vals


def _bilinear(img, xy):
    """Sample img at float (x=col, y=row) positions [..., 2]."""
    h, w = img.shape
    x = jnp.clip(xy[..., 0], 0.0, w - 1.001)
    y = jnp.clip(xy[..., 1], 0.0, h - 1.001)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    fx = x - x0
    fy = y - y0
    v00 = img[y0, x0]
    v01 = img[y0, x0 + 1]
    v10 = img[y0 + 1, x0]
    v11 = img[y0 + 1, x0 + 1]
    return (
        v00 * (1 - fx) * (1 - fy)
        + v01 * fx * (1 - fy)
        + v10 * (1 - fx) * fy
        + v11 * fx * fy
    )


def _downsample(img):
    h, w = img.shape
    h2, w2 = (h // 2) * 2, (w // 2) * 2
    c = img[:h2, :w2]
    return 0.25 * (c[0::2, 0::2] + c[1::2, 0::2] + c[0::2, 1::2] + c[1::2, 1::2])


@functools.partial(jax.jit, static_argnames=("window", "levels", "iterations"))
def lk_track(img0, img1, pts, window: int = 7, levels: int = 3,
             iterations: int = 10):
    """Pyramidal Lucas-Kanade: track pts [N, 2] (x, y) from img0 to img1.
    Returns (new_pts [N, 2], valid [N])."""
    pyr0 = [img0]
    pyr1 = [img1]
    for _ in range(levels - 1):
        pyr0.append(_downsample(pyr0[-1]))
        pyr1.append(_downsample(pyr1[-1]))

    r = window // 2
    offs = jnp.stack(
        jnp.meshgrid(jnp.arange(-r, r + 1.0), jnp.arange(-r, r + 1.0),
                     indexing="xy"),
        axis=-1,
    ).reshape(-1, 2)  # [W², 2]

    flow = jnp.zeros_like(pts)
    for lvl in range(levels - 1, -1, -1):
        scale = 2.0**lvl
        i0, i1 = pyr0[lvl], pyr1[lvl]
        gx, gy = image_gradients(i0)
        base = pts / scale  # [N, 2]
        patches = base[:, None, :] + offs[None, :, :]  # [N, W², 2]
        t0 = _bilinear(i0, patches)
        jx = _bilinear(gx, patches)
        jy = _bilinear(gy, patches)
        a11 = jnp.sum(jx * jx, axis=-1)
        a12 = jnp.sum(jx * jy, axis=-1)
        a22 = jnp.sum(jy * jy, axis=-1)
        det = a11 * a22 - a12 * a12

        def body(_, fl):
            cur = base[:, None, :] + offs[None, :, :] + (fl / scale)[:, None, :]
            t1 = _bilinear(i1, cur)
            e = t1 - t0
            b1 = jnp.sum(e * jx, axis=-1)
            b2 = jnp.sum(e * jy, axis=-1)
            safe = jnp.where(jnp.abs(det) < 1e-9, 1.0, det)
            du = -(a22 * b1 - a12 * b2) / safe
            dv = -(-a12 * b1 + a11 * b2) / safe
            step = jnp.where(
                (jnp.abs(det) < 1e-9)[:, None],
                0.0,
                jnp.stack([du, dv], axis=-1),
            )
            return fl + step * scale

        flow = jax.lax.fori_loop(0, iterations, body, flow)

    new_pts = pts + flow
    h, w = img1.shape
    valid = (
        (new_pts[:, 0] >= 1)
        & (new_pts[:, 0] < w - 1)
        & (new_pts[:, 1] >= 1)
        & (new_pts[:, 1] < h - 1)
    )
    return new_pts, valid


def track_with_fb_check(img0, img1, pts, fb_threshold: float = 1.0, **kw):
    """Forward-backward consistency (visual_frontend.rs:160): track
    forward, track back, keep points that return within threshold."""
    fwd, v1 = lk_track(img0, img1, pts, **kw)
    back, v2 = lk_track(img1, img0, fwd, **kw)
    err = jnp.linalg.norm(back - pts, axis=-1)
    return fwd, v1 & v2 & (err < fb_threshold), err


def triangulate_point(cams, pixels, intrinsics):
    """Linear DLT triangulation of one landmark from V views.

    cams [V, 4, 4] world-from-camera; pixels [V, 2]; returns xyz [3].
    """
    fx, fy, cx, cy = intrinsics

    def rows(cam, uv):
        from rust_robotics_tpu.core.lie import se3_inverse

        p = se3_inverse(cam)[:3]  # camera-from-world [3, 4]
        x = (uv[0] - cx) / fx
        y = (uv[1] - cy) / fy
        return jnp.stack([x * p[2] - p[0], y * p[2] - p[1]])

    a = jax.vmap(rows)(cams, pixels).reshape(-1, 4)
    m = a[:, :3]
    b = -a[:, 3]
    sol, *_ = jnp.linalg.lstsq(m, b)
    return sol


def triangulate_tracks(cams, track_pixels, track_mask, intrinsics):
    """Batched triangulation (visual_frontend.rs:260): track_pixels
    [L, V, 2] with mask [L, V] (which views saw which landmark). Unseen
    views get zero-weighted rows."""

    def one(pixels, mask):
        fx, fy, cx, cy = intrinsics

        def rows(cam, uv, m):
            from rust_robotics_tpu.core.lie import se3_inverse

            p = se3_inverse(cam)[:3]
            x = (uv[0] - cx) / fx
            y = (uv[1] - cy) / fy
            w = jnp.where(m, 1.0, 0.0)
            return w * jnp.stack([x * p[2] - p[0], y * p[2] - p[1]])

        a = jax.vmap(rows)(cams, pixels, mask).reshape(-1, 4)
        sol, *_ = jnp.linalg.lstsq(a[:, :3], -a[:, 3])
        return sol

    return jax.vmap(one)(track_pixels, track_mask)
