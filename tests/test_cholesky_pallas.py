"""Pallas blocked Cholesky (ops/cholesky_pallas.py): parity vs XLA and the
Schur reduced-solve wiring (sparse.rs:160 analog's retained system)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rust_robotics_tpu.ops.cholesky_pallas import (
    cholesky_pallas,
    cholesky_solve_pallas,
)


@pytest.mark.parametrize("n", [64, 128, 200, 384])
def test_factor_matches_xla(n):
    rng = np.random.default_rng(n)
    m = rng.normal(size=(n, n))
    a = jnp.asarray(m @ m.T + n * np.eye(n))
    l = cholesky_pallas(a)
    ref = jnp.linalg.cholesky(a)
    np.testing.assert_allclose(np.asarray(l), np.asarray(ref),
                               atol=1e-10 * n)
    # strictly-upper triangle is exactly zero
    assert float(jnp.max(jnp.abs(jnp.triu(l, 1)))) == 0.0


def test_solve_matches_direct():
    rng = np.random.default_rng(7)
    n = 250
    m = rng.normal(size=(n, n))
    a = jnp.asarray(m @ m.T + n * np.eye(n))
    b = jnp.asarray(rng.normal(size=(n, 3)))
    x = cholesky_solve_pallas(a, b)
    np.testing.assert_allclose(np.asarray(a @ x), np.asarray(b), atol=1e-9)


def test_schur_path_with_pallas_reduced_solver_matches_dense():
    """BA Schur with reduced_solver='pallas_chol' lands on the same solution
    as the default dense reduced solve."""
    from rust_robotics_tpu.nlls import SolverConfig
    from rust_robotics_tpu.slam.bundle_adjustment import (
        CameraIntrinsics,
        bundle_adjust,
    )

    rng = np.random.default_rng(0)
    n_cams, n_pts = 6, 40
    truth_cams = []
    for i in range(n_cams):
        t = np.array([i * 0.5, 0.0, -5.0])
        c = np.eye(4)
        c[:3, 3] = t
        truth_cams.append(c)
    truth_cams = jnp.asarray(np.stack(truth_cams))
    pts = jnp.asarray(rng.uniform(-2, 2, (n_pts, 3)) + np.array([0, 0, 3.0]))
    intr = CameraIntrinsics(500.0, 500.0, 320.0, 240.0)

    cam_idx = np.repeat(np.arange(n_cams), n_pts).astype(np.int32)
    pt_idx = np.tile(np.arange(n_pts), n_cams).astype(np.int32)

    def project(cam, p):
        inv = np.linalg.inv(np.asarray(cam))
        pc = inv[:3, :3] @ np.asarray(p) + inv[:3, 3]
        return np.array([500.0 * pc[0] / pc[2] + 320.0,
                         500.0 * pc[1] / pc[2] + 240.0])

    pixels = jnp.asarray(np.stack([
        project(truth_cams[c], pts[p]) for c, p in zip(cam_idx, pt_idx)
    ]))
    cams0 = jnp.asarray(np.asarray(truth_cams)
                        + rng.normal(0, 1e-3, truth_cams.shape))
    pts0 = pts + jnp.asarray(rng.normal(0, 0.05, pts.shape))

    out = {}
    for solver in ("dense", "pallas_chol"):
        cams, p3d, summary = bundle_adjust(
            cams0, pts0, cam_idx, pt_idx, pixels, intr,
            config=SolverConfig(linear_solver="schur", max_iterations=20,
                                reduced_solver=solver))
        out[solver] = (np.asarray(cams), np.asarray(p3d), summary)
    np.testing.assert_allclose(out["dense"][0], out["pallas_chol"][0],
                               atol=1e-6)
    np.testing.assert_allclose(out["dense"][1], out["pallas_chol"][1],
                               atol=1e-6)


@pytest.mark.parametrize("n", [96, 300, 640])
def test_cholesky_pallas_large_matches_numpy(n):
    """HBM-resident blocked path (cholesky_pallas_large): panels stream
    through VMEM, matrix unbounded by the single-buffer cap."""
    from rust_robotics_tpu.ops.cholesky_pallas import cholesky_pallas_large

    rng = np.random.default_rng(n)
    a = rng.normal(size=(n, n)).astype(np.float32)
    a = a @ a.T + n * np.eye(n, dtype=np.float32)
    l = np.asarray(cholesky_pallas_large(jnp.asarray(a), interpret=True))
    ref = np.linalg.cholesky(a.astype(np.float64))
    rel = np.abs(l - ref).max() / np.abs(ref).max()
    assert rel < 5e-5, rel
    # strictly lower triangular output
    assert np.all(np.triu(l, 1) == 0.0)
