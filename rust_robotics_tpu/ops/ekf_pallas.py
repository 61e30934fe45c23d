"""Pallas TPU kernel: fused batched EKF scan (unicycle + position model).

The north star's "innovation-update kernel" (BASELINE.json): the entire
T-step EKF rollout for a tile of B filters runs inside ONE kernel with the
belief resident in VMEM — no HBM round-trip per step, which is what bounds
the XLA scan version (the belief pytree re-streams through HBM every
iteration).

Layout: batch on the LANE axis. mean [4, B], covariance row-major [16, B],
measurements/controls [T, 2, B]. Every 4×4 matrix op unrolls at trace time
into elementwise arithmetic over [B]-vectors (pure VPU code, ~150 fused ops
per step); the matrix structure exploits the model's sparsity:
F = I except F[0,2], F[1,2], F[3,3]=0 (ekf.rs:214-233) and H = rows 0:2
(ekf.rs:243), S is 2×2 with a closed-form inverse.

Parity: bit-identical math to filters/kalman.ekf_step (same operation
order), verified by tests against the jnp path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _ekf_tile_kernel(z_ref, u_ref, mean_ref, cov_ref, out_mean_ref,
                     out_cov_ref, *, steps, dt, q_diag, r_diag):
    m = [mean_ref[i, :] for i in range(4)]
    p = [[cov_ref[4 * i + j, :] for j in range(4)] for i in range(4)]

    def body(t, carry):
        m, p = carry
        v_u = u_ref[t, 0, :]
        om = u_ref[t, 1, :]
        z0 = z_ref[t, 0, :]
        z1 = z_ref[t, 1, :]

        # predict mean (ekf.rs:203-212)
        cos_yaw = jnp.cos(m[2])
        sin_yaw = jnp.sin(m[2])
        x0 = m[0] + dt * v_u * cos_yaw
        x1 = m[1] + dt * v_u * sin_yaw
        x2 = m[2] + dt * om
        x3 = v_u

        # F evaluated at the PREDICTED state (ekf.rs:318-321)
        f02 = -dt * v_u * jnp.sin(x2)
        f12 = dt * v_u * jnp.cos(x2)

        # P' = F P Fᵀ + Q with F = I + e0 f02 e2ᵀ + e1 f12 e2ᵀ, row3 zeroed.
        # First A = F P  (rows: 0 += f02·row2; 1 += f12·row2; 3 = 0)
        a = [
            [p[0][j] + f02 * p[2][j] for j in range(4)],
            [p[1][j] + f12 * p[2][j] for j in range(4)],
            [p[2][j] for j in range(4)],
            [jnp.zeros_like(p[0][0]) for _ in range(4)],
        ]
        # P' = A Fᵀ  (cols: 0 += f02·col2; 1 += f12·col2; 3 = 0)
        pp = [[None] * 4 for _ in range(4)]
        for i in range(4):
            pp[i][0] = a[i][0] + f02 * a[i][2]
            pp[i][1] = a[i][1] + f12 * a[i][2]
            pp[i][2] = a[i][2]
            pp[i][3] = jnp.zeros_like(a[i][0])
        for j in range(4):
            pp[3][j] = jnp.zeros_like(a[0][0])
        for i in range(4):
            pp[i][i] = pp[i][i] + q_diag[i]

        # update: S = P'[0:2,0:2] + R, closed-form 2×2 inverse
        s00 = pp[0][0] + r_diag[0]
        s01 = pp[0][1]
        s10 = pp[1][0]
        s11 = pp[1][1] + r_diag[1]
        inv_det = 1.0 / (s00 * s11 - s01 * s10)
        i00 = s11 * inv_det
        i01 = -s01 * inv_det
        i10 = -s10 * inv_det
        i11 = s00 * inv_det

        # K = P'[:, 0:2] @ S⁻¹ ([4, 2])
        k = [
            (pp[i][0] * i00 + pp[i][1] * i10, pp[i][0] * i01 + pp[i][1] * i11)
            for i in range(4)
        ]
        y0 = z0 - x0
        y1 = z1 - x1
        new_m = [
            x0 + k[0][0] * y0 + k[0][1] * y1,
            x1 + k[1][0] * y0 + k[1][1] * y1,
            x2 + k[2][0] * y0 + k[2][1] * y1,
            x3 + k[3][0] * y0 + k[3][1] * y1,
        ]
        # P = (I − K H) P' = P' − K · P'[0:2, :]
        new_p = [
            [
                pp[i][j] - k[i][0] * pp[0][j] - k[i][1] * pp[1][j]
                for j in range(4)
            ]
            for i in range(4)
        ]
        return new_m, new_p

    m, p = jax.lax.fori_loop(0, steps, body, (m, p))
    for i in range(4):
        out_mean_ref[i, :] = m[i]
        for j in range(4):
            out_cov_ref[4 * i + j, :] = p[i][j]


@functools.partial(
    jax.jit,
    static_argnames=("dt", "q_diag", "r_diag", "tile", "interpret"),
)
def ekf_scan_lanes(zs, us, mean0, cov0, dt, q_diag, r_diag, tile=512,
                   interpret=False):
    """Run T fused EKF steps for B filters.

    zs/us [T, 2, B]; mean0 [4, B]; cov0 [16, B] (row-major 4×4).
    q_diag/r_diag: static tuples. B must be a multiple of `tile` (pad the
    lane axis). Returns (mean [4, B], cov [16, B]).
    """
    t, _, b = zs.shape
    assert b % tile == 0, (b, tile)
    grid = (b // tile,)
    kernel = functools.partial(
        _ekf_tile_kernel, steps=t, dt=dt, q_diag=q_diag, r_diag=r_diag
    )
    lane = lambda rows: pl.BlockSpec(
        (rows, tile), lambda i: (0, i), memory_space=pltpu.VMEM
    )
    stream = pl.BlockSpec((t, 2, tile), lambda i: (0, 0, i),
                          memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[stream, stream, lane(4), lane(16)],
        out_specs=(lane(4), lane(16)),
        out_shape=(
            jax.ShapeDtypeStruct((4, b), zs.dtype),
            jax.ShapeDtypeStruct((16, b), zs.dtype),
        ),
        interpret=interpret,
    )(zs, us, mean0, cov0)


def ekf_scan_reference(zs, us, mean0, cov0, dt, q_diag, r_diag):
    """Same computation via the generic jnp path (filters/kalman.ekf_step)
    for parity checks. Same [lane-major] in/out layout."""
    from rust_robotics_tpu.core.types import GaussianBelief
    from rust_robotics_tpu.filters.kalman import ekf_step

    b = mean0.shape[-1]
    belief = GaussianBelief(
        mean0.T, jnp.moveaxis(cov0.reshape(4, 4, b), -1, 0)
    )
    q = jnp.diag(jnp.asarray(q_diag, zs.dtype))
    r = jnp.diag(jnp.asarray(r_diag, zs.dtype))

    def step(bel, zu):
        z, u = zu
        bel = ekf_step(bel, z.T, u.T, dt, q, r)
        return bel, None

    belief, _ = jax.lax.scan(step, belief, (zs, us))
    return belief.mean.T, jnp.moveaxis(belief.cov, 0, -1).reshape(16, b)
