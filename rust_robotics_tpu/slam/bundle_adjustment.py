"""Bundle adjustment: pinhole reprojection factors over cameras + landmarks.

Reference: slam/src/bundle_adjustment.rs — `CameraIntrinsics::project`
(:21-31: fx·x/z+cx), world-from-camera SE(3) poses stored as tangents with
right-multiplicative retraction, euclidean landmarks, residual =
project((cam⁻¹)·p_world) − pixel, Huber(δ=2) default, leading cameras
fixed for gauge (:76-86), Schur elimination of landmarks by default.

TPU-native: all observations form one factor block; the Schur path uses the
NLLS engine's batched landmark-block elimination (landmarks are the LAST
variable group).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from rust_robotics_tpu.core.lie import se3_exp, se3_inverse, se3_log
from rust_robotics_tpu.nlls import (
    FactorBlock,
    Problem,
    RobustKernel,
    SolverConfig,
    VariableGroup,
    solve,
)
from rust_robotics_tpu.slam.pose_graph import se3_retract


@dataclasses.dataclass(frozen=True)
class CameraIntrinsics:
    fx: float
    fy: float
    cx: float
    cy: float

    def project(self, point_cam):
        """bundle_adjustment.rs:21-31 (z clamped instead of erroring — the
        validation-at-boundary becomes a numeric guard under jit)."""
        z = jnp.clip(point_cam[..., 2], 1e-9, None)
        return jnp.stack(
            [
                self.fx * point_cam[..., 0] / z + self.cx,
                self.fy * point_cam[..., 1] / z + self.cy,
            ],
            axis=-1,
        )


def make_reprojection_residual(intrinsics: CameraIntrinsics):
    def residual(cam_tangent, point_world, pixel):
        cam = se3_exp(cam_tangent)
        inv = se3_inverse(cam)
        p_cam = inv[:3, :3] @ point_world + inv[:3, 3]
        return intrinsics.project(p_cam) - pixel

    return residual


def build_bundle_adjustment(cameras, points, cam_indices, point_indices,
                            pixels, intrinsics, information=None,
                            fixed_cameras: int = 1,
                            robust=RobustKernel("huber", 2.0)):
    """cameras: [C, 4, 4] world-from-camera (or [C, 6] tangents);
    points [P, 3]; observations: cam_indices/point_indices [O], pixels [O,2].
    """
    cams = jnp.asarray(cameras)
    if cams.ndim == 3:
        cams = se3_log(cams)
    fixed = (jnp.arange(cams.shape[0]) < fixed_cameras)
    cam_group = VariableGroup("camera", cams, retract=se3_retract,
                              fixed_mask=fixed)
    pt_group = VariableGroup("point", jnp.asarray(points))
    idx = jnp.stack(
        [jnp.asarray(cam_indices, jnp.int32), jnp.asarray(point_indices, jnp.int32)],
        axis=-1,
    )
    block = FactorBlock(
        "reprojection",
        make_reprojection_residual(intrinsics),
        ("camera", "point"),
        idx,
        measurement=jnp.asarray(pixels),
        information=None if information is None else jnp.asarray(information),
        robust=robust,
    )
    # points last => Schur eliminates landmark blocks (sparse.rs:160 analog)
    return Problem((cam_group, pt_group), (block,))


def bundle_adjust(cameras, points, cam_indices, point_indices, pixels,
                  intrinsics, information=None, fixed_cameras=1,
                  robust=RobustKernel("huber", 2.0), use_schur=True,
                  config: SolverConfig | None = None):
    """bundle_adjust (bundle_adjustment.rs:108+). Returns
    (cameras [C, 4, 4], points [P, 3], SolverSummary)."""
    prob = build_bundle_adjustment(
        cameras, points, cam_indices, point_indices, pixels, intrinsics,
        information, fixed_cameras, robust,
    )
    if config is None:
        config = SolverConfig(linear_solver="schur" if use_schur else "dense")
    elif use_schur and config.linear_solver == "dense":
        config = dataclasses.replace(config, linear_solver="schur")
    solved, summary = solve(prob, config)
    cams = se3_exp(solved.group("camera").values)
    pts = solved.group("point").values
    return cams, pts, summary
