"""SE(2) / SE(3) pose-graph optimization on the shared NLLS engine.

Reference:
- SE(2): slam/src/pose_graph_optimization.rs — additive+wrap retraction
  (:167), edge residual r = [R_ijᵀ(R_iᵀ(t_j−t_i) − t_ij);
  wrap(yaw_j − yaw_i − yaw_ij)] (:178-200), first pose fixed (:100-103), LM
  with per-config tolerances (:113-121).
- SE(3): slam/src/pose_graph_optimization_3d.rs — nodes stored as tangent
  6-vectors (:14-35), right-multiplicative retraction, residual
  r = log(Z⁻¹ X_i⁻¹ X_j) (:155-157), analytic Jacobians −J_l⁻¹(r)Ad(Z⁻¹)
  and J_l⁻¹(−r) (:134-151).

TPU-native: edges of each graph form ONE factor block (vmapped residual);
Jacobians come from jacfwd through the retraction, which reproduces the
reference's analytic forms exactly (same first-order perturbation
convention). All E edges linearize in parallel.
"""

from __future__ import annotations

import jax.numpy as jnp

from rust_robotics_tpu.core.angles import normalize_angle
from rust_robotics_tpu.core.lie import (
    se3_exp,
    se3_inverse,
    se3_log,
)
from rust_robotics_tpu.nlls import (
    FactorBlock,
    Problem,
    SolverConfig,
    VariableGroup,
    solve,
)


# ---------------------------------------------------------------------------
# SE(2)
# ---------------------------------------------------------------------------

def se2_retract(value, delta):
    """pose_graph_optimization.rs:167: additive with yaw wrap."""
    return jnp.stack(
        [
            value[0] + delta[0],
            value[1] + delta[1],
            normalize_angle(value[2] + delta[2]),
        ]
    )


def se2_edge_residual(xi, xj, meas):
    """pose_graph_optimization.rs:178-200 edge error."""
    c, s = jnp.cos(xi[2]), jnp.sin(xi[2])
    r_i_t = jnp.array([[c, s], [-s, c]])
    cm, sm = jnp.cos(meas[2]), jnp.sin(meas[2])
    r_ij_t = jnp.array([[cm, sm], [-sm, cm]])
    delta_t = xj[:2] - xi[:2]
    te = r_ij_t @ (r_i_t @ delta_t - meas[:2])
    ang = normalize_angle(xj[2] - xi[2] - meas[2])
    return jnp.concatenate([te, ang[None]])


def build_pose_graph_2d(poses, edges_from, edges_to, measurements,
                        information=None, fix_first=True):
    """poses [N, 3]; edges_* [E]; measurements [E, 3];
    information [E, 3, 3] (default identity)."""
    n = poses.shape[0]
    fixed = jnp.zeros((n,), dtype=bool).at[0].set(fix_first)
    group = VariableGroup("pose", jnp.asarray(poses), retract=se2_retract,
                          fixed_mask=fixed)
    idx = jnp.stack(
        [jnp.asarray(edges_from, jnp.int32), jnp.asarray(edges_to, jnp.int32)],
        axis=-1,
    )
    block = FactorBlock(
        "se2_edge",
        se2_edge_residual,
        ("pose", "pose"),
        idx,
        measurement=jnp.asarray(measurements),
        information=None if information is None else jnp.asarray(information),
    )
    return Problem((group,), (block,))


def optimize_pose_graph_2d(poses, edges_from, edges_to, measurements,
                           information=None, max_iterations=50,
                           tolerance=1e-10, linear_solver="dense",
                           pcg_max_iterations=3000, pcg_tolerance=1e-6,
                           refine=0, chunks=None):
    """optimize_pose_graph (pose_graph_optimization.rs:73-140): LM, first
    pose fixed; tolerances mapped as the reference maps PoseGraphConfig
    (PCG defaults follow benchmark_large_pose_graph.rs:66-75: 3000 iters).
    Returns (poses [N, 3], SolverSummary).

    linear_solver="chain_direct" routes to the device-resident LM with a
    cyclic-reduction block-tridiagonal direct solve + Woodbury loop-closure
    correction (nlls/tridiag.py) — the TPU-native path for sequential-SLAM
    graphs (odometry chain + loop closures): no Krylov iteration, no
    per-iteration host syncs.

    linear_solver="banded_direct" handles ARBITRARY topologies (grid
    graphs, Manhattan-style datasets — anything the chain structure can't
    express): RCM reorder -> fat-block supernodal tridiagonal + streamed
    Woodbury for out-of-band edges (nlls/banded.py).

    linear_solver="direct" auto-routes: chain_direct when an (i,i+1)
    odometry chain exists, banded_direct otherwise.

    chunks (chain_direct only): SPIKE chunk count for the single-chip
    partitioned ladder; None auto-picks (1 below ~256k poses, then the
    smallest power of two keeping the per-chunk ladder <= 131072 rows —
    the AOT-compile-safe size; VERDICT r4 #2)."""
    if linear_solver == "direct":
        from rust_robotics_tpu.nlls.tridiag import has_full_chain

        n_nodes = jnp.asarray(poses).shape[0]
        linear_solver = ("chain_direct"
                         if has_full_chain(n_nodes, edges_from, edges_to)
                         else "banded_direct")
    if linear_solver == "chain_direct":
        return _optimize_chain_direct(poses, edges_from, edges_to,
                                      measurements, information,
                                      max_iterations, tolerance,
                                      refine=refine, chunks=chunks)
    if linear_solver == "banded_direct":
        if refine:
            raise ValueError(
                "refine is only supported by linear_solver='chain_direct'")
        return _optimize_banded_direct(poses, edges_from, edges_to,
                                       measurements, information,
                                       max_iterations, tolerance,
                                       se2_edge_residual, se2_retract, 3)
    if refine:
        raise ValueError(
            f"refine is only supported by linear_solver='chain_direct', "
            f"got {linear_solver!r}")
    prob = build_pose_graph_2d(poses, edges_from, edges_to, measurements,
                               information)
    cfg = SolverConfig(
        method="lm",
        max_iterations=max(max_iterations, 1),
        gradient_tolerance=tolerance,
        step_tolerance=tolerance,
        cost_tolerance=tolerance * tolerance,
        linear_solver=linear_solver,
        pcg_max_iterations=pcg_max_iterations,
        pcg_tolerance=pcg_tolerance,
    )
    solved, summary = solve(prob, cfg)
    return solved.groups[0].values, summary


def _optimize_chain_direct(poses, edges_from, edges_to, measurements,
                           information, max_iterations, tolerance,
                           fix_first=True, refine=0,
                           residual_fn=None, retract_fn=None, tdim=3,
                           chunks=None):
    """SE(2) pose graph on the device-resident chain solver."""
    from rust_robotics_tpu.nlls.solver import SolverSummary
    from rust_robotics_tpu.nlls.tridiag import (
        TERMINATION_NAMES,
        classify_chain_edges,
        solve_chain_lm,
    )

    poses = jnp.asarray(poses)
    n = poses.shape[0]
    if chunks is None:
        # auto: plain ladder to 256k poses (measured single-program
        # envelope); beyond it, SPIKE-chunk so the per-chunk ladder stays
        # at the compile-proven <= 131072 rows
        chunks = 0
        if n > 262144:
            chunks = 2
            while -(-n // chunks) > 131072:
                chunks *= 2
    (chain_meas, chain_info, loop_ef, loop_et, loop_meas,
     loop_info) = classify_chain_edges(n, edges_from, edges_to,
                                       measurements, information)
    fixed = jnp.zeros((n,), dtype=bool).at[0].set(fix_first)
    f = poses.dtype
    out, summ = solve_chain_lm(
        poses,
        jnp.asarray(chain_meas, f),
        None if chain_info is None else jnp.asarray(chain_info, f),
        jnp.asarray(loop_ef, jnp.int32),
        jnp.asarray(loop_et, jnp.int32),
        jnp.asarray(loop_meas, f),
        None if loop_info is None else jnp.asarray(loop_info, f),
        fixed,
        residual_fn=residual_fn or se2_edge_residual,
        retract_fn=retract_fn or se2_retract,
        tdim=tdim,
        max_iterations=max(max_iterations, 1),
        gradient_tolerance=tolerance,
        step_tolerance=tolerance,
        cost_tolerance=tolerance * tolerance,
        refine=refine,
        chunks=chunks,
    )
    # chain_direct performs exactly ONE direct linear solve per LM
    # iteration (no Krylov loop), so linear_iterations == iterations here
    # by construction — unlike the PCG paths, where it counts Krylov steps
    summary = SolverSummary(
        float(summ.initial_cost), float(summ.final_cost),
        int(summ.iterations), int(summ.accepted_steps),
        TERMINATION_NAMES[int(summ.termination_code)],
        int(summ.iterations),
    )
    return out, summary


def _optimize_banded_direct(poses, edges_from, edges_to, measurements,
                            information, max_iterations, tolerance,
                            residual_fn, retract_fn, tdim,
                            fix_first=True):
    """General-topology pose graph on the RCM-banded supernodal solver
    (nlls/banded.py); one direct linear solve per LM iteration."""
    import numpy as _np

    from rust_robotics_tpu.nlls.banded import solve_general_graph
    from rust_robotics_tpu.nlls.solver import SolverSummary
    from rust_robotics_tpu.nlls.tridiag import TERMINATION_NAMES

    poses = jnp.asarray(poses)
    n = poses.shape[0]
    fixed = _np.zeros((n,), bool)
    fixed[0] = fix_first
    out, summ, _plan = solve_general_graph(
        poses, edges_from, edges_to, measurements, information, fixed,
        residual_fn=residual_fn, retract_fn=retract_fn, tdim=tdim,
        max_iterations=max(max_iterations, 1), tolerance=tolerance)
    summary = SolverSummary(
        float(summ.initial_cost), float(summ.final_cost),
        int(summ.iterations), int(summ.accepted_steps),
        TERMINATION_NAMES[int(summ.termination_code)],
        int(summ.iterations),
    )
    return out, summary


# ---------------------------------------------------------------------------
# SE(3)
# ---------------------------------------------------------------------------

def se3_retract(value, delta):
    """Right-multiplicative tangent update: log(exp(v) · exp(δ))
    (pose_graph_optimization_3d.rs tangent storage + right perturbation)."""
    return se3_log(se3_exp(value) @ se3_exp(delta))


def se3_edge_residual(xi, xj, meas_tangent):
    """r = log(Z⁻¹ · X_i⁻¹ · X_j) (pose_graph_optimization_3d.rs:155-157).
    Measurement passed as tangent [6] for a uniform block array."""
    z = se3_exp(meas_tangent)
    return se3_log(se3_inverse(z) @ se3_inverse(se3_exp(xi)) @ se3_exp(xj))


def se3_anchored_edge_residual(li, lj, meas48):
    """Anchor-recentered SE(3) edge error in DEVIATION space (SURVEY
    §7.3(5) — the f32 accuracy fix): with X_i = A_i·exp(l_i) for
    trace-time anchors A and small device-side locals l,

        r = log(Z⁻¹ · X_i⁻¹ · X_j)
          = log( M · exp(−hat(Ad_{rel⁻¹} l_i)) · exp(hat(l_j)) ),

    where rel = A_i⁻¹A_j, M = Z⁻¹·rel and Ad_{rel⁻¹} are precomputed on
    the HOST in f64 (core/lie_np.py). Every device-side factor is
    near-identity, composed as deviations E = T − I (core/lie.py
    se3_expm1/se3_compose_dev/se3_logm1), so the f32 evaluation noise is
    RELATIVE to max(|residual|, |locals|) rather than absolute at the
    workspace scale — re-anchoring (anchor_rounds) then shrinks the
    noise floor together with the state, which is what takes the 10k
    SE(3) chain from the round-4 ~1 m f32 wall to the 1e-5 class.

    meas48 packs [E_M top-3-rows (12) | Ad_{rel⁻¹} (36)]."""
    from rust_robotics_tpu.core.lie import (
        se3_compose_dev,
        se3_expm1,
        se3_logm1,
    )

    f = li.dtype
    e_m = jnp.zeros((4, 4), f).at[:3].set(meas48[:12].reshape(3, 4))
    ad = meas48[12:].reshape(6, 6)
    e_a = se3_expm1(-(ad @ li))
    e_b = se3_expm1(lj)
    e_tot = se3_compose_dev(se3_compose_dev(e_m, e_a), e_b)
    return se3_logm1(e_tot)


def _optimize_chain_direct_anchored_se3(pose_tangents, edges_from,
                                        edges_to, measurement_tangents,
                                        information, max_iterations,
                                        tolerance, fix_first=True,
                                        chunks=None, anchor_rounds=2):
    """SE(3) chain solve in anchor-recentered deviation coordinates:
    anchors are the current tangents (composed in f64 host-side), the
    device solves for small locals starting at zero, the final poses
    recompose in f64 — repeated `anchor_rounds + 1` times, re-anchoring
    at each round's solution so both the locals and the residual-eval
    noise shrink geometrically. Same LM semantics as the plain chain
    path; the returned summary is the LAST round's."""
    import numpy as _np

    from rust_robotics_tpu.core import lie_np
    from rust_robotics_tpu.nlls.solver import SolverSummary
    from rust_robotics_tpu.nlls.tridiag import (
        TERMINATION_NAMES,
        classify_chain_edges,
        solve_chain_lm,
    )

    t64 = _np.asarray(pose_tangents, _np.float64)
    n = t64.shape[0]
    ef = _np.asarray(edges_from)
    et = _np.asarray(edges_to)
    z_mats = lie_np.se3_exp(
        _np.asarray(measurement_tangents, _np.float64))
    z_inv = lie_np.se3_inverse(z_mats)

    f = jnp.asarray(pose_tangents).dtype
    fixed = jnp.zeros((n,), dtype=bool).at[0].set(fix_first)
    if chunks is None:
        chunks = 0
        if n > 262144:
            chunks = 2
            while -(-n // chunks) > 131072:
                chunks *= 2

    cur = t64
    for _round in range(anchor_rounds + 1):
        anchors = lie_np.se3_exp(cur)
        rel = lie_np.se3_inverse(anchors[ef]) @ anchors[et]
        e_m = (z_inv @ rel
               - _np.eye(4))[:, :3, :].reshape(len(ef), 12)
        ad = lie_np.se3_adjoint(
            lie_np.se3_inverse(rel)).reshape(len(ef), 36)
        meas48 = _np.concatenate([e_m, ad], -1)

        (chain_meas, chain_info, loop_ef, loop_et, loop_meas,
         loop_info) = classify_chain_edges(n, ef, et, meas48,
                                           information)
        out_locals, summ = solve_chain_lm(
            jnp.zeros((n, 6), f),
            jnp.asarray(chain_meas, f),
            None if chain_info is None else jnp.asarray(chain_info, f),
            jnp.asarray(loop_ef, jnp.int32),
            jnp.asarray(loop_et, jnp.int32),
            jnp.asarray(loop_meas, f),
            None if loop_info is None else jnp.asarray(loop_info, f),
            fixed,
            residual_fn=se3_anchored_edge_residual,
            retract_fn=se3_retract,
            tdim=6,
            rdim=6,
            max_iterations=max(max_iterations, 1),
            gradient_tolerance=tolerance,
            step_tolerance=tolerance,
            cost_tolerance=tolerance * tolerance,
            chunks=chunks,
        )
        cur = lie_np.se3_log(
            anchors @ lie_np.se3_exp(
                _np.asarray(out_locals, _np.float64)))

    summary = SolverSummary(
        float(summ.initial_cost), float(summ.final_cost),
        int(summ.iterations), int(summ.accepted_steps),
        TERMINATION_NAMES[int(summ.termination_code)],
        int(summ.iterations),
    )
    return jnp.asarray(cur, f), summary


def build_pose_graph_3d(pose_tangents, edges_from, edges_to,
                        measurement_tangents, information=None,
                        fix_first=True):
    n = pose_tangents.shape[0]
    fixed = jnp.zeros((n,), dtype=bool).at[0].set(fix_first)
    group = VariableGroup("pose", jnp.asarray(pose_tangents),
                          retract=se3_retract, fixed_mask=fixed)
    idx = jnp.stack(
        [jnp.asarray(edges_from, jnp.int32), jnp.asarray(edges_to, jnp.int32)],
        axis=-1,
    )
    block = FactorBlock(
        "se3_edge",
        se3_edge_residual,
        ("pose", "pose"),
        idx,
        measurement=jnp.asarray(measurement_tangents),
        information=None if information is None else jnp.asarray(information),
    )
    return Problem((group,), (block,))


def optimize_pose_graph_3d(pose_tangents, edges_from, edges_to,
                           measurement_tangents, information=None,
                           max_iterations=50, tolerance=1e-10,
                           linear_solver="dense", refine=0,
                           anchored=False, chunks=None,
                           anchor_rounds=2):
    """optimize_pose_graph_3d (pose_graph_optimization_3d.rs:53-119).
    Returns (pose tangents [N, 6], SolverSummary).

    linear_solver="chain_direct": device-resident LM with the
    cyclic-reduction tridiagonal solve on 6×6 blocks (nlls/tridiag.py) —
    odometry chain + loop closures, same routing as the SE(2) path.
    "banded_direct" / "direct" route arbitrary topologies exactly as the
    SE(2) path (nlls/banded.py on 6-dof tangents).

    anchored=True (chain_direct only): anchor-recentered residuals — the
    f32 large-workspace fix (VERDICT r4 #3). Host f64 composes the
    initial poses into per-edge anchor-relative transforms once; the
    device solves small local corrections only, so the 10k-scale
    position-RMSE floor (~1 m at f32 in global coordinates) drops to the
    local-arithmetic level (<= 1e-4, pinned by tests/test_tridiag.py).
    chunks: see optimize_pose_graph_2d."""
    if anchored:
        if linear_solver not in ("chain_direct", "direct"):
            raise ValueError("anchored=True requires the chain_direct "
                             "(or direct-routed chain) solver")
        return _optimize_chain_direct_anchored_se3(
            pose_tangents, edges_from, edges_to, measurement_tangents,
            information, max_iterations, tolerance, chunks=chunks,
            anchor_rounds=anchor_rounds)
    if linear_solver == "direct":
        from rust_robotics_tpu.nlls.tridiag import has_full_chain

        n_nodes = jnp.asarray(pose_tangents).shape[0]
        linear_solver = ("chain_direct"
                         if has_full_chain(n_nodes, edges_from, edges_to)
                         else "banded_direct")
    if linear_solver == "banded_direct":
        if refine:
            raise ValueError(
                "refine is only supported by linear_solver='chain_direct'")
        return _optimize_banded_direct(pose_tangents, edges_from, edges_to,
                                       measurement_tangents, information,
                                       max_iterations, tolerance,
                                       se3_edge_residual, se3_retract, 6)
    if linear_solver == "chain_direct":
        return _optimize_chain_direct(pose_tangents, edges_from, edges_to,
                                      measurement_tangents, information,
                                      max_iterations, tolerance,
                                      refine=refine,
                                      residual_fn=se3_edge_residual,
                                      retract_fn=se3_retract, tdim=6,
                                      chunks=chunks)
    if refine:
        raise ValueError(
            f"refine is only supported by linear_solver='chain_direct', "
            f"got {linear_solver!r}")
    prob = build_pose_graph_3d(pose_tangents, edges_from, edges_to,
                               measurement_tangents, information)
    cfg = SolverConfig(
        method="lm",
        max_iterations=max(max_iterations, 1),
        gradient_tolerance=tolerance,
        step_tolerance=tolerance,
        cost_tolerance=tolerance * tolerance,
        linear_solver=linear_solver,
    )
    solved, summary = solve(prob, cfg)
    return solved.groups[0].values, summary
