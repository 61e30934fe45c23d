"""Multi-device general-graph solver: SPIKE over fat supernodal blocks.

Rounds out the multi-device story (parallel/sharded_tridiag.py covers
the chain flagship): the RCM-banded supernodal system of
`nlls/banded.py` is block-tridiagonal in SUPERNODES — exactly the
structure `spike_solve_local` partitions, and that helper is
block-dimension-agnostic. Each device factors its local run of fat
(s·t)² blocks; the (2·D·s·t)² interface system is all_gathered and
solved replicated.

Split of labor (TP-style): the LINEARIZATION + fat-block scatter is
replicated — at supernodal scales it is a tiny fraction of the solve
(edge Jacobians are O(E·t²) while the ladder is O(Ns·(s·t)³)) and
replicating it avoids a cross-device scatter protocol for arbitrary
edge->supernode placements. Only the ladder — where the FLOPs live —
is sharded.

Oracle: the single-device `solve_banded_lm` (tests/test_sharded_banded).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from rust_robotics_tpu.nlls.banded import plan_banded, solve_banded_lm
from rust_robotics_tpu.parallel.sharded_tridiag import spike_solve_local


def make_sharded_fat_tridiag_solver(mesh: Mesh, axis: str):
    """Returns solve(diag [Ns, D, D], upper [Ns-1, D, D], rhs [Ns, D, r])
    -> x [Ns, D, r]: the fat-block tridiagonal solve SPIKE-partitioned
    over `axis`. Ns is padded to a multiple of the axis size with
    decoupled identity blocks."""
    num_devices = mesh.shape[axis]

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis)),
        out_specs=P(axis),
        check_vma=False,
    )
    def run(diag_l, upper_l, rhs_l):
        d_idx = jax.lax.axis_index(axis)
        right_perm = [(i, (i + 1) % num_devices)
                      for i in range(num_devices)]
        c_right = upper_l[-1]
        c_right = jnp.where(d_idx == num_devices - 1, 0.0, c_right)
        a_left = jnp.swapaxes(
            jax.lax.ppermute(upper_l[-1][None], axis, right_perm)[0],
            -1, -2)
        a_left = jnp.where(d_idx == 0, 0.0, a_left)
        return spike_solve_local(diag_l, upper_l[:-1], a_left, c_right,
                                 rhs_l, axis, num_devices)

    def solve(diag, upper, rhs):
        ns, dd, _ = diag.shape
        r = rhs.shape[-1]
        f_ = diag.dtype
        m_loc = -(-ns // num_devices)
        ns_pad = m_loc * num_devices
        pad = ns_pad - ns
        eye = jnp.broadcast_to(jnp.eye(dd, dtype=f_), (pad, dd, dd))
        diag_p = jnp.concatenate([diag, eye], 0) if pad else diag
        rhs_p = jnp.concatenate(
            [rhs, jnp.zeros((pad, dd, r), f_)], 0) if pad else rhs
        # per-device upper layout: device d's rows [d*m, d*m + m) carry
        # uppers [d*m, d*m + m) where the LAST is its right coupling
        up_p = jnp.concatenate(
            [upper, jnp.zeros((ns_pad - upper.shape[0], dd, dd), f_)], 0)
        x = jax.jit(run)(diag_p, up_p, rhs_p)
        return x[:ns]

    return solve


def solve_general_graph_sharded(values0, edges_from, edges_to,
                                measurements, information, fixed_mask,
                                mesh: Mesh, axis: str, *, residual_fn,
                                retract_fn, tdim, max_supernode=256,
                                max_iterations=50, tolerance=1e-10):
    """Mesh-sharded counterpart of banded.solve_general_graph: identical
    plan + LM semantics with the fat-block ladder SPIKE-partitioned over
    `axis` (monkeypatch-free: runs solve_banded_lm with its
    block_tridiag machinery swapped for the sharded solve via the
    `linear_solve_override` hook)."""
    from rust_robotics_tpu.nlls import banded as banded_mod

    values0 = jnp.asarray(values0)
    n = values0.shape[0]
    ef = np.asarray(edges_from)
    et = np.asarray(edges_to)
    meas = np.asarray(measurements)
    info = None if information is None else np.asarray(information)
    plan = plan_banded(n, ef, et, max_supernode)
    f = values0.dtype

    values_b = values0[jnp.asarray(plan.order)]
    fixed_b = jnp.asarray(np.asarray(fixed_mask)[plan.order])
    pf = plan.perm[ef]
    pt = plan.perm[et]
    ib = plan.in_band
    band_info = None if info is None else jnp.asarray(info[ib], f)
    loop_info = None if info is None else jnp.asarray(info[~ib], f)

    fat_solve = make_sharded_fat_tridiag_solver(mesh, axis)

    out_b, summ = solve_banded_lm(
        values_b,
        jnp.asarray(pf[ib], jnp.int32),
        jnp.asarray(pt[ib], jnp.int32),
        jnp.asarray(meas[ib], f),
        band_info,
        jnp.asarray(pf[~ib], jnp.int32),
        jnp.asarray(pt[~ib], jnp.int32),
        jnp.asarray(meas[~ib], f),
        loop_info,
        fixed_b,
        residual_fn=residual_fn,
        retract_fn=retract_fn,
        tdim=tdim,
        supernode=plan.supernode,
        num_super=plan.num_super,
        max_iterations=max_iterations,
        gradient_tolerance=tolerance,
        step_tolerance=tolerance,
        cost_tolerance=tolerance * tolerance,
        fat_solve=fat_solve,
    )
    return out_b[jnp.asarray(plan.perm)], summ, plan
