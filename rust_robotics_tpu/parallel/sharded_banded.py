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
is sharded, injected through `solve_banded_lm`'s `fat_solve` hook.

Oracle: the single-device `solve_banded_lm` (tests/test_sharded_banded).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from rust_robotics_tpu.nlls.banded import solve_general_graph
from rust_robotics_tpu.parallel.sharded_tridiag import spike_solve_local

# fat_solve is a STATIC (identity-keyed) argument of the jitted
# solve_banded_lm — a fresh closure per call would retrace the whole LM
# while_loop every solve. One solver per (mesh, axis), forever.
_FAT_SOLVER_CACHE = {}


def make_sharded_fat_tridiag_solver(mesh: Mesh, axis: str):
    """Returns solve(diag [Ns, D, D], upper [Ns-1, D, D], rhs [Ns, D, r])
    -> x [Ns, D, r]: the fat-block tridiagonal solve SPIKE-partitioned
    over `axis`. Ns is padded to a multiple of the axis size with
    decoupled identity blocks. Cached per (mesh, axis) so the returned
    closure (a static jit argument downstream) stays identity-stable."""
    key = (mesh, axis)
    if key in _FAT_SOLVER_CACHE:
        return _FAT_SOLVER_CACHE[key]
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

    run_jit = jax.jit(run)

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
        x = run_jit(diag_p, up_p, rhs_p)
        return x[:ns]

    _FAT_SOLVER_CACHE[key] = solve
    return solve


def solve_general_graph_sharded(values0, edges_from, edges_to,
                                measurements, information, fixed_mask,
                                mesh: Mesh, axis: str, **kwargs):
    """Mesh-sharded counterpart of banded.solve_general_graph: identical
    plan + LM semantics (it IS solve_general_graph) with the fat-block
    ladder SPIKE-partitioned over `axis` via the `fat_solve` hook.
    Accepts solve_general_graph's keyword arguments."""
    return solve_general_graph(
        values0, edges_from, edges_to, measurements, information,
        fixed_mask, fat_solve=make_sharded_fat_tridiag_solver(mesh, axis),
        **kwargs)
