"""Multi-device general-graph solver: SPIKE over fat supernodal blocks.

Rounds out the multi-device story (parallel/sharded_tridiag.py covers
the chain flagship): the RCM-banded supernodal system of
`nlls/banded.py` is block-tridiagonal in SUPERNODES — exactly the
structure the SPIKE phases partition, and those helpers are
block-dimension-agnostic. Each device factors its local run of fat
(s·t)² blocks; the interface system over the 2D chunk-boundary rows is
pre-eliminated by replicated block-Thomas (D·(2·s·t)³ work instead of
the (2·D·s·t)³ dense LU — VERDICT r4 #4b; the chain-sized case keeps
the dense solve, see sharded_tridiag._DENSE_INTERFACE_MAX).

Split of labor (TP-style): the LINEARIZATION + fat-block scatter is
replicated — at supernodal scales it is a tiny fraction of the solve
(edge Jacobians are O(E·t²) while the ladder is O(Ns·(s·t)³)) and
replicating it avoids a cross-device scatter protocol for arbitrary
edge->supernode placements. Only the ladder — where the FLOPs live —
is sharded, injected through `solve_banded_lm`'s `fat_solve` hook as a
(factor, apply) PAIR: the local ladder factorization, spike solves, and
interface pre-elimination happen ONCE per damped system and are reused
across the gradient / Woodbury-chunk / correction applies (VERDICT r4
#4a — the round-4 single-callable hook refactored on every apply,
~(chunks+2)x the ladder FLOPs per LM iteration).

Per-iteration accounting: `parallel/accounting.py::spike_accounting`
(pinned by tests/test_sharded_banded.py).

Oracle: the single-device `solve_banded_lm` (tests/test_sharded_banded).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from rust_robotics_tpu.nlls.banded import solve_general_graph
from rust_robotics_tpu.parallel.sharded_tridiag import (
    spike_apply_local,
    spike_factor_local,
)

# fat_solve is a STATIC (identity-keyed) argument of the jitted
# solve_banded_lm — a fresh closure per call would retrace the whole LM
# while_loop every solve. One solver per (mesh, axis), forever.
_FAT_SOLVER_CACHE = {}
_FAT_PAIR_CACHE = {}


def _shard_factor_apply(mesh: Mesh, axis: str):
    """shard_map-wrapped SPIKE factor/apply bodies for fat blocks."""
    num_devices = mesh.shape[axis]

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(axis), P(axis)),
        out_specs=(P(axis), P(None)),
        check_vma=False,
    )
    def factor_run(diag_l, upper_l):
        d_idx = jax.lax.axis_index(axis)
        right_perm = [(i, (i + 1) % num_devices)
                      for i in range(num_devices)]
        c_right = upper_l[-1]
        c_right = jnp.where(d_idx == num_devices - 1, 0.0, c_right)
        a_left = jnp.swapaxes(
            jax.lax.ppermute(upper_l[-1][None], axis, right_perm)[0],
            -1, -2)
        a_left = jnp.where(d_idx == 0, 0.0, a_left)
        fac, w_loc, v_loc, iface = spike_factor_local(
            diag_l, upper_l[:-1], a_left, c_right, axis, num_devices)
        # local leaves shard over the axis; the interface factors are
        # identical on every device -> replicated out-spec
        return (fac, w_loc, v_loc), iface

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=((P(axis), P(None)), P(axis)),
        out_specs=P(axis),
        check_vma=False,
    )
    def apply_run(state, rhs_l):
        (fac, w_loc, v_loc), iface = state
        return spike_apply_local(fac, w_loc, v_loc, iface, rhs_l, axis,
                                 num_devices)

    return jax.jit(factor_run), jax.jit(apply_run)


def _pad_system(diag, upper, num_devices):
    ns, dd, _ = diag.shape
    f_ = diag.dtype
    m_loc = -(-ns // num_devices)
    ns_pad = m_loc * num_devices
    pad = ns_pad - ns
    eye = jnp.broadcast_to(jnp.eye(dd, dtype=f_), (pad, dd, dd))
    diag_p = jnp.concatenate([diag, eye], 0) if pad else diag
    # per-device upper layout: device d's rows [d*m, d*m + m) carry
    # uppers [d*m, d*m + m) where the LAST is its right coupling
    up_p = jnp.concatenate(
        [upper, jnp.zeros((ns_pad - upper.shape[0], dd, dd), f_)], 0)
    return diag_p, up_p, ns_pad


def make_sharded_fat_factor_apply(mesh: Mesh, axis: str):
    """Returns the (factor, apply) pair for `solve_banded_lm`'s
    fat_solve hook: factor(diag [Ns, D, D], upper [Ns-1, D, D]) -> fac;
    apply(fac, rhs [Ns, D, r]) -> x. The SPIKE factorization (local
    ladders + spikes + pre-eliminated interface) is computed once per
    damped system and reused across every apply of that LM iteration.
    Ns is padded to a multiple of the axis size with decoupled identity
    blocks. Cached per (mesh, axis) so the returned closures (static
    jit arguments downstream) stay identity-stable."""
    key = (mesh, axis)
    if key in _FAT_PAIR_CACHE:
        return _FAT_PAIR_CACHE[key]
    num_devices = mesh.shape[axis]
    factor_run, apply_run = _shard_factor_apply(mesh, axis)

    def factor(diag, upper):
        ns = diag.shape[0]
        diag_p, up_p, ns_pad = _pad_system(diag, upper, num_devices)
        state = factor_run(diag_p, up_p)
        return (state, ns, ns_pad)

    def apply_(fac, rhs):
        state, ns, ns_pad = fac
        pad = ns_pad - ns
        rhs_p = jnp.concatenate(
            [rhs, jnp.zeros((pad,) + rhs.shape[1:], rhs.dtype)], 0) \
            if pad else rhs
        return apply_run(state, rhs_p)[:ns]

    pair = (factor, apply_)
    _FAT_PAIR_CACHE[key] = pair
    return pair


def make_sharded_fat_tridiag_solver(mesh: Mesh, axis: str):
    """Single-shot form: solve(diag [Ns, D, D], upper [Ns-1, D, D],
    rhs [Ns, D, r]) -> x — one factor + one apply. Kept for direct
    fat-block solves; the LM hook uses `make_sharded_fat_factor_apply`
    so the factorization is shared across applies."""
    key = (mesh, axis)
    if key in _FAT_SOLVER_CACHE:
        return _FAT_SOLVER_CACHE[key]
    factor, apply_ = make_sharded_fat_factor_apply(mesh, axis)

    def solve(diag, upper, rhs):
        return apply_(factor(diag, upper), rhs)

    _FAT_SOLVER_CACHE[key] = solve
    return solve


def solve_general_graph_sharded(values0, edges_from, edges_to,
                                measurements, information, fixed_mask,
                                mesh: Mesh, axis: str, **kwargs):
    """Mesh-sharded counterpart of banded.solve_general_graph: identical
    plan + LM semantics (it IS solve_general_graph) with the fat-block
    ladder SPIKE-partitioned over `axis` via the (factor, apply) hook
    pair — one factorization per LM iteration, shared across applies.
    Accepts solve_general_graph's keyword arguments."""
    return solve_general_graph(
        values0, edges_from, edges_to, measurements, information,
        fixed_mask,
        fat_solve=make_sharded_fat_factor_apply(mesh, axis),
        **kwargs)
