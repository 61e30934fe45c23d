"""VMEM-resident batched wavefront relaxation as a Pallas TPU kernel.

Reference surface: the grid planners' cost-to-go computation
(a_star.rs:93-235 et al.), reformulated as min-plus stencil relaxation in
planning/wavefront.py. That XLA path re-streams the [B, W, H] raster and
its 8 direction masks from HBM on EVERY sweep — at 128x128 f32 that is
~190 KB of HBM traffic per sweep per map, which makes the sweep loop
bandwidth-bound (VERDICT r02 weak #4).

This kernel keeps one map's cost field resident in VMEM and runs K sweeps
per HBM round-trip: traffic drops to (d + int8 masks + d_out) / K per
sweep — a >10x reduction at K=16. Shifts are `pltpu.roll` (circular); the
wrap-around values are masked out by the precomputed out-of-bounds-aware
direction masks (planning/wavefront._incoming_masks fills False at the
border), so circular shift + mask select == the XLA path's padded shift.

Grid: one program per map in the batch; the while_loop convergence check
stays in XLA (compare the returned field against the input).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rust_robotics_tpu.planning.wavefront import (
    MOTIONS_4,
    MOTIONS_8,
    _incoming_masks,
)

_BIG_FRACTION = 4  # same sentinel as planning/wavefront.py


def _sweep_kernel(d_ref, mask_ref, out_ref, *, k_sweeps: int, motions):
    """One grid program relaxes a CHUNK of maps stacked on the sublane
    axis ([chunk·W, H]): sublane rolls wrap across map boundaries, but the
    per-cell masks encode only same-map validity, so wrapped values are
    always discarded — the chunk behaves exactly like independent maps
    while amortizing program-launch overhead over the whole stack.

    The four diagonal shifts reuse the two cardinal x-rolls (8 rolls per
    sweep instead of 12). Masks stay int8 — an f32-penalty-plane variant
    was measured SLOWER on the chip (22.3 vs 18.4 ms at 64×128×128): the
    8× input traffic outweighs the saved selects; see docs/PERF.md."""
    d0 = d_ref[:]
    f = d0.dtype
    rows, h = d0.shape
    big = jnp.asarray(jnp.finfo(f).max / _BIG_FRACTION, f)
    is8 = len(motions) == 8
    costs = [jnp.asarray(c, f) for _, _, c in motions]

    def pick(best, cand, i):
        return jnp.minimum(best, jnp.where(mask_ref[i] != 0, cand, big))

    def sweep(_, d):
        # motions order fixed by wavefront.MOTIONS_8:
        # (1,0) (0,1) (-1,0) (0,-1) [(-1,-1) (-1,1) (1,-1) (1,1)]
        rx_p = pltpu.roll(d, rows - 1, 0)   # [x] <- d[x+1]
        rx_m = pltpu.roll(d, 1, 0)          # [x] <- d[x-1]
        ry_p = pltpu.roll(d, h - 1, 1)      # [y] <- d[y+1]
        ry_m = pltpu.roll(d, 1, 1)          # [y] <- d[y-1]
        best = pick(d, rx_p + costs[0], 0)
        best = pick(best, ry_p + costs[1], 1)
        best = pick(best, rx_m + costs[2], 2)
        best = pick(best, ry_m + costs[3], 3)
        if is8:
            best = pick(best, pltpu.roll(rx_m, 1, 1) + costs[4], 4)
            best = pick(best, pltpu.roll(rx_m, h - 1, 1) + costs[5], 5)
            best = pick(best, pltpu.roll(rx_p, 1, 1) + costs[6], 6)
            best = pick(best, pltpu.roll(rx_p, h - 1, 1) + costs[7], 7)
        return best

    # fori_loop (not Python unroll) keeps the VMEM live set at ~6 planes
    # instead of k_sweeps × directions
    out_ref[:] = jax.lax.fori_loop(0, k_sweeps, sweep, d0)


@functools.partial(
    jax.jit,
    static_argnames=("connectivity", "corner_cutting", "max_iters",
                     "k_sweeps", "diag_cost", "interpret"),
)
def wavefront_costs_pallas(
    free,
    goals,
    connectivity: int = 8,
    corner_cutting: bool = False,
    max_iters: int | None = None,
    diag_cost: float | None = None,
    k_sweeps: int = 16,
    interpret: bool | None = None,
):
    """Drop-in replacement for planning.wavefront.wavefront_costs on TPU.

    free:  [B, W, H] (or [W, H]) bool traversability raster.
    goals: same shape, bool goal cells.
    Returns the optimal cost-to-go field with inf at unreachable cells;
    identical (up to f32 rounding of identical operations) to the XLA
    path — pinned by tests/test_wavefront_pallas.py.
    """
    if interpret is None:
        interpret = jax.devices()[0].platform == "cpu"
    motions = MOTIONS_8 if connectivity == 8 else MOTIONS_4
    dcost = (1.4142135623730951 if diag_cost is None else diag_cost)
    motions = tuple(
        (dx, dy, dcost if (dx != 0 and dy != 0) else c)
        for dx, dy, c in motions
    )

    squeeze = free.ndim == 2
    if squeeze:
        free = free[None]
        goals = goals[None]
    free = jnp.asarray(free, bool)
    b, w, h = free.shape
    f = jnp.result_type(float)
    big = jnp.asarray(jnp.finfo(f).max / _BIG_FRACTION, f)
    masks = jnp.stack(
        _incoming_masks(free, motions, corner_cutting), axis=1
    ).astype(jnp.int8)  # [B, D, W, H]
    d0 = jnp.where(goals & free, jnp.zeros((), f), big)
    if max_iters is None:
        max_iters = w * h

    nd = len(motions)
    # chunk maps onto the sublane axis: budget ~1 MB for the f32 field per
    # program (d + int8 masks + the ~6-plane sweep live set fit VMEM)
    chunk = max(1, min(b, (1024 * 1024) // (w * h * 4)))
    while b % chunk:
        chunk -= 1
    d0_flat = d0.reshape(b * w, h)
    pen_flat = jnp.swapaxes(masks, 0, 1).reshape(nd, b * w, h)
    sweep = pl.pallas_call(
        functools.partial(_sweep_kernel, k_sweeps=k_sweeps, motions=motions),
        out_shape=jax.ShapeDtypeStruct((b * w, h), f),
        grid=(b // chunk,),
        in_specs=[
            pl.BlockSpec((chunk * w, h), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nd, chunk * w, h), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((chunk * w, h), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )

    def body(carry):
        d, _, it = carry
        new = sweep(d, pen_flat)
        return new, jnp.any(new < d), it + k_sweeps

    def cond(carry):
        _, changed, it = carry
        return changed & (it < max_iters)

    d, _, _ = jax.lax.while_loop(
        cond, body, (d0_flat, jnp.asarray(True), 0))
    d = d.reshape(b, w, h)
    out = jnp.where(d >= big, jnp.asarray(jnp.inf, f), d)
    return out[0] if squeeze else out
