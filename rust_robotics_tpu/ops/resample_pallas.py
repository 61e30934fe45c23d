"""Pallas TPU kernel: fused systematic resampling + particle gather.

The north star's "resampling kernel" (BASELINE.json): weight
normalization, N_eff, the stratified inverse-CDF index search, AND the
particle gather run in ONE kernel with everything resident in VMEM.

Reference semantics: particle_filter.rs:337 (N_eff trigger), :416-:478
(cumulative-weight inverse-CDF draw). The CPU algorithm is a sequential
O(P) two-pointer walk. The TPU kernel inverts the search direction
(round-5 redesign; the round-2..4 kernel materialized three [P, P]
matrices per row):

- segment bounds, elementwise O(P): instead of ranking every position
  against every CDF entry, compute for each PARTICLE j the number of
  positions it absorbs — q_j = #{i : pos_i <= cum_j} = floor(P*cum_j - u)
  + 1, then two +-1 corrections against the exact float pos(k) = (k+u)/P
  so q_j is exact for the actual f32 comparisons (the candidate's float
  error is P*|cum|*eps ~ 1e-4 << 1, so +-1 bounds it);
- segment matrix, ONE [P, P] build: Mt[i, j] = [q_{j-1} <= i < q_j],
  built transposed (output index on sublanes) so q broadcasts as a lane
  vector with no relayout. Output slot i falls in exactly one particle's
  segment, so every row of Mt is an exact one-hot — the gather AND the
  parent-index extraction become ONE MXU matmul: the caller stacks
  j//64, j%64 channels under the states (each < 256, hence exact
  through the MXU's default-precision bf16 pass) and recombines them to
  idx outside. q_{j-1} comes from q via a shift MATMUL
  (S[j,i] = [j == i-1], HIGHEST precision so integers up to P survive),
  so q_prev_j == q_{j-1} bitwise and the segments tile [0, P) exactly.

This replaces the old searchsorted-as-[P,P]-comparison + count-reduce +
second one-hot build: one [P,P] VPU build per row instead of three, and
the batch is row-blocked (R=16 rows per grid step) so the prefix-sum
and shift matmuls batch into [R,P]x[P,P] MXU calls (128x the row
utilization of per-row [1,P] matmuls) and the shared iota/triangular/
shift matrices are built once per step instead of once per row.

Layout: one grid step per R batch rows; states ride [D, P] with
particles on the lane axis. P should be a multiple of 128.

Parity: exact index equality with the jnp searchsorted oracle in
interpret mode (tests/test_resample_pallas.py) — the q duality
#{j : q_j <= i} = #{j : cum_j < pos_i} is an identity of the same float
comparisons, not an approximation. On hardware the MXU prefix-sum's
summation order can shift an index by at most 1 at a CDF boundary
(measured 3/65536 draws at P=1024, 36/262144 at P=4096, HIGHEST
precision) — a statistically equivalent stratified draw. Measured on
one chip (round 5, vs the round-4 kernel): saturated B=8192 P=1024
2.3e8 -> 5.9e8 particles/s; pinned B=256 1.25e8 -> 1.9e8; tiled P=4096
1.7e8 -> 2.5e8. Roofline: the remaining cost is the [P,P] segment-
matrix build, ~3 VPU ops/element (2 compares + select-to-f32) ->
~0.96e9 particles/s VPU ceiling for this dense-algebra family at
P=1024; the kernel sits at ~62% of that with the prefix-sum/shift/
gather matmuls and DMA on top. Going past it needs an in-kernel
dynamic gather primitive, which Mosaic does not expose.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["systematic_resample_gather", "resample_reference"]


def _segment_bounds(cum, u, p):
    """q_j = #{i : (i+u)/p <= cum_j}, exact for f32 pos values.

    Elementwise: candidate floor(p*cum - u) + 1, then one upward and one
    downward correction comparing against the exact pos formula. Returns
    int32 in [0, p]."""
    ft = cum.dtype
    m = jnp.floor(p * cum - u).astype(jnp.int32) + 1
    m = jnp.clip(m, 0, p)
    # pos(m) <= cum -> undercounted by one
    m = m + ((m.astype(ft) + u) / p <= cum).astype(jnp.int32)
    # pos(m-1) > cum -> overcounted by one
    m = m - ((m.astype(ft) - 1 + u) / p > cum).astype(jnp.int32)
    return jnp.clip(m, 0, p)


_IDX_SPLIT = 64  # parent-index channels ride the matmul as j//64, j%64


def _augment_with_index_channels(states, p):
    """Stack hi/lo iota channels [j // 64, j % 64] under the states. The
    gather matmul then yields the parent index for free — split in two
    so each channel's integers stay <= max(P/64, 64) < 256 and survive
    the MXU's default-precision (bf16-mantissa) pass EXACTLY; a single
    iota channel would round (bf16 can't represent 257..). States
    themselves see the same default-precision one-hot product as the
    round-2..4 kernel's gather."""
    b = states.shape[0]
    jr = jnp.arange(p, dtype=states.dtype)
    hi = jnp.broadcast_to((jr // _IDX_SPLIT)[None, None, :], (b, 1, p))
    lo = jnp.broadcast_to((jr % _IDX_SPLIT)[None, None, :], (b, 1, p))
    return jnp.concatenate([states, hi, lo], axis=1)  # [B, D+2, P]


def _index_from_channels(out_aug, d, p):
    """Recombine the hi/lo channels into int32 parent indices."""
    idx = (_IDX_SPLIT * out_aug[:, d, :] + out_aug[:, d + 1, :])
    return jnp.clip(jnp.rint(idx).astype(jnp.int32), 0, p - 1)


def _resample_kernel(w_ref, u_ref, states_ref, out_states_ref,
                     neff_ref, *, p, r):
    # shared across the R rows of this grid step
    rio = jax.lax.broadcasted_iota(jnp.int32, (p, p), 0)
    cio = jax.lax.broadcasted_iota(jnp.int32, (p, p), 1)
    lower = (rio <= cio).astype(jnp.float32)   # L[j,i] = 1 where j <= i
    shift = (rio == cio - 1).astype(jnp.float32)  # S[j,i] = [j == i-1]

    w2 = w_ref[:, :]  # [R, P]
    totals = jnp.sum(w2, axis=1, keepdims=True)
    wn2 = w2 / totals
    neff_ref[:, :] = 1.0 / jnp.sum(wn2 * wn2, axis=1, keepdims=True)

    # prefix sums for ALL R rows in one [R,P]x[P,P] triangular matmul
    # (cumsum has no Pallas TPU lowering; a [1,P] matmul per row would
    # use 1/128 of the MXU's rows — batching was the round-5 2x)
    cum2 = jax.lax.dot_general(wn2, lower,
                               (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=jax.lax.Precision.HIGHEST)
    cum2 = cum2 / cum2[:, p - 1:]  # round-off guard (particle.py parity)
    u2 = u_ref[:, :]  # [R, 1], broadcasts

    q2 = _segment_bounds(cum2, u2, p)  # [R, P] int32 in [0, p]
    # q_prev_j = q_{j-1} (0 for j=0) via an exact integer shift matmul,
    # again batched across the R rows
    qprev2 = jax.lax.dot_general(
        q2.astype(jnp.float32), shift,
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        # HIGHEST: q holds integers up to P; the default bf16 pass would
        # round 257.. and corrupt the segment bounds
        precision=jax.lax.Precision.HIGHEST).astype(jnp.int32)

    for k in range(r):
        q = q2[k]
        qprev = qprev2[k]
        # segment matrix, built TRANSPOSED (output index i on sublanes)
        # so q/qprev broadcast along sublanes as lane vectors — no
        # lane->sublane relayout per row: Mt[i, j] = [q_prev_j <= i < q_j].
        # Each ROW of Mt is an exact one-hot (the segments tile [0, P)).
        mt = ((rio >= qprev[None, :]) & (rio < q[None, :])).astype(
            jnp.float32)
        # gather: out[c, i] = sum_j aug[c, j] * Mt[i, j] — one term per
        # row of Mt, so the matmul IS the gather. The caller stacks
        # hi/lo index channels under the states (exact through the MXU's
        # default-precision pass, see _augment_with_index_channels) —
        # no separate index matmul.
        out_states_ref[k, :, :] = jax.lax.dot_general(
            states_ref[k, :, :], mt,
            (((1,), (1,)), ((), ())),
            preferred_element_type=states_ref.dtype,
        )


def _resample_kernel_tiled(w_ref, u_ref, states_ref, out_states_ref,
                           neff_ref, *, p, t):
    """Block-tiled variant for P > 1024: a single [P, P] segment matrix
    exceeds VMEM past P ~ 1024 (P=4096 would need 67 MB); here every
    intermediate is [T, T] with T = 512 (1 MB) — the prefix sum runs
    chunk-by-chunk with a carry, segment bounds are elementwise per
    chunk, and the gather/index matmuls accumulate over source chunks
    per output chunk. Work stays O(P²/T²) tile builds (the dense-algebra
    trade is inherent without an in-kernel gather primitive); capacity
    is no longer VMEM-limited."""
    nt = p // t
    # chunk layout [nt, T] comes from the HOST-side reshape (Mosaic
    # rejects 1-D vector slices/concats/reshapes at offsets beyond the
    # first tile; 2-D row extraction is native)
    w2 = w_ref[0, :, :]  # [nt, T]
    total = jnp.sum(w2)
    wn2 = w2 / total
    neff_ref[0, 0, :] = (1.0 / jnp.sum(wn2 * wn2)).reshape(1)

    rio = jax.lax.broadcasted_iota(jnp.int32, (t, t), 0)
    cio = jax.lax.broadcasted_iota(jnp.int32, (t, t), 1)
    lower = (rio <= cio).astype(wn2.dtype)
    # every chunk's internal prefix in ONE [nt,T]x[T,T] matmul, then an
    # exclusive carry of the chunk totals (nt is tiny — unrolled adds)
    chunk_prefix = jax.lax.dot_general(
        wn2, lower, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)  # [nt, T]
    chunk_totals = chunk_prefix[:, t - 1]  # [nt]
    nio = jax.lax.broadcasted_iota(jnp.int32, (nt, nt), 0)
    njo = jax.lax.broadcasted_iota(jnp.int32, (nt, nt), 1)
    strict_lower = (njo < nio).astype(jnp.float32)  # carry[i] = sum_{j<i}
    carries = jnp.sum(strict_lower * chunk_totals[None, :], axis=1)
    cum2 = chunk_prefix + carries[:, None]  # [nt, T]
    grand = cum2[nt - 1, t - 1]
    cum2 = cum2 / grand  # round-off guard (particle.py parity)

    u = u_ref[0, 0, :]
    q2 = _segment_bounds(cum2, u, p)  # [nt, T] int32

    # q_prev: within-chunk shift matmul + previous chunk's last element
    # into column 0 (exact integer arithmetic in f32)
    shift_t = (rio == cio - 1).astype(jnp.float32)
    q2f = q2.astype(jnp.float32)
    inner = jax.lax.dot_general(q2f, shift_t, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32,
                                # HIGHEST: integers up to P must survive
                                precision=jax.lax.Precision.HIGHEST)
    shift_c = (njo == nio - 1).astype(jnp.float32)  # [nt, nt]
    prev_last = jnp.sum(shift_c * q2f[:, t - 1][None, :], axis=1)  # [nt]
    col0 = jax.lax.broadcasted_iota(jnp.int32, (nt, t), 1) == 0
    qprev2 = jnp.where(col0, prev_last[:, None], inner).astype(jnp.int32)

    rio_t = jax.lax.broadcasted_iota(jnp.int32, (t, t), 0)
    d = states_ref.shape[1]

    for ci in range(nt):
        row_g = rio_t + ci * t  # global output index on sublanes
        acc = jnp.zeros((d, t), states_ref.dtype)
        for cj in range(nt):
            # transposed segment tile (output index on sublanes): q/qprev
            # broadcast as lane vectors — no lane->sublane relayout
            mt = ((row_g >= qprev2[cj][None, :])
                  & (row_g < q2[cj][None, :])).astype(jnp.float32)
            acc = acc + jax.lax.dot_general(
                states_ref[0, :, cj, :], mt,
                (((1,), (1,)), ((), ())),
                preferred_element_type=states_ref.dtype,
            )
        out_states_ref[0, :, ci, :] = acc


_TILE_P = 512  # chunk size of the tiled kernel (P > 1024 dispatch)


def _row_block(b):
    """Rows per grid step: largest power-of-two divisor of b, capped at
    16 (shared-iota amortization saturates; block VMEM stays tiny)."""
    for r in (16, 8, 4, 2):
        if b % r == 0:
            return r
    return 1


@functools.partial(jax.jit, static_argnames=("interpret",))
def systematic_resample_gather(weights, u, states, interpret=None):
    """Fused systematic resampling for B independent particle filters.

    weights [B, P] (unnormalized), u [B] single stratified uniforms in
    [0, 1), states [B, D, P]. Returns (new_states [B, D, P],
    parent_idx [B, P] int32, neff [B]). `interpret=None` auto-selects
    interpreter mode on CPU backends (tests) and compiled mode on TPU.
    P <= 1024 runs the row-blocked segment-matrix kernel; larger P
    (multiple of 512) dispatches to the block-tiled kernel (same
    semantics, VMEM-bounded).
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"

    b, p = weights.shape
    d = states.shape[1]
    if p > 1024:
        if p % _TILE_P:
            raise ValueError(
                f"tiled resample needs P % {_TILE_P} == 0, got {p}")
        t = _TILE_P
        nt = p // t
        d2 = d + 2
        kernel = functools.partial(_resample_kernel_tiled, p=p, t=t)
        aug = _augment_with_index_channels(states, p)
        # host-side chunk layout [.., nt, T]: Mosaic has no in-kernel
        # 1-D reshape/slice past the first tile
        out_aug, neff = pl.pallas_call(
            kernel,
            grid=(b,),
            in_specs=[
                pl.BlockSpec((1, nt, t), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, d2, nt, t), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((1, d2, nt, t), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((b, d2, nt, t), states.dtype),
                jax.ShapeDtypeStruct((b, 1, 1), weights.dtype),
            ),
            interpret=interpret,
        )(weights.reshape(b, nt, t), u[:, None, None],
          aug.reshape(b, d2, nt, t))
        out_aug = out_aug.reshape(b, d2, p)
        return (out_aug[:, :d, :], _index_from_channels(out_aug, d, p),
                neff[:, 0, 0])

    r = _row_block(b)
    kernel = functools.partial(_resample_kernel, p=p, r=r)
    aug = _augment_with_index_channels(states, p)  # [B, D+2, P]
    out_aug, neff = pl.pallas_call(
        kernel,
        grid=(b // r,),
        in_specs=[
            pl.BlockSpec((r, p), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((r, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((r, d + 2, p), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((r, d + 2, p), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((r, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, d + 2, p), states.dtype),
            jax.ShapeDtypeStruct((b, 1), weights.dtype),
        ),
        interpret=interpret,
    )(weights, u[:, None], aug)
    return (out_aug[:, :d, :], _index_from_channels(out_aug, d, p),
            neff[:, 0])


def resample_reference(weights, u, states):
    """Generic jnp path with identical semantics (the parity oracle)."""
    b, p = weights.shape
    wn = weights / jnp.sum(weights, axis=-1, keepdims=True)
    neff = 1.0 / jnp.sum(wn * wn, axis=-1)
    cum = jnp.cumsum(wn, axis=-1)
    cum = cum / cum[..., -1:]
    pos = (jnp.arange(p, dtype=weights.dtype)[None, :] + u[:, None]) / p
    idx = jax.vmap(lambda c, q: jnp.searchsorted(c, q, side="left"))(cum,
                                                                     pos)
    idx = jnp.clip(idx, 0, p - 1).astype(jnp.int32)
    new_states = jax.vmap(lambda s, i: s[:, i])(states, idx)
    return new_states, idx, neff
