"""Blocked Cholesky factorization as a Pallas TPU kernel.

Reference surface: the BA/pose-graph reduced (Schur-complement) solve —
sparse.rs:160 eliminates landmark blocks and dense-solves the retained
camera system; here that retained solve (`nlls/solver.py::_solve_schur`)
gets a TPU-native factorization. XLA lowers `jnp.linalg.cholesky` to a
scalar-bound loop nest on TPU; this kernel keeps the whole (padded) matrix
resident in VMEM and spends the O(n³) flops in two MXU matmuls per block
step (panel scale + trailing rank-B update), with only the O(n·B²) block
factor/triangular-inverse loops on the VPU.

Algorithm (right-looking, block size B=128, K = n/B unrolled steps):
  for k in 0..K:
    D        = A[k,k] block                  — 128-step in-VMEM factor loop
    invL_kkᵀ = L_kk⁻ᵀ                        — 128-step forward substitution
    P        = A[k+1:, k] · invL_kkᵀ         — MXU
    A[k+1:, k+1:] -= P · Pᵀ                  — MXU (the n³ term)

Capacity: the matrix lives in VMEM, so n ≲ 1500 in f32 (BA with ~250
cameras) — exactly the reduced-system sizes the reference benchmarks
(size-200 BA → n=1200). Larger systems should use the matfree-PCG path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK = 128


def _dot_hi(a, b):
    """f32 matmul at (at least) bf16×3 precision.

    Mosaic's MXU lowering runs f32 dots at bf16-pass precision regardless
    of the XLA precision attribute, which wrecks a Cholesky (observed
    ~1e-5 relative per product on real v5e). Splitting each operand into
    bf16 head + f32 tail and summing the three cross products restores
    ~f32-grade accuracy while keeping every pass on the MXU. For f64
    (interpret/CPU paths) a direct dot is already exact enough.
    """
    if a.dtype != jnp.float32:
        return jnp.dot(a, b, preferred_element_type=a.dtype)
    ah = a.astype(jnp.bfloat16).astype(jnp.float32)
    al = a - ah
    bh = b.astype(jnp.bfloat16).astype(jnp.float32)
    bl = b - bh

    def d(u, v):
        return jnp.dot(u.astype(jnp.bfloat16), v.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)

    return d(ah, bh) + d(ah, bl) + d(al, bh)


def _factor_diag(d):
    """In-register Cholesky of a [B, B] SPD block (lower factor).

    128 masked rank-1 updates — VPU work on [B, B] tiles. All row/column
    extraction is done with masked reductions (Mosaic has no value-level
    dynamic_slice)."""
    b = d.shape[0]
    rows = jax.lax.broadcasted_iota(jnp.int32, (b, b), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (b, b), 1)
    zero = jnp.zeros((), d.dtype)

    def step(j, carry):
        a, l = carry
        pivot = jnp.sum(jnp.where((rows == j) & (cols == j), a, zero))
        inv = 1.0 / jnp.sqrt(jnp.maximum(pivot, 1e-30))
        col = jnp.sum(jnp.where(cols == j, a, zero), axis=1,
                      keepdims=True) * inv                     # [B, 1]
        col = jnp.where(rows[:, :1] >= j, col, zero)
        l = jnp.where(cols == j, col, l)
        strict = jnp.where(rows[:, :1] > j, col, zero)
        # rank-1 update as a broadcast product (exact VPU math — an MXU
        # outer product would run at bf16-pass precision)
        a = a - strict * strict.reshape(1, b)
        return a, l

    _, l = jax.lax.fori_loop(0, b, step, (d, jnp.zeros_like(d)))
    return l


def _tri_inverse(l):
    """Inverse of a [B, B] lower-triangular factor by row-wise forward
    substitution (X solves L·X = I), masked-reduction indexing."""
    b = l.shape[0]
    rows = jax.lax.broadcasted_iota(jnp.int32, (b, b), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (b, b), 1)
    zero = jnp.zeros((), l.dtype)

    def step(j, x):
        lrow = jnp.sum(jnp.where(rows == j, l, zero), axis=0,
                       keepdims=True)                          # [1, B]
        ljj = jnp.sum(jnp.where((rows == j) & (cols == j), l, zero))
        lrow = jnp.where(cols[:1, :] < j, lrow, zero)
        ej = (cols[:1, :] == j).astype(l.dtype)
        row = (ej - _dot_hi(lrow, x)) / ljj
        return jnp.where(rows == j, row, x)

    return jax.lax.fori_loop(0, b, step, jnp.zeros_like(l))


def _chol_kernel(a_hbm, out_ref, sem, k_blocks: int):
    # input stays in HBM; one DMA into the (only) VMEM working buffer —
    # keeps n=1280 f32 (the size-200 BA reduced system) inside the 16 MB
    # VMEM budget
    dma = pltpu.make_async_copy(a_hbm, out_ref, sem)
    dma.start()
    dma.wait()
    n = out_ref.shape[0]
    f = out_ref.dtype
    for k in range(k_blocks):
        lo = k * BLOCK
        hi = lo + BLOCK
        d = out_ref[lo:hi, lo:hi]
        l_kk = _factor_diag(d)
        out_ref[lo:hi, lo:hi] = l_kk
        if hi < n:
            inv_t = _tri_inverse(l_kk).T                       # L_kk⁻ᵀ
            panel = _dot_hi(out_ref[hi:n, lo:hi], inv_t)       # MXU
            out_ref[hi:n, lo:hi] = panel
            # trailing rank-B update in row chunks so the product temp is
            # [B, r] instead of [r, r]
            for i in range(k + 1, k_blocks):
                ri = i * BLOCK
                out_ref[ri:ri + BLOCK, hi:n] = (
                    out_ref[ri:ri + BLOCK, hi:n]
                    - _dot_hi(panel[ri - hi:ri - hi + BLOCK], panel.T))
    # zero the strictly-upper triangle
    r = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    out_ref[:] = jnp.where(r >= c, out_ref[:], jnp.zeros((), f))


@functools.partial(jax.jit, static_argnames=("interpret",))
def cholesky_pallas(a, interpret: bool | None = None):
    """Lower Cholesky factor of SPD `a` [n, n] (any n; padded to 128).

    Padding extends the diagonal with identity so the padded matrix stays
    SPD; the pad block factors to identity and never feeds back into the
    real block rows."""
    if interpret is None:
        interpret = jax.devices()[0].platform == "cpu"
    n = a.shape[0]
    pad = (-n) % BLOCK
    m = n + pad
    f = a.dtype
    if pad:
        a = jnp.pad(a, ((0, pad), (0, pad)))
        a = a.at[jnp.arange(n, m), jnp.arange(n, m)].set(1.0)
    out = pl.pallas_call(
        functools.partial(_chol_kernel, k_blocks=m // BLOCK),
        out_shape=jax.ShapeDtypeStruct((m, m), f),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SemaphoreType.DMA],
        interpret=interpret,
    )(a)
    return out[:n, :n]


def cholesky_solve_pallas(a, b, interpret: bool | None = None):
    """Solve SPD a·x = b via the Pallas factor + two triangular solves
    (the O(n²) substitutions stay in XLA — they are bandwidth-trivial)."""
    l = cholesky_pallas(a, interpret=interpret)
    y = jax.scipy.linalg.solve_triangular(l, b, lower=True)
    return jax.scipy.linalg.solve_triangular(l.T, y, lower=False)


# ---------------------------------------------------------------------------
# Beyond-VMEM: HBM-resident blocked Cholesky (VERDICT r02 #8)
# ---------------------------------------------------------------------------

def _dot_nt_hi(a, b):
    """a @ bᵀ at f32-grade precision (bf16×3 splitting, no explicit
    transpose — dot_general contracts the trailing dims)."""
    dn = (((1,), (1,)), ((), ()))

    def d(u, v):
        return jax.lax.dot_general(
            u.astype(jnp.bfloat16), v.astype(jnp.bfloat16), dn,
            preferred_element_type=jnp.float32)

    if a.dtype != jnp.float32:
        return jax.lax.dot_general(a, b, dn, preferred_element_type=a.dtype)
    ah = a.astype(jnp.bfloat16).astype(jnp.float32)
    al = a - ah
    bh = b.astype(jnp.bfloat16).astype(jnp.float32)
    bl = b - bh
    return d(ah, bh) + d(ah, bl) + d(al, bh)


def _chol_large_kernel(a_any, out_any, panel, rbuf, dbuf, sem,
                       *, n_pad: int, row_chunk: int):
    """One grid step = one 128-wide panel of a right-looking Cholesky.

    The matrix lives in HBM (aliased in/out); per step only the current
    column panel [n_pad, 128] and one trailing row chunk [row_chunk,
    n_pad] are VMEM-resident. The panel is masked to zero above the
    diagonal block, which makes the full-width trailing update exact with
    no column masking (zero rows/cols contribute nothing). HBM traffic is
    O(n³/128) — at n=2560 about 0.7 GB against 819 GB/s, far below the
    scalar-loop cost of XLA's TPU cholesky at these sizes.
    """
    del a_any  # aliased with out_any
    k = pl.program_id(0)
    lo = k * BLOCK
    hi = lo + BLOCK
    f = out_any.dtype

    # 1. diagonal block: DMA in, factor, L_kk^{-T}
    dma = pltpu.make_async_copy(
        out_any.at[pl.ds(lo, BLOCK), pl.ds(lo, BLOCK)], dbuf, sem)
    dma.start()
    dma.wait()
    l_kk = _factor_diag(dbuf[:])
    inv_t = _tri_inverse(l_kk).T

    # 2. column panel: DMA full column block, scale sub-diagonal rows,
    #    zero everything else, write back; restore L_kk over the zeros
    dma = pltpu.make_async_copy(out_any.at[:, pl.ds(lo, BLOCK)], panel, sem)
    dma.start()
    dma.wait()
    rows = jax.lax.broadcasted_iota(jnp.int32, (n_pad, BLOCK), 0)
    masked = jnp.where(rows >= hi, panel[:], jnp.zeros((), f))
    panel[:] = _dot_hi(masked, inv_t)
    dma = pltpu.make_async_copy(panel, out_any.at[:, pl.ds(lo, BLOCK)], sem)
    dma.start()
    dma.wait()
    dbuf[:] = l_kk
    dma = pltpu.make_async_copy(
        dbuf, out_any.at[pl.ds(lo, BLOCK), pl.ds(lo, BLOCK)], sem)
    dma.start()
    dma.wait()

    # 3. trailing rank-128 update, tiled over row chunks
    for i in range(n_pad // row_chunk):
        r0 = i * row_chunk

        @pl.when(r0 + row_chunk > hi)
        def _():
            dma = pltpu.make_async_copy(
                out_any.at[pl.ds(r0, row_chunk), :], rbuf, sem)
            dma.start()
            dma.wait()
            upd = _dot_nt_hi(panel[r0:r0 + row_chunk], panel[:])
            rbuf[:] = rbuf[:] - upd
            dma = pltpu.make_async_copy(
                rbuf, out_any.at[pl.ds(r0, row_chunk), :], sem)
            dma.start()
            dma.wait()


@functools.partial(jax.jit, static_argnames=("interpret", "row_chunk"))
def cholesky_pallas_large(a, interpret: bool | None = None,
                          row_chunk: int | None = None):
    """Lower Cholesky for matrices past the single-buffer VMEM cap: the
    matrix stays in HBM, panels stream through VMEM. Any n (padded to
    128); practical ceiling is the [n_pad, 128] panel (~10 MB at n≈20k)."""
    if interpret is None:
        interpret = jax.devices()[0].platform == "cpu"
    n = a.shape[0]
    pad = (-n) % BLOCK
    m = n + pad
    f = a.dtype
    if pad:
        a = jnp.pad(a, ((0, pad), (0, pad)))
        a = a.at[jnp.arange(n, m), jnp.arange(n, m)].set(1.0)
    if row_chunk is None:
        # keep the row buffer ≈ 4 MB
        row_chunk = max(BLOCK, min(512, (4 * 1024 * 1024) // (m * 4)))
        row_chunk -= row_chunk % BLOCK
    while m % row_chunk:
        row_chunk -= BLOCK
    out = pl.pallas_call(
        functools.partial(_chol_large_kernel, n_pad=m, row_chunk=row_chunk),
        grid=(m // BLOCK,),
        out_shape=jax.ShapeDtypeStruct((m, m), f),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[
            pltpu.VMEM((m, BLOCK), f),
            pltpu.VMEM((row_chunk, m), f),
            pltpu.VMEM((BLOCK, BLOCK), f),
            pltpu.SemaphoreType.DMA,
        ],
        input_output_aliases={0: 0},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(a)
    return jnp.tril(out)[:n, :n]
