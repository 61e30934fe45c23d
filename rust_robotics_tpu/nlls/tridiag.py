"""Device-resident chain NLLS: cyclic-reduction block-tridiagonal solve +
Woodbury loop-closure correction + fused Levenberg-Marquardt while_loop.

Reference surface: the large pose-graph benchmark
(crates/rust_robotics/examples/benchmark_large_pose_graph.rs:19-97;
README.md:728-730 — 10k poses in 8.62 s single-core at RMSE <= 2.2e-3) and
the shared LM loop semantics of rust_robotics_optimization/src/solver.rs
(:81-188 accept/reject with x0.3/x10 damping; sparse.rs:34-42 scaled
diagonal damping).

TPU-native inversion (SURVEY.md section 7.1): the reference iterates a
block-sparse PCG (sparse.rs:115) — a long *sequential* Krylov loop that is
latency-bound on an accelerator (3000 small dependent steps). A sequential
SLAM pose graph, however, is structurally a CHAIN (odometry factors i->i+1)
plus a few loop closures, so its Gauss-Newton system is block-tridiagonal
plus a low-rank correction:

    H = T + U W U^T,   T block-tridiagonal,  rank(UWU^T) = rdim x L.

- T^{-1} is applied by **cyclic reduction**: log2(n) levels of batched
  d x d block inverses and matmuls (pure vectorized VPU/MXU work, no
  sequential dependence beyond the 14-level ladder for n = 10k).
- Loop closures enter through the **Woodbury identity**; the capacity
  system is a dense (L*rdim)^2 solve (~300^2 for the 10k benchmark).
- The LM outer loop runs entirely on device in one `lax.while_loop`
  (termination flags computed on device, one host transfer at the end) —
  no per-iteration host syncs.

Everything has static shapes; the whole solve is a single XLA program.
"""

from __future__ import annotations

import functools
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from rust_robotics_tpu.ops.smallmat import inv_spd_small


def inv_spd(m):
    """Batched SPD inverse for block dims up to 8 without LAPACK loops:
    closed form for d <= 4 (ops/smallmat.py), one level of Schur block
    partitioning for 5 <= d <= 8, generic fallback beyond."""
    d = m.shape[-1]
    if d <= 4:
        return inv_spd_small(m)
    # recursive Schur partitioning: pure batched matmuls down to the
    # closed-form leaves — no LAPACK-style sequential panel loops. For
    # fat supernodal blocks this measured ~30% faster than batched
    # Cholesky + triangular inverse on the chip ([32,588,588]: 8.8 ms vs
    # 12.3 ms) at the same achieved accuracy (cyclic reduction's Schur
    # complements of an SPD system stay SPD, so every sub-block the
    # recursion inverts is SPD).
    # CONDITIONING ENVELOPE (measured, f64, d=96-384): residual ~1e-13
    # at kappa=1e3, ~1.5e-9 at kappa=1e4, but the recursion loses to a
    # Cholesky inverse rapidly beyond — ~1e-1 at kappa=1e6 (LAPACK:
    # 6e-11). The damped GN blocks the ladder feeds it are far inside
    # kappa~1e4 (tests/test_tridiag.py pins the measured bound); for
    # verification-grade ill-conditioned systems use the f64 dense
    # island or the chain path's `refine`.
    h = d // 2
    a = m[..., :h, :h]
    b = m[..., :h, h:]
    c = m[..., h:, h:]
    a_inv = inv_spd(a)
    ainv_b = a_inv @ b
    s = c - jnp.swapaxes(b, -1, -2) @ ainv_b
    s_inv = inv_spd(s)
    tl = a_inv + ainv_b @ s_inv @ jnp.swapaxes(ainv_b, -1, -2)
    tr = -ainv_b @ s_inv
    top = jnp.concatenate([tl, tr], axis=-1)
    bottom = jnp.concatenate([jnp.swapaxes(tr, -1, -2), s_inv], axis=-1)
    return jnp.concatenate([top, bottom], axis=-2)


class CRFactor(NamedTuple):
    """Cyclic-reduction factorization of a symmetric block-tridiagonal T.

    Hybrid level schedule (round-4 compile/runtime balance):
    - The TOP levels — the large, geometrically-shrinking ones that hold
      ~all the arithmetic — are unrolled exactly like the round-3 ladder
      (XLA fuses each into the surrounding program; total work stays
      O(2m) blocks).
    - The TAIL levels (active length ≤ _TAIL_M) run as ONE `lax.scan`
      over uniform [_TAIL_M/2]-length arrays (decoupled identity/zero
      padding is invariant under reduction). This caps the unrolled
      jaxpr at log2(m/_TAIL_M) levels regardless of problem size — the
      10k-chain cold compile dropped from ~12 min to under a minute
      through the relay (round-3 "Known gaps" item) while keeping the
      warm solve time of the fully-unrolled ladder (a fully-SCANNED
      ladder was measured 4x slower: every level re-processes full-m
      padded arrays).

    Tail arrays are stored in [d, d, m_t/2] SoA layout so the scan carry
    tiles densely (long axis on the lanes).
    """

    top: tuple  # per-level (e_inv, ae, ce, g, h): SoA [d, d, m_i/2]
    #             for d <= 8 (lanes-minor, unrolled products), AoS
    #             [m_i/2, d, d] for fat (MXU matmul) blocks
    tail: tuple  # stacked (e_inv, ae, ce, g, h), SoA [L_t, d, d, m_t/2]
    root_inv: jnp.ndarray  # [d, d] inverse of the final reduced block


_TAIL_M = 512  # active length at which the unrolled ladder hands to the scan

# Memory budget for one Woodbury edge chunk's ladder solve (RHS + per-level
# forward storage, sublane-padded; the sizing formula is ~2x conservative
# vs the arrays actually alive, so peak usage stays near half of this).
# Tests shrink this to force the multi-chunk path on small problems;
# solve_chain_lm reads it at TRACE time (call
# solve_chain_lm.clear_cache() after changing it).
WOODBURY_CHUNK_BYTES = 18 * 512 * 1024 * 1024


def _to_soa(x):
    """[m, d, r] -> [d, r, m] (long axis last, onto the lanes)."""
    return jnp.moveaxis(x, 0, -1)


def _from_soa(x):
    """[d, r, m] -> [m, d, r]."""
    return jnp.moveaxis(x, -1, 0)


def _soa_mm(a, b):
    """Block product on SoA operands: [da, dk, m] x [dk, db, m] ->
    [da, db, m], lanes (m) as the contraction batch. Lowers to d³
    multiply-adds over lane vectors — dense VPU work with NO [*, d, d]
    minor-dim tiling (an AoS [m, 3, 3] batched matmul makes XLA pick a
    T(4,128) tile on the trailing [3, 3] dims = 57x memory padding,
    measured OOM at 1M poses). UNROLLED multiply-adds, deliberately NOT
    an einsum: a dot_general drags the same tiny-d-minor layouts back in
    through its operand constraints — explicit mul/add keeps every
    array m-minor (dense lanes)."""
    da, dk, _ = a.shape
    rows = []
    for i in range(da):
        acc = a[i, 0][None, :] * b[0]          # [db, m]
        for k in range(1, dk):
            acc = acc + a[i, k][None, :] * b[k]
        rows.append(acc)
    return jnp.stack(rows, 0)


def _soa_inv_spd(m):
    """SPD inverse on SoA blocks [d, d, m]: closed form for d <= 3
    (component arithmetic over lane vectors), Schur-partition recursion
    beyond — the lane-resident mirror of `inv_spd`."""
    d = m.shape[0]
    if d == 1:
        return 1.0 / m
    if d == 2:
        a, b = m[0, 0], m[0, 1]
        c, e = m[1, 0], m[1, 1]
        inv_det = 1.0 / (a * e - b * c)
        return inv_det * jnp.stack(
            [jnp.stack([e, -b], 0), jnp.stack([-c, a], 0)], 0)
    if d == 3:
        a, b, c = m[0, 0], m[0, 1], m[0, 2]
        dd, e, f = m[1, 0], m[1, 1], m[1, 2]
        g, h, i = m[2, 0], m[2, 1], m[2, 2]
        co00 = e * i - f * h
        co01 = c * h - b * i
        co02 = b * f - c * e
        co10 = f * g - dd * i
        co11 = a * i - c * g
        co12 = c * dd - a * f
        co20 = dd * h - e * g
        co21 = b * g - a * h
        co22 = a * e - b * dd
        det = a * co00 + b * co10 + c * co20
        adj = jnp.stack([
            jnp.stack([co00, co01, co02], 0),
            jnp.stack([co10, co11, co12], 0),
            jnp.stack([co20, co21, co22], 0),
        ], 0)
        return adj / det
    h = d // 2
    a = m[:h, :h]
    b = m[:h, h:]
    c = m[h:, h:]
    a_inv = _soa_inv_spd(a)
    ainv_b = _soa_mm(a_inv, b)
    s = c - _soa_mm(jnp.swapaxes(b, 0, 1), ainv_b)
    s_inv = _soa_inv_spd(s)
    tl = a_inv + _soa_mm(_soa_mm(ainv_b, s_inv),
                         jnp.swapaxes(ainv_b, 0, 1))
    tr = -_soa_mm(ainv_b, s_inv)
    top = jnp.concatenate([tl, tr], axis=1)
    bottom = jnp.concatenate([jnp.swapaxes(tr, 0, 1), s_inv], axis=1)
    return jnp.concatenate([top, bottom], axis=0)


def _reduce_level_soa(b, a, c, d, f_):
    """One cyclic-reduction level on SoA arrays [d, d, m] (m even,
    lanes minor) — the scan-tail body. Returns (stored SoA level,
    reduced (b, a, c)) at half lane length."""
    be, bo = b[..., 0::2], b[..., 1::2]
    ae, ao = a[..., 0::2], a[..., 1::2]
    ce, co = c[..., 0::2], c[..., 1::2]
    e_inv = _soa_inv_spd(be)
    eye_tail = jnp.eye(d, dtype=f_)[..., None]
    zero_tail = jnp.zeros((d, d, 1), f_)
    e_inv_r = jnp.concatenate([e_inv[..., 1:], eye_tail], -1)
    ae_r = jnp.concatenate([ae[..., 1:], zero_tail], -1)
    ce_r = jnp.concatenate([ce[..., 1:], zero_tail], -1)
    g = _soa_mm(ao, e_inv)
    hh = _soa_mm(co, e_inv_r)
    b_new = bo - _soa_mm(g, ce) - _soa_mm(hh, ae_r)
    a_new = -_soa_mm(g, ae)
    c_new = -_soa_mm(hh, ce_r)
    return (e_inv, ae, ce, g, hh), (b_new, a_new, c_new)


def _reduce_level(b, a, c, eye, d, f_):
    """One cyclic-reduction level on AoS arrays (length 2h -> h).
    Returns (stored level, reduced (b, a, c))."""
    be, bo = b[0::2], b[1::2]
    ae, ao = a[0::2], a[1::2]
    ce, co = c[0::2], c[1::2]
    e_inv = inv_spd(be)
    # right even neighbor of odd j is even index j'+1 (pad: identity)
    e_inv_r = jnp.concatenate([e_inv[1:], eye[None]], 0)
    ae_r = jnp.concatenate([ae[1:], jnp.zeros((1, d, d), f_)], 0)
    ce_r = jnp.concatenate([ce[1:], jnp.zeros((1, d, d), f_)], 0)
    g = ao @ e_inv
    h = co @ e_inv_r
    b_new = bo - g @ ce - h @ ae_r
    a_new = -g @ ae
    c_new = -h @ ce_r
    return (e_inv, ae, ce, g, h), (b_new, a_new, c_new)


def block_tridiag_factor(diag, upper, tail_threshold=None):
    """Factor T (diag [n, d, d], upper [n-1, d, d]) by cyclic reduction:
    log2(n) levels of batched block inverses and matmuls (hybrid
    unroll+scan schedule — see CRFactor). The factorization is
    independent of the right-hand side — pair with `block_tridiag_apply`
    to solve for many (possibly chunked) RHS without refactoring.

    tail_threshold: override the unroll/scan handoff length. The chunked
    SPIKE path passes the full (padded) length so EVERY level runs in
    the uniform SoA scan: under vmap over chunks the unrolled AoS
    [C, m_i, d, d] levels trigger a catastrophic XLA tiling choice
    (T(4,128) on the trailing [3, 3] dims = 57x padding — measured OOM
    at 1M poses), while the scan's [d, d, m] SoA carries tile densely."""
    n, d, _ = diag.shape
    f_ = diag.dtype
    eye = jnp.eye(d, dtype=f_)

    m = 1 if n == 1 else 1 << (n - 1).bit_length()  # next power of two
    pad = m - n
    b = jnp.concatenate([diag, jnp.broadcast_to(eye, (pad, d, d))], 0) \
        if pad else diag
    c = jnp.concatenate([upper, jnp.zeros((m - 1 - upper.shape[0], d, d),
                                          f_)], 0) \
        if upper.shape[0] < m - 1 else upper
    c = jnp.concatenate([c, jnp.zeros((1, d, d), f_)], 0)  # C_{m-1} = 0
    a = jnp.concatenate([jnp.zeros((1, d, d), f_),
                         jnp.swapaxes(c[:-1], -1, -2)], 0)  # A_i = C_{i-1}^T

    # --- top: unrolled geometric levels down to the tail threshold --------
    # Fat (supernodal) blocks unroll fully: their per-level jaxpr is a
    # handful of matmul ops (compile-cheap) while the uniform-scan tail
    # would redo full-length batched inverses at every level (3x the
    # arithmetic — measured 2x factor time on the 100x100 grid).
    if tail_threshold is not None:
        tail_m = max(int(tail_threshold), 1)
    else:
        tail_m = _TAIL_M if d <= 8 else 1
    # Small blocks (d <= 8) run the TOP levels in SoA too — same
    # lanes-minor layout + unrolled products as the scan tail; the AoS
    # batched-matmul form is kept only for fat supernodal blocks, where
    # the MXU wants real [big, big] matmuls.
    use_soa = d <= 8
    top = []
    m_cur = m
    if use_soa:
        b, a, c = map(_to_soa, (b, a, c))
        while m_cur > tail_m:
            level, (b, a, c) = _reduce_level_soa(b, a, c, d, f_)
            top.append(level)
            m_cur //= 2
    else:
        while m_cur > tail_m:
            level, (b, a, c) = _reduce_level(b, a, c, eye, d, f_)
            top.append(level)
            m_cur //= 2

    # --- tail: uniform scan over the remaining log2(m_cur) levels ---------
    tail_levels = (m_cur - 1).bit_length()
    if tail_levels == 0:
        z = jnp.zeros((0, d, d, 0), f_)
        root = b[..., 0] if use_soa else b[0]
        return CRFactor(tuple(top), (z, z, z, z, z), inv_spd(root[None])[0])

    h2 = m_cur // 2
    pad_eye_soa = jnp.broadcast_to(eye[..., None], (d, d, h2))
    pad_zero_soa = jnp.zeros((d, d, h2), f_)

    def level_step(carry, _):
        b, a, c = carry  # SoA [d, d, m_t] throughout (see _soa_mm)
        level, (b_new, a_new, c_new) = _reduce_level_soa(b, a, c, d, f_)
        b_new = jnp.concatenate([b_new, pad_eye_soa], -1)
        a_new = jnp.concatenate([a_new, pad_zero_soa], -1)
        c_new = jnp.concatenate([c_new, pad_zero_soa], -1)
        return (b_new, a_new, c_new), level

    carry0 = (b, a, c) if use_soa else tuple(map(_to_soa, (b, a, c)))
    (b_soa, _, _), tail = jax.lax.scan(
        level_step, carry0, None, length=tail_levels)
    return CRFactor(tuple(top), tail, inv_spd(b_soa[..., 0][None])[0])


def block_tridiag_apply(factor: CRFactor, rhs):
    """Apply T⁻¹ to rhs [n, d, r] using a `block_tridiag_factor` result:
    forward reduction of the RHS down the ladder (unrolled top + scanned
    tail), root solve, then back-substitution in reverse."""
    n, d, r = rhs.shape
    f_ = rhs.dtype
    m = 1 if n == 1 else 1 << (n - 1).bit_length()
    pad = m - n
    f = jnp.concatenate([rhs, jnp.zeros((pad, d, r), f_)], 0) \
        if pad else rhs

    use_soa = d <= 8
    zero_col = jnp.zeros((d, r, 1), f_)

    # --- forward: unrolled top levels ------------------------------------
    top_fes = []
    if use_soa:
        f_s = _to_soa(f)  # [d, r, m]
        for (_, _, _, g, h) in factor.top:
            fe, fo = f_s[..., 0::2], f_s[..., 1::2]
            fe_r = jnp.concatenate([fe[..., 1:], zero_col], -1)
            top_fes.append(fe)
            f_s = fo - _soa_mm(g, fe) - _soa_mm(h, fe_r)
    else:
        for (_, _, _, g, h) in factor.top:
            fe, fo = f[0::2], f[1::2]
            fe_r = jnp.concatenate([fe[1:], jnp.zeros((1, d, r), f_)], 0)
            top_fes.append(fe)
            f = fo - g @ fe - h @ fe_r
        f_s = _to_soa(f)

    # --- forward: scanned tail (SoA bodies — see _soa_mm) -----------------
    tail_levels = factor.tail[0].shape[0]
    if tail_levels:
        h2 = factor.tail[0].shape[-1]
        m_t = 2 * h2
        pad_zero_soa = jnp.zeros((d, r, h2), f_)

        def fwd(f_soa, level):
            g, h = level[3], level[4]
            fe, fo = f_soa[..., 0::2], f_soa[..., 1::2]
            fe_r = jnp.concatenate([fe[..., 1:], zero_col], -1)
            f_new = jnp.concatenate(
                [fo - _soa_mm(g, fe) - _soa_mm(h, fe_r), pad_zero_soa],
                -1)
            return f_new, fe

        f_soa, tail_fes = jax.lax.scan(fwd, f_s, factor.tail)
        f0 = f_soa[..., 0]
    else:
        f0 = f_s[..., 0]

    x0 = factor.root_inv @ f0  # [d, r]

    # --- backward: scanned tail ------------------------------------------
    if tail_levels:
        x_s = jnp.zeros((d, r, m_t), f_).at[..., 0].set(x0)

        def bwd(x_soa, level_and_fe):
            level, fe = level_and_fe
            e_inv, ae, ce = level[0], level[1], level[2]
            x_odd = x_soa[..., :h2]
            xl = jnp.concatenate([zero_col, x_odd[..., :-1]], -1)
            x_even = _soa_mm(
                e_inv, fe - _soa_mm(ae, xl) - _soa_mm(ce, x_odd))
            x_new = jnp.stack([x_even, x_odd], axis=-1).reshape(
                d, r, m_t)
            return x_new, None

        x_s, _ = jax.lax.scan(
            bwd, x_s, (factor.tail, tail_fes), reverse=True)
    else:
        x_s = x0[:, :, None]

    # --- backward: unrolled top levels (reverse order) --------------------
    if use_soa:
        for (e_inv, ae, ce, _, _), fe in zip(reversed(factor.top),
                                             reversed(top_fes)):
            x_odd = x_s
            xl = jnp.concatenate([zero_col, x_odd[..., :-1]], -1)
            x_even = _soa_mm(
                e_inv, fe - _soa_mm(ae, xl) - _soa_mm(ce, x_odd))
            x_s = jnp.stack([x_even, x_odd], axis=-1).reshape(
                d, r, 2 * x_odd.shape[-1])
        x = _from_soa(x_s)
    else:
        x = _from_soa(x_s)
        for (e_inv, ae, ce, _, _), fe in zip(reversed(factor.top),
                                             reversed(top_fes)):
            x_odd = x
            xl = jnp.concatenate(
                [jnp.zeros((1, d, r), f_), x_odd[:-1]], 0)
            x_even = e_inv @ (fe - ae @ xl - ce @ x_odd)
            h_lvl = x_even.shape[0]
            x = jnp.stack([x_even, x_odd], axis=1).reshape(
                2 * h_lvl, d, r)

    return x[:n]


class ChunkedFactor(NamedTuple):
    """SPIKE-partitioned single-chip factorization of T (VERDICT r4 #2:
    the 1M-pose unrolled ladder exhausts the AOT compile workspace; C
    chunks keep the compiled ladder at the per-chunk size — the SAME
    partitioned math as parallel/sharded_tridiag.spike_solve_local, with
    vmap over chunks instead of shard_map over devices)."""

    fac: CRFactor          # vmapped ladder factors, leaves lead with [C]
    w: jnp.ndarray         # [C, d, d, m] SoA left spikes T_c⁻¹(e_first A_c)
    v: jnp.ndarray         # [C, d, d, m] SoA right spikes T_c⁻¹(e_last C_c)
    imat: jnp.ndarray      # [2C·d, 2C·d] interface system
    n: int                 # original (unpadded) row count


def chunked_tridiag_factor(diag, upper, chunks):
    """Factor T (diag [n, d, d], upper [n-1, d, d]) in `chunks`
    contiguous row chunks: each chunk runs the ladder at
    m = ceil(n/chunks) rows (vmapped over chunks) ENTIRELY in the
    uniform SoA scan schedule (tail_threshold=m — the vmapped unrolled
    AoS levels hit a 57x XLA padding blowup, see block_tridiag_factor),
    the two per-chunk spikes come from one extra 2d-column ladder apply
    (stored SoA for the same reason), and the coupled interface system
    over the 2C chunk-boundary rows is assembled once.
    Pair with `chunked_tridiag_apply`."""
    n, d, _ = diag.shape
    f_ = diag.dtype
    c_n = chunks
    m = -(-n // c_n)
    n_pad = c_n * m
    pad = n_pad - n
    eye = jnp.eye(d, dtype=f_)
    diag_p = jnp.concatenate(
        [diag, jnp.broadcast_to(eye, (pad, d, d))], 0) if pad else diag
    upper_p = jnp.concatenate(
        [upper, jnp.zeros((n_pad - 1 - upper.shape[0], d, d), f_)], 0) \
        if upper.shape[0] < n_pad - 1 else upper
    # chunk-internal uppers [C, m-1, d, d] and boundary couplings:
    # upper_p[c*m - 1] couples chunk c-1's last row to chunk c's first
    diag_c = diag_p.reshape(c_n, m, d, d)
    up_full = jnp.concatenate([upper_p, jnp.zeros((1, d, d), f_)],
                              0).reshape(c_n, m, d, d)
    upper_int = up_full[:, :m - 1]
    bound = up_full[:, m - 1]                      # [C, d, d]
    a_left = jnp.concatenate(
        [jnp.zeros((1, d, d), f_),
         jnp.swapaxes(bound[:-1], -1, -2)], 0)     # [C, d, d]
    c_right = jnp.concatenate(
        [bound[:-1], jnp.zeros((1, d, d), f_)], 0)

    m_pow2 = 1 if m == 1 else 1 << (m - 1).bit_length()
    fac = jax.vmap(
        lambda dg, up: block_tridiag_factor(dg, up,
                                            tail_threshold=m_pow2))(
        diag_c, upper_int)
    rhs_wv = jnp.zeros((c_n, m, d, 2 * d), f_)
    rhs_wv = rhs_wv.at[:, 0, :, :d].set(a_left)
    rhs_wv = rhs_wv.at[:, m - 1, :, d:].set(c_right)
    sol = jnp.moveaxis(jax.vmap(block_tridiag_apply)(fac, rhs_wv),
                       1, -1)                      # SoA [C, d, 2d, m]
    w = sol[:, :, :d]
    v = sol[:, :, d:]

    # interface system over z = [x_0^top, x_0^bot, ..., x_{C-1}^bot]
    idx = jnp.arange(c_n)
    mat = jnp.zeros((2 * c_n, d, 2 * c_n, d), f_)
    mat = mat.at[2 * idx, :, 2 * idx, :].set(
        jnp.broadcast_to(eye, (c_n, d, d)))
    mat = mat.at[2 * idx + 1, :, 2 * idx + 1, :].set(
        jnp.broadcast_to(eye, (c_n, d, d)))
    if c_n > 1:
        k = idx[1:]
        mat = mat.at[2 * k, :, 2 * (k - 1) + 1, :].set(w[1:, :, :, 0])
        mat = mat.at[2 * k + 1, :, 2 * (k - 1) + 1, :].set(
            w[1:, :, :, m - 1])
        k = idx[:-1]
        mat = mat.at[2 * k, :, 2 * (k + 1), :].set(v[:-1, :, :, 0])
        mat = mat.at[2 * k + 1, :, 2 * (k + 1), :].set(
            v[:-1, :, :, m - 1])
    imat = mat.reshape(2 * c_n * d, 2 * c_n * d)
    return ChunkedFactor(fac, w, v, imat, n)


def chunked_tridiag_apply(factor: ChunkedFactor, rhs):
    """Apply T⁻¹ to rhs [n, d, r] with a `chunked_tridiag_factor`
    result: vmapped per-chunk ladder applies, one (2C·d)² interface
    solve, local spike correction."""
    c_n, d, _, m = factor.w.shape
    n = factor.n
    r = rhs.shape[-1]
    f_ = rhs.dtype
    pad = c_n * m - n
    rhs_p = jnp.concatenate(
        [rhs, jnp.zeros((pad, d, r), f_)], 0) if pad else rhs
    g = jnp.moveaxis(
        jax.vmap(block_tridiag_apply)(factor.fac,
                                      rhs_p.reshape(c_n, m, d, r)),
        1, -1)                                      # SoA [C, d, r, m]
    rhs_z = jnp.stack([g[..., 0], g[..., m - 1]], axis=1).reshape(
        2 * c_n, d, r)
    z = jnp.linalg.solve(
        factor.imat, rhs_z.reshape(2 * c_n * d, r)).reshape(
        2 * c_n, d, r)
    zero = jnp.zeros((1, d, r), f_)
    xb_left = jnp.concatenate([zero, z[1::2][:-1]], 0)   # [C, d, r]
    xt_right = jnp.concatenate([z[0::2][1:], zero], 0)
    x = (g - jnp.einsum("ctsm,csr->ctrm", factor.w, xb_left)
         - jnp.einsum("ctsm,csr->ctrm", factor.v, xt_right))
    # [C, d, r, m] SoA -> [C, m, d, r] -> [n, d, r]
    return jnp.moveaxis(x, -1, 1).reshape(c_n * m, d, r)[:n]


def block_tridiag_solve(diag, upper, rhs):
    """Solve the symmetric block-tridiagonal system T x = rhs by cyclic
    reduction.

    diag:  [n, d, d]   diagonal blocks B_i (SPD after LM damping)
    upper: [n-1, d, d] super-diagonal blocks C_i coupling (i, i+1); the
                       sub-diagonal is C_i^T (symmetry)
    rhs:   [n, d, r]   r simultaneous right-hand sides

    log2(n) scanned reduction levels, each a handful of batched
    [m/2, d, d] inverses and matmuls; back-substitution re-interleaves
    level by level. Padding extends the system with decoupled identity
    equations so every level keeps a uniform shape (scan-compatible)."""
    return block_tridiag_apply(block_tridiag_factor(diag, upper), rhs)


def chain_linearize(values, chain_meas, chain_info, loop_from, loop_to,
                    loop_meas, loop_info, fixed, *, residual_fn,
                    retract_fn, tdim):
    """Gauss-Newton linearization of a chain factor graph with loop
    closures at `values`. Returns (grad [n,t], B [n,t,t] tridiagonal
    diagonal blocks, C [n-1,t,t] super-diagonal blocks, jac_loop
    (ji_l, jj_l) raw loop Jacobians or None, diag_loop [n,t] loop
    Hessian diagonal, cost). Shared by the LM forward pass
    (solve_chain_lm) and the IFT backward pass (nlls/implicit.py)."""
    n = values.shape[0]
    num_l = loop_from.shape[0]
    f_ = values.dtype

    def edge_terms(xi, xj, meas):
        z = jnp.zeros((tdim,), f_)

        def r_of(di, dj):
            return residual_fn(retract_fn(xi, di), retract_fn(xj, dj),
                               meas)

        r0 = r_of(z, z)
        ji, jj = jax.jacfwd(r_of, argnums=(0, 1))(z, z)
        return r0, ji, jj

    def apply_info(info, v):
        return v if info is None else jnp.einsum("eij,e...j->e...i",
                                                 info, v)

    # --- chain edges -----------------------------------------------------
    r_c, ji_c, jj_c = jax.vmap(edge_terms)(
        values[:-1], values[1:], chain_meas)
    ji_c = jnp.where(fixed[:-1, None, None], 0.0, ji_c)
    jj_c = jnp.where(fixed[1:, None, None], 0.0, jj_c)
    lam_r_c = apply_info(chain_info, r_c)
    cost = 0.5 * jnp.sum(r_c * lam_r_c)
    lam_ji = apply_info(chain_info, ji_c)
    lam_jj = apply_info(chain_info, jj_c)

    grad = jnp.zeros((n, tdim), f_)
    grad = grad.at[:-1].add(jnp.einsum("eri,er->ei", ji_c, lam_r_c))
    grad = grad.at[1:].add(jnp.einsum("eri,er->ei", jj_c, lam_r_c))

    b = jnp.zeros((n, tdim, tdim), f_)
    b = b.at[:-1].add(jnp.einsum("eri,erj->eij", ji_c, lam_ji))
    b = b.at[1:].add(jnp.einsum("eri,erj->eij", jj_c, lam_jj))
    c = jnp.einsum("eri,erj->eij", ji_c, lam_jj)  # [n-1, t, t]

    # --- loop closures ---------------------------------------------------
    if num_l:
        r_l, ji_l, jj_l = jax.vmap(edge_terms)(
            values[loop_from], values[loop_to], loop_meas)
        ji_l = jnp.where(fixed[loop_from, None, None], 0.0, ji_l)
        jj_l = jnp.where(fixed[loop_to, None, None], 0.0, jj_l)
        lam_r_l = apply_info(loop_info, r_l)
        cost = cost + 0.5 * jnp.sum(r_l * lam_r_l)
        grad = grad.at[loop_from].add(
            jnp.einsum("eri,er->ei", ji_l, lam_r_l))
        grad = grad.at[loop_to].add(
            jnp.einsum("eri,er->ei", jj_l, lam_r_l))
        # UWU^T diagonal contribution (needed only for the damping
        # magnitude, sparse.rs:34-42 uses the FULL H diagonal)
        lam_ji_l = apply_info(loop_info, ji_l)
        lam_jj_l = apply_info(loop_info, jj_l)
        diag_loop = jnp.zeros((n, tdim), f_)
        diag_loop = diag_loop.at[loop_from].add(
            jnp.einsum("erk,erk->ek", ji_l, lam_ji_l))
        diag_loop = diag_loop.at[loop_to].add(
            jnp.einsum("erk,erk->ek", jj_l, lam_jj_l))
        # the raw loop Jacobians ARE the Woodbury factor: H_loop =
        # U W Uᵀ with U's flat column block e holding J_i^T / J_j^T at
        # rows i_e / j_e. U is never materialized ([n, t, K] is the
        # 100k-pose memory cliff, VERDICT r3 #6) — the solve streams
        # edge chunks (chain_woodbury_solve).
        jac_loop = (ji_l, jj_l)
    else:
        diag_loop = jnp.zeros((n, tdim), f_)
        jac_loop = None

    grad = jnp.where(fixed[:, None], 0.0, grad)
    return grad, b, c, jac_loop, diag_loop, cost


def build_w_inv(loop_info, num_l, rdim, dtype):
    """Block-diagonal W⁻¹ [K, K] of the loop-edge information blocks."""
    w_inv_blocks = (jnp.broadcast_to(jnp.eye(rdim, dtype=dtype),
                                     (num_l, rdim, rdim))
                    if loop_info is None else inv_spd(loop_info))
    k_w = num_l * rdim
    w_inv = jnp.zeros((k_w, k_w), dtype)
    el = jnp.arange(num_l)[:, None, None]
    ri = jnp.arange(rdim)
    w_inv = w_inv.at[el * rdim + ri[None, :, None],
                     el * rdim + ri[None, None, :]].set(w_inv_blocks)
    return w_inv


def chain_woodbury_solve(bd, c, jac_loop, loop_from, loop_to, w_inv,
                         rhs_vec, w_blocks=None, refine=0,
                         chunk_bytes=None, chunks=0, spd=True):
    """x = (T + U W Uᵀ)⁻¹ rhs_vec for an assembled chain system.

    bd [n,t,t] damped/fixed-adjusted diagonal blocks, c [n-1,t,t] super-
    diagonal, jac_loop = (ji_l, jj_l) raw loop Jacobians (or None),
    w_inv [K,K], rhs_vec [n,t]. U's columns are streamed in edge chunks
    sized by WOODBURY_CHUNK_BYTES — no O(n·K) array is materialized.
    Shared by solve_chain_lm's inner solve and the IFT backward pass.

    refine: number of iterative-refinement passes (x += H⁻¹(b − Hx),
    one cheap H matvec + one extra ladder apply each). Off by default —
    the SE(2) benchmarks don't need it; opt in for ill-conditioned f32
    systems (large-workspace SE(3) chains) where the factorization's
    κ·ε solve error dominates. Requires `w_blocks` [L, r, r] (the loop
    information blocks; identity if None) when loops are present and
    refine > 0, since the H matvec applies W itself rather than W⁻¹.

    chunk_bytes: per-chunk memory budget for the streamed column solve;
    None reads the module default WOODBURY_CHUNK_BYTES at trace time
    (note: changing the module global after a solver has been traced has
    no effect until its jit cache is cleared — pass the budget
    explicitly, e.g. solve_chain_lm(woodbury_chunk_bytes=...), when
    tuning)."""
    n, tdim, _ = bd.shape
    f_ = bd.dtype
    if chunks and chunks > 1:
        fac_c = chunked_tridiag_factor(bd, c, chunks)
        t_apply = lambda rhs: chunked_tridiag_apply(fac_c, rhs)
    else:
        fac = block_tridiag_factor(bd, c)
        t_apply = lambda rhs: block_tridiag_apply(fac, rhs)
    if jac_loop is None:
        x = t_apply(rhs_vec[..., None])[..., 0]
        for _ in range(refine):
            tx = jnp.einsum("nij,nj->ni", bd, x)
            tx = tx.at[:-1].add(jnp.einsum("nij,nj->ni", c, x[1:]))
            tx = tx.at[1:].add(jnp.einsum("nji,nj->ni", c, x[:-1]))
            x = x + t_apply((rhs_vec - tx)[..., None])[..., 0]
        return x
    ji_l, jj_l = jac_loop
    num_l = loop_from.shape[0]
    rdim = ji_l.shape[1]
    k_w = num_l * rdim

    if chunks and chunks > 1:
        # SPIKE-chunked ladder: the all-scan tail stores per-level
        # forward state at FULL padded length (L_t levels x m/2 rows per
        # chunk), not the unrolled ladder's geometric 2m total — size
        # the edge chunks by that footprint, with NO extra safety factor:
        # every chunk apply pays an r-INDEPENDENT re-read of the level
        # factor arrays, so over-chunking is the dominant cost (the
        # first 1M capture ran 34 chunk applies per iteration)
        m_loc = -(-n // chunks)
        m_loc_p2 = 1 if m_loc == 1 else 1 << (m_loc - 1).bit_length()
        lt = max((m_loc_p2 - 1).bit_length(), 1)
        eff_rows = chunks * lt * max(m_loc_p2 // 2, 1)
        _bytes_per_edge = eff_rows * 8 * 4 * rdim
    else:
        m_pow2 = 1 if n == 1 else 1 << (n - 1).bit_length()
        eff_rows = 2 * m_pow2
        _bytes_per_edge = 3 * eff_rows * 8 * 4 * rdim
    budget = WOODBURY_CHUNK_BYTES if chunk_bytes is None else chunk_bytes
    cs_edges = max(1, min(num_l, budget // _bytes_per_edge))
    nc_edges = -(-num_l // cs_edges)

    def ut_apply(z):
        """Uᵀ z for z [n, t, C] -> [K, C] via row gathers (U's only
        nonzero rows are the loop endpoints)."""
        zi = z[loop_from]
        zj = z[loop_to]
        out = (jnp.einsum("eat,etc->eac", ji_l, zi)
               + jnp.einsum("eat,etc->eac", jj_l, zj))
        return out.reshape(k_w, -1)

    def s_cols_of_chunk(chunk):
        """T⁻¹ applied to one chunk of U's columns, contracted back to
        the corresponding S columns [K, cs*r]."""
        ji_c, jj_c, ef_c, et_c = chunk
        cols = (jnp.arange(cs_edges)[:, None] * rdim
                + jnp.arange(rdim)[None, :])  # [cs, r]
        rhs = jnp.zeros((n, tdim, cs_edges * rdim), f_)
        rhs = rhs.at[ef_c[:, None], :, cols].add(ji_c)
        rhs = rhs.at[et_c[:, None], :, cols].add(jj_c)
        return ut_apply(t_apply(rhs))

    pad_e = nc_edges * cs_edges - num_l

    def pad0(x):
        return jnp.concatenate(
            [x, jnp.zeros((pad_e,) + x.shape[1:], x.dtype)], 0) \
            if pad_e else x

    chunks = tuple(
        pad0(x).reshape((nc_edges, cs_edges) + x.shape[1:])
        for x in (ji_l, jj_l, loop_from, loop_to))
    if nc_edges == 1:
        uty = s_cols_of_chunk(tuple(x[0] for x in chunks))
    else:
        s_parts = jax.lax.map(s_cols_of_chunk, chunks)  # [nc, K, cs*r]
        uty = jnp.moveaxis(s_parts, 0, 1).reshape(
            k_w, nc_edges * cs_edges * rdim)[:, :k_w]
    s = w_inv + uty
    # S is SPD analytically (W SPD, T SPD after damping) — Cholesky
    # halves the dense K×K solve flops vs LU and is factored ONCE across
    # refine passes. But f32 ASSEMBLY error in Uᵀ T⁻¹ U can make the
    # numerical S indefinite (measured: min eig -0.17 vs max 11 on an
    # UNDAMPED 1k-pose chain), and then Cholesky NaNs. Inside the LM
    # loop that is safe — the finite-delta guard damps up and retries
    # (spd=True, the default). Callers that solve ONCE with no retry
    # (the IFT backward pass, which uses the undamped H at the optimum)
    # must pass spd=False for the robust LU path: on a nearly-SPD
    # indefinite S, LU still returns the accurate solution where
    # Cholesky returns NaN.
    if spd:
        s_cho = jax.scipy.linalg.cho_factor(s)
        s_solve = lambda r: jax.scipy.linalg.cho_solve(s_cho, r)
    else:
        s_lu = jax.scipy.linalg.lu_factor(s)
        s_solve = lambda r: jax.scipy.linalg.lu_solve(s_lu, r)

    def u_scatter(cb):
        """U v: [L, r] per-edge coefficients -> [n, t]."""
        out = jnp.zeros((n, tdim), f_)
        out = out.at[loop_from].add(jnp.einsum("eat,ea->et", ji_l, cb))
        out = out.at[loop_to].add(jnp.einsum("eat,ea->et", jj_l, cb))
        return out

    def solve_once(b_vec):
        y0 = t_apply(b_vec[..., None])[..., 0]
        rhs_c = ut_apply(y0[..., None])[:, 0]
        coef = s_solve(rhs_c)
        # correction T⁻¹ (U coef) via one more ladder apply; U coef is
        # assembled sparsely from the edge Jacobians
        u_coef = u_scatter(coef.reshape(num_l, rdim))
        return y0 - t_apply(u_coef[..., None])[..., 0]

    x = solve_once(rhs_vec)
    if refine:
        assert w_blocks is not None, "refine needs the loop info blocks"

        def h_apply(v):
            tv = jnp.einsum("nij,nj->ni", bd, v)
            tv = tv.at[:-1].add(jnp.einsum("nij,nj->ni", c, v[1:]))
            tv = tv.at[1:].add(jnp.einsum("nji,nj->ni", c, v[:-1]))
            utv = ut_apply(v[..., None])[:, 0].reshape(num_l, rdim)
            wv = jnp.einsum("eij,ej->ei", w_blocks, utv)
            return tv + u_scatter(wv)

        for _ in range(refine):
            x = x + solve_once(rhs_vec - h_apply(x))
    return x


class NestedPartition(NamedTuple):
    """Static two-level partition of a chain with loop closures: every
    closure endpoint is a separator; the chain intervals between
    consecutive separators are eliminated in a BATCH (they pad to one
    common length), leaving a coarse block-tridiagonal system over the
    ~2L separator poses whose Woodbury rides a ~2L-row ladder instead of
    the full n-row one (VERDICT r4 #6). Built host-side by
    `nested_partition` from concrete endpoint arrays."""
    bounds: jnp.ndarray    # [nb] separator pose ids (includes 0, n-1)
    seg_idx: jnp.ndarray   # [ns, m] interior pose ids; sentinel n invalid
    seg_mask: jnp.ndarray  # [ns, m] valid interior rows
    cmask: jnp.ndarray     # [ns, m-1] valid interior couplings
    last_pos: jnp.ndarray  # [ns] index of last valid interior row
    left_c: jnp.ndarray    # [ns] c index coupling bounds[k] -> interior
    right_c: jnp.ndarray   # [ns] c index coupling interior -> bounds[k+1]
    direct: jnp.ndarray    # [ns] empty interior -> bounds adjacent in T
    loop_kf: jnp.ndarray   # [L] closure endpoints in separator coords
    loop_kt: jnp.ndarray


def nested_partition(n, loop_from, loop_to):
    """Build the NestedPartition for `chain_nested_solve`. Host-side
    (numpy, trace-time): the separator set and segment shapes are static
    structure, exactly like classify_chain_edges."""
    import numpy as np

    if n < 2:
        raise ValueError("nested solve needs n >= 2")
    lf = np.asarray(loop_from).astype(np.int64)
    lt = np.asarray(loop_to).astype(np.int64)
    bounds = np.unique(np.concatenate(
        [np.array([0, n - 1], np.int64), lf, lt]))
    seg_len = bounds[1:] - bounds[:-1] - 1
    m = max(int(seg_len.max(initial=0)), 1)
    ar = np.arange(m)
    mask = ar[None, :] < seg_len[:, None]
    idx = np.where(mask, bounds[:-1, None] + 1 + ar[None, :], n)
    cmask = ar[None, :max(m - 1, 0)] < (seg_len - 1)[:, None]
    i32 = lambda x: jnp.asarray(np.asarray(x, np.int32))
    return NestedPartition(
        i32(bounds), i32(idx), jnp.asarray(mask), jnp.asarray(cmask),
        i32(np.maximum(seg_len - 1, 0)), i32(bounds[:-1]),
        i32(bounds[1:] - 1), jnp.asarray(seg_len == 0),
        i32(np.searchsorted(bounds, lf)),
        i32(np.searchsorted(bounds, lt)))


def chain_nested_solve(bd, c, jac_loop, w_inv, rhs_vec, part,
                       w_blocks=None):
    """x = (T + U W Uᵀ)⁻¹ rhs by two-level block elimination.

    Exact (no approximation): closure endpoints are separators, so U is
    zero on every interior row and interior elimination commutes with
    the Woodbury term. The segment interiors are factored/solved as ONE
    vmapped batch (same padded length), each against 2t+1 columns
    (left/right boundary couplings + rhs); the coarse Schur system over
    the nb separators reuses `chain_woodbury_solve` verbatim — same
    streamed-column machinery, but every ladder apply is nb rows
    instead of n. For the 100k-pose benchmark (999 stride-100 closures,
    nb = 1001) this removes ~11 full-100k multi-column ladder applies
    per LM iteration in favor of one batched 1000x~100 segment solve
    plus a 1001-row coarse solve. `refine`/`chunks` do not apply here
    (the factors are exact per level and no full-n ladder exists)."""
    n, tdim, _ = bd.shape
    f_ = bd.dtype
    ns, m = part.seg_idx.shape
    eye = jnp.eye(tdim, dtype=f_)

    gather_rows = jnp.minimum(part.seg_idx, n - 1)
    bdi = jnp.where(part.seg_mask[:, :, None, None], bd[gather_rows], eye)
    if m > 1:
        ci = jnp.where(part.cmask[:, :, None, None],
                       c[jnp.minimum(part.seg_idx[:, :-1], n - 2)], 0.0)
    else:
        ci = jnp.zeros((ns, 0, tdim, tdim), f_)
    fac = jax.vmap(block_tridiag_factor)(bdi, ci)

    nonempty = part.seg_mask[:, 0]
    cl = jnp.where(nonempty[:, None, None], c[part.left_c], 0.0)
    cr = jnp.where(nonempty[:, None, None],
                   c[jnp.minimum(part.right_c, max(n - 2, 0))], 0.0)
    rhs_i = jnp.where(part.seg_mask[:, :, None], rhs_vec[gather_rows],
                      0.0)
    last_oh = jnp.arange(m)[None, :] == part.last_pos[:, None]

    # 2t+1 columns per segment: T_I⁻¹ [e₀ clᵀ | e_last cr | rhs_I]
    cols = jnp.zeros((ns, m, tdim, 2 * tdim + 1), f_)
    cols = cols.at[:, 0, :, :tdim].set(jnp.swapaxes(cl, -1, -2))
    cols = cols.at[:, :, :, tdim:2 * tdim].add(
        last_oh[:, :, None, None] * cr[:, None, :, :])
    cols = cols.at[:, :, :, 2 * tdim].set(rhs_i)
    g = jax.vmap(block_tridiag_apply)(fac, cols)  # [ns, m, t, 2t+1]
    g0 = g[:, 0]
    gl = jnp.sum(last_oh[:, :, None, None] * g, axis=1)

    # Schur corrections onto the separators (T_I⁻¹ is symmetric, so the
    # coarse system stays symmetric with upper-only storage)
    corr_pp = jnp.einsum("sij,sjk->sik", cl, g0[..., :tdim])
    corr_pq = jnp.einsum("sij,sjk->sik", cl, g0[..., tdim:2 * tdim])
    corr_qq = jnp.einsum("sji,sjk->sik", cr, gl[..., tdim:2 * tdim])
    rp = jnp.einsum("sij,sj->si", cl, g0[..., 2 * tdim])
    rq = jnp.einsum("sji,sj->si", cr, gl[..., 2 * tdim])

    bdc = bd[part.bounds]
    bdc = bdc.at[:-1].add(-corr_pp)
    bdc = bdc.at[1:].add(-corr_qq)
    cc = -corr_pq + jnp.where(part.direct[:, None, None],
                              c[part.left_c], 0.0)
    rc = rhs_vec[part.bounds]
    rc = rc.at[:-1].add(-rp)
    rc = rc.at[1:].add(-rq)

    xc = chain_woodbury_solve(bdc, cc, jac_loop, part.loop_kf,
                              part.loop_kt, w_inv, rc,
                              w_blocks=w_blocks)

    # back-substitution: x_I = G_rhs − G_A x_left − G_B x_right
    xi = (g[..., 2 * tdim]
          - jnp.einsum("smij,sj->smi", g[..., :tdim], xc[:-1])
          - jnp.einsum("smij,sj->smi", g[..., tdim:2 * tdim], xc[1:]))
    x = jnp.zeros((n + 1, tdim), f_)  # row n catches sentinel scatters
    x = x.at[part.seg_idx].set(xi)
    x = x.at[part.bounds].set(xc)
    return x[:n]


class ChainSummary(NamedTuple):
    initial_cost: jnp.ndarray
    final_cost: jnp.ndarray
    iterations: jnp.ndarray
    accepted_steps: jnp.ndarray
    termination_code: jnp.ndarray  # 0 max_iter 1 grad 2 step 3 cost 4 fail


TERMINATION_NAMES = {0: "max_iterations", 1: "gradient_converged",
                     2: "step_converged", 3: "cost_converged",
                     4: "numerical_failure"}


_CHAIN_LM_STATICS = ("residual_fn", "retract_fn", "tdim", "max_iterations",
                     "gradient_tolerance", "step_tolerance",
                     "cost_tolerance", "initial_damping", "refine",
                     "woodbury_chunk_bytes", "chunks", "rdim")


def _chain_lm_ops(chain_meas, chain_info, loop_from, loop_to, loop_meas,
                  loop_info, fixed, *, residual_fn, retract_fn, tdim,
                  gradient_tolerance, step_tolerance, cost_tolerance,
                  refine, woodbury_chunk_bytes, chunks, rdim,
                  nested_part=None):
    """Build the LM machinery closures (cost_only, body) for a chain
    problem — shared by the fully-fused while_loop driver and the
    host-stepped driver (one jitted body application per LM iteration;
    the chunked-ladder-inside-while_loop program kernel-faults the TPU
    runtime, so the chunked path steps from the host — at the 250k+
    scales that need chunking, ~25 dispatches are noise). Must be called
    under a trace."""
    num_l = loop_from.shape[0]
    rdim = chain_meas.shape[-1] if rdim is None else rdim
    f_ = chain_meas.dtype

    def apply_info(info, v):
        return v if info is None else jnp.einsum("eij,e...j->e...i", info, v)

    def linearize(values):
        return chain_linearize(
            values, chain_meas, chain_info, loop_from, loop_to, loop_meas,
            loop_info, fixed, residual_fn=residual_fn,
            retract_fn=retract_fn, tdim=tdim)

    def cost_only(values):
        r_c = jax.vmap(residual_fn)(values[:-1], values[1:], chain_meas)
        cost = 0.5 * jnp.sum(r_c * apply_info(chain_info, r_c))
        if num_l:
            r_l = jax.vmap(residual_fn)(
                values[loop_from], values[loop_to], loop_meas)
            cost = cost + 0.5 * jnp.sum(r_l * apply_info(loop_info, r_l))
        return cost

    # W^{-1}: block-diagonal inverse information of the loop edges
    w_inv = build_w_inv(loop_info, num_l, rdim, f_) if num_l else None
    w_blocks = (jnp.broadcast_to(jnp.eye(rdim, dtype=f_),
                                 (num_l, rdim, rdim))
                if loop_info is None else loop_info) if num_l else None

    eye_t = jnp.eye(tdim, dtype=f_)

    def lin_solve(grad, b, c, jac_loop, diag_loop, damping):
        # scaled LM damping on the FULL diagonal (sparse.rs:34-42)
        diag_t = jnp.diagonal(b, axis1=-2, axis2=-1)
        lam = damping * jnp.maximum(jnp.abs(diag_t + diag_loop), 1.0)
        bd = b + jax.vmap(jnp.diag)(lam)
        bd = jnp.where(fixed[:, None, None], eye_t, bd)
        if nested_part is not None:
            return chain_nested_solve(bd, c, jac_loop, w_inv, -grad,
                                      nested_part, w_blocks=w_blocks)
        return chain_woodbury_solve(bd, c, jac_loop, loop_from, loop_to,
                                    w_inv, -grad, w_blocks=w_blocks,
                                    refine=refine,
                                    chunk_bytes=woodbury_chunk_bytes,
                                    chunks=chunks)

    def apply_step(values, delta):
        delta = jnp.where(fixed[:, None], 0.0, delta)
        return jax.vmap(retract_fn)(values, delta)

    def body(carry):
        values, damping, cost, it, accepted, term, done = carry
        grad, b, c, jac_loop, diag_loop, _ = linearize(values)
        gmax = jnp.max(jnp.abs(grad))
        grad_conv = gmax <= gradient_tolerance

        delta = lin_solve(grad, b, c, jac_loop, diag_loop, damping)
        bad = ~jnp.all(jnp.isfinite(delta))
        step_norm = jnp.linalg.norm(delta)
        step_conv = step_norm <= step_tolerance

        trial = apply_step(values, delta)
        trial_cost = cost_only(trial)
        # ~done: under vmap the while_loop runs lock-step until the
        # SLOWEST instance finishes — converged instances must FREEZE
        # (same trajectory as a solo solve), not keep taking steps
        # (VERDICT r4 #5)
        accept = ((~done) & (~grad_conv) & (~step_conv) & (~bad)
                  & (trial_cost < cost))
        change = jnp.abs(cost - trial_cost)
        cost_conv = accept & (change <= cost_tolerance)

        new_values = jax.tree_util.tree_map(
            lambda t_, v_: jnp.where(accept, t_, v_), trial, values)
        new_cost = jnp.where(accept, trial_cost, cost)
        new_damping = jnp.where(
            accept, jnp.maximum(damping * 0.3, 1e-15),
            jnp.minimum(damping * 10.0, 1e15))
        new_damping = jnp.where(done | grad_conv | step_conv | bad,
                                damping, new_damping)
        new_term = jnp.where(
            done, term,
            jnp.where(
                grad_conv, 1,
                jnp.where(bad, 4,
                          jnp.where(step_conv, 2,
                                    jnp.where(cost_conv, 3, 0))))).astype(
                                        jnp.int32)
        new_done = done | grad_conv | step_conv | cost_conv | bad
        return (new_values, new_damping, new_cost,
                it + (~done).astype(jnp.int32),
                accepted + accept.astype(jnp.int32), new_term, new_done)

    return cost_only, body


@functools.partial(jax.jit, static_argnames=_CHAIN_LM_STATICS)
def _solve_chain_lm_fused(
    values0, chain_meas, chain_info, loop_from, loop_to, loop_meas,
    loop_info, fixed_mask, nested_part=None, *, residual_fn, retract_fn,
    tdim, max_iterations, gradient_tolerance, step_tolerance,
    cost_tolerance, initial_damping, refine, woodbury_chunk_bytes,
    chunks, rdim,
):
    """Fully device-resident driver: the whole LM as one while_loop."""
    f_ = values0.dtype
    cost_only, body = _chain_lm_ops(
        chain_meas, chain_info, loop_from, loop_to, loop_meas, loop_info,
        fixed_mask, residual_fn=residual_fn, retract_fn=retract_fn,
        tdim=tdim, gradient_tolerance=gradient_tolerance,
        step_tolerance=step_tolerance, cost_tolerance=cost_tolerance,
        refine=refine, woodbury_chunk_bytes=woodbury_chunk_bytes,
        chunks=chunks, rdim=rdim, nested_part=nested_part)

    def cond(carry):
        _, _, _, it, _, _, done = carry
        return (~done) & (it < max_iterations)

    # Full-f32 matmul passes: the TPU MXU's default precision for f32
    # inputs is bf16-pass, which costs ~10x RMSE on the 10k benchmark
    # (measured 2.5e-3 vs 3.0e-4); the blocks here are tiny, so the extra
    # passes are free.
    with jax.default_matmul_precision("float32"):
        cost0 = cost_only(values0)
        values, _, cost, it, accepted, term, _ = jax.lax.while_loop(
            cond, body,
            (values0, jnp.asarray(initial_damping, f_), cost0,
             jnp.asarray(0, jnp.int32), jnp.asarray(0, jnp.int32),
             jnp.asarray(0, jnp.int32), jnp.asarray(False)),
        )
    return values, ChainSummary(cost0, cost, it, accepted, term)


@functools.partial(jax.jit, static_argnames=_CHAIN_LM_STATICS)
def _chain_lm_init(
    values0, chain_meas, chain_info, loop_from, loop_to, loop_meas,
    loop_info, fixed_mask, nested_part=None, *, residual_fn, retract_fn,
    tdim, max_iterations, gradient_tolerance, step_tolerance,
    cost_tolerance, initial_damping, refine, woodbury_chunk_bytes,
    chunks, rdim,
):
    f_ = values0.dtype
    cost_only, _ = _chain_lm_ops(
        chain_meas, chain_info, loop_from, loop_to, loop_meas, loop_info,
        fixed_mask, residual_fn=residual_fn, retract_fn=retract_fn,
        tdim=tdim, gradient_tolerance=gradient_tolerance,
        step_tolerance=step_tolerance, cost_tolerance=cost_tolerance,
        refine=refine, woodbury_chunk_bytes=woodbury_chunk_bytes,
        chunks=chunks, rdim=rdim, nested_part=nested_part)
    with jax.default_matmul_precision("float32"):
        cost0 = cost_only(values0)
    return (values0, jnp.asarray(initial_damping, f_), cost0,
            jnp.asarray(0, jnp.int32), jnp.asarray(0, jnp.int32),
            jnp.asarray(0, jnp.int32), jnp.asarray(False))


@functools.partial(jax.jit, static_argnames=_CHAIN_LM_STATICS)
def _chain_lm_step(
    carry, chain_meas, chain_info, loop_from, loop_to, loop_meas,
    loop_info, fixed_mask, nested_part=None, *, residual_fn, retract_fn,
    tdim, max_iterations, gradient_tolerance, step_tolerance,
    cost_tolerance, initial_damping, refine, woodbury_chunk_bytes,
    chunks, rdim,
):
    _, body = _chain_lm_ops(
        chain_meas, chain_info, loop_from, loop_to, loop_meas, loop_info,
        fixed_mask, residual_fn=residual_fn, retract_fn=retract_fn,
        tdim=tdim, gradient_tolerance=gradient_tolerance,
        step_tolerance=step_tolerance, cost_tolerance=cost_tolerance,
        refine=refine, woodbury_chunk_bytes=woodbury_chunk_bytes,
        chunks=chunks, rdim=rdim, nested_part=nested_part)
    with jax.default_matmul_precision("float32"):
        return body(carry)


def solve_chain_lm(
    values0,
    chain_meas,
    chain_info,
    loop_from,
    loop_to,
    loop_meas,
    loop_info,
    fixed_mask,
    *,
    residual_fn: Callable,
    retract_fn: Callable,
    tdim: int,
    max_iterations: int = 50,
    gradient_tolerance: float = 1e-10,
    step_tolerance: float = 1e-10,
    cost_tolerance: float = 1e-12,
    initial_damping: float = 1e-3,
    refine: int = 0,
    woodbury_chunk_bytes: int | None = None,
    chunks: int = 0,
    rdim: int | None = None,
    host_loop: bool | None = None,
    nested: bool | None = None,
):
    """Device-resident LM over a chain factor graph with loop closures.

    values0:    [n, dim] node values (dim == storage dim; tangent dim tdim)
    chain_meas: [n-1, rdim] measurement of edge (i, i+1)
    chain_info: [n-1, rdim, rdim] information (or None -> identity)
    loop_*:     [L] / [L, rdim] / [L, rdim, rdim] extra edges (L may be 0)
    fixed_mask: [n] bool — fixed nodes take zero increment

    residual_fn(xi, xj, meas) -> [rdim]; retract_fn(x, delta) -> x'.
    woodbury_chunk_bytes: explicit (static) per-chunk budget for the
    streamed loop-closure column solve — the supported way to tune chunk
    sizing (the module-level WOODBURY_CHUNK_BYTES default is read at
    trace time, so mutating it after a first solve silently has no
    effect until solve_chain_lm.clear_cache()).
    chunks: > 1 routes the block-tridiagonal solve through the
    single-chip SPIKE partition (`chunked_tridiag_factor/apply`) — C
    chunks keep the compiled ladder at n/C rows, breaking the ~250k-pose
    AOT compile ceiling (the 1M-pose path); 0/1 uses the plain ladder.
    rdim: residual dimension when it differs from the measurement width
    (packed encodings, e.g. the anchored SE(3) path's 48-wide
    measurements with 6-dim residuals).
    host_loop: None auto-selects — the chunked path on an accelerator
    steps the LM from the host (one jitted body application per
    iteration; the chunked ladder inside a single while_loop program
    kernel-faults the TPU runtime, and at chunking scales the ~25
    dispatches are noise), everything else runs the fused while_loop.
    Not vmappable when the host loop engages (chunks>1 on TPU).
    nested: route the inner solve through the two-level elimination
    (`chain_nested_solve`) — closure endpoints become separators, the
    intervals between them are eliminated as one vmapped batch, and the
    Woodbury rides a coarse ~2L-row ladder instead of the full n rows.
    Exact (parity-tested against the streamed path); pays off when n is
    large AND closures are many (the 100k benchmark: 9.7 s -> see
    PERF.md). None auto-enables for n >= 50_000, >= 64 closures, and a
    separator set <= n/8 (needs concrete endpoint arrays — silently
    stays off under tracing). Mutually exclusive with chunks > 1;
    `refine` does not apply to the nested path.
    Returns (values [n, dim], ChainSummary of device scalars).

    Mirrors solver.rs:81-188 exactly: linearize -> gradient check -> solve
    -> step check -> trial -> accept (damping x0.3, cost-change check) /
    reject (damping x10).
    """
    kw = dict(residual_fn=residual_fn, retract_fn=retract_fn, tdim=tdim,
              max_iterations=max_iterations,
              gradient_tolerance=gradient_tolerance,
              step_tolerance=step_tolerance,
              cost_tolerance=cost_tolerance,
              initial_damping=initial_damping, refine=refine,
              woodbury_chunk_bytes=woodbury_chunk_bytes, chunks=chunks,
              rdim=rdim)
    n = values0.shape[0]
    num_l = int(loop_from.shape[0])
    chunked = bool(chunks and chunks > 1)
    part = None
    if nested is None:
        if num_l >= 64 and n >= 50_000 and not chunked:
            try:  # needs concrete endpoints; stays off under tracing
                import numpy as np
                nb = len(np.unique(np.concatenate(
                    [np.array([0, n - 1]), np.asarray(loop_from),
                     np.asarray(loop_to)])))
                nested = nb <= n // 8
            except Exception:
                nested = False
        else:
            nested = False
    if nested:
        if chunked:
            raise ValueError("nested=True is mutually exclusive with "
                             "chunks > 1 (no full-n ladder exists to "
                             "chunk)")
        if num_l == 0:
            nested = False  # plain ladder already optimal
    if nested:
        part = nested_partition(n, loop_from, loop_to)
    args = (chain_meas, chain_info, loop_from, loop_to, loop_meas,
            loop_info, fixed_mask, part)
    if host_loop is None:
        host_loop = bool(chunks and chunks > 1
                         and jax.default_backend() != "cpu")
    if not host_loop:
        return _solve_chain_lm_fused(values0, *args, **kw)
    carry = _chain_lm_init(values0, *args, **kw)
    cost0 = carry[2]
    while (not bool(carry[6])) and int(carry[3]) < max_iterations:
        carry = _chain_lm_step(carry, *args, **kw)
    values, _, cost, it, accepted, term, _ = carry
    return values, ChainSummary(cost0, cost, it, accepted, term)


def _clear_chain_lm_caches():
    _solve_chain_lm_fused.clear_cache()
    _chain_lm_init.clear_cache()
    _chain_lm_step.clear_cache()


solve_chain_lm.clear_cache = _clear_chain_lm_caches



def chain_edge_partition(n, edges_from, edges_to):
    """The (first_idx [n-1], is_chain [E]) partition behind
    classify_chain_edges: the first (i, i+1) edge per consecutive pair
    becomes the tridiagonal entry, everything else is a loop edge.
    Raises when a consecutive pair has no edge. Shared with
    implicit.pose_graph_implicit_vjp so the gradient scatter can never
    desynchronize from the forward classification."""
    import numpy as np

    ef = np.asarray(edges_from)
    et = np.asarray(edges_to)
    consecutive = et == ef + 1
    first_idx = np.full(n - 1, -1, dtype=np.int64)
    for e in np.nonzero(consecutive)[0]:
        if first_idx[ef[e]] < 0:
            first_idx[ef[e]] = e
    if np.any(first_idx < 0):
        raise ValueError("chain_direct requires at least one (i, i+1) "
                         "edge per consecutive pair")
    is_chain = np.zeros(len(ef), dtype=bool)
    is_chain[first_idx] = True
    return first_idx, is_chain


def has_full_chain(n, edges_from, edges_to):
    """True when every consecutive (i, i+1) pair has an edge — the
    'direct' auto-routing predicate (chain_direct vs banded_direct),
    shared by the SE(2)/SE(3) pose-graph entry points."""
    import numpy as np

    ef = np.asarray(edges_from)
    et = np.asarray(edges_to)
    consec = np.zeros(max(n - 1, 0), bool)
    mask = et == ef + 1
    consec[ef[mask]] = True
    return bool(consec.all())


def classify_chain_edges(n, edges_from, edges_to, measurements,
                         information=None):
    """Split an edge list into the chain part (i -> i+1, reordered into
    position) and the loop-closure remainder — the structure every
    sequential-SLAM pose graph has. Host-side (numpy), trace-time.

    Returns (chain_meas [n-1, rdim], chain_info or None, loop_from,
    loop_to, loop_meas, loop_info or None). Requires every (i, i+1) pair
    to have at least one edge (true for odometry chains); EXTRA parallel
    (i, i+1) edges (e.g. VIO fusion's visual+inertial double edges,
    vio_pipeline.rs:408) go to the low-rank side with the loop
    closures."""
    import numpy as np

    ef = np.asarray(edges_from)
    et = np.asarray(edges_to)
    meas = np.asarray(measurements)
    info = None if information is None else np.asarray(information)
    first_idx, is_chain = chain_edge_partition(n, ef, et)
    chain_meas = meas[first_idx]
    chain_info = None if info is None else info[first_idx]
    loop = ~is_chain
    loop_info = None if info is None else info[loop]
    return (chain_meas, chain_info, ef[loop], et[loop], meas[loop],
            loop_info)
