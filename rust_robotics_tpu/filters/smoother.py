"""Temporally-parallel Kalman filtering and RTS smoothing (associative
scan over the time axis).

Reference capability: the reference has NO smoother and processes every
sequence with a sequential loop (SURVEY.md §5 "long-context/sequence
parallelism: absent"); this module is the TPU-native sequence-parallel
design SURVEY §2.12 calls for — Kalman filtering/smoothing is an
associative operation (Särkkä & García-Fernández, "Temporal
Parallelization of Bayesian Smoothers", IEEE TAC 2021), so a length-T
sequence runs in O(log T) scan depth with `jax.lax.associative_scan`, and
the time axis can shard across chips (XLA partitions associative scans
with collective boundary exchange — the halo scheme of SURVEY §2.12).

The affine-Gaussian system is x_k = F_k x_{k−1} + c_k + w_k,
z_k = H x_k + v_k (the drift c_k carries EKF linearization offsets, so the
extended smoother below reuses the same elements). Filtering elements
(A, b, C, η, J) compose forward; smoothing elements (E, g, L) compose in
reverse. `sequential_*` are the textbook loops used as golden references;
tests pin parallel == sequential.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "parallel_kalman_filter",
    "parallel_rts_smoother",
    "sequential_kalman_filter",
    "sequential_rts_smoother",
    "ekf_smooth_unicycle",
]


def _solve(a, b):
    return jnp.linalg.solve(a, b)


def _filter_elements(fs, qs, h, r, zs, cs, m0, p0):
    """Per-step associative filtering elements for the affine system."""
    t, n, _ = fs.shape
    eye = jnp.eye(n, dtype=fs.dtype)

    def generic(f, q, z, c):
        s = h @ q @ h.T + r
        k = _solve(s, h @ q).T  # Q Hᵀ S⁻¹
        ikh = eye - k @ h
        a = ikh @ f
        b = ikh @ c + k @ z
        cc = ikh @ q
        hf = h @ f
        resid = z - h @ c
        eta = hf.T @ _solve(s, resid)
        jj = hf.T @ _solve(s, hf)
        return a, b, cc, eta, jj

    a, b, c, eta, jj = jax.vmap(generic)(fs, qs, zs, cs)

    # first element conditions on the prior (m0, P0) directly
    f0, q0, z0, c0v = fs[0], qs[0], zs[0], cs[0]
    m_pred = f0 @ m0 + c0v
    p_pred = f0 @ p0 @ f0.T + q0
    s0 = h @ p_pred @ h.T + r
    k0 = _solve(s0, h @ p_pred).T
    b0 = m_pred + k0 @ (z0 - h @ m_pred)
    c0 = (eye - k0 @ h) @ p_pred
    a = a.at[0].set(jnp.zeros((n, n), fs.dtype))
    b = b.at[0].set(b0)
    c = c.at[0].set(c0)
    eta = eta.at[0].set(jnp.zeros((n,), fs.dtype))
    jj = jj.at[0].set(jnp.zeros((n, n), fs.dtype))
    return a, b, c, eta, jj


def _filter_combine(e1, e2):
    """(A, b, C, η, J): e1 earlier, e2 later (Särkkä & G-F, Lemma 1)."""
    a1, b1, c1, eta1, j1 = e1
    a2, b2, c2, eta2, j2 = e2
    n = a1.shape[-1]
    eye = jnp.eye(n, dtype=a1.dtype)
    m = eye + c1 @ j2
    mt = eye + j2 @ c1
    a = a2 @ _solve(m, a1)
    b = a2 @ _solve(m, b1 + c1 @ eta2) + b2
    c = a2 @ _solve(m, c1) @ jnp.swapaxes(a2, -1, -2) + c2
    eta = jnp.swapaxes(a1, -1, -2) @ _solve(mt, eta2 - j2 @ b1) + eta1
    j = jnp.swapaxes(a1, -1, -2) @ _solve(mt, j2 @ a1) + j1
    return a, b, c, eta, j


def parallel_kalman_filter(fs, qs, h, r, zs, m0, p0, cs=None):
    """Filtered means/covs [T, n]/[T, n, n] in O(log T) scan depth."""
    if cs is None:
        cs = jnp.zeros(fs.shape[:2], fs.dtype)
    elems = _filter_elements(fs, qs, h, r, zs, cs, m0, p0)
    combine = jax.vmap(_filter_combine)
    a, b, c, eta, j = jax.lax.associative_scan(combine, elems)
    return b, c


def sequential_kalman_filter(fs, qs, h, r, zs, m0, p0, cs=None):
    """Textbook sequential KF — the golden reference for the scan."""
    if cs is None:
        cs = jnp.zeros(fs.shape[:2], fs.dtype)

    def step(carry, xs):
        m, p = carry
        f, q, z, c = xs
        m_pred = f @ m + c
        p_pred = f @ p @ f.T + q
        s = h @ p_pred @ h.T + r
        k = _solve(s, h @ p_pred).T
        m_new = m_pred + k @ (z - h @ m_pred)
        p_new = (jnp.eye(m.shape[0], dtype=p.dtype) - k @ h) @ p_pred
        return (m_new, p_new), (m_new, p_new)

    (_, _), (ms, ps) = jax.lax.scan(step, (m0, p0), (fs, qs, zs, cs))
    return ms, ps


def _smoother_elements(fs, qs, cs, ms, ps):
    """Smoothing elements (E, g, L): element k maps the smoothed state at
    k+1 to the smoothed state at k."""
    t, n = ms.shape

    def generic(f_next, q_next, c_next, m, p):
        p_pred = f_next @ p @ f_next.T + q_next
        g = _solve(p_pred, f_next @ p).T  # P Fᵀ (P⁻)⁻¹
        gvec = m - g @ (f_next @ m + c_next)
        ll = p - g @ p_pred @ g.T
        return g, gvec, ll

    e, g, ll = jax.vmap(generic)(fs[1:], qs[1:], cs[1:], ms[:-1], ps[:-1])
    # last element: identity on the filtered posterior at T
    e = jnp.concatenate([e, jnp.zeros((1, n, n), ms.dtype)])
    g = jnp.concatenate([g, ms[-1:]])
    ll = jnp.concatenate([ll, ps[-1:]])
    return e, g, ll


def _smoother_combine(e1, e2):
    """e1 earlier (closer to t=0), e2 later; composes right-to-left."""
    ee1, g1, l1 = e1
    ee2, g2, l2 = e2
    return (
        ee1 @ ee2,
        ee1 @ g2 + g1,
        ee1 @ l2 @ jnp.swapaxes(ee1, -1, -2) + l1,
    )


def parallel_rts_smoother(fs, qs, h, r, zs, m0, p0, cs=None):
    """Smoothed means/covs via two associative scans (filter forward,
    smooth backward) — O(log T) total depth. Returns (smoothed_means,
    smoothed_covs, filtered_means, filtered_covs)."""
    if cs is None:
        cs = jnp.zeros(fs.shape[:2], fs.dtype)
    ms, ps = parallel_kalman_filter(fs, qs, h, r, zs, m0, p0, cs)
    elems = _smoother_elements(fs, qs, cs, ms, ps)
    # reverse=True feeds combine (later, earlier) — swap into time order
    combine = jax.vmap(lambda a, b: _smoother_combine(b, a))
    _, g, ll = jax.lax.associative_scan(combine, elems, reverse=True)
    return g, ll, ms, ps


def sequential_rts_smoother(fs, qs, h, r, zs, m0, p0, cs=None):
    """Textbook RTS backward pass — golden reference."""
    if cs is None:
        cs = jnp.zeros(fs.shape[:2], fs.dtype)
    ms, ps = sequential_kalman_filter(fs, qs, h, r, zs, m0, p0, cs)

    def back(carry, xs):
        m_s, p_s = carry
        f_next, q_next, c_next, m, p = xs
        p_pred = f_next @ p @ f_next.T + q_next
        g = _solve(p_pred, f_next @ p).T
        m_new = m + g @ (m_s - (f_next @ m + c_next))
        p_new = p + g @ (p_s - p_pred) @ g.T
        return (m_new, p_new), (m_new, p_new)

    (_, _), (ms_s, ps_s) = jax.lax.scan(
        back, (ms[-1], ps[-1]),
        (fs[1:], qs[1:], cs[1:], ms[:-1], ps[:-1]),
        reverse=True,
    )
    ms_out = jnp.concatenate([ms_s, ms[-1:]])
    ps_out = jnp.concatenate([ps_s, ps[-1:]])
    return ms_out, ps_out, ms, ps


def ekf_smooth_unicycle(zs, us, dt, q, r, m0, p0):
    """Extended smoothing for the reference's shared unicycle problem:
    run the EKF, linearize the motion model along the filtered trajectory
    (F_t at the filtered point, drift c_t = f(x̂) − F_t x̂), then run the
    parallel affine smoother — the standard extended RTS construction in
    O(log T) depth. Returns dict(smoothed/filtered means + covs)."""
    from rust_robotics_tpu.core.types import GaussianBelief
    from rust_robotics_tpu.filters.kalman import ekf_step
    from rust_robotics_tpu.models.motion import (
        unicycle_jacobian,
        unicycle_propagate,
    )

    def fstep(belief, xs):
        z, u = xs
        new = ekf_step(belief, z, u, dt, q, r)
        return new, new.mean

    b0 = GaussianBelief(m0, p0)
    _, means = jax.lax.scan(fstep, b0, (zs, us))
    lin_pts = jnp.concatenate([m0[None], means[:-1]])
    fs = jax.vmap(
        lambda x, u: unicycle_jacobian(unicycle_propagate(x, u, dt), u, dt)
    )(lin_pts, us)
    cs = jax.vmap(
        lambda x, u, f: unicycle_propagate(x, u, dt) - f @ x
    )(lin_pts, us, fs)
    h = jnp.zeros((2, 4), zs.dtype).at[0, 0].set(1.0).at[1, 1].set(1.0)
    qs = jnp.broadcast_to(q, fs.shape)
    g, ll, ms, ps = parallel_rts_smoother(fs, qs, h, r, zs, m0, p0, cs)
    return {
        "smoothed_means": g,
        "smoothed_covs": ll,
        "filtered_means": ms,
        "filtered_covs": ps,
    }
