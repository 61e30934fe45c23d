"""C/GMRES NMPC + rocket landing tests."""

import jax
import jax.numpy as jnp
import numpy as np

from rust_robotics_tpu.control.cgmres import CGMRESConfig, run_cgmres
from rust_robotics_tpu.control.rocket import RocketConfig, plan_landing


def test_cgmres_stabilizes_nonlinear_system():
    """Classic C/GMRES demo plant: semi-active damper-ish nonlinear system
    ẋ1 = x2, ẋ2 = −x1 + (1 − x1²) x2 + u (controlled Van der Pol)."""

    def dynamics(x, u):
        return jnp.array([x[1], -x[0] + (1.0 - x[0] ** 2) * x[1] + u[0]])

    stage = lambda x, u: 0.5 * (2.0 * x[0] ** 2 + x[1] ** 2 + 0.1 * u[0] ** 2)
    terminal = lambda x: 0.5 * (2.0 * x[0] ** 2 + x[1] ** 2)

    x0 = jnp.array([1.5, 0.0])
    xs, us = run_cgmres(
        dynamics, stage, terminal, x0, steps=1200,
        cfg=CGMRESConfig(sampling_dt=0.01), m_controls=1,
    )
    final = np.asarray(xs[-1])
    assert np.linalg.norm(final) < 0.15, final
    # uncontrolled Van der Pol has a limit cycle with |x| ~ 2: control works
    assert np.all(np.isfinite(np.asarray(us)))


def test_rocket_lands_softly():
    cfg = RocketConfig()
    x0 = jnp.array([20.0, 60.0, -3.0, -8.0])
    target = jnp.array([0.0, 0.0])
    xs, us, cost = plan_landing(x0, target, cfg)
    final = np.asarray(xs[-1])
    assert np.linalg.norm(final[:2] - np.asarray(target)) < 1.0, final
    assert np.linalg.norm(final[2:]) < 1.0, final
    # thrust bounds respected
    mags = np.linalg.norm(np.asarray(us), axis=-1)
    assert mags.max() <= cfg.max_thrust + 1e-6
    # altitude stays (approximately) non-negative
    assert np.asarray(xs)[:, 1].min() > -1.0
