"""Gate-racing stack: gates, motor quad, powertrain, aware-vs-unaware."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rust_robotics_tpu.control.racing import (
    GatePlane,
    MotorQuadParams,
    PowertrainParams,
    effective_max_rotor,
    hover_state,
    make_gate_lap_costs,
    motor_quad_step,
    powertrain_init,
    powertrain_step,
    simulate_gate_race,
)

P = MotorQuadParams()


def test_hover_is_equilibrium():
    s = hover_state(0.0, 0.0, 2.0, P)
    hover = P.gravity / 4.0
    rotors = jnp.full((4,), hover)
    for _ in range(20):
        s = motor_quad_step(P, s, rotors, 0.02)
    np.testing.assert_allclose(np.asarray(s[0:3]), [0, 0, 2.0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(s[3:6]), 0.0, atol=1e-6)


def test_differential_thrust_rolls():
    s = hover_state(0.0, 0.0, 2.0, P)
    hover = P.gravity / 4.0
    # more thrust on left rotors (f1, f2) -> positive roll rate
    rotors = jnp.array([hover - 0.5, hover + 0.5, hover + 0.5, hover - 0.5])
    s = motor_quad_step(P, s, rotors, 0.02)
    assert float(s[10]) > 0  # roll rate
    np.testing.assert_allclose(float(s[11]), 0.0, atol=1e-9)  # no pitch


def test_rotor_saturation_limits_thrust():
    s = hover_state(0.0, 0.0, 2.0, P)
    rotors = jnp.full((4,), 100.0)  # way beyond max
    s1 = motor_quad_step(P, s, rotors, 0.02)
    s2 = motor_quad_step(P, s, jnp.full((4,), P.max_rotor_thrust), 0.02)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), atol=1e-12)


def test_powertrain_ideal_reduces_to_motor_model():
    base = MotorQuadParams()
    ideal = PowertrainParams.ideal(base)
    qs = hover_state(0.0, 0.0, 2.0, base)
    ps = powertrain_init(qs, ideal)
    cmd = jnp.array([2.0, 2.5, 2.5, 2.0])
    ps2 = powertrain_step(ideal, ps, cmd, 0.02)
    qs2 = motor_quad_step(base, qs, cmd, 0.02)
    np.testing.assert_allclose(np.asarray(ps2[:14]), np.asarray(qs2),
                               atol=1e-9)
    assert float(ps2[18]) == 1.0  # no discharge


def test_powertrain_lag_and_sag():
    p = PowertrainParams(motor_tau=0.2, discharge_rate=0.5, sag_coeff=0.2)
    qs = hover_state(0.0, 0.0, 2.0, p.base)
    ps = powertrain_init(qs, p)
    cmd = jnp.full((4,), p.base.max_rotor_thrust)
    ps1 = powertrain_step(p, ps, cmd, 0.02)
    # lag: actual thrust has not reached the command
    assert float(ps1[14]) < float(cmd[0]) - 0.5
    # discharge is monotone under load
    for _ in range(50):
        ps1 = powertrain_step(p, ps1, cmd, 0.02)
    assert float(ps1[18]) < 1.0
    # sag: effective ceiling below nominal under heavy load and low soc
    assert float(effective_max_rotor(p, ps1)) < p.base.max_rotor_thrust


def test_gate_advance_requires_aperture():
    gates = [GatePlane(center=(2.0, 0.0, 2.0), normal=(1.0, 0.0, 0.0),
                       half_width=0.5, half_height=0.5)]
    _, _, advance = make_gate_lap_costs(gates)
    # crossing inside the aperture
    idx, hit = advance(jnp.array([1.5, 0.0, 2.0]), jnp.array([2.5, 0.0, 2.0]),
                       jnp.asarray(0.0))
    assert bool(hit) and int(idx) == 1
    # crossing outside (y offset 2 > half_width)
    idx, hit = advance(jnp.array([1.5, 2.0, 2.0]), jnp.array([2.5, 2.0, 2.0]),
                       jnp.asarray(0.0))
    assert not bool(hit) and int(idx) == 0


@pytest.mark.slow
def test_race_passes_gates_and_aware_preserves_charge():
    gates = [
        GatePlane(center=(3.0, 0.0, 1.5), normal=(1.0, 0.0, 0.0),
                  half_width=1.2, half_height=1.2),
        GatePlane(center=(6.0, 0.0, 1.5), normal=(1.0, 0.0, 0.0),
                  half_width=1.2, half_height=1.2),
    ]
    p = PowertrainParams(motor_tau=0.05, discharge_rate=0.05,
                         sag_coeff=0.15)
    rep = simulate_gate_race(jax.random.PRNGKey(0), gates, p, steps=90,
                             num_samples=128, horizon=15, aware=True)
    assert rep["gates_passed"] >= 1
    assert rep["final_soc"] < 1.0
    assert np.all(np.isfinite(rep["trajectory"]))
    # charge budget: with a reserve penalty the final SOC is >= unbudgeted
    rep_b = simulate_gate_race(jax.random.PRNGKey(0), gates, p, steps=90,
                               num_samples=128, horizon=15, aware=True,
                               charge_weight=50.0, charge_reserve=1.1)
    assert rep_b["final_soc"] >= rep["final_soc"] - 0.02
