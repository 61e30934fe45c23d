"""Gate-racing MPPI stack: 3D gates, motor-level quadrotor, powertrain
(motor lag + battery sag), charge budgets.

Reference: crates/rust_robotics_control/src/ —
racing_mppi_3d.rs (RacingGatePlane3D: orthonormalized center/normal/up/
right frame with half extents; RacingGateLap3D reference-free objective —
progress toward the active gate along its normal, lateral_weight off-axis
penalty, pass_bonus for crossing inside the aperture, miss_penalty outside,
optional closed lap wrap :199-:380),
racing_mppi_motor.rs (rotor-thrust control: X-mixer roll = (f1+f2)−(f0+f3),
pitch = (f0+f1)−(f2+f3), yaw = (f0+f2)−(f1+f3) with inertia folded into
gains :199-:209; quaternion attitude integration :616, per-rotor
saturation, rate damping, drag, speed clamp :212-:260),
racing_mppi_powertrain.rs (first-order motor lag α = 1−exp(−dt/τ), battery:
OCV linear in SOC to min_voltage_scale, instantaneous sag −sag·load,
relaxation overpotential building with load and recovering when idle,
effective per-rotor ceiling = max_rotor · terminal_voltage_scale
:193-:271; powertrain-aware vs unaware controllers; ChargeBudget reserve
penalty :350-:372).

TPU-native shape: quad + powertrain dynamics are pure pytree step
functions, so MPPI's [samples × horizon] rollouts fuse into one scan; the
aware/unaware split is just which step function MPPI rolls out — both are
the same compiled kernel family.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from rust_robotics_tpu.control.mppi import MPPIConfig, mppi_plan

__all__ = [
    "GatePlane",
    "make_gate_lap_costs",
    "MotorQuadParams",
    "motor_quad_step",
    "hover_state",
    "PowertrainParams",
    "powertrain_init",
    "powertrain_step",
    "effective_max_rotor",
    "simulate_gate_race",
]


# ---------------------------------------------------------------------------
# gates (racing_mppi_3d.rs)


@dataclasses.dataclass(frozen=True)
class GatePlane:
    center: tuple
    normal: tuple
    up_hint: tuple = (0.0, 0.0, 1.0)
    half_width: float = 1.0
    half_height: float = 1.0

    def frame(self):
        c = np.asarray(self.center, float)
        n = np.asarray(self.normal, float)
        n = n / np.linalg.norm(n)
        u = np.asarray(self.up_hint, float)
        u = u - (u @ n) * n
        u = u / max(np.linalg.norm(u), 1e-12)
        r = np.cross(n, u)
        return c, n, u, r


def _stack_gates(gates):
    frames = [g.frame() for g in gates]
    return (jnp.asarray([f[0] for f in frames]),
            jnp.asarray([f[1] for f in frames]),
            jnp.asarray([f[2] for f in frames]),
            jnp.asarray([f[3] for f in frames]),
            jnp.asarray([g.half_width for g in gates]),
            jnp.asarray([g.half_height for g in gates]))


def make_gate_lap_costs(gates, progress_weight=6.0, lateral_weight=0.4,
                        control_weight=0.002, hover_thrust=None,
                        tilt_weight=8.0, rate_weight=0.05):
    """Reference-free gate objective (RacingGateLap3D): the rollout state is
    augmented with the active gate index; stage cost pulls toward the
    active gate plane along its normal and penalizes lateral offset.
    Returns (stage, terminal, advance) where advance(pos_prev, pos, idx)
    updates the active gate on an in-aperture crossing."""
    c, n, u, r, hw, hh = _stack_gates(gates)
    ng = c.shape[0]

    def gate_terms(pos, idx):
        gc, gn = c[idx], n[idx]
        gu, gr = u[idx], r[idx]
        rel = pos - gc
        along = jnp.sum(rel * gn, -1)
        lat = jnp.abs(jnp.sum(rel * gr, -1)) + jnp.abs(jnp.sum(rel * gu, -1))
        return along, lat

    def stage(state, u_ctl):
        pos = state[..., :3]
        idx = state[..., -1].astype(jnp.int32) % ng
        along, lat = gate_terms(pos, idx)
        eff = u_ctl - (hover_thrust if hover_thrust is not None else 0.0)
        cost = (progress_weight * jnp.abs(along)
                + lateral_weight * lat
                + control_weight * jnp.sum(eff * eff, -1))
        if state.shape[-1] >= 14:
            # keep the thrust axis near +z and body rates bounded — the
            # reference samples around hover so stays upright implicitly;
            # an explicit tilt term keeps the fused rollout stable
            qx, qy = state[..., 7], state[..., 8]
            tilt = 2.0 * (qx * qx + qy * qy)  # 1 − R₃₃
            rates = state[..., 10:13]
            cost = cost + tilt_weight * tilt + rate_weight * jnp.sum(
                rates * rates, -1
            )
        return cost

    def terminal(state):
        pos = state[..., :3]
        idx = state[..., -1].astype(jnp.int32) % ng
        along, lat = gate_terms(pos, idx)
        return 4.0 * progress_weight * jnp.abs(along) + lateral_weight * lat

    def advance(pos_prev, pos, idx, tol=0.0):
        """Crossing check (racing_mppi_3d.rs GateTransition): signed normal
        distance goes − → + with the crossing point inside the aperture."""
        i = idx.astype(jnp.int32) % ng
        gc, gn, gu, gr = c[i], n[i], u[i], r[i]
        s0 = jnp.sum((pos_prev - gc) * gn, -1)
        s1 = jnp.sum((pos - gc) * gn, -1)
        crossed = (s0 < 0) & (s1 >= 0)
        t = jnp.where(jnp.abs(s1 - s0) > 1e-12, -s0 / (s1 - s0), 0.0)
        xp = pos_prev + jnp.clip(t, 0.0, 1.0)[..., None] * (pos - pos_prev)
        wr = jnp.abs(jnp.sum((xp - gc) * gr, -1)) <= hw[i] + tol
        hr = jnp.abs(jnp.sum((xp - gc) * gu, -1)) <= hh[i] + tol
        passed = crossed & wr & hr
        return jnp.where(passed, idx + 1, idx), passed

    return stage, terminal, advance


# ---------------------------------------------------------------------------
# motor-level quadrotor (racing_mppi_motor.rs)


@dataclasses.dataclass(frozen=True)
class MotorQuadParams:
    gravity: float = 9.81
    drag: float = 0.3
    max_rotor_thrust: float = 6.0
    torque_gain: float = 9.0
    yaw_gain: float = 2.0
    rate_damping: float = 1.2
    max_speed: float = 7.0


def _quat_rotate(q, v):
    qv = q[..., 1:]
    t = 2.0 * jnp.cross(qv, v)
    return v + q[..., :1] * t + jnp.cross(qv, t)


def _quat_integrate(q, w, dt):
    qw, qx, qy, qz = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    dq = jnp.stack([
        -(qx * wx + qy * wy + qz * wz),
        qw * wx + qy * wz - qz * wy,
        qw * wy + qz * wx - qx * wz,
        qw * wz + qx * wy - qy * wx,
    ], -1)
    q = q + 0.5 * dt * dq
    return q / jnp.clip(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-12)


def hover_state(x, y, z, params: MotorQuadParams, gate_idx=0.0):
    """State layout [14]: pos 3, vel 3, quat 4, rates 3, active gate 1."""
    return jnp.concatenate([
        jnp.array([x, y, z, 0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0,
                   0.0, 0.0, 0.0, gate_idx]),
    ])


def motor_quad_step(params: MotorQuadParams, state, rotors, dt,
                    max_rotor=None):
    """One step of the rotor-mixing rigid body (racing_mppi_motor.rs:212).
    `max_rotor` overrides the saturation ceiling (the powertrain passes its
    battery-limited value)."""
    ceil = params.max_rotor_thrust if max_rotor is None else max_rotor
    f = jnp.clip(rotors, 0.0, ceil)
    f0, f1, f2, f3 = f[..., 0], f[..., 1], f[..., 2], f[..., 3]
    roll = params.torque_gain * ((f1 + f2) - (f0 + f3))
    pitch = params.torque_gain * ((f0 + f1) - (f2 + f3))
    yaw = params.yaw_gain * ((f0 + f2) - (f1 + f3))
    torque = jnp.stack([roll, pitch, yaw], -1)

    pos = state[..., 0:3]
    vel = state[..., 3:6]
    quat = state[..., 6:10]
    rates = state[..., 10:13]
    gate = state[..., 13:14]

    rates = rates + (torque - params.rate_damping * rates) * dt
    quat = _quat_integrate(quat, rates, dt)
    thrust = jnp.sum(f, -1)
    axis = _quat_rotate(quat, jnp.broadcast_to(
        jnp.array([0.0, 0.0, 1.0]), pos.shape))
    acc = thrust[..., None] * axis - params.drag * vel
    acc = acc - jnp.array([0.0, 0.0, params.gravity])
    vel = vel + acc * dt
    speed = jnp.linalg.norm(vel, axis=-1, keepdims=True)
    vel = jnp.where(speed > params.max_speed,
                    vel * params.max_speed / jnp.clip(speed, 1e-9), vel)
    pos = pos + vel * dt
    return jnp.concatenate([pos, vel, quat, rates, gate], -1)


# ---------------------------------------------------------------------------
# powertrain (racing_mppi_powertrain.rs)


@dataclasses.dataclass(frozen=True)
class PowertrainParams:
    base: MotorQuadParams = MotorQuadParams()
    motor_tau: float = 0.08
    discharge_rate: float = 0.02
    sag_coeff: float = 0.12
    min_voltage_scale: float = 0.7
    relax_build: float = 0.0
    relax_recover: float = 0.0
    relax_coeff: float = 0.0

    @staticmethod
    def ideal(base: MotorQuadParams = MotorQuadParams()):
        """Zero lag, no discharge, no sag — reduces exactly to the motor
        model (the benchmark baseline)."""
        return PowertrainParams(base, motor_tau=0.0, discharge_rate=0.0,
                                sag_coeff=0.0, min_voltage_scale=1.0)


def powertrain_init(quad_state, params: PowertrainParams, soc=1.0):
    """Augment the 14-state quad with [rotor_thrust 4, soc 1, relax 1]."""
    hover = params.base.gravity / 4.0
    return jnp.concatenate([
        quad_state,
        jnp.full((4,), hover),
        jnp.array([soc, 0.0]),
    ])


def _voltage_scale(p: PowertrainParams, soc, load, relaxation):
    soc = jnp.clip(soc, 0.0, 1.0)
    ocv = p.min_voltage_scale + (1.0 - p.min_voltage_scale) * soc
    v = jnp.clip(ocv - p.sag_coeff * load, 0.0, 1.0)
    return jnp.clip(v - p.relax_coeff * jnp.clip(relaxation, 0.0, 1.0),
                    0.0, 1.0)


def effective_max_rotor(p: PowertrainParams, state):
    rt = state[..., 14:18]
    load = jnp.clip(jnp.sum(rt, -1) / (4.0 * p.base.max_rotor_thrust),
                    0.0, 1.0)
    return p.base.max_rotor_thrust * _voltage_scale(
        p, state[..., 18], load, state[..., 19]
    )


def powertrain_step(params: PowertrainParams, state, command, dt):
    """Powertrain step (racing_mppi_powertrain.rs:235): ceiling-clamped
    first-order lag on rotor thrusts, base physics on the ACTUAL thrusts,
    monotone discharge, relaxation build/recover."""
    p = params
    quad = state[..., :14]
    rt = state[..., 14:18]
    soc = state[..., 18]
    relax = state[..., 19]

    eff = effective_max_rotor(p, state)
    alpha = 1.0 - jnp.exp(-dt / p.motor_tau) if p.motor_tau > 0 else 1.0
    target = jnp.clip(command, 0.0, eff[..., None])
    rt = rt + (target - rt) * alpha

    quad = motor_quad_step(p.base, quad, rt, dt,
                           max_rotor=p.base.max_rotor_thrust)
    load = jnp.clip(jnp.sum(rt, -1) / (4.0 * p.base.max_rotor_thrust),
                    0.0, 1.0)
    soc = jnp.clip(soc - p.discharge_rate * load * dt, 0.0, 1.0)
    relax = jnp.clip(
        relax + (p.relax_build * load - p.relax_recover * relax) * dt,
        0.0, 1.0,
    )
    return jnp.concatenate([
        quad, rt, soc[..., None], relax[..., None]
    ], -1)


# ---------------------------------------------------------------------------
# closed loop


def simulate_gate_race(key, gates, params: PowertrainParams,
                       start=(0.0, 0.0, 1.5), steps: int = 120,
                       dt: float = 0.05, horizon: int = 18,
                       num_samples: int = 192, aware: bool = True,
                       charge_weight: float = 0.0,
                       charge_reserve: float = 0.0,
                       closed: bool = True):
    """Closed-loop race through `gates` (simulate_powertrain_race*):
    `aware=False` plans with ideal actuators (the reference's honest
    baseline) but EXECUTES through the real powertrain; `aware=True` rolls
    MPPI candidates through the powertrain itself. ChargeBudget: penalize
    load when SOC falls below `charge_reserve` with `charge_weight`.

    Returns report dict(gates_passed, lap_fraction, mean_speed,
    saturation_fraction, final_soc, min_soc, trajectory)."""
    base = params.base
    hover = base.gravity / 4.0
    stage_g, term_g, advance = make_gate_lap_costs(
        gates, hover_thrust=hover
    )
    ng = len(gates)

    def stage(state, u_ctl):
        c = stage_g(state, u_ctl)
        if charge_weight > 0.0 and state.shape[-1] >= 20:
            load = jnp.clip(jnp.sum(u_ctl, -1)
                            / (4.0 * base.max_rotor_thrust), 0.0, 1.0)
            low = state[..., 18] < charge_reserve
            c = c + charge_weight * jnp.where(low, load, 0.0)
        return c

    plan_params = params if aware else PowertrainParams.ideal(base)

    def plan_dyn(state, u_ctl, dtv):
        new = powertrain_step(plan_params, state, u_ctl, dtv)
        idx, _ = advance(state[..., 0:3], new[..., 0:3], state[..., 13])
        return new.at[..., 13].set(idx)

    mcfg = MPPIConfig(
        horizon=horizon, num_samples=num_samples, temperature=0.25,
        noise_sigma=(0.2,) * 4,
        control_min=(0.0,) * 4,
        control_max=(base.max_rotor_thrust,) * 4,
        dt=dt,
    )
    state = powertrain_init(hover_state(*start, base), params)
    u_nom = jnp.full((horizon, 4), hover)
    keys = jax.random.split(key, steps)

    traj = [np.asarray(state)]
    passed = 0
    sat_steps = 0
    min_soc = 1.0
    for i in range(steps):
        u_nom, first, _ = mppi_plan(keys[i], plan_dyn, stage, term_g, state,
                                    u_nom, mcfg)
        new = powertrain_step(params, state, first, dt)
        idx, hit = advance(state[0:3], new[0:3], state[13])
        if not closed:
            idx = jnp.minimum(idx, ng)
        new = new.at[13].set(idx)
        passed += int(hit)
        eff = float(effective_max_rotor(params, state))
        if float(jnp.max(first)) >= eff - 1e-6:
            sat_steps += 1
        min_soc = min(min_soc, float(new[18]))
        state = new
        traj.append(np.asarray(state))
        u_nom = jnp.concatenate([u_nom[1:], u_nom[-1:]])
    traj = np.stack(traj)
    speeds = np.linalg.norm(traj[:, 3:6], axis=1)
    return {
        "gates_passed": passed,
        "lap_fraction": passed / ng,
        "laps_completed": passed // ng,
        "mean_speed": float(speeds.mean()),
        "max_speed": float(speeds.max()),
        "saturation_fraction": sat_steps / steps,
        "final_soc": float(traj[-1, 18]),
        "min_soc": min_soc,
        "trajectory": traj,
    }
