"""UKF-vs-CKF accuracy experiment suite.

Reference: crates/rust_robotics_localization/src/experiments/
ukf_ckf_accuracy/mod.rs (:33-:1205) — scenario *families* (MotionProfile:
commanded vs true velocity/yaw waves, control latency, actuator limits,
process/control/observation noise, observation refresh/hold/outlier
bursts), deterministic seeded simulations, per-scenario UKF and CKF RMSE,
aggregation *variants* that select scenario slots (full coverage, strided
subsampling, escalation on disagreement), and `AccuracyObservation` rows
(bucket median RMSE, min/max, ckf_wins, ukf_over_ckf ratio, winner,
coverage_ratio) compared across variants by (family, bucket) key.

TPU-native shape: the reference loops scenario-by-scenario, step-by-step;
here ALL scenarios of a family simulate as one `vmap`-over-scenarios
`lax.scan`-over-time program, and both filters run inside the same scan —
one fused kernel yields every RMSE. Aggregation variants then merely
*index* the RMSE vector (the expensive part is shared, unlike the
reference, which re-simulates per variant).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from rust_robotics_tpu.filters.kalman import (
    GaussianBelief,
    ckf_step,
    ukf_step,
    unicycle_position_model,
)
from rust_robotics_tpu.models.motion import unicycle_propagate
from rust_robotics_tpu.utils.experiments import VariantDescriptor

__all__ = ["MotionProfile", "SCENARIO_FAMILIES", "AccuracyObservation",
           "simulate_family_rmse", "run_ukf_ckf_accuracy"]


@dataclasses.dataclass(frozen=True)
class MotionProfile:
    """The reference's MotionProfile surface (mod.rs:42-70), trimmed to the
    fields that drive observable behavior."""

    velocity: float = 1.0
    yaw_rate: float = 0.1
    true_velocity_wave: float = 0.0
    true_yaw_wave_deg: float = 0.0
    control_latency_steps: int = 0
    process_noise_xy: float = 0.01
    process_noise_yaw_deg: float = 0.5
    control_noise_v: float = 0.05
    control_noise_yaw_deg: float = 1.0
    control_bias_v: float = 0.0
    obs_noise_x: float = 0.15
    obs_noise_y: float = 0.15
    observation_refresh_interval: int = 1
    observation_outlier_probability: float = 0.0
    observation_outlier_scale: float = 6.0


SCENARIO_FAMILIES = {
    "nominal": MotionProfile(),
    "aggressive_yaw": MotionProfile(yaw_rate=0.45, true_yaw_wave_deg=20.0),
    "velocity_wave": MotionProfile(true_velocity_wave=0.6),
    "latency": MotionProfile(control_latency_steps=3),
    "biased_control": MotionProfile(control_bias_v=0.15),
    "sparse_observations": MotionProfile(observation_refresh_interval=4),
    "outliers": MotionProfile(observation_outlier_probability=0.08),
    "noisy_obs": MotionProfile(obs_noise_x=0.5, obs_noise_y=0.5),
    "fast": MotionProfile(velocity=2.5),
    "drift": MotionProfile(process_noise_yaw_deg=2.5),
}


@dataclasses.dataclass
class AccuracyObservation:
    """mod.rs:81-113 AccuracyObservation analog."""

    family_name: str
    bucket: int
    total_scenarios: int
    selected_slots: tuple
    escalated: bool
    ukf_bucket_median_rmse: float
    ckf_bucket_median_rmse: float
    ukf_min_rmse: float
    ukf_max_rmse: float
    ckf_min_rmse: float
    ckf_max_rmse: float
    ckf_wins: int

    def ukf_over_ckf(self):
        return self.ukf_bucket_median_rmse / max(
            self.ckf_bucket_median_rmse, 1e-9
        )

    def winner(self):
        return "CKF" if self.ukf_over_ckf() > 1.0 else "UKF"

    def coverage_ratio(self):
        return len(self.selected_slots) / self.total_scenarios

    def comparison_key(self):
        return (self.family_name, self.bucket)


@functools.partial(jax.jit, static_argnames=("profile", "steps",
                                             "n_scenarios"))
def simulate_family_rmse(key, profile: MotionProfile, steps: int = 120,
                         n_scenarios: int = 32, dt: float = 0.1):
    """Per-scenario (UKF RMSE, CKF RMSE) for one family — every scenario
    AND both filters in one fused vmap×scan program."""
    f = jnp.result_type(float)
    model = unicycle_position_model()
    q = jnp.diag(jnp.array([0.1, 0.1, jnp.deg2rad(1.0), 1.0], f)) ** 2
    r = jnp.diag(jnp.array([profile.obs_noise_x, profile.obs_noise_y],
                           f)) ** 2

    def one_scenario(k):
        ks = jax.random.split(k, 6)
        t = jnp.arange(steps, dtype=f) * dt
        v_true = profile.velocity * (
            1.0 + profile.true_velocity_wave * jnp.sin(0.7 * t)
        )
        w_true = profile.yaw_rate + jnp.deg2rad(
            profile.true_yaw_wave_deg
        ) * jnp.sin(0.9 * t)
        # commanded = delayed + biased + noisy copy of true
        lag = profile.control_latency_steps
        v_cmd = jnp.roll(v_true, lag) + profile.control_bias_v + \
            profile.control_noise_v * jax.random.normal(ks[0], (steps,))
        w_cmd = jnp.roll(w_true, lag) + jnp.deg2rad(
            profile.control_noise_yaw_deg
        ) * jax.random.normal(ks[1], (steps,))
        proc = jax.random.normal(ks[2], (steps, 4)) * jnp.array([
            profile.process_noise_xy, profile.process_noise_xy,
            jnp.deg2rad(profile.process_noise_yaw_deg), 0.0,
        ])
        obs_noise = jax.random.normal(ks[3], (steps, 2)) * jnp.array([
            profile.obs_noise_x, profile.obs_noise_y,
        ])
        outlier = (jax.random.uniform(ks[4], (steps,))
                   < profile.observation_outlier_probability)
        obs_noise = jnp.where(
            outlier[:, None],
            obs_noise * profile.observation_outlier_scale, obs_noise,
        )
        fresh = (jnp.arange(steps) % profile.observation_refresh_interval
                 ) == 0

        x0 = jnp.zeros(4, f)
        b0 = GaussianBelief(x0, jnp.eye(4, dtype=f))

        def step(carry, xs):
            x_true, bu, bc, last_z = carry
            vt, wt, vc, wc, pn, on, fr = xs
            u_true = jnp.stack([vt, wt])
            u_cmd = jnp.stack([vc, wc])
            x_true = unicycle_propagate(x_true, u_true, dt) + pn
            z_new = x_true[:2] + on
            z = jnp.where(fr, z_new, last_z)  # held observation
            bu2 = ukf_step(bu, z, u_cmd, dt, q, r, model)
            bc2 = ckf_step(bc, z, u_cmd, dt, q, r, model)
            eu = jnp.sum((bu2.mean[:2] - x_true[:2]) ** 2)
            ec = jnp.sum((bc2.mean[:2] - x_true[:2]) ** 2)
            return (x_true, bu2, bc2, z), (eu, ec)

        xs = (v_true, w_true, v_cmd, w_cmd, proc, obs_noise, fresh)
        (_, _, _, _), (eu, ec) = jax.lax.scan(
            step, (x0, b0, b0, jnp.zeros(2, f)), xs
        )
        return jnp.sqrt(jnp.mean(eu)), jnp.sqrt(jnp.mean(ec))

    keys = jax.random.split(key, n_scenarios)
    return jax.vmap(one_scenario)(keys)


# aggregation variants (mod.rs: 5 variants selecting scenario slots)
def _slots_full(n):
    return list(range(n))


def _slots_strided(n, stride):
    return list(range(0, n, stride))


AGGREGATION_VARIANTS = (
    VariantDescriptor("full_coverage", "median over every scenario"),
    VariantDescriptor("strided_2", "every 2nd scenario"),
    VariantDescriptor("strided_4", "every 4th scenario"),
    VariantDescriptor("head_8", "first 8 scenarios only"),
    VariantDescriptor("escalating", "strided-4, escalate to full when "
                                    "UKF/CKF disagree by >10%"),
)


def run_ukf_ckf_accuracy(seed: int = 0, families=None, steps: int = 120,
                         n_scenarios: int = 32, buckets=(8, 16, 32)):
    """The full suite: families × aggregation variants × RMSE buckets.
    Returns {variant: [AccuracyObservation, ...]}. Deterministic per seed
    (mod.rs deterministic seeded sims)."""
    families = families or SCENARIO_FAMILIES
    rmse = {}
    for i, (name, profile) in enumerate(sorted(families.items())):
        key = jax.random.PRNGKey(seed * 1000 + i)
        eu, ec = simulate_family_rmse(key, profile, steps, n_scenarios)
        rmse[name] = (np.asarray(eu), np.asarray(ec))

    out = {}
    for v in AGGREGATION_VARIANTS:
        rows = []
        for name, (eu, ec) in sorted(rmse.items()):
            n = len(eu)
            escalated = False
            if v.name == "full_coverage":
                slots = _slots_full(n)
            elif v.name == "strided_2":
                slots = _slots_strided(n, 2)
            elif v.name == "strided_4":
                slots = _slots_strided(n, 4)
            elif v.name == "head_8":
                slots = list(range(min(8, n)))
            else:  # escalating
                slots = _slots_strided(n, 4)
                med_u = np.median(eu[slots])
                med_c = np.median(ec[slots])
                if abs(med_u / max(med_c, 1e-9) - 1.0) > 0.1:
                    slots = _slots_full(n)
                    escalated = True
            su, sc = eu[slots], ec[slots]
            for bucket in buckets:
                bu, bc = su[:bucket], sc[:bucket]
                if len(bu) == 0:
                    continue
                rows.append(AccuracyObservation(
                    family_name=name,
                    bucket=bucket,
                    total_scenarios=n,
                    selected_slots=tuple(slots[:bucket]),
                    escalated=escalated,
                    ukf_bucket_median_rmse=float(np.median(bu)),
                    ckf_bucket_median_rmse=float(np.median(bc)),
                    ukf_min_rmse=float(bu.min()),
                    ukf_max_rmse=float(bu.max()),
                    ckf_min_rmse=float(bc.min()),
                    ckf_max_rmse=float(bc.max()),
                    ckf_wins=int((bc < bu).sum()),
                ))
        out[v.name] = rows
    return out
