"""Path-tracking accuracy experiment suite.

Reference: crates/rust_robotics_control/src/experiments/
path_tracking_accuracy/ (~1,422 LoC with drone_trajectory_quality) —
controller variants (PurePursuit / Stanley / LQR-steer) driven over seeded
course scenarios, reporting cross-track RMSE, max deviation, progress, and
goal completion per (variant × seed × scenario) cell through the shared
experiments harness (core experiments.rs), with deltas annotated against a
reference variant.

TPU-native shape: each (controller × course × seed) closed loop is a
`lax.scan`; seeds batch with vmap. Courses are sine/chicane/circle splines
sampled once.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from rust_robotics_tpu.control.trackers import (
    LQRSteerConfig,
    bicycle_kinematics,
    lqr_steer_control,
    pure_pursuit_control,
    stanley_control,
)
from rust_robotics_tpu.utils.experiments import (
    ExperimentSamplingPlan,
    VariantDescriptor,
    annotate_against_reference,
    run_experiment,
)

__all__ = ["run_path_tracking_accuracy", "COURSES", "CONTROLLERS"]


def _course(kind: str, n=601):
    xs = jnp.linspace(0.0, 60.0, n)
    if kind == "sine":
        ys = 3.0 * jnp.sin(xs / 8.0)
    elif kind == "chicane":
        ys = 2.0 * jnp.tanh(jnp.sin(xs / 10.0) * 1.5)
    else:  # gentle arc
        ys = 0.01 * xs ** 2 * 0.5
    return jnp.stack([xs, ys], axis=-1), jnp.ones(n)


COURSES = ("sine", "chicane", "arc")
CONTROLLERS = (
    VariantDescriptor("pure_pursuit", "geometric lookahead"),
    VariantDescriptor("stanley", "front-axle cross-track law"),
    VariantDescriptor("lqr_steer", "lateral-error LQR"),
)


@functools.partial(jax.jit, static_argnames=("controller", "steps"))
def _rollout(key, pts, mask, controller: str, steps: int = 500,
             dt: float = 0.1, target_speed: float = 3.0,
             wheelbase: float = 2.9):
    f = jnp.result_type(float)
    # seeded initial offset: the "scenario" perturbation
    off = jax.random.uniform(key, (2,), minval=-1.0, maxval=1.0)
    state0 = jnp.array([0.0, off[0] * 1.5, off[1] * 0.3, 1.0], f)
    cfg = LQRSteerConfig(wheelbase=wheelbase)
    max_steer = 0.6  # the reference controllers clamp at max_steer

    def step(carry, _):
        state, (pe, pth) = carry
        if controller == "pure_pursuit":
            accel, steer, _ = pure_pursuit_control(state, pts, mask,
                                                   target_speed)
            errs = (pe, pth)
        elif controller == "stanley":
            accel, steer, _ = stanley_control(state, pts, mask, target_speed)
            errs = (pe, pth)
        else:
            accel, steer, (e, th) = lqr_steer_control(
                state, pts, mask, target_speed, pe, pth, cfg
            )
            errs = (e, th)
        steer = jnp.clip(steer, -max_steer, max_steer)
        new = bicycle_kinematics(state, accel, steer, dt, wheelbase)
        done = jnp.linalg.norm(state[:2] - pts[-1]) < 2.0
        new = jnp.where(done, state, new)
        return (new, errs), new

    (_, _), traj = jax.lax.scan(
        step, (state0, (jnp.asarray(0.0, f), jnp.asarray(0.0, f))), None,
        length=steps,
    )
    d = jnp.min(jnp.linalg.norm(
        traj[:, None, :2] - pts[None, :, :], axis=-1), axis=1)
    settle = steps // 5
    return {
        "cross_track_rmse": jnp.sqrt(jnp.mean(d[settle:] ** 2)),
        "max_cross_track": jnp.max(d[settle:]),
        "progress": traj[-1, 0],
        "goal_reached": jnp.linalg.norm(traj[-1, :2] - pts[-1]) < 2.5,
    }


def run_path_tracking_accuracy(seeds=(0, 1, 2), reference="pure_pursuit",
                               steps: int = 500):
    """The suite: controllers × courses × seeds through the experiments
    harness; summaries + deltas vs the reference variant. Returns the
    list of ExperimentVariantReport."""

    def run_fn(variant, seed, scenario):
        pts, mask = _course(scenario)
        out = _rollout(jax.random.PRNGKey(seed), pts, mask, variant.name,
                       steps)
        return {k: float(v) for k, v in out.items()}

    plan = ExperimentSamplingPlan(seeds=tuple(seeds), scenarios=COURSES)
    reducers = {
        "mean_cross_track_rmse": lambda obs: float(np.mean(
            [o["cross_track_rmse"] for o in obs])),
        "worst_max_cross_track": lambda obs: float(np.max(
            [o["max_cross_track"] for o in obs])),
        "goal_rate": lambda obs: float(np.mean(
            [o["goal_reached"] for o in obs])),
    }
    reports = run_experiment(CONTROLLERS, plan, run_fn, reducers)
    return annotate_against_reference(reports, reference)
