"""Meta control, LQR speed+steer, point-to-plane 3D ICP tests."""

import jax
import jax.numpy as jnp
import numpy as np

from rust_robotics_tpu.control.meta import (
    LQRSpeedSteerConfig,
    MetaControlConfig,
    lqr_speed_steer_control,
    meta_control_step,
    meta_select,
)
from rust_robotics_tpu.control.trackers import (
    bicycle_kinematics,
    pure_pursuit_control,
    stanley_control,
)
from rust_robotics_tpu.core.lie import se3_exp
from rust_robotics_tpu.slam.scan_matching import point_to_plane_icp


def test_meta_select_hysteresis():
    use, ema = jnp.asarray(False), jnp.asarray(0.0)
    # sustained high error flips to fallback
    for _ in range(40):
        use, ema = meta_select(use, ema, jnp.asarray(2.0))
    assert bool(use)
    # sustained low error flips back
    for _ in range(60):
        use, ema = meta_select(use, ema, jnp.asarray(0.05))
    assert not bool(use)


def test_meta_control_runs_closed_loop():
    xs = jnp.linspace(0.0, 40.0, 401)
    pts = jnp.stack([xs, 2.0 * jnp.sin(xs / 8.0)], axis=-1)
    mask = jnp.ones(401)
    state = jnp.array([0.0, -1.0, 0.2, 1.0])
    use, ema = jnp.asarray(False), jnp.asarray(0.0)
    for _ in range(200):
        accel, steer, use, ema = meta_control_step(
            state, pts, mask, 3.0, use, ema,
            lambda s: pure_pursuit_control(s, pts, mask, 3.0),
            lambda s: stanley_control(s, pts, mask, 3.0),
        )
        state = bicycle_kinematics(state, accel, steer, 0.1, 2.9)
    assert float(state[0]) > 25.0
    assert np.isfinite(float(ema))


def test_lqr_speed_steer_tracks_path_and_speed():
    cfg = LQRSpeedSteerConfig(wheelbase=2.9)
    xs = jnp.linspace(0.0, 50.0, 501)
    pts = jnp.stack([xs, 2.0 * jnp.sin(xs / 10.0)], axis=-1)
    mask = jnp.ones(501)
    sp = jnp.full((501,), 2.5)
    def step(carry, _):
        state, pe, pth = carry
        accel, steer, (e, th) = lqr_speed_steer_control(
            state, pts, mask, sp, pe, pth, cfg
        )
        state = bicycle_kinematics(state, accel, steer, cfg.dt, cfg.wheelbase)
        return (state, e, th), state

    (_, _, _), traj = jax.lax.scan(
        step,
        (jnp.array([0.0, -0.5, 0.1, 0.5]), jnp.asarray(0.0), jnp.asarray(0.0)),
        None, length=180,
    )
    traj = np.asarray(traj)
    on_course = (traj[:, 0] > 8.0) & (traj[:, 0] < 47.0)
    # converges to the target speed AND tracks the path while on course
    assert abs(traj[on_course, 3].mean() - 2.5) < 0.2
    ref = 2.0 * np.sin(traj[on_course, 0] / 10.0)
    assert np.abs(traj[on_course, 1] - ref).mean() < 0.5


def test_point_to_plane_icp_3d():
    key = jax.random.PRNGKey(0)
    # two planes forming a corner (well-constrained)
    u = jax.random.uniform(key, (150, 2), jnp.float64) * 4
    plane1 = jnp.concatenate([u, jnp.zeros((150, 1))], axis=-1)
    plane2 = jnp.concatenate(
        [u[:, :1], jnp.zeros((150, 1)), u[:, 1:]], axis=-1
    )
    plane3 = jnp.concatenate([jnp.zeros((150, 1)), u], axis=-1)
    prev = jnp.concatenate([plane1, plane2, plane3])
    n1 = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), plane1.shape)
    n2 = jnp.broadcast_to(jnp.array([0.0, 1.0, 0.0]), plane2.shape)
    n3 = jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0]), plane3.shape)
    normals = jnp.concatenate([n1, n2, n3])

    xi_true = jnp.array([0.1, -0.05, 0.08, 0.03, -0.02, 0.04])
    # current = inverse-transform of prev so that estimated xi ≈ xi_true
    from rust_robotics_tpu.core.lie import se3_inverse

    inv = se3_inverse(se3_exp(xi_true))
    cur = prev @ np.asarray(inv)[:3, :3].T + np.asarray(inv)[:3, 3]
    xi, err = point_to_plane_icp(prev, normals, jnp.asarray(cur))
    end = se3_exp(xi)
    np.testing.assert_allclose(
        np.asarray(end), np.asarray(se3_exp(xi_true)), atol=5e-3
    )
    assert float(err) < 0.05
