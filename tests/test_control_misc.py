"""iLQR/DDP, LQR regulator, ADMM consensus, CBF filter, mission FSM and
behavior-tree tests."""

import jax
import jax.numpy as jnp
import numpy as np

from rust_robotics_tpu.control.admm import (
    ADMMConfig,
    solve_consensus,
    solve_formation_consensus,
)
from rust_robotics_tpu.control.cbf import (
    CBFConfig,
    cbf_filter_single_integrator,
)
from rust_robotics_tpu.control.mission import (
    Action,
    Condition,
    Selector,
    Sequence,
    Status,
    make_waypoint_mission,
)
from rust_robotics_tpu.control.trajopt import ddp_solve, ilqr_solve, lqr_regulator


def pendulum_dynamics(x, u, dt):
    """Inverted pendulum on a cart, linearized-free nonlinear form."""
    th, thd = x[0], x[1]
    thdd = 9.81 * jnp.sin(th) + u[0]
    return jnp.array([th + thd * dt, thd + thdd * dt])


def test_ilqr_swings_pendulum_to_upright():
    stage = lambda x, u: 0.5 * (x[0] ** 2 + 0.1 * x[1] ** 2 + 0.01 * u[0] ** 2)
    terminal = lambda x: 50.0 * (x[0] ** 2 + x[1] ** 2)
    x0 = jnp.array([0.5, 0.0])
    us0 = jnp.zeros((60, 1))
    xs, us, cost = ilqr_solve(pendulum_dynamics, stage, terminal, x0, us0, 0.02)
    assert abs(float(xs[-1, 0])) < 0.05
    assert float(cost) < 10.0


def test_ddp_matches_or_beats_ilqr():
    stage = lambda x, u: 0.5 * (x[0] ** 2 + 0.1 * x[1] ** 2 + 0.01 * u[0] ** 2)
    terminal = lambda x: 50.0 * (x[0] ** 2 + x[1] ** 2)
    x0 = jnp.array([0.8, 0.0])
    us0 = jnp.zeros((60, 1))
    _, _, c_ilqr = ilqr_solve(pendulum_dynamics, stage, terminal, x0, us0, 0.02)
    _, _, c_ddp = ddp_solve(pendulum_dynamics, stage, terminal, x0, us0, 0.02)
    assert float(c_ddp) <= float(c_ilqr) * 1.2


def test_lqr_regulator_stabilizes():
    dt = 0.02
    a = jnp.array([[1.0, dt], [9.81 * dt, 1.0]])
    b = jnp.array([[0.0], [dt]])
    k = lqr_regulator(a, b, jnp.eye(2), jnp.eye(1))
    x = jnp.array([0.3, 0.0])
    for _ in range(400):
        u = -(k @ x)
        x = a @ x + b @ u
    assert float(jnp.linalg.norm(x)) < 1e-3


def test_admm_consensus_converges_to_weighted_mean():
    targets = jnp.array([[0.0, 0.0], [2.0, 0.0], [4.0, 6.0]])
    res = solve_consensus(targets, cfg=ADMMConfig(iterations=300))
    np.testing.assert_allclose(res.z, jnp.mean(targets, axis=0), atol=1e-5)
    assert float(res.primal_residual) < 1e-4


def test_formation_consensus():
    offsets = jnp.array([[1.0, 0.0], [-1.0, 0.0], [0.0, 1.0]])
    positions = jnp.array([[5.8, 2.1], [4.1, 2.0], [5.1, 2.9]])
    center, targets, res = solve_formation_consensus(positions, offsets)
    np.testing.assert_allclose(np.asarray(center), [5.0, 2.0], atol=0.2)
    np.testing.assert_allclose(
        np.asarray(targets) - np.asarray(center), np.asarray(offsets), atol=1e-5
    )


def test_cbf_filter_prevents_collision():
    cfg = CBFConfig(alpha=2.0)
    obstacles = jnp.array([[2.0, 0.0]])
    radii = jnp.array([1.0])
    pos = jnp.array([0.0, 0.0])
    dt = 0.05
    min_h = np.inf
    for _ in range(200):
        u_des = jnp.array([1.5, 0.0])  # drive straight at the obstacle
        u = cbf_filter_single_integrator(pos, u_des, obstacles, radii, cfg)
        pos = pos + dt * u
        h = float(jnp.sum((pos - obstacles[0]) ** 2) - radii[0] ** 2)
        min_h = min(min_h, h)
    assert min_h > -0.05, min_h  # barrier (approximately) maintained
    # filter is inactive far from obstacles
    far = cbf_filter_single_integrator(
        jnp.array([-50.0, 0.0]), jnp.array([1.5, 0.0]), obstacles, radii, cfg
    )
    np.testing.assert_allclose(np.asarray(far), [1.5, 0.0], atol=1e-6)


def test_behavior_tree_semantics():
    bb = {"battery": 0.1, "charged": False}
    log = []

    def charge(b):
        log.append("charge")
        b["charged"] = True
        return Status.SUCCESS

    def work(b):
        log.append("work")
        return Status.SUCCESS

    tree = Selector(
        [
            Sequence(
                [Condition(lambda b: b["battery"] < 0.2), Action(charge)]
            ),
            Action(work),
        ]
    )
    assert tree.tick(bb) == Status.SUCCESS
    assert log == ["charge"]
    bb["battery"] = 0.9
    assert tree.tick(bb) == Status.SUCCESS
    assert log == ["charge", "work"]


def test_waypoint_mission_with_stuck_recovery():
    import numpy as np

    waypoints = [np.array([5.0, 0.0]), np.array([5.0, 5.0])]
    sm = make_waypoint_mission(waypoints, stuck_window=5, recovery_steps=3)
    bb = {"position": np.array([0.0, 0.0]), "wp_index": 0}
    # simulate: robot is stuck for a while, then moves
    stuck_steps = 8
    pos = np.array([0.0, 0.0])
    states = []
    for k in range(60):
        if sm.state == "navigate" and k >= stuck_steps:
            wp = waypoints[bb["wp_index"]]
            step = wp - pos
            n = np.linalg.norm(step)
            if n > 1e-9:
                pos = pos + 0.6 * step / max(n, 1.0)
        bb["position"] = pos
        states.append(sm.step(bb))
        if sm.state == "done":
            break
    assert "recover" in states  # stuck phase triggered recovery
    assert sm.state == "done"
    assert bb.get("recovery_count", 0) >= 1


def _horizon_consensus_reference(goal_trajs, anchor, smooth_weight, rho,
                                 iters):
    """Independent f64 numpy transcription of the reference's ADMM loop
    (admm_consensus.rs:544-684, unit weights, no box constraints, zero
    offsets) used to pin the JAX implementation's splitting semantics."""
    g = np.asarray(goal_trajs, np.float64)
    n, horizon, d = g.shape
    a_mat = np.eye(horizon) * (rho * n)
    for t in range(1, horizon - 1):
        idx = [t - 1, t, t + 1]
        coeff = [1.0, -2.0, 1.0]
        for ai, ia in enumerate(idx):
            for bi, ib in enumerate(idx):
                a_mat[ia, ib] += smooth_weight * coeff[ai] * coeff[bi]
    free = list(range(1, horizon)) if anchor is not None else \
        list(range(horizon))
    a_red = a_mat[np.ix_(free, free)]
    z = g.mean(axis=0)
    if anchor is not None:
        z[0] = anchor
    x = np.broadcast_to(z[None], g.shape).copy()
    u = np.zeros_like(g)
    for _ in range(iters):
        x = (g + rho * (z[None] - u)) / (1.0 + rho)
        b = rho * (x + u).sum(axis=0)  # [H, d]
        b_red = b[free]
        if anchor is not None:
            b_red = b_red - np.outer(a_mat[free, 0], z[0])
        z_free = np.linalg.solve(a_red, b_red)
        z = z.copy()
        z[free] = z_free
        u = u + x - z[None]
    return z


def test_horizon_consensus_matches_reference_semantics():
    """Smoothness and anchor live in the z-update ONCE (not scaled by the
    number of agents) — parity vs an independent transcription of
    admm_consensus.rs's solve_horizon_consensus (ADVICE r3 medium)."""
    from rust_robotics_tpu.control.admm import solve_horizon_consensus

    rng = np.random.default_rng(3)
    goals = rng.normal(0.0, 1.0, (5, 8, 2)).astype(np.float32) + \
        np.linspace(0, 3, 8)[None, :, None].astype(np.float32)
    anchor = np.array([0.1, -0.2], np.float32)
    for smooth in (0.0, 25.0):
        z, res = solve_horizon_consensus(
            jnp.asarray(goals), jnp.asarray(anchor), smooth_weight=smooth,
            cfg=ADMMConfig(rho=1.0, iterations=80))
        want = _horizon_consensus_reference(goals, anchor, smooth, 1.0, 80)
        np.testing.assert_allclose(np.asarray(z), want, rtol=2e-4, atol=2e-4)
        # hard anchor: z[0] equals the anchor exactly
        np.testing.assert_allclose(np.asarray(z[0]), anchor, atol=1e-6)


def test_horizon_consensus_duplication_scaling():
    """Duplicating every agent k-fold while scaling λ by k leaves the
    converged center unchanged (the whole objective scales by k) — this
    fails under the r3 bug, which folded λ into each agent's x-update and
    thereby scaled the EFFECTIVE smoothness by the agent count."""
    from rust_robotics_tpu.control.admm import solve_horizon_consensus

    rng = np.random.default_rng(7)
    base = rng.normal(0.0, 0.5, (3, 10, 2)).astype(np.float32)
    dup = np.concatenate([base, base, base], axis=0)  # 3x each agent
    cfg = ADMMConfig(rho=1.0, iterations=400)
    z1, _ = solve_horizon_consensus(jnp.asarray(base), None,
                                    smooth_weight=30.0, cfg=cfg)
    z3, _ = solve_horizon_consensus(jnp.asarray(dup), None,
                                    smooth_weight=90.0, cfg=cfg)
    np.testing.assert_allclose(np.asarray(z1), np.asarray(z3), atol=5e-4)


def test_horizon_consensus_horizon_one_hard_anchor():
    """horizon == 1 with an anchor: the whole trajectory IS the anchor
    (the reference's m == 0 reduced-system case) — review finding."""
    from rust_robotics_tpu.control.admm import solve_horizon_consensus

    goals = jnp.asarray([[[3.0, -1.0]], [[5.0, 2.0]]])  # [A=2, H=1, d=2]
    anchor = jnp.asarray([0.5, 0.25])
    z, _ = solve_horizon_consensus(goals, anchor,
                                   cfg=ADMMConfig(iterations=50))
    np.testing.assert_allclose(np.asarray(z[0]), np.asarray(anchor),
                               atol=1e-7)
