"""Planner-vs-planner and filter-vs-filter statistical comparison suites.

Mirrors the reference's integration/comparison test layer (SURVEY.md §4.2,
crates/*/tests/): any_angle_statistical_test.rs (paired significance on
MovingAI scenarios — the README.md:407 p=0.025 machinery),
any_angle_optimality_gap.rs (gap vs a visibility-graph optimum, the Anya
baseline), rrt_star_convergence_comparison.rs, coverage_planner_
comparison.rs, flowfield_multiagent_comparison.rs,
grid_threshold_planner_comparison.rs (threshold-floor hunting), and
localization's unified_filter_comparison.rs / ckf_vs_ukf_broad_
comparison.rs.

The TPU inversion carries into the tests: scenario batches run as one
vmapped program (seeds are a batch axis, not a for-loop), and the
statistics are computed over device-resident result tensors.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rust_robotics_tpu.planning.wavefront import (
    extract_path,
    goal_raster,
    wavefront_costs,
)
from rust_robotics_tpu.planning.smoothing import shortcut_path
from rust_robotics_tpu.planning.incremental import ida_star_costs
from rust_robotics_tpu.planning.fields import (
    boustrophedon_sweep,
    descend_field,
    flow_field,
)
from rust_robotics_tpu.planning.coverage import (
    coverage_metrics,
    spiral_coverage,
    wavefront_cpp,
)
from rust_robotics_tpu.planning.rrt import RRTConfig, rrt_plan
from rust_robotics_tpu.data.moving_ai import load_map, load_scenarios
from rust_robotics_tpu.utils.experiments import sign_test_p_value

REF = "/root/reference/crates/rust_robotics_planning/benchdata/moving_ai"


def _smoothed_length(free, costs, start_idx, path_len=256):
    """Grid path → optimal LOS shortcut length (A*+optimize_path)."""
    idx, mask, _ = extract_path(costs, free, start_idx, max_len=path_len)
    pts = idx.astype(jnp.result_type(float)) + 0.5
    _, total = shortcut_path(pts, mask, ~free, 0.0, 0.0, 1.0, samples=96)
    return float(total)


@pytest.mark.slow
class TestAnyAngleStatistical:
    """any_angle_statistical_test.rs analog on a checked-in MovingAI map:
    the optimal LOS shortcut must never lengthen the grid path, and must
    shorten it with paired-sign-test significance."""

    def _scenario_results(self, n=14):
        m = load_map(f"{REF}/dao/arena2.map")
        scens = load_scenarios(f"{REF}/dao/arena2.map.scen")
        grid = m.to_grid()
        free = grid.free()
        rows = []
        chosen = [s for s in scens if s.optimal_length > 8.0]
        chosen = chosen[:: max(1, len(chosen) // n)][:n]
        for sc in chosen:
            sx, sy = m.planning_point(sc.start_x, sc.start_y)
            gx, gy = m.planning_point(sc.goal_x, sc.goal_y)
            s_idx = grid.world_to_index(jnp.array([sx, sy]))
            g_idx = grid.world_to_index(jnp.array([gx, gy]))
            costs = wavefront_costs(free, goal_raster(free.shape, g_idx))
            grid_cost = float(costs[int(s_idx[0]), int(s_idx[1])])
            smooth = _smoothed_length(free, costs, s_idx)
            euclid = float(jnp.linalg.norm(
                (s_idx - g_idx).astype(jnp.result_type(float))))
            rows.append((grid_cost, smooth, euclid))
        return rows

    def test_shortcut_never_longer_and_significantly_shorter(self):
        rows = self._scenario_results()
        assert len(rows) >= 10
        wins = losses = 0
        for grid_cost, smooth, euclid in rows:
            # optimality sandwich: euclid lower bound <= smooth <= grid
            assert smooth <= grid_cost + 1e-6
            assert smooth >= euclid - 1e-6
            if smooth < grid_cost - 1e-9:
                wins += 1
            elif smooth > grid_cost + 1e-9:
                losses += 1
        p = sign_test_p_value(wins, losses)
        # the reference's claim is p=0.025 on 160 scenarios; on ≥10 the
        # shortcut should win essentially always
        assert p < 0.05, (wins, losses, p)

    def test_mean_improvement_bounded(self):
        rows = self._scenario_results()
        rel = [(g - s) / g for g, s, _ in rows]
        # any-angle shortening on octile grids is small but positive
        assert 0.0 < float(np.mean(rel)) < 0.15


@pytest.mark.slow
def test_any_angle_optimality_gap_vs_visibility_optimum():
    """any_angle_optimality_gap.rs analog: compare the A*+shortcut length
    against the exact any-angle optimum computed on a full visibility
    graph over free-cell centers (the Anya optimality baseline,
    anya.rs:463 uses the same visibility-Dijkstra construction)."""
    rng = np.random.default_rng(7)
    gaps = []
    for trial in range(3):
        w = h = 14
        blocked = np.zeros((w, h), bool)
        for _ in range(5):  # random rectangular obstacles
            x0, y0 = rng.integers(2, w - 4, 2)
            dw, dh = rng.integers(1, 4, 2)
            blocked[x0:x0 + dw, y0:y0 + dh] = True
        blocked[0, :] = blocked[-1, :] = False
        free = jnp.asarray(~blocked)

        # exact optimum: Floyd-Warshall over LOS edges between cell centers
        centers = np.stack(np.meshgrid(np.arange(w), np.arange(h),
                                       indexing="ij"), -1).reshape(-1, 2) + 0.5
        free_flat = (~blocked).reshape(-1)
        from rust_robotics_tpu.planning.smoothing import line_of_sight_free
        p = jnp.asarray(centers, jnp.result_type(float))
        los = np.asarray(jax.vmap(
            lambda a: line_of_sight_free(
                jnp.broadcast_to(a, p.shape), p, jnp.asarray(blocked),
                0.0, 0.0, 1.0, samples=96)
        )(p))
        d = np.linalg.norm(centers[:, None] - centers[None, :], axis=-1)
        adj = np.where(los & free_flat[:, None] & free_flat[None, :],
                       d, np.inf)
        np.fill_diagonal(adj, 0.0)
        # min-plus closure by squaring (log2(n) rounds)
        dist = adj
        for _ in range(int(np.ceil(np.log2(w * h)))):
            dist = np.minimum(dist, (dist[:, :, None]
                                     + dist[None, :, :]).min(axis=1))

        start = (0, 0)
        goal = (w - 1, h - 1)
        si = start[0] * h + start[1]
        gi = goal[0] * h + goal[1]
        opt = dist[si, gi]
        assert np.isfinite(opt)

        costs = wavefront_costs(free, goal_raster((w, h),
                                                  jnp.array(goal)))
        smooth = _smoothed_length(free, costs, jnp.array(start),
                                  path_len=128)
        gaps.append(smooth / opt - 1.0)
    gaps = np.asarray(gaps)
    assert np.all(gaps >= -1e-6)          # never beats the true optimum
    assert float(np.median(gaps)) < 0.02  # reference reports +0.27%
    assert float(gaps.max()) < 0.06


@pytest.mark.slow
def test_rrt_star_convergence_comparison():
    """rrt_star_convergence_comparison.rs analog: over a seed batch, RRT*
    median solution cost is no worse than RRT's, and RRT* improves (weakly)
    with a larger node budget."""
    obstacles = jnp.array([[5.0, 5.0], [4.0, 7.0], [7.0, 4.0]])
    radii = jnp.array([1.2, 1.0, 1.0])
    start = jnp.array([0.0, 0.0])
    goal = jnp.array([10.0, 10.0])
    keys = jax.random.split(jax.random.PRNGKey(0), 8)

    def best_cost(key, star, nodes):
        cfg = RRTConfig(max_nodes=nodes, expand_dis=0.8,
                        connect_radius=2.0, goal_threshold=0.8)
        _, _, cost = rrt_plan(key, start, goal, obstacles, radii, cfg,
                              star=star)
        return cost

    rrt_small = jax.vmap(lambda k: best_cost(k, False, 256))(keys)
    star_small = jax.vmap(lambda k: best_cost(k, True, 256))(keys)
    star_large = jax.vmap(lambda k: best_cost(k, True, 512))(keys)

    rrt_med = float(jnp.median(rrt_small))
    star_med = float(jnp.median(star_small))
    large_med = float(jnp.median(star_large))
    straight = float(jnp.linalg.norm(goal - start))
    assert np.isfinite(rrt_med) and np.isfinite(star_med)
    assert star_med <= rrt_med + 1e-6
    assert large_med <= star_med + 0.25   # anytime: more samples no worse
    assert star_med >= straight - 1e-6    # sanity lower bound


@pytest.mark.slow
def test_coverage_planner_comparison():
    """coverage_planner_comparison.rs analog: boustrophedon / spiral /
    wavefront-CPP compared on one workspace by coverage ratio and
    revisit overhead."""
    blocked = np.zeros((12, 12), bool)
    blocked[4:7, 4:7] = True
    free = jnp.asarray(~blocked)

    cells, mask = boustrophedon_sweep(free)
    bous = np.asarray(cells)[np.asarray(mask)]
    m_bous = coverage_metrics(bous, blocked)

    spiral = spiral_coverage(blocked, (0, 0))
    m_spiral = coverage_metrics(spiral, blocked)

    path, covered = wavefront_cpp(blocked, (0, 0), (11, 11))
    m_wave = coverage_metrics(path, blocked)

    # boustrophedon enumerates every free cell exactly once
    assert m_bous["coverage_ratio"] == 1.0 and m_bous["revisits"] == 0
    # wavefront CPP covers (almost) everything, allowing backtrack revisits
    assert m_wave["coverage_ratio"] >= 0.95
    # plain spiral gets stuck in corners — strictly weaker coverage than
    # the tree-based planners (the comparison's reported ordering)
    assert m_spiral["coverage_ratio"] <= m_wave["coverage_ratio"]
    assert m_spiral["coverage_ratio"] >= 0.3


@pytest.mark.slow
def test_flowfield_multiagent_comparison():
    """flowfield_multiagent_comparison.rs analog: ONE shared integration
    field serves many agents; each greedy descent reaches the goal with
    near-per-agent-optimal cost."""
    blocked = np.zeros((16, 16), bool)
    blocked[6:10, 3:13] = True
    free = jnp.asarray(~blocked)
    goal = jnp.array([15, 15])
    field = flow_field(free, goal_raster((16, 16), goal))

    starts = [(0, 0), (0, 15), (3, 8), (15, 0), (12, 2), (0, 8)]
    for s in starts:
        idx, mask, cost = descend_field(field, free, jnp.array(s),
                                        max_len=128)
        pts = np.asarray(idx)[np.asarray(mask)]
        assert tuple(pts[-1]) == (15, 15), s
        # descent follows the field's own steepest direction — its length
        # equals the field value at the start (shared-field optimality)
        assert float(cost) == pytest.approx(float(field[s]), abs=1e-6)


@pytest.mark.slow
def test_grid_threshold_floor_hunting():
    """grid_threshold_planner_comparison.rs analog: IDA*'s final threshold
    equals the true optimal cost (the threshold floor), deepening count is
    bounded, and the fringe variant agrees."""
    blocked = np.zeros((20, 20), bool)
    blocked[10, 2:18] = True
    free = jnp.asarray(~blocked)
    start = jnp.array([0, 10])
    goal = jnp.array([19, 10])
    opt = float(wavefront_costs(free, goal_raster((20, 20), goal))[0, 10])

    g, cost, stats = ida_star_costs(free, start, goal)
    assert float(cost) == pytest.approx(opt, abs=1e-6)
    assert float(stats["final_threshold"]) == pytest.approx(opt, abs=1e-6)
    assert 1 <= int(stats["deepenings"]) <= 64
    assert int(stats["expanded_cells"]) <= 400

    from rust_robotics_tpu.planning.incremental import fringe_search_costs
    _, cost_f, stats_f = fringe_search_costs(free, start, goal)
    assert float(cost_f) == pytest.approx(opt, abs=1e-6)


@pytest.mark.slow
def test_unified_filter_broad_comparison():
    """unified_filter_comparison.rs + ckf_vs_ukf_broad_comparison.rs
    analog: UKF and CKF RMSE distributions agree across scenario families
    (the broad-comparison claim: neither dominates by a wide margin)."""
    from rust_robotics_tpu.experiments.ukf_ckf_accuracy import (
        SCENARIO_FAMILIES, simulate_family_rmse)

    key = jax.random.PRNGKey(42)
    fams = ["nominal", "aggressive_yaw", "noisy_obs", "outliers"]
    for name in fams:
        ukf_rmse, ckf_rmse = simulate_family_rmse(
            key, SCENARIO_FAMILIES[name], steps=80, n_scenarios=16)
        ukf_med = float(jnp.median(ukf_rmse))
        ckf_med = float(jnp.median(ckf_rmse))
        assert np.isfinite(ukf_med) and np.isfinite(ckf_med), name
        assert 0.0 < ukf_med < 5.0 and 0.0 < ckf_med < 5.0, name
        ratio = ukf_med / ckf_med
        assert 0.5 < ratio < 2.0, (name, ratio)
