"""Any-angle statistical suite across all 5 MovingAI families.

Mirrors the reference's experiments:
- tests/any_angle_movingai_comparison.rs / any_angle_statistical_test.rs:
  ≥160 `.scen` scenarios across dao/room/random/maze/street with a paired
  significance test on path quality (the README.md:402-409 headline).
- tests/any_angle_optimality_gap.rs: gap measurement against the exact
  visibility optimum on tractable sub-grids (the reference runs Anya on
  50×50 grids; here 96×96 windows cropped from the real family maps).
- Golden octile costs: the wavefront cost field must reproduce the `.scen`
  optimal lengths on all 5 maps (extends the round-1 arena2-only golden to
  every checked-in family).

Skipped when the reference benchdata is absent. Slow-marked: this sweeps
160 full-map scenarios + 10 certified windows.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rust_robotics_tpu.data.fixtures import reference_benchdata_root
from rust_robotics_tpu.data.moving_ai import load_map, load_scenarios
from rust_robotics_tpu.planning.any_angle import VisibilityPlanner
from rust_robotics_tpu.planning.smoothing import shortcut_path
from rust_robotics_tpu.planning.wavefront import (
    extract_path,
    goal_raster,
    wavefront_costs,
)
from rust_robotics_tpu.utils.experiments import sign_test_p_value

BASE = reference_benchdata_root()
needs_maps = pytest.mark.skipif(BASE is None, reason="reference benchdata absent")

FAMILIES = [
    ("dao", "arena2"),
    ("room", "8room_000"),
    ("random", "random512-10-0"),
    ("maze", "maze512-1-0"),
    ("street", "Berlin_0_512"),
]
BUCKETS = (10, 20, 30, 40)
PER_BUCKET = 8
MAX_PATH_CELLS = 224  # bucket 40 → optimal length < 164 ≤ cell count bound


def family_scenarios(fam, name):
    m = load_map(f"{BASE}/{fam}/{name}.map")
    scens = load_scenarios(f"{BASE}/{fam}/{name}.map.scen")
    grid = m.to_grid()
    free = grid.free()
    chosen = []
    for b in BUCKETS:
        chosen += [s for s in scens if s.bucket == b][:PER_BUCKET]
    starts, goals = [], []
    for s in chosen:
        sx, sy = m.planning_point(s.start_x, s.start_y)
        gx, gy = m.planning_point(s.goal_x, s.goal_y)
        starts.append(np.asarray(grid.world_to_index(jnp.array([sx, sy]))))
        goals.append(np.asarray(grid.world_to_index(jnp.array([gx, gy]))))
    return free, chosen, np.asarray(starts), np.asarray(goals)


def full_map_results():
    """(family → rows of (scen, grid_cost, shortcut_len)) over 160
    scenarios, with batched per-family wavefronts.

    max_iters is bounded by the bucket ceiling: a scenario of octile length
    L settles its start cell after ≤ ⌈L⌉+1 sweeps (every step costs ≥ 1),
    so full-map convergence (≈ map-diameter sweeps on 513² mazes, ~4-5×
    more) is never paid."""
    results = {}
    sweeps = int(4 * (max(BUCKETS) + 1)) + 64
    for fam, name in FAMILIES:
        free, chosen, starts, goals = family_scenarios(fam, name)
        b = len(chosen)
        costs = wavefront_costs(
            jnp.broadcast_to(free, (b,) + free.shape),
            goal_raster(free.shape, jnp.asarray(goals)),
            max_iters=sweeps,
        )
        rows = []
        for i, s in enumerate(chosen):
            grid_cost = float(costs[i, starts[i, 0], starts[i, 1]])
            idx, mask, _ = extract_path(
                costs[i], free, jnp.asarray(starts[i]),
                max_len=MAX_PATH_CELLS)
            pts = idx.astype(jnp.result_type(float)) + 0.5
            _, tot = shortcut_path(pts, mask, ~free, 0.0, 0.0, 1.0,
                                   samples=128)
            rows.append((s, grid_cost, float(tot)))
        results[fam] = rows
    return results


@pytest.mark.slow
@needs_maps
def test_scen_goldens_and_shortcut_statistics_across_families():
    """One pass over ≥160 `.scen` scenarios × 5 families (single test so
    the expensive batched wavefronts run exactly once under xdist):

    (a) golden parity — the min-plus wavefront reproduces the MovingAI
        octile optima on every checked-in family map (not just arena2);
    (b) README.md:402-409 analog — the any-angle shortcut never lengthens
        the grid path, wins with paired sign-test significance, and its
        mean improvement is in the any-angle range (~2-8%)."""
    results = full_map_results()

    total = 0
    for fam, rows in results.items():
        for s, grid_cost, _ in rows:
            assert grid_cost == pytest.approx(s.optimal_length, abs=1e-4), (
                fam, s)
            total += 1
    assert total >= 160

    wins = losses = total = 0
    improvements = []
    for fam, rows in results.items():
        for s, grid_cost, short in rows:
            total += 1
            assert short <= grid_cost + 1e-6, (fam, s)
            euclid = math.hypot(s.goal_x - s.start_x, s.goal_y - s.start_y)
            assert short >= euclid - 1e-5, (fam, s)
            if short < grid_cost - 1e-9:
                wins += 1
            elif short > grid_cost + 1e-9:
                losses += 1
            improvements.append((grid_cost - short) / grid_cost)
    assert total >= 160
    p = sign_test_p_value(wins, losses)
    assert p < 1e-6, (wins, losses, p)
    mean_impr = float(np.mean(improvements))
    assert 0.005 < mean_impr < 0.15, mean_impr


def crop_window(free, size=64, min_component=400):
    """A size×size window containing a big connected free component.

    Scans a few offsets; returns (window free raster, component mask) where
    the component is the connected region of the window's most-central free
    cell — scenario endpoints sampled from it are mutually reachable."""
    free_np = np.asarray(free)
    w, h = free_np.shape
    centers = [(0.5, 0.5), (0.35, 0.5), (0.65, 0.5), (0.5, 0.35),
               (0.5, 0.65), (0.3, 0.3), (0.7, 0.7)]
    for fx, fy in centers:
        x0 = min(max(int(fx * w) - size // 2, 0), w - size)
        y0 = min(max(int(fy * h) - size // 2, 0), h - size)
        win = jnp.asarray(free_np[x0:x0 + size, y0:y0 + size])
        cells = np.argwhere(np.asarray(win))
        if len(cells) < min_component:
            continue
        seed = cells[np.argmin(np.abs(cells - size // 2).sum(-1))]
        costs = wavefront_costs(win, goal_raster((size, size),
                                                 jnp.asarray(seed)),
                                max_iters=4 * size)
        comp = np.isfinite(np.asarray(costs))
        if comp.sum() >= min_component:
            return win, comp
    raise AssertionError("no connected window found")


@pytest.mark.slow
@needs_maps
def test_visibility_optimum_certified_on_windows_of_all_families():
    """The exact any-angle planner on 64×64 windows of each family map:
    batched min-plus lengths equal the independent host Dijkstra oracle to
    1e-9 (i.e. within +0.01% of the visibility optimum by construction),
    and the fast shortcut planner stays within a small gap of it."""
    rng = np.random.default_rng(42)
    gaps = []
    for fam, name in FAMILIES:
        m = load_map(f"{BASE}/{fam}/{name}.map")
        free, comp = crop_window(m.to_grid().free())
        vp = VisibilityPlanner(free)
        cells = np.argwhere(comp)  # mutually reachable component

        pairs = []
        tries = 0
        while len(pairs) < 8 and tries < 200:
            tries += 1
            s, g = cells[rng.integers(0, len(cells), 2)]
            if np.abs(s - g).max() < 20:
                continue
            pairs.append((s, g))
        starts = np.asarray([p[0] for p in pairs])
        goals = np.asarray([p[1] for p in pairs])

        opt = np.asarray(vp.lengths(jnp.asarray(starts), jnp.asarray(goals)))
        costs = wavefront_costs(
            jnp.broadcast_to(free, (len(pairs),) + free.shape),
            goal_raster(free.shape, jnp.asarray(goals)),
        )
        reachable = 0
        for i, (s, g) in enumerate(pairs):
            grid_cost = float(costs[i, s[0], s[1]])
            if math.isinf(grid_cost):
                assert math.isinf(opt[i]), (fam, i)
                continue
            reachable += 1
            idx, mask, _ = extract_path(costs[i], free, jnp.asarray(s),
                                        max_len=256)
            pts = idx.astype(jnp.result_type(float)) + 0.5
            _, tot = shortcut_path(pts, mask, ~free, 0.0, 0.0, 1.0,
                                   samples=192)
            short = float(tot)
            assert opt[i] <= short + 1e-6, (fam, i)
            assert opt[i] <= grid_cost + 1e-6, (fam, i)
            gaps.append((short - opt[i]) / opt[i])

        assert reachable >= 4, (fam, reachable)
        # certify the batched solve against the host Dijkstra oracle on the
        # first two reachable scenarios (+0.01% gate, met exactly)
        checked = 0
        for i, (s, g) in enumerate(pairs):
            if checked == 2 or not np.isfinite(opt[i]):
                continue
            path = vp.path(s, g)
            assert path is not None, (fam, i)
            oracle = float(np.sum(np.linalg.norm(np.diff(path, axis=0),
                                                 axis=-1)))
            assert opt[i] == pytest.approx(oracle, rel=1e-9, abs=1e-9), (
                fam, i)
            assert opt[i] <= oracle * 1.0001
            checked += 1
        assert checked == 2, fam

    # the fast planner's quality vs the certified optimum across families
    gaps = np.asarray(gaps)
    assert gaps.min() >= -1e-9
    assert float(np.mean(gaps)) < 0.03, gaps
    assert float(gaps.max()) < 0.12, gaps
