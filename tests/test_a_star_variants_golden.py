"""Golden parity for the PythonRobotics A* variants.

Consumes the reference's pinned golden CSVs
(crates/rust_robotics_planning/src/testdata/a_star_variants_*_python.csv,
the fixtures of a_star_variants.rs tests :905-:949) and asserts our
planner reproduces every waypoint to 1e-12 on the same PythonRobotics
maze. Skipped when the reference checkout is absent.
"""

import math
import os

import numpy as np
import pytest

from rust_robotics_tpu.data.fixtures import reference_testdata_root
from rust_robotics_tpu.planning.a_star_variants import (
    AStarVariantConfig,
    AStarVariantPlanner,
    path_length,
)

TESTDATA = reference_testdata_root()
needs_goldens = pytest.mark.skipif(
    TESTDATA is None, reason="reference testdata absent"
)


def build_pythonrobotics_maze():
    """The 50×50 wall maze of a_star_variants.rs tests (:835-:860)."""
    ox, oy = [], []

    def vline(x0, y0, length):
        for x in range(x0, x0 + 2):
            for y in range(y0, y0 + length):
                ox.append(float(x))
                oy.append(float(y))

    def hline(x0, y0, length):
        for x in range(x0, x0 + length):
            for y in range(y0, y0 + 2):
                ox.append(float(x))
                oy.append(float(y))

    vline(0, 0, 50)
    vline(48, 0, 50)
    hline(0, 0, 50)
    hline(0, 48, 50)
    for x, y, ln in zip(
        [10, 10, 10, 15, 20, 20, 30, 30, 35, 30, 40, 45],
        [10, 30, 45, 20, 5, 40, 10, 40, 5, 40, 10, 25],
        [10, 10, 5, 10, 10, 5, 20, 10, 25, 10, 35, 15],
    ):
        vline(x, y, ln)
    for x, y, ln in zip(
        [35, 40, 15, 10, 45, 20, 10, 15, 25, 45, 10, 30, 10, 40],
        [5, 10, 15, 20, 20, 25, 30, 35, 35, 35, 40, 40, 45, 45],
        [10, 5, 10, 10, 5, 5, 10, 5, 10, 5, 10, 5, 5, 5],
    ):
        hline(x, y, ln)
    return ox, oy


@pytest.fixture(scope="module")
def maze():
    return build_pythonrobotics_maze()


def load_golden(name):
    rows = np.loadtxt(
        os.path.join(TESTDATA, f"a_star_variants_{name}_python.csv"),
        delimiter=",", skiprows=1, ndmin=2,
    )
    return rows


GOLDEN_MODES = [
    ("beam", "beam"),
    ("iterative_deepening", "iterative"),
    ("dynamic_weighting", "dynamic"),
    ("theta_star_like", "theta"),
    ("jump_point_corners", "jump"),
]


@needs_goldens
@pytest.mark.parametrize("mode,csv_name", GOLDEN_MODES)
def test_variant_matches_pythonrobotics_golden(maze, mode, csv_name):
    ox, oy = maze
    planner = AStarVariantPlanner(ox, oy, AStarVariantConfig(mode=mode))
    path = planner.plan(5.0, 5.0, 35.0, 45.0)
    golden = load_golden(csv_name)
    assert path.shape == golden.shape, (mode, path.shape, golden.shape)
    np.testing.assert_allclose(path, golden, atol=1e-12)


def test_standard_mode_finds_path(maze):
    ox, oy = maze
    planner = AStarVariantPlanner(ox, oy, AStarVariantConfig(mode="standard"))
    path = planner.plan(5.0, 5.0, 35.0, 45.0)
    np.testing.assert_allclose(path[0], [5.0, 5.0])
    np.testing.assert_allclose(path[-1], [35.0, 45.0])
    # consecutive waypoints are 8-connected single steps
    steps = np.abs(np.diff(path, axis=0))
    assert steps.max() <= 1.0


@needs_goldens
def test_standard_beats_or_matches_suboptimal_variants(maze):
    """The suboptimal variants (beam/dynamic) trade quality for speed; the
    standard mode's path must be no longer than theirs."""
    ox, oy = maze
    std = AStarVariantPlanner(ox, oy, AStarVariantConfig(mode="standard"))
    base = path_length(std.plan(5.0, 5.0, 35.0, 45.0))
    for name in ("beam", "dynamic"):
        golden = load_golden(name)
        assert base <= path_length(golden) + 1e-9, name


def test_config_validation_rejects_bad_values(maze):
    ox, oy = maze
    with pytest.raises(ValueError):
        AStarVariantPlanner(ox, oy, AStarVariantConfig(beam_capacity=0))
    with pytest.raises(ValueError):
        AStarVariantPlanner(ox, oy, AStarVariantConfig(resolution=-1.0))
    with pytest.raises(ValueError):
        AStarVariantPlanner(ox, oy, AStarVariantConfig(max_theta=0))
    with pytest.raises(ValueError):
        AStarVariantPlanner(ox, oy, AStarVariantConfig(mode="nope"))
    planner = AStarVariantPlanner(ox, oy, AStarVariantConfig())
    with pytest.raises(ValueError):
        planner.plan(0.0, 0.0, 35.0, 45.0)  # start on the boundary wall
