"""Locate the reference's checked-in mini dataset fixtures.

The reference pins tiny EuRoC/KITTI layouts under
crates/rust_robotics_slam/tests/fixtures/{euroc_mini,kitti_mini} and runs
its CI VIO replay against them (headless_euroc_vio.rs:18-20). When the
reference checkout is present (read-only, at REFERENCE_ROOT), tests and
demos replay those exact artifacts for true output parity; otherwise
callers fall back to the synthetic generators in tests/fixture_gen.py.
"""

from __future__ import annotations

import os

REFERENCE_ROOT = os.environ.get("RUST_ROBOTICS_REFERENCE", "/root/reference")

_FIXTURE_DIR = os.path.join(
    REFERENCE_ROOT, "crates", "rust_robotics_slam", "tests", "fixtures"
)


def reference_fixture_root(name: str):
    """Absolute path to the reference fixture `name` ('euroc_mini' or
    'kitti_mini'), or None when the reference checkout is unavailable."""
    path = os.path.join(_FIXTURE_DIR, name)
    return path if os.path.isdir(path) else None


def reference_benchdata_root():
    """Path to the reference's MovingAI benchmark maps
    (crates/rust_robotics_planning/benchdata/moving_ai), or None."""
    path = os.path.join(
        REFERENCE_ROOT, "crates", "rust_robotics_planning", "benchdata",
        "moving_ai",
    )
    return path if os.path.isdir(path) else None


def reference_testdata_root():
    """Path to the reference's planning golden CSVs
    (crates/rust_robotics_planning/src/testdata), or None."""
    path = os.path.join(
        REFERENCE_ROOT, "crates", "rust_robotics_planning", "src", "testdata"
    )
    return path if os.path.isdir(path) else None
