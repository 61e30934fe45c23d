"""Gallery builder (Pages-gallery analog) + pure-NumPy embedded demo
analog (rust_robotics_embedded_demo/src/main.rs PASS gate)."""

import os
import sys

import pytest

from rust_robotics_tpu.demos.embedded_demo import Lcg, run_embedded_demo
from rust_robotics_tpu.demos.gallery import build_gallery


def test_embedded_demo_passes_reference_gate():
    """main.rs:144-147: final EKF position error < 0.5 m -> PASS."""
    report = run_embedded_demo()
    assert report["passed"]
    assert report["final_error"] < 0.1  # much tighter pinned golden
    # deterministic: bit-identical rerun
    again = run_embedded_demo()
    assert again["final_error"] == report["final_error"]


def test_embedded_demo_uses_no_jax():
    """The 'constrained target' constraint: the module must not import
    jax (the analog of the reference's no_std build gate)."""
    import rust_robotics_tpu.demos.embedded_demo as mod
    import ast

    tree = ast.parse(open(mod.__file__).read())
    for node in ast.walk(tree):
        if isinstance(node, ast.Import):
            assert not any(a.name.startswith("jax") for a in node.names)
        if isinstance(node, ast.ImportFrom):
            assert not (node.module or "").startswith("jax")


def test_lcg_matches_reference_constants():
    """main.rs:43-58 LCG constants: pinned first draws."""
    rng = Lcg(1)
    a = rng.next_u64()
    assert a == (6364136223846793005 + 1442695040888963407) % 2**64
    u = Lcg(1)
    u.next_u64()
    assert 0.0 <= u.next_f64() < 1.0


def test_gallery_builds_subset(tmp_path):
    names = ["render_svg_path_planning", "render_svg_dubins"]
    index = build_gallery(str(tmp_path), names=names)
    html = open(index).read()
    assert "render_svg_path_planning" in html
    assert os.path.exists(
        os.path.join(tmp_path, "media", "render_svg_path_planning.svg"))
    assert "FAILED" not in html


@pytest.mark.slow
def test_gallery_builds_all(tmp_path):
    index = build_gallery(str(tmp_path))
    html = open(index).read()
    assert "FAILED" not in html
    media = os.listdir(os.path.join(tmp_path, "media"))
    from rust_robotics_tpu.demos.render import RENDERS

    assert len(media) == len(RENDERS)
