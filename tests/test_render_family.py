"""Render family breadth: every reference render_* example has an analog
registered in `demos.render.RENDERS` (Cargo.toml:60-470: 15 render_*_svg +
7 render_gif_*), and each writes a non-trivial media file.

The heavier closed-loop renders are `slow`; a fast subset runs unmarked.
"""

import os

import pytest

from rust_robotics_tpu.demos.render import RENDERS

FAST = [
    "render_svg_dubins",
    "render_svg_safe_decode_nav",
    "render_svg_rigid_body_mip_planning",
    "render_svg_stl_cbs_multi_robot",
    "render_svg_kinodynamic_stl_cbs",
    "render_svg_hierarchical_mapf_replanning",
    "render_svg_traversal_risk_graph",
    "render_svg_branchout_multimodal_driving",
]
SLOW = sorted(set(RENDERS) - set(FAST))


def _run(name, tmp_path):
    ext = ".gif" if "gif" in name else ".svg"
    out = tmp_path / (name + ext)
    ret = RENDERS[name](str(out))
    if ret is None and not out.exists():
        pytest.skip(f"{name}: source data unavailable")
    assert out.exists(), name
    size = os.path.getsize(out)
    assert size > 200, (name, size)
    if ext == ".svg":
        head = out.read_bytes()[:100]
        assert b"<svg" in head
    else:
        assert out.read_bytes()[:3] == b"GIF"


def test_registry_covers_the_reference_render_family():
    gifs = [n for n in RENDERS if n.startswith("render_gif_")]
    svgs = [n for n in RENDERS if n.startswith("render_svg_")]
    assert len(gifs) >= 6  # reference ships 7 render_gif_* targets
    assert len(svgs) >= 15  # reference ships 15 render_*_svg targets


@pytest.mark.parametrize("name", FAST)
def test_fast_render_writes_media(name, tmp_path):
    _run(name, tmp_path)


@pytest.mark.slow
@pytest.mark.parametrize("name", SLOW)
def test_slow_render_writes_media(name, tmp_path):
    _run(name, tmp_path)
