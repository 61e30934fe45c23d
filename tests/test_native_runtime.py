"""Native C++ host runtime: parity with the pure-Python paths.

The native library (rust_robotics_tpu/native/host_runtime.cpp) mirrors the
reference's native host runtime — moving_ai.rs loader, g2o.rs text I/O,
gif_recorder.rs encoder. These tests pin native output == Python output on
real reference benchmark data, and validate the GIF byte stream by decoding
it with PIL (an independent decoder).
"""

import os

import numpy as np
import pytest

from rust_robotics_tpu import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="no C++ toolchain"
)

REF_MAPS = "/root/reference/crates/rust_robotics_planning/benchdata/moving_ai"

MAP_TEXT = """type octile
height 4
width 5
map
.....
..@..
.TT.G
SW..O
"""

G2O_TEXT = """VERTEX_SE2 0 0.0 0.0 0.0
VERTEX_SE2 1 1.0 0.5 0.1
EDGE_SE2 0 1 1.0 0.5 0.1 100 0 0 100 0 25
VERTEX_SE3:QUAT 7 1 2 3 0 0 0 1
EDGE_SE3:QUAT 7 7 0.1 0 0 0 0 0 1 1 0 0 0 0 0 2 0 0 0 0 3 0 0 0 4 0 0 5 0 6
"""


def _ref_map_path():
    p = os.path.join(REF_MAPS, "dao", "arena2.map")
    return p if os.path.exists(p) else None


def test_map_parse_matches_python():
    from rust_robotics_tpu.data import moving_ai

    for text in filter(None, [MAP_TEXT, _read(_ref_map_path())]):
        py = moving_ai._parse_map_py(text)
        nat = moving_ai.parse_map(text)
        assert (nat.width, nat.height) == (py.width, py.height)
        assert np.array_equal(nat.tiles, py.tiles)
        assert np.array_equal(nat.passable(), py.passable())


def _read(path):
    if path is None:
        return None
    with open(path) as f:
        return f.read()


def test_map_parse_rejects_garbage():
    with pytest.raises(ValueError):
        native.parse_map_native("type hex\nheight 1\nwidth 1\nmap\n.")
    with pytest.raises(ValueError):
        native.parse_map_native(
            "type octile\nheight 2\nwidth 2\nmap\n..\n.X\n"
        )
    with pytest.raises(ValueError):
        native.parse_map_native("type octile\nheight 3\nwidth 2\nmap\n..\n..\n")


def test_scen_parse_matches_python():
    from rust_robotics_tpu.data import moving_ai

    texts = ["version 1\n0\ta.map\t5\t4\t0\t0\t4\t0\t4.0\n"
             "1 a.map 5 4 1 1 3 3 2.828427\n"]
    ref = _ref_map_path()
    if ref is not None:
        texts.append(_read(ref + ".scen"))
    for text in texts:
        py = moving_ai._parse_scenarios_py(text)
        nat = moving_ai.parse_scenarios(text)
        assert nat == py


def test_g2o_parse_matches_python():
    from rust_robotics_tpu.slam import g2o as g2o_mod

    py = g2o_mod._parse_g2o_py(G2O_TEXT)
    nat = g2o_mod.parse_g2o(G2O_TEXT)
    assert sorted(nat.vertices_se2) == sorted(py.vertices_se2)
    for k in py.vertices_se2:
        np.testing.assert_array_equal(nat.vertices_se2[k], py.vertices_se2[k])
    assert len(nat.edges_se2) == len(py.edges_se2)
    for (af, at, am, ai), (bf, bt, bm, bi) in zip(nat.edges_se2, py.edges_se2):
        assert (af, at) == (bf, bt)
        np.testing.assert_array_equal(am, bm)
        np.testing.assert_array_equal(ai, bi)
    for k in py.vertices_se3:
        np.testing.assert_array_equal(nat.vertices_se3[k][0],
                                      py.vertices_se3[k][0])
        np.testing.assert_array_equal(nat.vertices_se3[k][1],
                                      py.vertices_se3[k][1])
    for a, b in zip(nat.edges_se3, py.edges_se3):
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_g2o_roundtrip_through_writer():
    from rust_robotics_tpu.slam.g2o import parse_g2o, write_g2o

    g = parse_g2o(G2O_TEXT)
    g2 = parse_g2o(write_g2o(g))
    np.testing.assert_allclose(g2.vertices_se2[1], g.vertices_se2[1])
    np.testing.assert_allclose(g2.edges_se3[0][4], g.edges_se3[0][4])


def test_g2o_bad_record_raises():
    with pytest.raises(ValueError):
        native.parse_g2o_native("EDGE_SE2 0 1 nope 0 0 1 0 0 1 0 1")


def test_gif_stream_decodes_bitexact(tmp_path):
    pil = pytest.importorskip("PIL.Image")
    rng = np.random.default_rng(0)
    frames = [
        rng.integers(0, 256, size=(24, 32, 3), dtype=np.uint8)
        for _ in range(3)
    ]
    path = str(tmp_path / "native.gif")
    w = native.NativeGifWriter(path, 32, 24)
    for fr in frames:
        w.add_frame(fr, delay_cs=7)
    assert w.close() == 3
    im = pil.open(path)
    assert im.n_frames == 3
    for i, fr in enumerate(frames):
        im.seek(i)
        decoded = np.asarray(im.convert("RGB"))
        np.testing.assert_array_equal(decoded, native.quantize_rgb_native(fr))
        assert im.info["duration"] == 70


def test_native_polyline_endpoints_and_bounds():
    rgb = np.full((20, 30, 3), 255, np.uint8)
    pts = np.array([[2, 2], [27, 2], [27, 17], [-5, 40]], np.int32)
    assert native.draw_polyline_native(rgb, pts, 1, (10, 20, 30))
    assert tuple(rgb[2, 2]) == (10, 20, 30)
    assert tuple(rgb[17, 27]) == (10, 20, 30)
    # out-of-bounds tail clipped, no crash, frame untouched elsewhere
    assert tuple(rgb[0, 29]) == (255, 255, 255)


def test_gif_recorder_uses_native_streaming(tmp_path):
    from rust_robotics_tpu.viz.raster import CanvasConfig, Frame, GifRecorder

    cfg = CanvasConfig(width=40, height=40)
    rec = GifRecorder(tmp_path / "rec.gif", cfg)
    assert rec._native is not None
    fr = Frame(cfg)
    fr.draw_points_xy([0.0], [0.0], (216, 84, 60), 4)
    rec.add_frame(fr)
    out = rec.finish()
    assert os.path.getsize(out) > 100
