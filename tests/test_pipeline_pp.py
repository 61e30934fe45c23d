"""Pipeline parallelism: GPipe schedule, systolic shard_map, windowed VIO.

VERDICT acceptance (§ PP): the overlapped schedule must produce output
identical to the sequential composition, demonstrated on the virtual mesh.
Mirrors vio_pipeline.rs:176's stage order as the sequential oracle.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from rust_robotics_tpu.parallel.pipeline import (
    Stage,
    pipeline_schedule,
    pipeline_shard_map,
    run_pipelined,
    run_sequential,
)


def test_schedule_is_diagonal_and_overlaps():
    sched = pipeline_schedule(num_windows=4, num_stages=3)
    assert len(sched) == 12
    ticks = [t for t, _, _ in sched]
    assert max(ticks) == 4 + 3 - 2  # W + S - 1 ticks total
    # overlap: some tick hosts two different stages on different windows
    by_tick = {}
    for t, s, w in sched:
        by_tick.setdefault(t, []).append((s, w))
    assert any(len(v) > 1 for v in by_tick.values())
    # dependency order: stage s of window w appears after stage s-1 of w
    pos = {(s, w): i for i, (t, s, w) in enumerate(sched)}
    for (s, w), i in pos.items():
        if s > 0:
            assert pos[(s - 1, w)] < i


def test_run_pipelined_matches_sequential_with_chain_stage():
    scale = Stage(lambda x: 2.0 * x)
    accum = Stage(lambda c, x: (c + jnp.sum(x), x + c), chain=True,
                  init_carry=jnp.zeros(()))
    square = Stage(lambda x: x * x)
    stages = [scale, accum, square]
    windows = [jnp.arange(3.0) + i for i in range(5)]

    record = []
    got = run_pipelined(stages, windows, record=record)
    want = run_sequential(stages, windows)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))
    assert record == pipeline_schedule(5, 3)


def test_pipeline_shard_map_equals_composition():
    devices = np.asarray(jax.devices()[:4]).reshape(4)
    mesh = Mesh(devices, ("pipe",))

    def stage_fn(stage, x):
        # heterogeneous per-stage math, homogeneous signature
        return x * (stage + 2) + stage

    xs = jnp.asarray(np.random.default_rng(0).normal(size=(6, 8)))
    got = pipeline_shard_map(stage_fn, xs, mesh)
    want = xs
    for s in range(4):
        want = want * (s + 2) + s
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-12)


@pytest.mark.slow
def test_pipeline_across_two_processes_fake_cluster():
    """Microbatches hop a real process boundary: 2 OS processes, one
    pipeline stage each, ppermute over gloo (multi-host PP form)."""
    import re
    import socket
    import subprocess
    import sys as _sys

    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    coord = f"127.0.0.1:{port}"
    procs = [
        subprocess.Popen(
            [_sys.executable, "-m",
             "rust_robotics_tpu.parallel.fake_cluster",
             coord, "2", str(pid), "pipeline"],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env={"PATH": "/usr/bin:/bin", "HOME": "/root",
                 "PYTHONPATH": ".", "JAX_PLATFORMS": "cpu"},
        )
        for pid in (0, 1)
    ]
    sums = []
    for p in procs:
        out, _ = p.communicate(timeout=420)
        assert p.returncode == 0, out
        m = re.search(r"FAKEPIPE proc=\d err=([0-9.e+-]+) sum=(-?[0-9.]+)",
                      out)
        assert m, out
        assert float(m.group(1)) < 1e-6, out
        sums.append(float(m.group(2)))
    assert sums[0] == sums[1]


@pytest.fixture(scope="module")
def euroc_fixture(tmp_path_factory):
    import importlib.util
    import os

    here = os.path.dirname(os.path.abspath(__file__))
    spec = importlib.util.spec_from_file_location(
        "fixture_gen", os.path.join(here, "fixture_gen.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    root = str(tmp_path_factory.mktemp("euroc_pp"))
    truth, landmarks, t_bs = mod.make_euroc_fixture(root)
    return root, truth


@pytest.mark.slow
def test_windowed_vio_pipelined_equals_sequential(euroc_fixture):
    from rust_robotics_tpu.data.euroc import EurocDataset
    from rust_robotics_tpu.slam.vio_pp import run_vio_pipeline_windowed

    root, truth = euroc_fixture
    ds = EurocDataset.load(root)
    tracks = ds.load_feature_tracks()

    seq = run_vio_pipeline_windowed(ds, tracks, window_frames=3,
                                    pipelined=False)
    pipe = run_vio_pipeline_windowed(ds, tracks, window_frames=3,
                                     pipelined=True)
    assert pipe.num_windows >= 3
    # identical output — the PP acceptance criterion
    np.testing.assert_array_equal(np.asarray(pipe.fused_poses),
                                  np.asarray(seq.fused_poses))
    np.testing.assert_array_equal(np.asarray(pipe.dead_reckoned),
                                  np.asarray(seq.dead_reckoned))
    # the pipelined run actually used the overlapped schedule
    assert pipe.schedule == pipeline_schedule(pipe.num_windows, 4)
    assert seq.schedule == []

    # sanity: fusion tracks ground truth on the synthetic sequence
    k = np.asarray(pipe.fused_poses).shape[0]
    cam_idx = truth["cam_idx"][:k]
    gt_pos = truth["pos"][cam_idx]
    err = np.sqrt(np.mean(np.sum(
        (np.asarray(pipe.fused_poses)[:, :3, 3] - gt_pos) ** 2, axis=-1)))
    dead_err = np.sqrt(np.mean(np.sum(
        (np.asarray(pipe.dead_reckoned)[:, :3, 3] - gt_pos) ** 2, axis=-1)))
    assert err < 0.6, (err, dead_err)
    assert err <= dead_err + 1e-9, (err, dead_err)
