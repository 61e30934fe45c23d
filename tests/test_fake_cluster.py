"""Multi-process fake-cluster test (SURVEY §4 implication: multi-host tests
are new; run jax.distributed multi-process on one host as the fake
cluster). Spawns 2 OS processes, each owning one CPU device, joined by the
gloo collectives backend; the sharded training step's psum collectives
cross the process boundary."""

import re
import socket
import subprocess
import sys

import numpy as np
import pytest


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_training_step_agrees():
    port = _free_port()
    coord = f"127.0.0.1:{port}"
    procs = [
        subprocess.Popen(
            [sys.executable, "-m", "rust_robotics_tpu.parallel.fake_cluster",
             coord, "2", str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env={"PATH": "/usr/bin:/bin", "HOME": "/root",
                 "PYTHONPATH": ".",
                 "JAX_PLATFORMS": "cpu"},
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=420)
        outs.append(out)
        assert p.returncode == 0, out
    losses = []
    for out in outs:
        m = re.search(r"FAKECLUSTER proc=(\d) loss=(-?[0-9.]+)", out)
        assert m, out
        losses.append(float(m.group(2)))
    assert np.isfinite(losses).all()
    # the loss is a psum-reduced global scalar: both processes agree exactly
    assert losses[0] == losses[1]

    # single-process oracle on a 2-device virtual mesh
    oracle = subprocess.run(
        [sys.executable, "-c",
         "import jax; jax.config.update('jax_platforms','cpu');"
         "jax.config.update('jax_num_cpu_devices', 2);"
         "import numpy as np;"
         "from jax.sharding import Mesh, NamedSharding, PartitionSpec as P;"
         "from rust_robotics_tpu.train import make_training_step,"
         " synthesize_batch;"
         "mesh = Mesh(np.asarray(jax.devices()).reshape(2,1),"
         " ('data','model'));"
         "c,m,r,l,i0 = synthesize_batch(jax.random.PRNGKey(0), batch=8,"
         " steps=8, num_landmarks=16);"
         "put = lambda x, s: jax.device_put(x, NamedSharding(mesh, s));"
         "c,m,i0 = put(c,P('data')), put(m,P('data')), put(i0,P('data'));"
         "r = put(r, P('data',None,'model')); l = put(l, P('model'));"
         "init, step = make_training_step(mesh); p,o = init();"
         "loss=None\n"
         "for _ in range(2): p,o,loss = step(p,o,c,m,r,l,i0)\n"
         "print('ORACLE', float(loss))"],
        capture_output=True, text=True, timeout=420, cwd=".",
        env={"PATH": "/usr/bin:/bin", "HOME": "/root", "PYTHONPATH": "."},
    )
    assert oracle.returncode == 0, oracle.stdout + oracle.stderr
    oracle_loss = float(oracle.stdout.strip().split()[-1])
    np.testing.assert_allclose(losses[0], oracle_loss, rtol=1e-5)


@pytest.mark.slow
def test_two_process_spike_chain_solver_agrees():
    """The FLAGSHIP chain solve across a real process boundary: two
    jax.distributed gloo processes each host one mesh slot of the
    SPIKE-partitioned LM; both report the identical replicated cost and
    the single-device-class RMSE."""
    port = _free_port()
    coord = f"127.0.0.1:{port}"
    procs = [
        subprocess.Popen(
            [sys.executable, "-m", "rust_robotics_tpu.parallel.fake_cluster",
             coord, "2", str(pid), "spike"],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env={"PATH": "/usr/bin:/bin", "HOME": "/root",
                 "PYTHONPATH": ".",
                 "JAX_PLATFORMS": "cpu"},
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=420)
        outs.append(out)
        assert p.returncode == 0, out
    results = []
    for out in outs:
        m = re.search(
            r"FAKESPIKE proc=(\d) rmse=([0-9.e+-]+) cost=(-?[0-9.]+) "
            r"iters=(\d+)", out)
        assert m, out
        results.append((float(m.group(2)), float(m.group(3)),
                        int(m.group(4))))
    # replicated summary: both processes agree exactly
    assert results[0] == results[1]
    rmse_val, cost, iters = results[0]
    assert rmse_val < 5e-3, results
    assert iters >= 3
