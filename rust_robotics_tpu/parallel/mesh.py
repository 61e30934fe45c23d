"""Device mesh + sharding policies.

The reference has no parallelism of any kind (SURVEY.md §1.2) — this layer
is new TPU-first architecture, per SURVEY.md §2.12:

- `data` axis: batches of independent filters / planner queries / particle
  banks (the primary throughput axis for filter updates/s/chip).
- `model` axis: landmarks, Hessian blocks, map tiles (tensor-parallel state
  split; partial reductions combined with psum over ICI).

Collectives are inserted by XLA from NamedSharding annotations under jit
(GSPMD); `shard_map` is used where the collective must be explicit (e.g.
landmark-sharded likelihood psum). Multi-host: the same code runs under
`jax.distributed.initialize()` — mesh axes spanning hosts ride DCN, inner
axes ride ICI.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, data_axis: int | None = None,
              axis_names=("data", "model")):
    """Build a 2D ('data', 'model') mesh over the available devices.

    Single chip degrades to a (1, 1) mesh — annotations become no-ops, so
    the same jitted program runs anywhere.
    """
    devices = jax.devices()
    n = n_devices or len(devices)
    devices = np.asarray(devices[:n])
    if data_axis is None:
        # favor the data axis; model axis gets 2 when n is even and >= 4
        model = 2 if n % 2 == 0 and n >= 4 else 1
        data_axis = n // model
    model = n // data_axis
    assert data_axis * model == n, (data_axis, model, n)
    return Mesh(devices.reshape(data_axis, model), axis_names)


def shard_batch(mesh, tree, batch_dims=1):
    """Place a pytree with leading batch dim(s) on the `data` axis."""
    spec = P("data")
    return jax.device_put(tree, NamedSharding(mesh, spec))


def shard_landmarks(mesh, landmarks):
    """Place a landmark table [L, d] on the `model` axis."""
    return jax.device_put(landmarks, NamedSharding(mesh, P("model")))
