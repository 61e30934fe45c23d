"""Pipeline parallelism: GPipe-style microbatch schedules over devices.

Reference surface: the VIO pipeline's strictly sequential stage
composition (slam/src/vio_pipeline.rs:176 — preintegration → BA → state
refinement → pose-graph fusion, over keyframe windows :296-316). The
reference has no parallelism (SURVEY.md §1.2); §2.12's PP row calls for
microbatched keyframe-window pipelining across devices/hosts — new
architecture, built here.

Two mechanisms:

1. `run_pipelined` — host-orchestrated GPipe schedule for HETEROGENEOUS
   stages (each stage its own jitted program, pinned to its own device).
   The host issues work in diagonal tick order (window i enters stage s at
   tick i+s); because JAX dispatch is asynchronous, stage s of window i
   executes on device s while stage s-1 of window i+1 runs on device s-1 —
   real overlap with zero change to the math. Chain stages (carrying state
   across windows, e.g. pose-graph fusion) serialize only along their own
   stage row, exactly like a transformer pipeline's sequential dependency
   on the previous microbatch's optimizer state. Output is identical to
   the sequential composition by construction (same calls, same order per
   dependency chain) — tests assert bitwise equality.

2. `pipeline_shard_map` — a compiled systolic pipeline for HOMOGENEOUS
   stage signatures: S devices on a 'pipe' mesh axis, microbatches stream
   through `jax.lax.ppermute` ring shifts inside one `lax.scan`, the
   collective-based pattern that rides ICI on a real slice (one program,
   no host in the loop).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map


@dataclasses.dataclass(frozen=True)
class Stage:
    """One pipeline stage.

    fn: `fn(x) -> y` when chain=False; `fn(carry, x) -> (carry, y)` when
    chain=True (state threads across windows in order — the fusion stage).
    """

    fn: Callable
    chain: bool = False
    init_carry: Any = None


def pipeline_schedule(num_windows: int, num_stages: int):
    """[(tick, stage, window)] of the GPipe diagonal: window i runs stage s
    at tick i + s. Total ticks = W + S - 1 vs W·S sequential slots."""
    out = []
    for t in range(num_windows + num_stages - 1):
        for s in range(num_stages):
            w = t - s
            if 0 <= w < num_windows:
                out.append((t, s, w))
    return out


def run_pipelined(stages: Sequence[Stage], windows: List[Any],
                  devices: Optional[Sequence] = None,
                  record: Optional[list] = None):
    """Run every window through all stages on the GPipe schedule.

    devices: one per stage (defaults to jax.devices(), cycled). Inputs to
    stage s are device_put onto its device, so XLA executes each stage
    where its operands live; async dispatch overlaps the diagonal.
    `record` (if given) collects the issue order [(tick, stage, window)]
    for schedule introspection in tests.

    Returns the list of final-stage outputs per window (same values as the
    sequential loop `for w: for s: ...`).
    """
    n_w = len(windows)
    n_s = len(stages)
    if devices is None:
        devices = jax.devices()
    devices = [devices[s % len(devices)] for s in range(n_s)]

    vals = {0: list(windows)}  # stage-input buffers
    for s in range(1, n_s + 1):
        vals[s] = [None] * n_w
    carries = [st.init_carry for st in stages]

    for t, s, w in pipeline_schedule(n_w, n_s):
        x = windows[w] if s == 0 else vals[s][w]
        x = jax.device_put(x, devices[s])
        st = stages[s]
        if st.chain:
            carry = carries[s]
            if carry is not None:
                carry = jax.device_put(carry, devices[s])
            carries[s], y = st.fn(carry, x)
        else:
            y = st.fn(x)
        vals[s + 1][w] = y
        if record is not None:
            record.append((t, s, w))
    return vals[n_s]


def run_sequential(stages: Sequence[Stage], windows: List[Any]):
    """Plain window-major composition — the oracle the pipeline must match
    (vio_pipeline.rs's stage order)."""
    carries = [st.init_carry for st in stages]
    outs = []
    for w, x in enumerate(windows):
        for s, st in enumerate(stages):
            if st.chain:
                carries[s], x = st.fn(carries[s], x)
            else:
                x = st.fn(x)
        outs.append(x)
    return outs


# ---------------------------------------------------------------------------
# compiled systolic pipeline (shard_map + ppermute)
# ---------------------------------------------------------------------------

def pipeline_shard_map(stage_fn: Callable, xs, mesh: Mesh,
                       axis_name: str = "pipe"):
    """Stream microbatches through S devices with ring shifts.

    stage_fn(stage_index, x) -> y must be shape-preserving (homogeneous
    pipeline). xs [W, ...] microbatches enter at stage 0; outputs [W, ...]
    leave stage S-1 after S hops. One jitted program: a `lax.scan` over
    W + S - 1 ticks whose body does (inject → apply stage → ppermute right).
    Equals `stage_{S-1}(...stage_0(x))` per microbatch.
    """
    s = mesh.shape[axis_name]
    w = xs.shape[0]
    ticks = w + s - 1
    item_shape = xs.shape[1:]

    def local(xs_local):
        # xs_local [W, ...] replicated; each device knows its stage index
        stage = jax.lax.axis_index(axis_name)

        def tick(h, t):
            # device 0 injects window t (if valid); others use the carried h
            inject = jnp.where(t < w, t, 0)
            x0 = xs_local[inject]
            x = jnp.where(stage == 0, x0, h)
            y = stage_fn(stage, x)
            # pass right along the ring; what stage 0 receives is unused
            h_next = jax.lax.ppermute(
                y, axis_name, [(i, (i + 1) % s) for i in range(s)])
            # the last stage emits window t - (S-1) at tick t
            return h_next, y

        h0 = jnp.zeros(item_shape, xs.dtype)
        try:  # mark the carry as device-varying (jax >= 0.8 vma tracking)
            h0 = jax.lax.pvary(h0, (axis_name,))
        except AttributeError:
            pass
        _, ys = jax.lax.scan(tick, h0, jnp.arange(ticks))
        return ys[None]  # [1, ticks, ...] — per-device stack

    fn = shard_map(
        local, mesh=mesh,
        in_specs=P(),  # replicated input
        out_specs=P(axis_name),
    )
    ys = fn(xs)  # [S, ticks, ...] — row s = outputs of stage s per tick
    # window i leaves the last stage at tick i + S - 1
    return ys[s - 1, s - 1:s - 1 + w]
