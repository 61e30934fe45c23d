"""Profiling, determinism, and NaN-guard utilities.

Reference posture (SURVEY.md §5): the reference has no tracing framework —
wall-clock via `std::time::Instant` in benchmark examples
(crates/rust_robotics/examples/speed_comparison.rs:8,:46), Criterion
micro-benchmarks, per-query search-statistics structs (`AStarSearchStats`
a_star.rs:98, `SolverSummary` optimization/solver.rs:69), finiteness
validation at every API boundary (ekf.rs:318-:355), and determinism by
construction (single-threaded, seeded StdRng). The TPU-native analogs:

- `trace(dir)` — JAX profiler trace context (xprof-compatible; open with
  tensorboard or xprof) for real kernel-level timing instead of Instant.
- `wall_time_ms(fn)` — marginal dependency-chained wall clock with forced
  readback, the Instant analog that is honest under async dispatch.
- `assert_deterministic(fn, *args)` — bitwise-reproducibility check: runs
  the function twice and asserts every output leaf is bit-identical (the
  reference's seeded-StdRng guarantee, which on TPU must be *checked*
  because reductions can be scheduled nondeterministically off-path).
- `nan_report(tree)` / `guard_finite(tree)` — the finiteness validation
  boundary (ekf.rs:318 validates inputs; here whole pytrees at once).
"""

from __future__ import annotations

import contextlib
import time
from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["trace", "wall_time_ms", "assert_deterministic", "nan_report",
           "guard_finite"]


@contextlib.contextmanager
def trace(log_dir: str):
    """JAX profiler trace scope — kernel-level timing on the device
    (view in xprof/tensorboard). Usage:

        with trace("/tmp/trace"):
            out = step(x)
            jax.block_until_ready(out)
    """
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def wall_time_ms(fn: Callable[[], Any], runs: int = 10,
                 warmup: int = 1) -> float:
    """Marginal per-call wall-clock ms with forced readback — compile and
    first-dispatch latency excluded (the measurement discipline of
    bench.py)."""
    for _ in range(warmup):
        jax.block_until_ready(fn())
    t0 = time.perf_counter()
    for _ in range(runs):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) * 1000.0 / runs


def assert_deterministic(fn: Callable[..., Any], *args,
                         runs: int = 2) -> Any:
    """Run `fn(*args)` `runs` times and assert every output array is
    BITWISE identical across runs. Returns the first output."""
    first = jax.tree_util.tree_map(np.asarray, fn(*args))
    flat0, treedef = jax.tree_util.tree_flatten(first)
    for r in range(1, runs):
        again = jax.tree_util.tree_map(np.asarray, fn(*args))
        flat, treedef2 = jax.tree_util.tree_flatten(again)
        if treedef2 != treedef:
            raise AssertionError(
                f"run {r}: output structure changed: {treedef2} vs {treedef}")
        for i, (a, b) in enumerate(zip(flat0, flat)):
            if a.dtype != b.dtype or a.shape != b.shape or not np.array_equal(
                    a.view(np.uint8) if a.dtype.kind == "f" else a,
                    b.view(np.uint8) if b.dtype.kind == "f" else b):
                raise AssertionError(
                    f"run {r}: leaf {i} not bitwise reproducible "
                    f"(dtype {a.dtype}, shape {a.shape})")
    return first


def nan_report(tree: Any) -> Dict[str, int]:
    """Count non-finite entries per leaf path; empty dict == all finite."""
    report: Dict[str, int] = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        arr = np.asarray(leaf)
        if arr.dtype.kind == "f":
            bad = int((~np.isfinite(arr)).sum())
            if bad:
                report[jax.tree_util.keystr(path)] = bad
    return report


def guard_finite(tree: Any, name: str = "value") -> Any:
    """Raise FloatingPointError when any leaf holds NaN/Inf (the
    reference's boundary validation, ekf.rs:318-:355); returns `tree`."""
    report = nan_report(tree)
    if report:
        raise FloatingPointError(f"{name} contains non-finite values: "
                                 f"{report}")
    return tree
