"""Aux subsystem tests: benchmark gate, experiments harness, controller
arena, orbax checkpointing."""

import jax.numpy as jnp
import pytest
import numpy as np

from rust_robotics_tpu.control.arena import run_controller_arena
from rust_robotics_tpu.utils.bench_gate import compare_csv, write_csv
from rust_robotics_tpu.utils.checkpoint import (
    latest_step,
    load_checkpoint,
    save_checkpoint,
)
from rust_robotics_tpu.utils.experiments import (
    ExperimentSamplingPlan,
    VariantDescriptor,
    annotate_against_reference,
    run_experiment,
)


class TestBenchGate:
    BASE = "name,score,elapsed_ms\na,1.0,12.5\nb,2.0,90.1\n"

    def test_pass_identical_functional(self):
        gen = "name,score,elapsed_ms\na,1.0000000001,99.9\nb,2.0,1.2\n"
        assert compare_csv(self.BASE, gen) == []

    def test_fail_on_functional_drift(self):
        gen = "name,score,elapsed_ms\na,1.1,12.5\nb,2.0,90.1\n"
        problems = compare_csv(self.BASE, gen)
        assert len(problems) == 1 and "score" in problems[0]

    def test_fail_on_header_and_rows(self):
        assert compare_csv(self.BASE, "name,value\na,1\n")
        assert compare_csv(self.BASE, "name,score,elapsed_ms\na,1.0,12.5\n")

    def test_write_csv_roundtrip(self, tmp_path):
        p = write_csv(
            tmp_path / "x.csv", ["name", "v", "t_ms"], [["a", 1.23456789, 5.0]]
        )
        text = open(p).read()
        assert compare_csv(text, text) == []


def test_experiments_harness():
    variants = [
        VariantDescriptor("baseline"),
        VariantDescriptor("fast", parameters={"gain": 2.0}),
    ]
    plan = ExperimentSamplingPlan(seeds=[0, 1, 2], scenarios=["a", "b"])
    assert plan.total_runs == 6

    def run(v, seed, scenario):
        return seed + (1.0 if v.name == "fast" else 0.0)

    reports = run_experiment(
        variants, plan, run, {"mean": lambda xs: float(np.mean(xs))}
    )
    reports = annotate_against_reference(reports, "baseline")
    assert reports[1].summary["mean"] - reports[0].summary["mean"] == 1.0
    assert reports[1].reference_deltas["mean"] == 1.0
    assert reports[0].reference_deltas["mean"] == 0.0


def test_controller_arena_deterministic(tmp_path):
    results, (header, rows) = run_controller_arena(steps=300)
    assert set(results) == {"pure_pursuit", "stanley", "lqr_steer"}
    for m in results.values():
        assert m["cross_track_rmse"] < 1.0
        assert m["progress"] > 20.0
    # deterministic: second run produces gate-identical functional columns
    _, (h2, rows2) = run_controller_arena(steps=300)
    p1 = write_csv(tmp_path / "a.csv", header, rows)
    p2 = write_csv(tmp_path / "b.csv", h2, rows2)
    assert compare_csv(open(p1).read(), open(p2).read()) == []


def test_checkpoint_roundtrip(tmp_path):
    state = {
        "mean": jnp.arange(8.0),
        "cov": jnp.eye(3),
        "step": jnp.asarray(7),
    }
    save_checkpoint(tmp_path, 7, state)
    assert latest_step(tmp_path) == 7
    restored = load_checkpoint(tmp_path, 7, state)
    np.testing.assert_allclose(restored["mean"], state["mean"])
    np.testing.assert_allclose(restored["cov"], state["cov"])


class TestProfilingUtils:
    """utils/profiling.py: determinism + finiteness aux (SURVEY §5)."""

    def test_assert_deterministic_passes_for_pure_fn(self):
        from rust_robotics_tpu.utils.profiling import assert_deterministic
        import jax, jax.numpy as jnp

        f = jax.jit(lambda k: jax.random.normal(k, (8,)))
        out = assert_deterministic(f, jax.random.PRNGKey(0), runs=3)
        assert out.shape == (8,)

    def test_assert_deterministic_catches_impure_fn(self):
        from rust_robotics_tpu.utils.profiling import assert_deterministic
        import numpy as np, pytest

        state = {"n": 0}

        def impure():
            state["n"] += 1
            return np.full((3,), float(state["n"]))

        with pytest.raises(AssertionError):
            assert_deterministic(impure)

    def test_nan_guard(self):
        from rust_robotics_tpu.utils.profiling import (guard_finite,
                                                       nan_report)
        import jax.numpy as jnp, pytest

        good = {"a": jnp.ones(3), "b": jnp.zeros((2, 2))}
        assert nan_report(good) == {}
        assert guard_finite(good) is good
        bad = {"a": jnp.array([1.0, jnp.nan, jnp.inf])}
        rep = nan_report(bad)
        assert sum(rep.values()) == 2
        with pytest.raises(FloatingPointError):
            guard_finite(bad, "belief")

    def test_wall_time_ms_positive(self):
        from rust_robotics_tpu.utils.profiling import wall_time_ms
        import jax, jax.numpy as jnp

        f = jax.jit(lambda: jnp.ones((64, 64)) @ jnp.ones((64, 64)))
        assert wall_time_ms(f, runs=3) > 0.0


def test_dataflow_path_planning_graph():
    """demos/dataflow.py: the dora_path_planning_dataflow.yml graph runs
    deterministically; metrics agree with sink reports."""
    from rust_robotics_tpu.demos.dataflow import run_path_planning_dataflow

    reports, metrics = run_path_planning_dataflow(3)
    assert len(reports) == 3 and len(metrics) == 3
    for rep, met in zip(reports, metrics):
        assert rep["found"]
        assert met["waypoint_count"] == len(rep["waypoints"])
        assert met["euclidean_length"] == pytest.approx(rep["cost"],
                                                        rel=1e-5)
    # deterministic: a second run produces identical reports
    reports2, _ = run_path_planning_dataflow(3)
    assert reports == reports2


def test_dataflow_validates_wiring():
    from rust_robotics_tpu.demos.dataflow import (Dataflow, DataflowSpec,
                                                  NodeSpec)

    bad = DataflowSpec([NodeSpec("n", {"x": "ghost/out"}, [], lambda e: None)])
    with pytest.raises(ValueError):
        Dataflow(bad)
    undeclared = DataflowSpec([
        NodeSpec("n", {"tick": "timer/millis/100"}, [],
                 lambda e: {"oops": 1})])
    with pytest.raises(ValueError):
        Dataflow(undeclared).step()


def test_dataflow_ekf_node_converges():
    from rust_robotics_tpu.demos.dataflow import build_ekf_dataflow

    flow, est = build_ekf_dataflow()
    flow.run(40)
    assert len(est) == 40
    assert est[-1]["position_error"] < 0.5
