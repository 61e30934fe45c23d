"""Aux subsystem tests: benchmark gate, experiments harness, controller
arena, orbax checkpointing."""

import jax.numpy as jnp
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
