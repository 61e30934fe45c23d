"""rust_robotics_tpu — a TPU-native differentiable robotics engine.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the
rust_robotics reference (PythonRobotics-style algorithm suite): batched
Kalman-family localizers, sampling filters (PF/MCL/FastSLAM), grid mapping
and planners (wavefront Dijkstra/A*, DWA, RRT*), controllers (PID → MPPI),
and a factor-graph nonlinear-least-squares engine (ICP, pose graphs, bundle
adjustment, IMU preintegration, VIO).

Design (see SURVEY.md §7): stateless pure functions over batched pytrees,
fixed-capacity padded arrays with masks, `lax.scan`/`while_loop` control
flow, `jax.sharding.Mesh` + shard_map for multi-chip scale, and Pallas
kernels for the hot inner ops.
"""

__version__ = "0.1.0"

from rust_robotics_tpu.core import lie, types  # noqa: F401
