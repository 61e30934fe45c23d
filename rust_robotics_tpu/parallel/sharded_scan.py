"""Sequence-parallel scan matching with ring halo exchange (SP/CP).

SURVEY.md §2.12 SP/CP row: the reference processes scan sequences with
sequential per-scan loops (correlative_scan_matching.rs:55 pose-grid
search per scan; vio_pipeline.rs:296-316 keyframe windows; the slam_node
ICP loop ros2_nodes/slam_node/src/main.rs:592). The TPU-native form shards
the TIME axis of a long scan sequence across the mesh:

- Each device holds a contiguous chunk of C scans and matches its C
  consecutive pairs locally (batched vmapped ICP — all pairs in parallel).
- The pair that straddles a chunk boundary needs the FIRST scan of the
  next device: one `ppermute` ring shift sends each device's first scan to
  its left neighbor — the halo exchange. Communication is one scan per
  device per call, riding ICI.
- Relative poses compose into an absolute trajectory with an associative
  scan over the SE(2) group product (O(log T) depth, time-shardable) —
  the same parallel-prefix inversion the smoother uses
  (filters/smoother.py).

The sharded program is pinned against the unsharded vmap oracle (f64
round-off — only XLA reduction-order reassociation differs) in
tests/test_sharded_scan.py and dry-run as program #5 in
__graft_entry__.dryrun_multichip.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from rust_robotics_tpu.core.angles import normalize_angle
from rust_robotics_tpu.slam.scan_matching import robust_icp

try:
    from jax import shard_map as _shard_map
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map as _shard_map


def se2_compose(a, b):
    """Group product of SE(2) poses [..., 3] (x, y, yaw): a ∘ b."""
    c, s = jnp.cos(a[..., 2]), jnp.sin(a[..., 2])
    x = a[..., 0] + c * b[..., 0] - s * b[..., 1]
    y = a[..., 1] + s * b[..., 0] + c * b[..., 1]
    yaw = normalize_angle(a[..., 2] + b[..., 2])
    return jnp.stack([x, y, yaw], axis=-1)


def compose_trajectory(rel_poses):
    """Absolute poses from relative scan-to-scan poses via associative scan
    (SE(2) composition is a group product — parallel prefix applies).

    rel_poses [T, 3] -> absolute [T, 3] where absolute[t] = rel[0] ∘ ... ∘
    rel[t] (pose of scan t+1 in the frame of scan 0)."""
    return jax.lax.associative_scan(se2_compose, rel_poses)


def _pair_icp(prev_scan, cur_scan, iterations):
    # init pose derived from the scan data (0·x == 0 for finite scans) so
    # the fori_loop carry is device-varying under shard_map (VMA check)
    init = jnp.zeros((3,), cur_scan.dtype) + 0.0 * cur_scan[0, 0]
    pose, err = robust_icp(prev_scan, cur_scan, init_pose=init,
                           iterations=iterations)
    return pose


def scan_odometry_serial(scans, iterations: int = 20):
    """Unsharded oracle: match all T-1 consecutive scan pairs (batched) and
    compose. scans [T, M, 2] -> (rel [T-1, 3], absolute [T-1, 3])."""
    rel = jax.vmap(functools.partial(_pair_icp, iterations=iterations))(
        scans[:-1], scans[1:])
    return rel, compose_trajectory(rel)


def make_sharded_scan_odometry(mesh: Mesh, axis: str = "data",
                               iterations: int = 20):
    """Build the jitted sequence-sharded scan-odometry step.

    Returns fn(scans [T, M, 2]) -> (rel [T-1, 3], absolute [T-1, 3]) with
    the time axis sharded over `axis`. T must be divisible by the axis
    size (pad upstream). The boundary pair of each chunk is served by a
    one-scan ppermute halo from the right neighbor (ring)."""
    n = mesh.shape[axis]
    perm = [(i, (i - 1) % n) for i in range(n)]  # send left = receive from right

    def local(scans_local):
        # scans_local [C, M, 2] — this device's chunk
        halo = jax.lax.ppermute(scans_local[:1], axis, perm)
        ext = jnp.concatenate([scans_local, halo], axis=0)  # [C+1, M, 2]
        rel = jax.vmap(functools.partial(_pair_icp, iterations=iterations))(
            ext[:-1], ext[1:])  # [C, 3]
        return rel

    smap = _shard_map(local, mesh=mesh, in_specs=P(axis),
                      out_specs=P(axis))

    @jax.jit
    def run(scans):
        t = scans.shape[0]
        rel_all = smap(scans)  # [T, 3]; entry T-1 wraps around the ring
        rel = rel_all[: t - 1]
        return rel, compose_trajectory(rel)

    return run


def shard_scans(mesh: Mesh, scans, axis: str = "data"):
    """Place a [T, M, 2] scan stack time-sharded on the mesh."""
    return jax.device_put(scans, NamedSharding(mesh, P(axis)))
