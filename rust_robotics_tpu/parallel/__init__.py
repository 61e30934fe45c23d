from rust_robotics_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    shard_batch,
    shard_landmarks,
)
