from rust_robotics_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    shard_batch,
    shard_landmarks,
)
from rust_robotics_tpu.parallel.pipeline import (  # noqa: F401
    Stage,
    pipeline_schedule,
    pipeline_shard_map,
    run_pipelined,
    run_sequential,
)
