from rust_robotics_tpu.core import angles, lie, types  # noqa: F401
from rust_robotics_tpu.core.angles import normalize_angle  # noqa: F401
from rust_robotics_tpu.core.types import (  # noqa: F401
    GaussianBelief,
    GridSpec2D,
    Path2D,
    Pose2D,
    State2D,
)
