from rust_robotics_tpu.models.motion import (  # noqa: F401
    unicycle_jacobian,
    unicycle_propagate,
)
from rust_robotics_tpu.models.observation import (  # noqa: F401
    position_jacobian,
    position_observe,
    range_bearing_observe,
)
