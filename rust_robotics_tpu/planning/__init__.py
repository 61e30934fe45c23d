from rust_robotics_tpu.planning.grid import (  # noqa: F401
    GridMap,
    grid_from_obstacle_points,
    grid_from_raster,
)
from rust_robotics_tpu.planning.wavefront import (  # noqa: F401
    extract_path,
    goal_raster,
    plan_grid,
    wavefront_costs,
)
