from rust_robotics_tpu.data.moving_ai import (  # noqa: F401
    MovingAiMap,
    MovingAiScenario,
    load_map,
    load_scenarios,
)
