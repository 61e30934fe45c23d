from rust_robotics_tpu.viz.raster import (  # noqa: F401
    CanvasConfig,
    Frame,
    GifRecorder,
)
