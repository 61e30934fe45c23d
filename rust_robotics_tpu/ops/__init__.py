from rust_robotics_tpu.ops.smallmat import (  # noqa: F401
    cholesky_small,
    det_small,
    inv_spd_small,
    solve_spd_small,
)
from rust_robotics_tpu.ops.resample_pallas import (  # noqa: F401
    resample_reference,
    systematic_resample_gather,
)
from rust_robotics_tpu.ops.cholesky_pallas import (  # noqa: F401
    cholesky_pallas,
    cholesky_solve_pallas,
)
