from rust_robotics_tpu.filters.kalman import (  # noqa: F401
    StateSpaceModel,
    ckf_step,
    ekf_predict,
    ekf_step,
    ekf_update,
    enkf_step,
    iekf_step,
    information_step,
    ukf_step,
    unicycle_position_model,
)
from rust_robotics_tpu.filters.particle import (  # noqa: F401
    ParticleBelief,
    effective_particles,
    init_particles,
    mcl_step,
    multinomial_resample,
    pf_estimate,
    pf_predict,
    pf_step,
    pf_update_ranges,
    systematic_resample,
)
