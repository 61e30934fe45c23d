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
