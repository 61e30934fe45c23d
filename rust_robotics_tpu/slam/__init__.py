from rust_robotics_tpu.slam.bundle_adjustment import (  # noqa: F401
    CameraIntrinsics,
    bundle_adjust,
)
from rust_robotics_tpu.slam.ekf_slam import (  # noqa: F401
    EKFSLAMBelief,
    ekf_slam_predict,
    ekf_slam_step,
    init_ekf_slam,
)
from rust_robotics_tpu.slam.fastslam import (  # noqa: F401
    FastSLAMParticles,
    fastslam1_step,
    init_fastslam,
)
from rust_robotics_tpu.slam.g2o import parse_g2o, write_g2o  # noqa: F401
from rust_robotics_tpu.slam.icp import ICPResult, icp_matching  # noqa: F401
from rust_robotics_tpu.slam.imu import (  # noqa: F401
    Preintegrated,
    optimize_imu_trajectory,
    predict_nav_state,
    preintegrate,
)
from rust_robotics_tpu.slam.pose_graph import (  # noqa: F401
    optimize_pose_graph_2d,
    optimize_pose_graph_3d,
    se2_edge_residual,
    se3_edge_residual,
)
from rust_robotics_tpu.slam.scan_matching import (  # noqa: F401
    correlative_scan_match,
    graph_slam_from_landmarks,
    point_to_line_icp,
    robust_icp,
)
from rust_robotics_tpu.slam.vio import run_vio_pipeline  # noqa: F401
from rust_robotics_tpu.slam.slam_node import (  # noqa: F401
    IcpGatingParams,
    REASONS,
    append_and_prune,
    blend_motion_delta,
    compute_icp_blend_decision,
    run_slam_node_loop,
    scan_to_points,
    subsample_stride,
)
from rust_robotics_tpu.slam.vio import pose_error_se3  # noqa: F401
from rust_robotics_tpu.slam.vio_pp import (  # noqa: F401
    run_vio_pipeline_windowed,
)
