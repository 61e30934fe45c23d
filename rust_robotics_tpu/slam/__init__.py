from rust_robotics_tpu.slam.pose_graph import (  # noqa: F401
    optimize_pose_graph_2d,
    optimize_pose_graph_3d,
    se2_edge_residual,
    se3_edge_residual,
)
