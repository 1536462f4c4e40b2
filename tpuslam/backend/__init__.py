from tpuslam.backend.posegraph import PoseGraph, optimize_pose_graph  # noqa: F401
