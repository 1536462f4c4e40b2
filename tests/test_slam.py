"""Full-system SLAM test with loop closure on a synthetic loop sequence
(BASELINE.json config 5, single-host part; SURVEY.md §3.1)."""

import numpy as np
import pytest

from tpuslam.config import (
    ICPConfig,
    Intrinsics,
    KeyframeConfig,
    PoseGraphConfig,
    SLAMConfig,
    VoxelConfig,
)
from tpuslam.data.synthetic import default_scene, render_depth
from tpuslam.eval.ate import ate_rmse
from tpuslam.mapping import VoxelMap
from tpuslam.slam import SlamSystem

K = Intrinsics(160.0, 160.0, 79.5, 59.5)
H, W = 120, 160


def loop_trajectory(num_frames: int) -> np.ndarray:
    """Camera translates around a small loop and returns to the start."""
    from scipy.spatial.transform import Rotation

    poses = np.zeros((num_frames, 4, 4))
    for i in range(num_frames):
        s = i / num_frames
        a = 2 * np.pi * s
        t = np.array([0.18 * np.sin(a), 0.05 * np.sin(2 * a),
                      0.10 * (1 - np.cos(a))])
        rot = Rotation.from_euler("yx", [0.15 * np.sin(a), 0.06 * np.sin(a)])
        poses[i, :3, :3] = rot.as_matrix()
        poses[i, :3, 3] = t
        poses[i, 3, 3] = 1.0
    return poses


CFG = SLAMConfig(
    height=H,
    width=W,
    icp=ICPConfig(pyramid_levels=3, iters_per_level=(12, 8, 8),
                  max_corr_dist=0.25, huber_delta=0.05),
    keyframe=KeyframeConfig(max_translation=0.08, max_rotation=0.12),
    posegraph=PoseGraphConfig(max_nodes=64, max_edges=256, gn_iters=15,
                              lc_min_gap=3, lc_max_dist=0.6,
                              lc_max_residual=0.05, lc_min_inliers=0.3),
    voxel=VoxelConfig(capacity=1 << 13, map_capacity=1 << 15),
)


@pytest.fixture(scope="module")
def loop_sequence():
    poses = loop_trajectory(30)
    depths = np.stack(
        [render_depth(poses[i], K, H, W, seed=i) for i in range(len(poses))]
    )
    return poses, depths


def test_slam_with_loop_closure(loop_sequence):
    gt, depths = loop_sequence
    slam = SlamSystem(K, CFG, enable_loop_closure=True)
    for i in range(len(depths)):
        slam.process(depths[i], timestamp=i / 30.0)
    ts, est = slam.trajectory()
    assert len(slam.odo.keyframes) >= 4
    m = ate_rmse(ts, est, np.arange(len(gt)) / 30.0, gt, max_difference=0.005)
    assert m["rmse"] < 0.02, m
    # graph grew odometry edges
    assert slam.graph.num_edges >= slam.graph.num_nodes - 1


def test_voxel_map_accumulates(loop_sequence):
    gt, depths = loop_sequence
    slam = SlamSystem(K, CFG, enable_loop_closure=False, enable_map=True)
    for i in range(0, 12):
        slam.process(depths[i], timestamp=i / 30.0)
    assert isinstance(slam.map, VoxelMap)
    assert slam.map.num_insertions == len(slam.odo.keyframes)
    n = slam.map.size()
    assert 100 < n <= CFG.voxel.map_capacity
    pts = slam.map.points()
    # map points live inside the room AABB
    assert np.all(np.abs(pts) < 5.0)


def test_slam_with_map_ba(loop_sequence):
    """Final Schur-complement map BA runs and does not degrade the
    trajectory (SURVEY.md §2b N13 integration path)."""
    gt, depths = loop_sequence
    slam = SlamSystem(K, CFG, enable_loop_closure=True, map_ba=True)
    for i in range(len(depths)):
        slam.process(depths[i], timestamp=i / 30.0)
    ts, est_before = slam.trajectory()
    m_before = ate_rmse(ts, est_before, np.arange(len(gt)) / 30.0, gt,
                        max_difference=0.005)
    slam.finalize()
    assert slam.map_ba_stats is not None, "map BA did not run"
    assert slam.map_ba_stats["num_obs"] > 100
    ts, est = slam.trajectory()
    m = ate_rmse(ts, est, np.arange(len(gt)) / 30.0, gt, max_difference=0.005)
    assert np.all(np.isfinite(est))
    # BA must not blow up the trajectory; equal-or-better within noise
    assert m["rmse"] < max(1.5 * m_before["rmse"], 0.02), (m, m_before)


def test_slam_with_sharded_map(loop_sequence):
    """Full SLAM with the mesh-sharded voxel map (all-to-all fusion + ring
    frame-to-map refinement) on the fake 8-device mesh — must match the
    single-device map system's map content and keep the trajectory sane."""
    from tpuslam.dist.map_fusion import ShardedVoxelMap

    gt, depths = loop_sequence
    ref = SlamSystem(K, CFG, enable_loop_closure=False, enable_map=True)
    slam = SlamSystem(K, CFG, enable_loop_closure=False, enable_map=True,
                      sharded_map=True, track_against_map=True)
    for i in range(0, 16):
        ref.process(depths[i], timestamp=i / 30.0)
        slam.process(depths[i], timestamp=i / 30.0)
    assert isinstance(slam.map, ShardedVoxelMap)
    assert slam.map.num_insertions == len(slam.odo.keyframes)
    assert slam.map.dropped_total == 0
    # refinement actually ran and mostly accepted
    assert len(slam.map_refine_stats) > 0
    ok_frac = np.mean([s["ok"] for s in slam.map_refine_stats])
    assert ok_frac > 0.5, slam.map_refine_stats
    # same keyframe decisions → same map content as the single-device system
    if len(ref.odo.keyframes) == len(slam.odo.keyframes):
        assert abs(slam.map.size() - ref.map.size()) <= 0.05 * ref.map.size()
    ts, est = slam.trajectory()
    m = ate_rmse(ts, est, np.arange(len(gt)) / 30.0, gt, max_difference=0.005)
    assert m["rmse"] < 0.02, m
