"""Checkpoint / resume + fault-recovery tests (SURVEY.md §5 "Failure
detection / elastic recovery" — kill mid-run, restart from snapshot)."""

import numpy as np

from tpuslam.config import ICPConfig, Intrinsics, KeyframeConfig, SLAMConfig
from tpuslam.frontend import Odometry
from tpuslam.slam import SlamSystem
from tpuslam.utils.checkpoint import load_checkpoint, save_checkpoint

K = Intrinsics(160.0, 160.0, 79.5, 59.5)
H, W = 120, 160

CFG = SLAMConfig(
    height=H, width=W,
    icp=ICPConfig(pyramid_levels=3, iters_per_level=(6, 6, 10),
                  max_corr_dist=0.25, huber_delta=0.05),
    keyframe=KeyframeConfig(max_translation=0.10, max_rotation=0.15),
)


def _render(n):
    from tpuslam.data.synthetic import orbit_trajectory, render_depth

    poses = orbit_trajectory(n)
    return poses, np.stack(
        [render_depth(poses[i], K, H, W, seed=i) for i in range(n)]
    )


def test_odometry_checkpoint_resume_identical(tmp_path):
    """Crash-after-frame-k recovery must reproduce the uninterrupted run."""
    _, depths = _render(10)
    path = str(tmp_path / "ckpt.npz")

    # uninterrupted reference run
    ref = Odometry(K, CFG)
    for i in range(10):
        ref.process(depths[i], timestamp=i / 30.0)

    # interrupted run: process 5, snapshot, "crash", restore, continue
    a = Odometry(K, CFG)
    for i in range(5):
        a.process(depths[i], timestamp=i / 30.0)
    save_checkpoint(path, a, a.frame_idx)
    del a

    b = Odometry(K, CFG)
    start = load_checkpoint(path, b)
    assert start == 5
    for i in range(start, 10):
        b.process(depths[i], timestamp=i / 30.0)

    ref_traj = np.stack(ref.trajectory)
    b_traj = np.stack(b.trajectory)
    np.testing.assert_allclose(b_traj, ref_traj, atol=1e-5)
    assert len(b.keyframes) == len(ref.keyframes)


def test_slam_checkpoint_roundtrips_graph(tmp_path):
    _, depths = _render(8)
    path = str(tmp_path / "slam_ckpt.npz")
    s1 = SlamSystem(K, CFG, enable_loop_closure=False)
    for i in range(8):
        s1.process(depths[i], timestamp=i / 30.0)
    save_checkpoint(path, s1, s1.odo.frame_idx)

    s2 = SlamSystem(K, CFG, enable_loop_closure=False)
    start = load_checkpoint(path, s2)
    assert start == 8
    assert s2.graph.num_nodes == s1.graph.num_nodes
    assert s2.graph.num_edges == s1.graph.num_edges
    np.testing.assert_allclose(
        s2.graph._poses[: s2.graph.num_nodes],
        s1.graph._poses[: s1.graph.num_nodes], atol=1e-6,
    )
    ts1, tr1 = s1.trajectory()
    ts2, tr2 = s2.trajectory()
    np.testing.assert_allclose(tr2, tr1, atol=1e-6)


def test_resume_rebuilds_voxel_map(tmp_path):
    """The map is a derived product of the keyframes; resume must re-fuse
    them so frame-to-map tracking / map BA keep working after --resume."""
    _, depths = _render(10)
    path = str(tmp_path / "map_ckpt.npz")
    # tight promotion threshold so several keyframes (and map insertions)
    # happen within the short fixture
    cfg = SLAMConfig(
        height=H, width=W, icp=CFG.icp,
        keyframe=KeyframeConfig(max_translation=0.02, max_rotation=0.05),
    )
    s1 = SlamSystem(K, cfg, enable_loop_closure=False, enable_map=True)
    for i in range(10):
        s1.process(depths[i], timestamp=i / 30.0)
    assert s1.map.num_insertions == len(s1.odo.keyframes) >= 2
    save_checkpoint(path, s1, s1.odo.frame_idx)

    s2 = SlamSystem(K, cfg, enable_loop_closure=False, enable_map=True)
    load_checkpoint(path, s2)
    assert s2.map.num_insertions == s1.map.num_insertions
    # identical fusion inputs (same clouds, same poses) → identical map
    assert s2.map.size() == s1.map.size()
    p1 = np.sort(s1.map.points(), axis=0)
    p2 = np.sort(s2.map.points(), axis=0)
    np.testing.assert_allclose(p2, p1, atol=1e-6)
