"""Visualization artifacts (SURVEY.md §2a R15) — headless PNG generation."""

import os

import numpy as np

from tpuslam import viz


def _poses(n, rng):
    poses = np.tile(np.eye(4), (n, 1, 1))
    poses[:, :3, 3] = np.cumsum(rng.normal(scale=0.02, size=(n, 3)), axis=0)
    return poses


def test_plot_trajectory(tmp_path, rng):
    est = _poses(30, rng)
    gt = _poses(30, rng)
    p = viz.plot_trajectory(str(tmp_path / "traj.png"), est, gt,
                            keyframe_indices=[0, 10, 20])
    assert os.path.getsize(p) > 1000


def test_plot_map(tmp_path, rng):
    pts = rng.normal(size=(2000, 3))
    p = viz.plot_map(str(tmp_path / "map.png"), pts, _poses(10, rng))
    assert os.path.getsize(p) > 1000


def test_depth_and_normal_images(tmp_path, rng):
    depth = np.abs(rng.normal(loc=2.0, scale=0.3, size=(48, 64)))
    depth[:5] = 0.0
    p = viz.save_depth_image(str(tmp_path / "depth.png"), depth)
    assert os.path.getsize(p) > 1000
    normals = rng.normal(size=(48, 64, 3))
    normals /= np.linalg.norm(normals, axis=-1, keepdims=True)
    p = viz.save_normal_image(str(tmp_path / "normals.png"), normals,
                              depth > 0)
    assert os.path.getsize(p) > 1000


def test_write_run_report(tmp_path):
    """End-to-end: run a few frames and emit the artifact set."""
    from tests.test_slam import CFG, K, H, W, loop_trajectory
    from tpuslam.data.synthetic import render_depth
    from tpuslam.slam import SlamSystem

    gt = loop_trajectory(6)
    slam = SlamSystem(K, CFG, enable_loop_closure=False, enable_map=True)
    for i in range(6):
        slam.process(render_depth(gt[i], K, H, W, seed=i), timestamp=i / 30.0)
    files = viz.write_run_report(str(tmp_path / "report"), slam, gt)
    assert len(files) == 2
    for f in files:
        assert os.path.getsize(f) > 1000
