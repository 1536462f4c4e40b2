"""BASELINE.json config 5 end-to-end: loop-closure SLAM over a long
synthetic sequence, then distributed pose-graph optimization across the
fake 8-device mesh, matching the single-device backend."""

import jax
import numpy as np
import pytest

from tests.test_slam import CFG, K, H, W, loop_trajectory
from tpuslam.backend.distba import optimize_pose_graph_spmd
from tpuslam.backend.posegraph import optimize_pose_graph
from tpuslam.data.synthetic import render_depth
from tpuslam.dist.mesh import make_mesh
from tpuslam.eval.ate import ate_rmse
from tpuslam.slam import SlamSystem

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 2, reason="needs multi-device backend"
)


def test_loop_slam_with_distributed_backend():
    n = 40
    gt = loop_trajectory(n)
    depths = np.stack([render_depth(gt[i], K, H, W, seed=i) for i in range(n)])
    slam = SlamSystem(K, CFG, enable_loop_closure=True)
    for i in range(n):
        slam.process(depths[i], timestamp=i / 30.0)
    ts, est = slam.trajectory()
    m = ate_rmse(ts, est, np.arange(n) / 30.0, gt, max_difference=0.005)
    assert m["rmse"] < 0.03, m

    # re-optimize the final graph on the mesh; must agree with single-device
    graph = slam.graph.graph()
    cfg = CFG.posegraph
    poses_single, _ = optimize_pose_graph(graph, cfg)
    mesh = make_mesh()
    poses_dist, cost = optimize_pose_graph_spmd(graph, cfg, mesh)
    np.testing.assert_allclose(
        np.asarray(poses_dist), np.asarray(poses_single), atol=1e-3
    )
    assert np.isfinite(float(cost))

    # applying the distributed result must keep the trajectory consistent
    slam.graph.set_poses(np.asarray(poses_dist, dtype=np.float32))
    for idx in range(slam._num_graph_nodes):
        rec = slam.odo.keyframes[idx]
        slam.odo.keyframes[idx] = rec._replace(
            T_world_kf=np.asarray(poses_dist[idx], dtype=np.float32)
        )
    ts2, est2 = slam.trajectory()
    m2 = ate_rmse(ts2, est2, np.arange(n) / 30.0, gt, max_difference=0.005)
    assert m2["rmse"] < 0.04, m2
