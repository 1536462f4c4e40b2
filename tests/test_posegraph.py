"""Pose-graph backend unit/integration tests (SURVEY.md §4; BASELINE config 5
single-host part)."""

import jax
import jax.numpy as jnp
import numpy as np

from tpuslam.backend.posegraph import (
    GraphHost,
    edge_residual,
    graph_cost,
    optimize_pose_graph,
)
from tpuslam.config import PoseGraphConfig
from tpuslam.geom import se3

CFG = PoseGraphConfig(max_nodes=16, max_edges=64, gn_iters=15, damping=1e-6)


def ring_poses(n, radius=1.0):
    """Ground-truth poses around a circle with heading tangent to it."""
    poses = []
    for k in range(n):
        a = 2 * np.pi * k / n
        T = np.eye(4, dtype=np.float32)
        T[:3, :3] = np.asarray(se3.so3_exp(jnp.array([0.0, 0.0, a])))
        T[:3, 3] = [radius * np.cos(a), radius * np.sin(a), 0.0]
        poses.append(T)
    return poses


def test_edge_residual_zero_when_consistent():
    T_i = se3.exp(jnp.array([0.1, 0.2, -0.1, 0.05, 0.0, 0.1]))
    T_j = se3.exp(jnp.array([-0.2, 0.1, 0.3, 0.0, 0.1, -0.05]))
    r = edge_residual(T_i, T_j, se3.inv(T_i) @ T_j)
    np.testing.assert_allclose(np.asarray(r), 0.0, atol=1e-5)


def test_optimize_noop_on_consistent_graph():
    gt = ring_poses(8)
    g = GraphHost(CFG)
    for T in gt:
        g.add_node(T)
    for k in range(7):
        g.add_edge(k, k + 1, np.linalg.inv(gt[k]) @ gt[k + 1])
    graph = g.graph()
    poses, cost = optimize_pose_graph(graph, CFG)
    assert float(cost) < 1e-8
    for k in range(8):
        E = np.asarray(se3.relative(poses[k], jnp.asarray(gt[k])))
        assert np.linalg.norm(E[:3, 3]) < 1e-4


def test_loop_closure_distributes_drift():
    """Odometry chain with accumulated drift + one exact loop-closure edge:
    optimization should cut the end-point error by well over half."""
    gt = ring_poses(12)
    rng = np.random.default_rng(3)
    g = GraphHost(PoseGraphConfig(max_nodes=16, max_edges=64, gn_iters=25,
                                  damping=1e-6))
    cfg = g.cfg
    # noisy odometry integration
    noisy = [gt[0]]
    for k in range(11):
        T_rel = np.linalg.inv(gt[k]) @ gt[k + 1]
        pert = np.asarray(
            se3.exp(jnp.asarray(
                rng.normal(scale=[0.01, 0.01, 0.01, 0.005, 0.005, 0.02],
                           size=6).astype(np.float32)
            ))
        )
        noisy.append(noisy[-1] @ T_rel @ pert)
    for T in noisy:
        g.add_node(T)
    for k in range(11):
        g.add_edge(k, k + 1, np.linalg.inv(noisy[k]) @ noisy[k + 1])
    # exact loop closure between first and last keyframe
    g.add_edge(0, 11, np.linalg.inv(gt[0]) @ gt[11], weight=2.0)
    graph = g.graph()

    def endpoint_err(poses):
        E = np.asarray(se3.relative(jnp.asarray(poses[11]), jnp.asarray(gt[11])))
        return np.linalg.norm(E[:3, 3])

    err_before = endpoint_err(np.asarray(graph.poses))
    poses, cost = optimize_pose_graph(graph, cfg)
    err_after = endpoint_err(np.asarray(poses))
    assert np.all(np.isfinite(np.asarray(poses)))
    assert err_after < 0.5 * err_before, (err_before, err_after)
    assert float(graph_cost(graph._replace(poses=poses), cfg)) < float(
        graph_cost(graph, cfg)
    )


def test_optimize_is_jittable_no_nans():
    gt = ring_poses(6)
    g = GraphHost(CFG)
    for T in gt:
        g.add_node(T)
    for k in range(5):
        g.add_edge(k, k + 1, np.linalg.inv(gt[k]) @ gt[k + 1])
    graph = g.graph()
    grad_fn = jax.grad(lambda p: graph_cost(graph._replace(poses=p), CFG))
    gr = grad_fn(graph.poses)
    assert np.all(np.isfinite(np.asarray(gr)))
