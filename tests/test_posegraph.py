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


def test_cg_solver_matches_dense():
    """The matrix-free block-CG path must agree with the dense Cholesky
    solve on the same regularized system (to CG tolerance)."""
    from tpuslam.backend.posegraph import optimize_pose_graph_cg

    gt = ring_poses(12)
    rng = np.random.default_rng(5)
    cfg = PoseGraphConfig(max_nodes=16, max_edges=64, gn_iters=20,
                          damping=1e-6)
    g = GraphHost(cfg)
    noisy = [gt[0]]
    for k in range(11):
        T_rel = np.linalg.inv(gt[k]) @ gt[k + 1]
        pert = np.asarray(se3.exp(jnp.asarray(
            rng.normal(scale=0.01, size=6).astype(np.float32))))
        noisy.append(noisy[-1] @ T_rel @ pert)
    for T in noisy:
        g.add_node(T)
    for k in range(11):
        g.add_edge(k, k + 1, np.linalg.inv(noisy[k]) @ noisy[k + 1])
    g.add_edge(0, 11, np.linalg.inv(gt[0]) @ gt[11], weight=2.0)
    graph = g.graph()
    p_dense, c_dense = optimize_pose_graph(graph, cfg)
    p_cg, c_cg = optimize_pose_graph_cg(graph, cfg)
    np.testing.assert_allclose(np.asarray(p_cg)[:12], np.asarray(p_dense)[:12],
                               atol=5e-4)
    assert abs(float(c_cg) - float(c_dense)) < 1e-3 * max(float(c_dense), 1.0)


def test_cg_solver_scales_past_dense_capacity():
    """CG handles a 1024-node chain+closures graph — a (6144)² dense system
    the Cholesky path shouldn't even materialize — and straightens it."""
    from tpuslam.backend.posegraph import optimize_pose_graph_cg

    n = 1024
    cfg = PoseGraphConfig(max_nodes=n, max_edges=2 * n, gn_iters=8,
                          damping=1e-6)
    gt = ring_poses(n, radius=5.0)
    rng = np.random.default_rng(9)
    g = GraphHost(cfg)
    noisy = [gt[0]]
    for k in range(n - 1):
        T_rel = np.linalg.inv(gt[k]) @ gt[k + 1]
        pert = np.asarray(se3.exp(jnp.asarray(
            rng.normal(scale=0.002, size=6).astype(np.float32))))
        noisy.append(noisy[-1] @ T_rel @ pert)
    for T in noisy:
        g.add_node(T)
    for k in range(n - 1):
        g.add_edge(k, k + 1, np.linalg.inv(noisy[k]) @ noisy[k + 1])
    # a handful of exact long-range closures
    for a, b in ((0, n - 1), (0, n // 2), (n // 4, 3 * n // 4)):
        g.add_edge(a, b, np.linalg.inv(gt[a]) @ gt[b], weight=2.0)
    graph = g.graph()

    def endpoint_err(poses):
        E = np.asarray(se3.relative(jnp.asarray(poses[n - 1]),
                                    jnp.asarray(gt[n - 1])))
        return np.linalg.norm(E[:3, 3])

    err_before = endpoint_err(np.asarray(graph.poses))
    poses, _ = optimize_pose_graph_cg(graph, cfg, cg_iters=256)
    err_after = endpoint_err(np.asarray(poses))
    assert np.all(np.isfinite(np.asarray(poses)))
    assert err_after < 0.3 * err_before, (err_before, err_after)


def test_solver_dispatch():
    """PoseGraphConfig.solver routes the system-level optimize() call."""
    from tpuslam.backend.posegraph import optimize

    gt = ring_poses(8)
    for solver in ("dense", "cg"):
        cfg = PoseGraphConfig(max_nodes=16, max_edges=64, gn_iters=10,
                              damping=1e-6, solver=solver)
        g = GraphHost(cfg)
        for T in gt:
            g.add_node(T)
        for k in range(7):
            g.add_edge(k, k + 1, np.linalg.inv(gt[k]) @ gt[k + 1])
        poses, cost = optimize(g.graph(), cfg)
        assert float(cost) < 1e-6, (solver, float(cost))
