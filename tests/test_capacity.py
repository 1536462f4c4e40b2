"""Production-scale trajectory capacity (VERDICT r2 missing #2).

The pose graph must grow past its initial padding (amortized doubling, no
RuntimeError wall), keyframe-cloud sparsification must bound memory while
keeping a spatially diverse cover, and `optimize` must auto-switch to the
matrix-free CG solver on large graphs.  The end-to-end config-5-scale run
(2,000 frames through run_slam) lives in tests/test_config5_scale.py.
"""

import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from tpuslam.backend.posegraph import (
    GraphHost,
    graph_cost,
    optimize,
    optimize_pose_graph,
    optimize_pose_graph_cg,
)
from tpuslam.config import (
    Intrinsics,
    KeyframeConfig,
    PoseGraphConfig,
    SLAMConfig,
)
from tpuslam.frontend import KeyframeRecord, Odometry
from tpuslam.geom.cloud import PointCloud


def _chain_graph(n: int, cfg: PoseGraphConfig, seed: int = 0) -> GraphHost:
    """Noisy straight-line odometry chain + a few skip edges."""
    rng = np.random.default_rng(seed)
    g = GraphHost(cfg)
    T = np.eye(4, dtype=np.float32)
    step = np.eye(4, dtype=np.float32)
    step[0, 3] = 0.1
    for i in range(n):
        noisy = T.copy()
        noisy[:3, 3] += rng.normal(scale=0.01, size=3)
        g.add_node(noisy)
        if i > 0:
            g.add_edge(i - 1, i, step)
        T = T @ step
    for i in range(0, n - 5, 5):
        skip = np.eye(4, dtype=np.float32)
        skip[0, 3] = 0.5
        g.add_edge(i, i + 5, skip)
    return g


def test_graph_grows_past_initial_capacity():
    """add_node/add_edge beyond max_nodes/max_edges must NOT raise — the
    round-2 wall (GraphHost raised RuntimeError at capacity) is gone."""
    cfg = PoseGraphConfig(max_nodes=4, max_edges=4, gn_iters=10,
                          damping=1e-6)
    g = _chain_graph(20, cfg)
    assert g.num_nodes == 20
    assert g.node_capacity >= 20 and g.node_capacity % 4 == 0
    assert g.edge_capacity >= g.num_edges
    graph = g.graph()
    assert graph.poses.shape[0] == g.node_capacity
    c0 = float(graph_cost(graph, cfg))
    poses, _ = optimize(graph, cfg)
    g.set_poses(np.asarray(poses, dtype=np.float32))
    c1 = float(graph_cost(g.graph(), cfg))
    assert np.all(np.isfinite(np.asarray(poses)))
    assert c1 < c0


def test_ensure_capacity_preserves_content():
    cfg = PoseGraphConfig(max_nodes=4, max_edges=4)
    g = _chain_graph(3, cfg)
    poses_before = g._poses[: g.num_nodes].copy()
    edges_before = g._edge_T[: g.num_edges].copy()
    g.ensure_capacity(nodes=100, edges=100)
    assert g.node_capacity >= 100 and g.edge_capacity >= 100
    np.testing.assert_array_equal(g._poses[: g.num_nodes], poses_before)
    np.testing.assert_array_equal(g._edge_T[: g.num_edges], edges_before)
    # padding stays identity (the solvers left-multiply exp(0)=I onto it)
    np.testing.assert_array_equal(g._poses[-1], np.eye(4, dtype=np.float32))


def test_solver_auto_switches_and_agrees():
    """'auto' must pick CG past dense_max_nodes of capacity and the two
    solvers must agree on the same graph."""
    cfg = PoseGraphConfig(max_nodes=64, max_edges=256, gn_iters=12,
                          damping=1e-6, solver="auto", dense_max_nodes=32)
    g = _chain_graph(40, cfg)  # grows capacity to 128 > dense_max_nodes
    assert g.node_capacity > cfg.dense_max_nodes
    graph = g.graph()
    poses_auto, _ = optimize(graph, cfg)     # → CG path
    poses_dense, _ = optimize_pose_graph(graph, cfg)
    poses_cg, _ = optimize_pose_graph_cg(graph, cfg, cg_iters=cfg.cg_iters,
                                         cg_tol=cfg.cg_tol)
    np.testing.assert_allclose(np.asarray(poses_auto), np.asarray(poses_cg),
                               atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(poses_auto)[: g.num_nodes],
        np.asarray(poses_dense)[: g.num_nodes], atol=1e-3)


def test_solver_auto_keys_on_live_count(monkeypatch):
    """A small LIVE graph in grown storage must solve dense at the live
    bucket, not pay CG for its capacity high-water mark (VERDICT r3 #6)."""
    import tpuslam.backend.posegraph as pg

    cfg = PoseGraphConfig(max_nodes=16, max_edges=32, gn_iters=8,
                          damping=1e-6, solver="auto", dense_max_nodes=64)
    g = _chain_graph(20, cfg)          # 20 live nodes
    g.ensure_capacity(nodes=300)       # storage high-water mark: 512 slots
    assert g.node_capacity == 512 > cfg.dense_max_nodes

    graph = g.graph(bucketed=True)
    # bucket = pow2(max(20, 32)) = 32 — the dense solve dispatches small
    assert graph.poses.shape[0] == 32
    assert int(np.asarray(graph.node_mask).sum()) == 20

    picked = []
    real_dense = pg.optimize_pose_graph
    real_cg = pg.optimize_pose_graph_cg
    monkeypatch.setattr(pg, "optimize_pose_graph",
                        lambda *a, **k: picked.append("dense")
                        or real_dense(*a, **k))
    monkeypatch.setattr(pg, "optimize_pose_graph_cg",
                        lambda *a, **k: picked.append("cg")
                        or real_cg(*a, **k))
    poses, _ = pg.optimize(graph, cfg, live_nodes=g.num_nodes)
    assert picked == ["dense"]
    # ... and agrees with the full-capacity solve on the live nodes
    poses_full, _ = real_dense(g.graph(), cfg)
    np.testing.assert_allclose(np.asarray(poses)[: g.num_nodes],
                               np.asarray(poses_full)[: g.num_nodes],
                               atol=1e-5)
    # past the threshold the live count sends auto to CG even when the
    # bucket equals a dense-friendly shape
    picked.clear()
    pg.optimize(graph, cfg, live_nodes=cfg.dense_max_nodes + 1)
    assert picked == ["cg"]


def _record(k: int, x: float, with_cloud: bool = True) -> KeyframeRecord:
    T = np.eye(4, dtype=np.float32)
    T[0, 3] = x
    cloud = None
    if with_cloud:
        cloud = PointCloud(
            points=np.zeros((8, 3), np.float32),
            normals=np.zeros((8, 3), np.float32),
            mask=np.ones((8,), bool),
        )
    return KeyframeRecord(index=k, timestamp=float(k), T_world_kf=T,
                          cloud=cloud)


def test_cloud_budget_sparsification():
    """Past max_keyframes retained clouds the most spatially redundant one
    is dropped; protected ids, keyframe 0 and the recent window survive."""
    cfg = SLAMConfig(keyframe=KeyframeConfig(max_keyframes=6,
                                             sparsify_protect_recent=2))
    odo = Odometry(Intrinsics.tum_default(), cfg)
    # keyframes along a line, with 5/6 clustered at x≈2.0 (redundant)
    xs = [0.0, 1.0, 2.0, 2.001, 2.002, 2.003, 2.004, 3.0, 4.0]
    odo.keyframes = [_record(k, x) for k, x in enumerate(xs)]
    odo.protected_kf_ids = {1}
    odo._enforce_cloud_budget()
    retained = [k for k, r in enumerate(odo.keyframes) if r.cloud is not None]
    assert len(retained) == 6
    assert 0 in retained          # origin anchor
    assert 1 in retained          # protected (loop-closure anchor)
    assert 7 in retained and 8 in retained   # recent window
    # the cluster at x≈2 lost members first (most redundant)
    assert sum(1 for k in retained if 2 <= k <= 6) == 2


def test_sparsification_keeps_diverse_cover():
    """Dropping order is min-nearest-neighbor-distance: a uniform line keeps
    a roughly uniform subset, never a one-sided chunk."""
    cfg = SLAMConfig(keyframe=KeyframeConfig(max_keyframes=5,
                                             sparsify_protect_recent=1))
    odo = Odometry(Intrinsics.tum_default(), cfg)
    odo.keyframes = [_record(k, 0.1 * k) for k in range(20)]
    odo._enforce_cloud_budget()
    retained = [k for k, r in enumerate(odo.keyframes) if r.cloud is not None]
    assert len(retained) == 5
    xs = np.asarray([0.1 * k for k in retained])
    # spread must cover most of the [0, 1.9] range
    assert xs.max() - xs.min() > 1.5


def test_proposal_skips_unverifiable_before_cap():
    """Sparsified (cloud-less) keyframes must not consume proposal slots:
    if the nearest pairs are unverifiable, verifiable pairs just beyond
    them must still be proposed (review finding: candidate starvation)."""
    from tpuslam.backend.loopclosure import propose_candidates

    cfg = PoseGraphConfig(lc_min_gap=2, lc_max_dist=1.0)
    # 8 keyframes at the same spot (all within radius); pair distance
    # grows with |i - j| via tiny offsets so nearest pairs involve 3,4
    xs = [0.0, 0.01, 0.02, 0.03, 0.031, 0.05, 0.06, 0.07]
    poses = []
    for x in xs:
        T = np.eye(4)
        T[0, 3] = x
        poses.append(T)
    verifiable = np.ones(8, bool)
    verifiable[[3, 4]] = False    # the closest pairs' members lost clouds
    cands = propose_candidates(poses, cfg, max_candidates=4,
                               verifiable=verifiable)
    assert cands, "verifiable pairs beyond the nearest must be proposed"
    for c in cands:
        assert verifiable[c.i] and verifiable[c.j]


def test_rotation_angle_promote_threshold_in_config():
    """lost_inlier_fraction is config-driven (VERDICT r2 weak #3): a frame
    whose inlier fraction sits between two thresholds flips `lost`."""
    import jax.numpy as jnp

    from tpuslam.frontend import _promote_flags
    from tpuslam.icp import ICPResult

    res = ICPResult(T=jnp.eye(4), iters=jnp.int32(3), rms=jnp.float32(0.01),
                    inlier_fraction=jnp.float32(0.2),
                    converged=jnp.bool_(True), H=jnp.eye(6),
                    num_inliers=jnp.float32(100.0))
    strict = SLAMConfig(keyframe=KeyframeConfig(lost_inlier_fraction=0.3))
    lax_ = SLAMConfig(keyframe=KeyframeConfig(lost_inlier_fraction=0.1))
    assert bool(_promote_flags(res, jnp.eye(4), strict).lost)
    assert not bool(_promote_flags(res, jnp.eye(4), lax_).lost)
