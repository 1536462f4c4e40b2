"""Distributed (mesh/shard_map/psum) tests on the fake 8-device CPU backend
(SURVEY.md §4 "Multi-node without a cluster"; BASELINE config 5 distributed
part).  Collectives execute for real across the 8 virtual devices."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpuslam.backend.distba import optimize_pose_graph_spmd
from tpuslam.backend.posegraph import GraphHost, optimize_pose_graph
from tpuslam.config import ICPConfig, PoseGraphConfig
from tpuslam.dist.mesh import make_mesh, pad_to_multiple, shard_cloud
from tpuslam.dist.sharded_icp import make_aligned_spmd_fn
from tpuslam.geom import se3


pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 2, reason="needs multi-device backend"
)


def test_mesh_has_8_fake_devices():
    assert len(jax.devices()) == 8
    mesh = make_mesh()
    assert mesh.shape["shard"] == 8


def test_pad_to_multiple():
    x = jnp.ones((10, 3))
    y = pad_to_multiple(x, 8)
    assert y.shape == (16, 3)
    np.testing.assert_allclose(np.asarray(y[10:]), 0.0)


def test_shard_cloud_layout():
    from tpuslam.geom.cloud import PointCloud

    cloud = PointCloud.from_points(jnp.ones((100, 3)))
    mesh = make_mesh()
    sharded = shard_cloud(cloud, mesh)
    assert sharded.points.shape[0] == 104  # padded to multiple of 8
    assert int(sharded.mask.sum()) == 100
    assert len(sharded.points.sharding.device_set) == 8


def test_sharded_icp_matches_single_device():
    """Point-sharded SPMD ICP must reproduce the single-device result
    (same reduction, just psum-completed)."""
    from tests.test_icp_synthetic import K, depth_frame
    from tpuslam.icp import align_frames, build_pyramid

    T_a = np.eye(4)
    tau = jnp.array([0.02, -0.015, 0.02, 0.01, 0.02, -0.01])
    T_b = np.asarray(se3.exp(tau))
    cfg = ICPConfig(pyramid_levels=2, iters_per_level=(8, 10),
                    max_corr_dist=0.25, huber_delta=0.05)
    pyr_a = build_pyramid(depth_frame(T_a), cfg.pyramid_levels)
    pyr_b = build_pyramid(depth_frame(T_b), cfg.pyramid_levels)

    ref = align_frames(pyr_b, pyr_a, K, se3.identity(), cfg)

    mesh = make_mesh()
    fn = make_aligned_spmd_fn(mesh, cfg)
    out = fn(pyr_b, pyr_a, K, se3.identity())

    np.testing.assert_allclose(np.asarray(out.T), np.asarray(ref.T), atol=1e-5)
    # psum reduction order perturbs the convergence check by ulps, so the
    # early-exit iteration count may differ slightly — the pose must not.
    assert abs(int(out.iters) - int(ref.iters)) <= 3
    # and it actually recovered the pose
    E = np.asarray(se3.relative(out.T, jnp.asarray(T_b)))
    assert np.linalg.norm(E[:3, 3]) < 5e-3


def test_distributed_posegraph_matches_single_device():
    from tests.test_posegraph import ring_poses

    cfg = PoseGraphConfig(max_nodes=16, max_edges=64, gn_iters=10,
                          damping=1e-6)
    gt = ring_poses(10)
    rng = np.random.default_rng(7)
    g = GraphHost(cfg)
    noisy = [gt[0]]
    for k in range(9):
        T_rel = np.linalg.inv(gt[k]) @ gt[k + 1]
        pert = np.asarray(se3.exp(jnp.asarray(
            rng.normal(scale=0.01, size=6).astype(np.float32))))
        noisy.append(noisy[-1] @ T_rel @ pert)
    for T in noisy:
        g.add_node(T)
    for k in range(9):
        g.add_edge(k, k + 1, np.linalg.inv(noisy[k]) @ noisy[k + 1])
    g.add_edge(0, 9, np.linalg.inv(gt[0]) @ gt[9], weight=2.0)
    graph = g.graph()

    poses_ref, cost_ref = optimize_pose_graph(graph, cfg)
    mesh = make_mesh()
    poses_spmd, cost_spmd = optimize_pose_graph_spmd(graph, cfg, mesh)

    np.testing.assert_allclose(
        np.asarray(poses_spmd), np.asarray(poses_ref), atol=5e-4
    )
    assert np.isfinite(float(cost_spmd))


def test_psum_gn_reduce_equivalence():
    """Hand check: sharded gn_reduce partials psum to the full reduction."""
    from tpuslam.kernels.gn_reduce import gn_reduce
    from jax.sharding import PartitionSpec as P

    rng = np.random.default_rng(0)
    n = 128
    x = jnp.asarray(rng.normal(size=(n, 3)), dtype=jnp.float32)
    q = x + jnp.asarray(rng.normal(scale=0.01, size=(n, 3)), dtype=jnp.float32)
    nrm = jnp.asarray(rng.normal(size=(n, 3)), dtype=jnp.float32)
    nrm = nrm / jnp.linalg.norm(nrm, axis=-1, keepdims=True)
    w = jnp.ones((n,))
    mask = jnp.ones((n,), dtype=bool)

    ref = gn_reduce(x, q, nrm, w, mask, 0.05)

    mesh = make_mesh()

    def local(x, q, nrm, w, mask):
        s = gn_reduce(x, q, nrm, w, mask, 0.05)
        return jax.tree.map(lambda v: jax.lax.psum(v, "shard"), s)

    fn = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P("shard", None), P("shard", None), P("shard", None),
                  P("shard"), P("shard")),
        out_specs=jax.tree.map(lambda _: P(), ref),
    )
    out = fn(x, q, nrm, w, mask)
    np.testing.assert_allclose(np.asarray(out.H), np.asarray(ref.H),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.b), np.asarray(ref.b),
                               rtol=1e-5, atol=1e-5)
