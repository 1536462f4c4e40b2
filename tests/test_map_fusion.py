"""Sharded voxel-map fusion (dist/map_fusion.py) vs the single-chip oracle.

The all-to-all owner routing must reproduce mapping.VoxelMap's fusion
exactly per voxel: every point of a voxel lands on that voxel's owner
device, so the centroid arithmetic is identical (up to float summation
order).  SURVEY.md §2c EP/Ulysses rows.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from tpuslam.config import VoxelConfig
from tpuslam.dist.map_fusion import (
    ShardedVoxelMap,
    make_fuse_fn,
    voxel_owner,
)
from tpuslam.dist.mesh import make_mesh
from tpuslam.geom.cloud import PointCloud
from tpuslam.mapping import VoxelMap

CFG = VoxelConfig(
    voxel_size=0.05, map_voxel_size=0.05,
    capacity=1 << 12, map_capacity=1 << 13,
    origin=-2.0, extent=4.0,
)


def _random_cloud(rng, n, scale=1.5, invalid_frac=0.1) -> PointCloud:
    pts = rng.uniform(-scale, scale, size=(n, 3)).astype(np.float32)
    nrm = rng.normal(size=(n, 3)).astype(np.float32)
    nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
    mask = rng.uniform(size=n) > invalid_frac
    return PointCloud(points=jnp.asarray(pts), normals=jnp.asarray(nrm),
                      mask=jnp.asarray(mask))


def _valid_sorted(cloud: PointCloud):
    m = np.asarray(cloud.mask)
    p = np.asarray(cloud.points)[m]
    n = np.asarray(cloud.normals)[m]
    order = np.lexsort((p[:, 2], p[:, 1], p[:, 0]))
    return p[order], n[order]


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(8)


def test_sharded_fusion_matches_single_chip(mesh):
    rng = np.random.default_rng(0)
    clouds = [_random_cloud(rng, 2048) for _ in range(3)]
    T = np.eye(4, dtype=np.float32)
    T[:3, 3] = [0.1, -0.05, 0.02]

    ref = VoxelMap(CFG)
    svm = ShardedVoxelMap(CFG, mesh, new_capacity=2048)
    for c in clouds:
        ref.insert(c, T)
        stats = svm.insert(c, T)
        assert int(stats.dropped) == 0

    p_ref, n_ref = _valid_sorted(ref.cloud)
    p_got, n_got = _valid_sorted(svm.gather())
    assert p_ref.shape == p_got.shape, (
        f"voxel count mismatch: {p_ref.shape} vs {p_got.shape}")
    np.testing.assert_allclose(p_got, p_ref, atol=1e-5)
    np.testing.assert_allclose(n_got, n_ref, atol=1e-4)
    assert svm.size() == int(ref.cloud.count())


def test_ownership_invariant(mesh):
    """Every valid row of shard d hashes to owner d."""
    rng = np.random.default_rng(1)
    svm = ShardedVoxelMap(CFG, mesh, new_capacity=1024)
    svm.insert(_random_cloud(rng, 1024), np.eye(4, dtype=np.float32))
    n_dev = mesh.shape["shard"]
    full = svm.gather()
    pts = np.asarray(full.points).reshape(n_dev, svm.shard_cap, 3)
    msk = np.asarray(full.mask).reshape(n_dev, svm.shard_cap)
    for d in range(n_dev):
        owner, in_box = voxel_owner(
            jnp.asarray(pts[d]), jnp.asarray(msk[d]), n_dev, CFG)
        ow = np.asarray(owner)[msk[d]]
        assert np.all(ow == d), f"shard {d} holds foreign voxels"


def test_bucket_overflow_reported(mesh):
    """A starved bucket_cap must drop points and say so, never corrupt."""
    rng = np.random.default_rng(2)
    n = 1024
    fuse, bucket_cap, shard_cap = make_fuse_fn(
        mesh, CFG, n, bucket_slack=0.05)
    assert bucket_cap * 8 * 8 < n  # genuinely starved
    n_dev = mesh.shape["shard"]
    empty = PointCloud(
        points=jnp.zeros((shard_cap * n_dev, 3)),
        normals=jnp.zeros((shard_cap * n_dev, 3)),
        mask=jnp.zeros((shard_cap * n_dev,), bool),
    )
    cloud = _random_cloud(rng, n, invalid_frac=0.0)
    fused, stats = fuse(empty, cloud, jnp.eye(4))
    n_in_box = int(np.asarray(
        voxel_owner(cloud.points, cloud.mask, n_dev, CFG)[1].sum()))
    assert int(stats.dropped) > 0
    assert int(stats.dropped) + int(stats.routed) == n_in_box
    # surviving points are a subset of the oracle's voxels
    ref = VoxelMap(CFG)
    ref.insert(cloud, np.eye(4, dtype=np.float32))
    p_ref, _ = _valid_sorted(ref.cloud)
    p_got, _ = _valid_sorted(fused)
    assert p_got.shape[0] <= p_ref.shape[0]


def test_out_of_aabb_points_not_routed(mesh):
    """Points outside the world AABB must be dropped silently-but-masked,
    exactly as the single-chip voxel_downsample drops them."""
    rng = np.random.default_rng(3)
    cloud = _random_cloud(rng, 512, scale=10.0, invalid_frac=0.0)  # most OOB
    ref = VoxelMap(CFG)
    ref.insert(cloud, np.eye(4, dtype=np.float32))
    svm = ShardedVoxelMap(CFG, mesh, new_capacity=512)
    stats = svm.insert(cloud, np.eye(4, dtype=np.float32))
    assert int(stats.dropped) == 0
    p_ref, _ = _valid_sorted(ref.cloud)
    p_got, _ = _valid_sorted(svm.gather())
    assert p_ref.shape == p_got.shape
    np.testing.assert_allclose(p_got, p_ref, atol=1e-5)


def test_sharded_map_feeds_ring_tracking(mesh):
    """End-to-end: fuse a synthetic frame into the sharded map, then track a
    perturbed copy against the map shards with ring ICP — no gather of the
    map anywhere in the loop."""
    from tpuslam.config import ICPConfig
    from tpuslam.dist.ring_map import align_to_map_ring
    from tpuslam.geom import se3

    rng = np.random.default_rng(4)
    # three mutually orthogonal planes: all 6 DoF observable by
    # point-to-plane (two planes leave the in-plane translation free)
    n = 516
    k = n // 3
    a = rng.uniform(-1, 1, size=(k, 2)).astype(np.float32)
    half = np.full((k, 1), 0.5, np.float32)
    plane_z = np.concatenate([a, half], 1)
    plane_x = np.concatenate([-half, a], 1)
    plane_y = np.concatenate([a[:, :1], half, a[:, 1:]], 1)
    pts = np.concatenate([plane_z, plane_x, plane_y], 0)
    nrm = np.concatenate(
        [np.tile([0, 0, 1.0], (k, 1)), np.tile([1.0, 0, 0], (k, 1)),
         np.tile([0, 1.0, 0], (k, 1))],
    ).astype(np.float32)
    cloud = PointCloud(points=jnp.asarray(pts), normals=jnp.asarray(nrm),
                       mask=jnp.ones((n,), bool))

    svm = ShardedVoxelMap(CFG, mesh, new_capacity=n)
    svm.insert(cloud, np.eye(4, dtype=np.float32))

    delta = jnp.asarray([0.02, -0.015, 0.01, 0.01, -0.008, 0.012])
    T_true = se3.exp(delta)
    frame = cloud.transform(se3.inv(T_true))
    cfg = ICPConfig(max_iters=15, max_corr_dist=0.3, huber_delta=0.05)
    res = align_to_map_ring(frame, svm.cloud_shards, jnp.eye(4), cfg, mesh)
    err = np.asarray(se3.log(se3.inv(res.T) @ T_true))
    assert np.linalg.norm(err) < 5e-3, f"ring tracking off by {err}"
