"""Schur-complement map BA tests (SURVEY.md §2b N13, §3.3).

Covers: (1) algebraic exactness of the scalar-landmark Schur reduction vs
the dense joint solve, (2) joint pose+map convergence on a synthetic
surface, (3) the landmark-sharded SPMD variant matching the single-device
result on the fake 8-device CPU mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpuslam.backend.map_ba import (
    MapBAProblem,
    backsub_landmarks,
    build_map_ba_problem,
    map_ba_partials,
    optimize_map_ba,
    optimize_map_ba_spmd,
    partition_observations,
    schur_reduce,
)
from tpuslam.backend.posegraph import GraphHost
from tpuslam.config import PoseGraphConfig
from tpuslam.geom import se3


def _random_problem(rng, N=4, M=24, obs_per=6):
    """Random well-conditioned BA problem with every landmark observed."""
    poses = []
    for _ in range(N):
        tw = rng.normal(scale=0.1, size=6)
        poses.append(np.asarray(se3.exp(jnp.asarray(tw))))
    poses = jnp.asarray(np.stack(poses), dtype=jnp.float32)
    mpts = rng.normal(scale=1.0, size=(M, 3)).astype(np.float32)
    mnrm = rng.normal(size=(M, 3)).astype(np.float32)
    mnrm /= np.linalg.norm(mnrm, axis=1, keepdims=True)
    obs_pose, obs_map, obs_p, obs_w = [], [], [], []
    for j in range(M):
        for _ in range(obs_per):
            i = rng.integers(0, N)
            p_world = mpts[j] + rng.normal(scale=0.05, size=3)
            T_inv = np.asarray(se3.inv(poses[i]))
            obs_pose.append(i)
            obs_map.append(j)
            obs_p.append(T_inv[:3, :3] @ p_world + T_inv[:3, 3])
            obs_w.append(1.0)
    prob = MapBAProblem(
        map_points=jnp.asarray(mpts),
        map_normals=jnp.asarray(mnrm),
        map_mask=jnp.ones((M,), bool),
        obs_pose=jnp.asarray(obs_pose, dtype=jnp.int32),
        obs_map=jnp.asarray(obs_map, dtype=jnp.int32),
        obs_p=jnp.asarray(np.stack(obs_p), dtype=jnp.float32),
        obs_w=jnp.asarray(obs_w, dtype=jnp.float32),
    )
    return poses, prob


def test_schur_matches_dense_joint_solve():
    """H_red δ = −b_red must give the same pose step as solving the full
    (6N+M) joint system, and back-substitution the same landmark step."""
    rng = np.random.default_rng(3)
    poses, prob = _random_problem(rng)
    N = poses.shape[0]
    M = prob.map_points.shape[0]
    H_pp, b_p, U, a, c, _cost = map_ba_partials(poses, prob, huber_delta=1e9)

    eps = 1e-3  # identical regularization on both routes
    H_red, b_red = schur_reduce(H_pp + eps * jnp.eye(6 * N), b_p, U,
                                a + eps, c)
    delta_schur = -jnp.linalg.solve(H_red, b_red)
    ds_schur = backsub_landmarks(delta_schur, U, a + eps, c)

    # dense joint system: variables [pose twists (6N), landmark s (M)]
    H_joint = jnp.zeros((6 * N + M, 6 * N + M))
    H_joint = H_joint.at[: 6 * N, : 6 * N].set(H_pp + eps * jnp.eye(6 * N))
    H_joint = H_joint.at[: 6 * N, 6 * N:].set(-U.T)
    H_joint = H_joint.at[6 * N:, : 6 * N].set(-U)
    H_joint = H_joint.at[6 * N:, 6 * N:].set(jnp.diag(a + eps))
    b_joint = jnp.concatenate([b_p, -c])
    sol = -jnp.linalg.solve(H_joint, b_joint)
    np.testing.assert_allclose(np.asarray(delta_schur),
                               np.asarray(sol[: 6 * N]), atol=1e-4)
    np.testing.assert_allclose(np.asarray(ds_schur),
                               np.asarray(sol[6 * N:]), atol=1e-4)


def _surface_world(rng, M=96):
    """Control points on two planes + a sphere cap (well-constrained)."""
    pts, nrm = [], []
    third = M // 3
    for k in range(third):            # floor z=0
        pts.append([rng.uniform(-1, 1), rng.uniform(-1, 1), 0.0])
        nrm.append([0.0, 0.0, 1.0])
    for k in range(third):            # wall x=1
        pts.append([1.0, rng.uniform(-1, 1), rng.uniform(0, 2)])
        nrm.append([-1.0, 0.0, 0.0])
    for k in range(M - 2 * third):    # sphere r=0.5 at (0,0,1)
        v = rng.normal(size=3)
        v /= np.linalg.norm(v)
        pts.append((np.array([0, 0, 1.0]) + 0.5 * v).tolist())
        nrm.append(v.tolist())
    return (np.asarray(pts, np.float32), np.asarray(nrm, np.float32))


def _make_slam_like(rng, N=6, M=96, ppk=64, pose_noise=0.03,
                    map_noise=0.01):
    """Ground-truth poses observing a known surface; perturbed initials."""
    mpts, mnrm = _surface_world(rng)
    gt_poses = []
    for i in range(N):
        tw = np.concatenate([
            0.3 * np.array([np.cos(i), np.sin(i), 0.1 * i]),
            0.05 * rng.normal(size=3)])
        gt_poses.append(np.asarray(se3.exp(jnp.asarray(tw, jnp.float32))))
    gt_poses = np.stack(gt_poses)
    obs_pose, obs_map, obs_p, obs_w = [], [], [], []
    for i in range(N):
        T_inv = np.asarray(se3.inv(jnp.asarray(gt_poses[i])))
        for _ in range(ppk):
            j = rng.integers(0, M)
            p_world = mpts[j]  # exact surface point
            obs_pose.append(i)
            obs_map.append(j)
            obs_p.append(T_inv[:3, :3] @ p_world + T_inv[:3, 3])
            obs_w.append(1.0)
    # perturb initial poses and map
    init_poses = []
    for i in range(N):
        if i == 0:
            init_poses.append(gt_poses[0])  # gauge anchor stays exact
            continue
        tw = pose_noise * rng.normal(size=6)
        init_poses.append(
            np.asarray(se3.exp(jnp.asarray(tw, jnp.float32))) @ gt_poses[i])
    init_map = mpts + map_noise * rng.normal(size=(M, 1)) * mnrm
    prob = MapBAProblem(
        map_points=jnp.asarray(init_map, jnp.float32),
        map_normals=jnp.asarray(mnrm),
        map_mask=jnp.ones((M,), bool),
        obs_pose=jnp.asarray(obs_pose, dtype=jnp.int32),
        obs_map=jnp.asarray(obs_map, dtype=jnp.int32),
        obs_p=jnp.asarray(np.stack(obs_p), dtype=jnp.float32),
        obs_w=jnp.asarray(obs_w, dtype=jnp.float32),
    )
    cfg = PoseGraphConfig(max_nodes=N, max_edges=4 * N, gn_iters=15,
                          damping=1e-5)
    g = GraphHost(cfg)
    for i in range(N):
        g.add_node(np.asarray(init_poses[i]))
    # Weak odometry chain from the NOISY initials: weight small enough that
    # the (exact) map observations dominate — these edges encode the wrong
    # relative poses, so any meaningful weight biases the optimum off GT.
    for i in range(1, N):
        g.add_edge(i - 1, i,
                   np.asarray(se3.relative(jnp.asarray(init_poses[i - 1]),
                                           jnp.asarray(init_poses[i]))),
                   weight=1e-4)
    return gt_poses, np.stack(init_poses), prob, g.graph(), cfg, mpts


def test_map_ba_converges_to_ground_truth():
    rng = np.random.default_rng(0)
    gt_poses, init_poses, prob, graph, cfg, gt_map = _make_slam_like(rng)
    poses0_err = np.abs(init_poses - gt_poses).max()
    # huber_delta large: the synthetic observations are exact, so robust
    # down-weighting of the (large) initial residuals only slows GN.
    poses, map_pts, cost = optimize_map_ba(graph, prob, cfg,
                                           huber_delta=10.0)
    poses = np.asarray(poses)
    err = np.abs(poses - gt_poses).max()
    assert err < 0.2 * poses0_err, (err, poses0_err)
    assert err < 5e-3, err
    # refined map points should be closer to the true surface
    d0 = np.abs(np.sum((np.asarray(prob.map_points) - gt_map)
                       * np.asarray(prob.map_normals), axis=1)).mean()
    d1 = np.abs(np.sum((np.asarray(map_pts) - gt_map)
                       * np.asarray(prob.map_normals), axis=1)).mean()
    assert d1 < 0.5 * d0, (d1, d0)


def test_map_ba_spmd_matches_single_device():
    if len(jax.devices()) < 2:
        pytest.skip("needs multi-device (fake CPU) backend")
    from tpuslam.dist.mesh import make_mesh

    rng = np.random.default_rng(1)
    _gt, _init, prob, graph, cfg, _m = _make_slam_like(rng)
    poses_1, map_1, cost_1 = optimize_map_ba(graph, prob, cfg)
    mesh = make_mesh(len(jax.devices()))
    poses_8, map_8, cost_8 = optimize_map_ba_spmd(graph, prob, cfg, mesh)
    np.testing.assert_allclose(np.asarray(poses_1), np.asarray(poses_8),
                               atol=5e-5)
    np.testing.assert_allclose(np.asarray(map_1), np.asarray(map_8),
                               atol=5e-5)


def test_partition_observations_preserves_everything():
    rng = np.random.default_rng(2)
    _poses, prob = _random_problem(rng, N=3, M=20, obs_per=4)
    sprob, m_per, dropped = partition_observations(prob, n_dev=4)
    assert dropped == 0
    assert sprob.map_points.shape[0] % 4 == 0
    # every live observation present exactly once, with owner-local index
    live = np.asarray(sprob.obs_w) > 0
    n_dev = 4
    cap = sprob.obs_w.shape[0] // n_dev
    om = np.asarray(sprob.obs_map).reshape(n_dev, cap)
    ow = np.asarray(sprob.obs_w).reshape(n_dev, cap)
    total = int((np.asarray(prob.obs_w) > 0).sum())
    assert int(live.sum()) == total
    for d in range(n_dev):
        sel = ow[d] > 0
        # owner-local indices stay within this device's landmark range
        assert om[d][sel].max(initial=0) < m_per


def test_grid_probe_returns_exact_indices():
    """Correspondence.idx from the 27-cell probe must equal the brute-force
    nearest index into the SORTED control array (VERDICT r2 weak #5: map-BA
    problem construction used an O(C·M) post-hoc index recovery; the probe
    now carries the sorted position through its scan)."""
    from tpuslam.geom.cloud import PointCloud
    from tpuslam.kernels.correspond import (
        _INVALID_KEY,
        build_grid_index,
        grid_hash_correspond,
    )

    rng = np.random.default_rng(11)
    mpts, mnrm = _surface_world(rng, M=128)
    ctrl = PointCloud(points=jnp.asarray(mpts), normals=jnp.asarray(mnrm),
                      mask=jnp.ones((mpts.shape[0],), bool))
    index = build_grid_index(ctrl, cell=0.1)
    q = mpts[rng.integers(0, mpts.shape[0], size=64)]
    q = q + 0.01 * rng.normal(size=q.shape).astype(np.float32)
    corr = grid_hash_correspond(
        jnp.asarray(q), jnp.ones((64,), bool), index, max_dist=0.1)
    w = np.asarray(corr.w)
    assert w.sum() > 48
    # brute-force nearest over the sorted arrays (the oracle)
    pts = np.asarray(index.points)
    valid = np.asarray(index.keys) != _INVALID_KEY
    d2 = np.sum((q[:, None, :] - pts[None, :, :]) ** 2, axis=-1)
    d2[:, ~valid] = np.inf
    oracle = d2.argmin(axis=1)
    idx = np.asarray(corr.idx)
    matched = w > 0
    # probe idx must point at a row with the oracle's distance (ties on
    # equidistant duplicates are fine — compare distances, not raw ids)
    np.testing.assert_allclose(
        d2[matched, idx[matched]],
        d2[matched, oracle[matched]], rtol=1e-5, atol=1e-12)
    # and the returned coordinates are exactly the indexed rows
    np.testing.assert_array_equal(np.asarray(corr.q)[matched],
                                  pts[idx[matched]])


def test_build_problem_from_clouds():
    """End-to-end construction: keyframe clouds against a control surface."""
    rng = np.random.default_rng(4)
    mpts, mnrm = _surface_world(rng, M=96)
    N, C = 3, 48
    kf_poses, kf_points, kf_mask = [], [], []
    for i in range(N):
        tw = 0.2 * rng.normal(size=6).astype(np.float32)
        T = np.asarray(se3.exp(jnp.asarray(tw)))
        T_inv = np.asarray(se3.inv(jnp.asarray(T)))
        sel = rng.integers(0, mpts.shape[0], size=C)
        pw = mpts[sel] + 0.002 * rng.normal(size=(C, 3)).astype(np.float32)
        kf_poses.append(T)
        kf_points.append((pw @ T_inv[:3, :3].T) + T_inv[:3, 3])
        kf_mask.append(np.ones((C,), bool))
    prob = build_map_ba_problem(
        jnp.asarray(np.stack(kf_poses), jnp.float32),
        jnp.asarray(np.stack(kf_points), jnp.float32),
        jnp.asarray(np.stack(kf_mask)),
        jnp.asarray(mpts), jnp.asarray(mnrm),
        jnp.ones((mpts.shape[0],), bool),
        max_dist=0.1)
    w = np.asarray(prob.obs_w)
    assert w.sum() > 0.9 * N * C  # nearly all points associated
    # associated map point must be the true nearest (within the gate)
    q = np.asarray(prob.map_points)[np.asarray(prob.obs_map)]
    x = np.stack([
        np.asarray(se3.transform_points(jnp.asarray(kf_poses[i]),
                                        jnp.asarray(kf_points[i])))
        for i in range(N)]).reshape(-1, 3)
    d = np.linalg.norm((x - q)[w > 0], axis=1)
    assert d.max() < 0.1
