"""Synthetic two-cloud + two-frame ICP integration tests.

BASELINE.json config 1 ("Synthetic two-cloud ICP: plane+sphere pair, known
SE(3) perturbation, CPU-runnable convergence check") and the frame-to-frame
equivalent (SURVEY.md §4 Integration rows).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from tpuslam.config import ICPConfig, Intrinsics
from tpuslam.data.synthetic import default_scene, render_depth, sample_cloud
from tpuslam.geom import se3
from tpuslam.geom.backproject import backproject
from tpuslam.geom.cloud import PointCloud
from tpuslam.geom.normals import organized_normals
from tpuslam.icp import Frame, align_clouds, align_frames, build_pyramid

K = Intrinsics(160.0, 160.0, 79.5, 59.5)
H, W = 120, 160


def make_clouds(n=4096, noise=0.0):
    """dst = scene sampled in world frame; src = inv(T_true)·(other sampling).

    ICP should recover T with T·src ≈ dst surface.
    """
    scene = default_scene()
    dst_pts, dst_nrm = sample_cloud(scene, n, seed=0)
    src_pts, src_nrm = sample_cloud(scene, n, seed=1, noise=noise)
    return (
        PointCloud.from_points(jnp.asarray(src_pts), jnp.asarray(src_nrm)),
        PointCloud.from_points(jnp.asarray(dst_pts), jnp.asarray(dst_nrm)),
    )


def pose_error(T_est, T_true):
    E = np.asarray(se3.relative(jnp.asarray(T_est), jnp.asarray(T_true)))
    return (
        float(np.linalg.norm(E[:3, 3])),
        float(np.asarray(se3.rotation_angle(jnp.asarray(E)))),
    )


@pytest.mark.parametrize("use_grid", [False, True])
def test_two_cloud_icp_converges(use_grid):
    src_world, dst = make_clouds()
    tau = jnp.array([0.04, -0.03, 0.05, 0.02, -0.03, 0.025])  # ~6cm, ~2.7°
    T_true = se3.exp(tau)
    src = src_world.transform(se3.inv(T_true))
    cfg = ICPConfig(max_iters=30, max_corr_dist=0.3, huber_delta=0.1)
    res = align_clouds(src, dst, se3.identity(), cfg, use_grid=use_grid)
    t_err, r_err = pose_error(res.T, T_true)
    # The grid-hash path truncates each cell to a bounded candidate list, so
    # on *raw dense* clouds (many points per cell) its NN is approximate;
    # production feeds it voxel-downsampled clouds where cells hold O(1)
    # points and the approximation vanishes.
    tol = 1e-2 if use_grid else 5e-3
    assert t_err < tol, f"translation error {t_err}"
    assert r_err < tol, f"rotation error {r_err}"
    # grid path: truncated candidate lists inflate the *reported* residual
    # on dense raw clouds (matches are valid but not always the nearest)
    assert float(res.rms) < (3e-2 if use_grid else 8e-3)
    assert float(res.inlier_fraction) > 0.7


def test_two_cloud_icp_with_noise():
    src_world, dst = make_clouds(noise=0.002)
    tau = jnp.array([0.03, 0.02, -0.04, -0.02, 0.02, 0.01])
    T_true = se3.exp(tau)
    src = src_world.transform(se3.inv(T_true))
    cfg = ICPConfig(max_iters=30, max_corr_dist=0.3, huber_delta=0.05)
    res = align_clouds(src, dst, se3.identity(), cfg, use_grid=False)
    t_err, r_err = pose_error(res.T, T_true)
    assert t_err < 1.2e-2
    assert r_err < 1.2e-2


def test_icp_at_identity_stays():
    src, dst = make_clouds()
    cfg = ICPConfig(max_iters=10, max_corr_dist=0.3)
    res = align_clouds(src, dst, se3.identity(), cfg, use_grid=False)
    t_err, r_err = pose_error(res.T, se3.identity())
    assert t_err < 5e-3 and r_err < 5e-3


def depth_frame(T_world_cam):
    depth = render_depth(np.asarray(T_world_cam, dtype=np.float64), K, H, W)
    pts, mask = backproject(jnp.asarray(depth), K, depth_min=0.1, depth_max=8.0)
    nrm, nmask = organized_normals(pts, mask)
    return Frame(points=pts, normals=nrm, mask=mask & nmask)


def test_frame_to_frame_icp():
    """BASELINE.json config 2 analogue: pose between two rendered frames."""
    T_a = np.eye(4)
    tau = jnp.array([0.03, -0.02, 0.02, 0.015, 0.025, -0.01])
    T_b = np.asarray(se3.exp(tau))  # camera b pose in world
    frame_a = depth_frame(T_a)
    frame_b = depth_frame(T_b)
    cfg = ICPConfig(pyramid_levels=3, iters_per_level=(12, 8, 8),
                    max_corr_dist=0.25, huber_delta=0.05)
    pyr_a = build_pyramid(frame_a, cfg.pyramid_levels)
    pyr_b = build_pyramid(frame_b, cfg.pyramid_levels)
    # T maps src(b) camera points into dst(a) camera frame:
    # x_a = T_a⁻¹ T_b x_b ⇒ truth = inv(T_a) @ T_b
    res = align_frames(pyr_b, pyr_a, K, se3.identity(), cfg)
    t_err, r_err = pose_error(res.T, jnp.asarray(T_b))
    assert t_err < 4e-3, f"translation error {t_err}"
    assert r_err < 4e-3, f"rotation error {r_err}"
    assert float(res.inlier_fraction) > 0.5


@pytest.mark.parametrize("factor", [2, 4])
def test_frame_icp_with_source_subsample(factor):
    """finest_subsample decimates the source residual set only; the pose
    must stay within a small tolerance of the full-density solution."""
    from tpuslam.icp import subsample_source
    import dataclasses

    T_a = np.eye(4)
    tau = jnp.array([0.03, -0.02, 0.02, 0.015, 0.025, -0.01])
    T_b = np.asarray(se3.exp(tau))
    frame_a = depth_frame(T_a)
    frame_b = depth_frame(T_b)
    cfg = ICPConfig(pyramid_levels=3, iters_per_level=(12, 8, 8),
                    max_corr_dist=0.25, huber_delta=0.05)
    pyr_a = build_pyramid(frame_a, cfg.pyramid_levels)
    pyr_b = build_pyramid(frame_b, cfg.pyramid_levels)
    # shape bookkeeping: factor 2 keeps every other ROW (points[0::2]);
    # factor 4 keeps one stride-2 grid.  Expected counts derived from the
    # frame shape so odd H stays correct (ceil division).
    cloud = subsample_source(frame_b, factor)
    h, w = frame_b.points.shape[0], frame_b.points.shape[1]
    assert cloud.points.shape[0] == ((h + 1) // 2 * w if factor == 2
                                     else (h + 1) // 2 * ((w + 1) // 2))
    sub_cfg = dataclasses.replace(cfg, finest_subsample=factor)
    res = align_frames(pyr_b, pyr_a, K, se3.identity(), sub_cfg)
    t_err, r_err = pose_error(res.T, jnp.asarray(T_b))
    assert t_err < 5e-3, f"translation error {t_err}"
    assert r_err < 5e-3, f"rotation error {r_err}"
    assert float(res.inlier_fraction) > 0.5


def test_frame_icp_with_per_level_inner_steps():
    """inner_steps_per_level overrides the gather/solve split per pyramid
    level; convergence must match the global-inner_steps solution."""
    import dataclasses

    T_a = np.eye(4)
    tau = jnp.array([0.03, -0.02, 0.02, 0.015, 0.025, -0.01])
    T_b = np.asarray(se3.exp(tau))
    cfg = ICPConfig(pyramid_levels=3, iters_per_level=(12, 8, 8),
                    inner_steps_per_level=(2, 4, 4),
                    max_corr_dist=0.25, huber_delta=0.05)
    pyr_a = build_pyramid(depth_frame(T_a), cfg.pyramid_levels)
    pyr_b = build_pyramid(depth_frame(T_b), cfg.pyramid_levels)
    res = align_frames(pyr_b, pyr_a, K, se3.identity(), cfg)
    t_err, r_err = pose_error(res.T, jnp.asarray(T_b))
    assert t_err < 4e-3 and r_err < 4e-3


def test_frame_icp_with_per_level_tol():
    """tol_delta_per_level loosens coarse-level early exit; the finest level
    keeps the tight tolerance so the converged pose is unchanged."""
    import dataclasses

    T_a = np.eye(4)
    tau = jnp.array([0.03, -0.02, 0.02, 0.015, 0.025, -0.01])
    T_b = np.asarray(se3.exp(tau))
    cfg = ICPConfig(pyramid_levels=3, iters_per_level=(12, 8, 8),
                    tol_delta_per_level=(1e-4, 1e-3, 2e-3),
                    max_corr_dist=0.25, huber_delta=0.05)
    pyr_a = build_pyramid(depth_frame(T_a), cfg.pyramid_levels)
    pyr_b = build_pyramid(depth_frame(T_b), cfg.pyramid_levels)
    res = align_frames(pyr_b, pyr_a, K, se3.identity(), cfg)
    t_err, r_err = pose_error(res.T, jnp.asarray(T_b))
    assert t_err < 4e-3 and r_err < 4e-3
