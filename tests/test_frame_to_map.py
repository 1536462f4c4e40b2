"""Frame-to-map tracking (BASELINE.json config 4: frame-to-keyframe ICP with
voxel map + keyframe selection; SURVEY.md §2a R10)."""

import numpy as np
import pytest

from tests.test_slam import CFG, K, H, W, loop_trajectory
from tpuslam.data.synthetic import render_depth
from tpuslam.eval.ate import ate_rmse
from tpuslam.slam import SlamSystem


@pytest.mark.parametrize("mode", ["projective", "grid"])
def test_map_refinement_tracks_and_bounds_drift(mode):
    gt = loop_trajectory(24)
    depths = np.stack(
        [render_depth(gt[i], K, H, W, seed=i) for i in range(len(gt))]
    )
    plain = SlamSystem(K, CFG, enable_loop_closure=False)
    mapped = SlamSystem(K, CFG, enable_loop_closure=False,
                        track_against_map=True, map_track_mode=mode)
    for i in range(len(depths)):
        plain.process(depths[i], timestamp=i / 30.0)
        mapped.process(depths[i], timestamp=i / 30.0)
    ts = np.arange(len(gt)) / 30.0
    _, est_plain = plain.trajectory()
    _, est_map = mapped.trajectory()
    m_plain = ate_rmse(ts, est_plain, ts, gt, max_difference=0.005)
    m_map = ate_rmse(ts, est_map, ts, gt, max_difference=0.005)
    # refinement ran and mostly succeeded
    assert len(mapped.map_refine_stats) > 5
    ok_frac = np.mean([s["ok"] for s in mapped.map_refine_stats])
    assert ok_frac > 0.6, mapped.map_refine_stats[:5]
    # Map refinement adds grid-hash/voxel quantization noise (mm-scale) on
    # top of the odometry estimate — it pays off when odometry drifts, and
    # must never make things more than that noise floor worse.
    assert m_map["rmse"] <= m_plain["rmse"] + 0.01, (m_map, m_plain)
    assert m_map["rmse"] < 0.04, m_map


def test_align_map_to_frame_recovers_known_pose():
    """Reverse projective association (icp.align_map_to_frame): a world-frame
    map built from frame A must register to frame B at B's ground truth."""
    import jax.numpy as jnp

    from tpuslam.frontend import preprocess_jit
    from tpuslam.geom import se3
    from tpuslam.geom.voxel import voxel_downsample
    from tpuslam.icp import align_map_to_frame_jit

    gt = loop_trajectory(24)
    T_a, T_b = gt[0], gt[1]
    d_a = render_depth(T_a, K, H, W, seed=0)
    d_b = render_depth(T_b, K, H, W, seed=1)
    pyr_a = preprocess_jit(jnp.asarray(d_a), K, CFG)
    pyr_b = preprocess_jit(jnp.asarray(d_b), K, CFG)
    # "map" = frame A's cloud posed into the world at its ground truth
    map_cloud = voxel_downsample(
        pyr_a[0].as_cloud().transform(jnp.asarray(T_a.astype(np.float32))),
        CFG.voxel.voxel_size, CFG.voxel.capacity,
        origin=CFG.voxel.origin, extent=CFG.voxel.extent,
    )
    # warm start: frame A's pose (one inter-frame motion away from truth)
    res = align_map_to_frame_jit(
        map_cloud, pyr_b[0], K, jnp.asarray(T_a.astype(np.float32)), CFG.icp
    )
    assert bool(res.converged)
    assert float(res.num_inliers) > 1000.0
    assert float(res.inlier_fraction) > 0.5, float(res.inlier_fraction)
    err = se3.log(se3.relative(jnp.asarray(T_b.astype(np.float32)), res.T))
    # translation + rotation error vs ground truth (voxel-quantized map →
    # a few mm of association noise is expected at this scene scale)
    assert float(jnp.linalg.norm(err[:3])) < 0.01, np.asarray(err)
    assert float(jnp.linalg.norm(err[3:])) < 0.01, np.asarray(err)
