"""Frame-to-map tracking (BASELINE.json config 4: frame-to-keyframe ICP with
voxel map + keyframe selection; SURVEY.md §2a R10)."""

import numpy as np

from tests.test_slam import CFG, K, H, W, loop_trajectory
from tpuslam.data.synthetic import render_depth
from tpuslam.eval.ate import ate_rmse
from tpuslam.slam import SlamSystem


def test_map_refinement_tracks_and_bounds_drift():
    gt = loop_trajectory(24)
    depths = np.stack(
        [render_depth(gt[i], K, H, W, seed=i) for i in range(len(gt))]
    )
    plain = SlamSystem(K, CFG, enable_loop_closure=False)
    mapped = SlamSystem(K, CFG, enable_loop_closure=False,
                        track_against_map=True)
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
