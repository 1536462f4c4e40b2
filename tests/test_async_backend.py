"""Pipelined frontend/backend (SURVEY.md §2c "PP" row): the backend worker
overlaps loop-closure verification + graph optimization with tracking."""

import numpy as np

from tests.test_slam import CFG, K, H, W, loop_trajectory
from tpuslam.data.synthetic import render_depth
from tpuslam.eval.ate import ate_rmse
from tpuslam.slam import SlamSystem


def test_async_backend_matches_sync_quality():
    n = 30
    gt = loop_trajectory(n)
    depths = np.stack([render_depth(gt[i], K, H, W, seed=i) for i in range(n)])
    ts = np.arange(n) / 30.0

    sync = SlamSystem(K, CFG, enable_loop_closure=True)
    for i in range(n):
        sync.process(depths[i], timestamp=ts[i])
    sync.finalize()
    _, est_sync = sync.trajectory()
    m_sync = ate_rmse(ts, est_sync, ts, gt, max_difference=0.005)

    asy = SlamSystem(K, CFG, enable_loop_closure=True, async_backend=True)
    for i in range(n):
        asy.process(depths[i], timestamp=ts[i])
    asy.finalize()
    _, est_async = asy.trajectory()
    m_async = ate_rmse(ts, est_async, ts, gt, max_difference=0.005)

    # async applies corrections at different times, but after finalize()
    # both must land at the same quality
    assert m_async["rmse"] < max(2 * m_sync["rmse"], 0.02), (m_async, m_sync)
    assert np.all(np.isfinite(est_async))
