"""Drift-robust (pose-free) loop-closure proposal — VERDICT r4 #6.

Proximity-only proposal requires the CURRENT ESTIMATES of a revisited pair
to sit within `lc_max_dist`; accumulated drift beyond that radius makes the
revisit unproposable and the drift uncorrectable — the exact regime loop
closure exists for.  The descriptor path (frontend.depth_descriptor +
backend.loopclosure.propose_descriptor_candidates) nominates candidates by
depth-appearance similarity with NO pose term, verified from an identity
initial guess through the unchanged gated ICP batch.
"""

import dataclasses

import numpy as np
import pytest

from tpuslam.config import (
    ICPConfig,
    Intrinsics,
    KeyframeConfig,
    PoseGraphConfig,
    SLAMConfig,
    VoxelConfig,
)
from tpuslam.data.synthetic import loop_trajectory, render_depth
from tpuslam.eval.ate import ate_rmse
from tpuslam.slam import SlamSystem

K = Intrinsics(160.0, 160.0, 79.5, 59.5)
H, W = 120, 160
FRAMES = 48
CHUNK = 8
BIAS_PER_CHUNK = 0.012        # m of injected world-anchor drift per chunk


def _cfg(lc_descriptor: bool) -> SLAMConfig:
    return SLAMConfig(
        height=H,
        width=W,
        icp=ICPConfig(pyramid_levels=3, iters_per_level=(12, 8, 8)),
        keyframe=KeyframeConfig(max_translation=0.08, max_rotation=0.12),
        # lc_max_dist far below the injected drift: the proximity path is
        # structurally blind to the revisit
        posegraph=PoseGraphConfig(
            max_nodes=64, max_edges=256, gn_iters=20,
            lc_min_gap=3, lc_max_dist=0.02,
            lc_max_residual=0.05, lc_min_inliers=0.3,
            lc_descriptor=lc_descriptor),
        voxel=VoxelConfig(capacity=1 << 13, map_capacity=1 << 15),
    )


@pytest.fixture(scope="module")
def drifted_run_inputs():
    gt = loop_trajectory(FRAMES, cycles=2, radius=0.35)
    depths = np.stack(
        [render_depth(gt[i], K, H, W, seed=i) for i in range(FRAMES)]
    ).astype(np.float32)
    return gt, depths


def _run_with_drift(depths, lc_descriptor: bool):
    """Boundary-chunked SLAM with an artificial world-anchor bias injected
    before every chunk: tracking stays perfect (relative), but keyframe
    poses — and therefore proximity proposals and odometry edges — drift
    like a real long loop."""
    slam = SlamSystem(K, _cfg(lc_descriptor), enable_loop_closure=True,
                      chunk_mode="boundary")
    bias = np.eye(4, dtype=np.float32)
    bias[2, 3] = BIAS_PER_CHUNK
    ts = np.arange(len(depths)) / 30.0
    for i in range(0, len(depths), CHUNK):
        if i > 0:
            slam.odo.T_world_kf = (
                bias @ slam.odo.T_world_kf.astype(np.float32))
        slam.process_chunk(depths[i:i + CHUNK], ts[i:i + CHUNK])
    slam.finalize()
    return slam


def test_depth_descriptor_shape_and_similarity(drifted_run_inputs):
    import jax.numpy as jnp

    from tpuslam.config import SLAMConfig
    from tpuslam.frontend import DESC_GRID, depth_descriptor, preprocess_jit

    gt, depths = drifted_run_inputs
    cfg = _cfg(True)
    lap = FRAMES // 2

    def desc(i):
        pyr = preprocess_jit(jnp.asarray(depths[i]), K, cfg)
        return np.asarray(depth_descriptor(pyr[-1].points, pyr[-1].mask))

    d0, d_same, d_far = desc(0), desc(lap), desc(lap // 2)
    n = DESC_GRID[0] * DESC_GRID[1]
    assert d0.shape == (2 * n,)

    def dist(a, b):
        w = np.minimum(a[n:], b[n:])
        return 2 * (w * np.abs(a[:n] - b[:n])).sum() / (
            (w * (a[:n] + b[:n])).sum() + 1e-6)

    # same pose one lap later → near-identical descriptor; quarter-lap
    # away → clearly different
    assert dist(d0, d_same) < 0.02, dist(d0, d_same)
    assert dist(d0, d_far) > 2 * dist(d0, d_same)


def test_descriptor_path_closes_drifted_loop(drifted_run_inputs):
    gt, depths = drifted_run_inputs
    ts = np.arange(FRAMES) / 30.0

    off = _run_with_drift(depths, lc_descriptor=False)
    on = _run_with_drift(depths, lc_descriptor=True)

    # proximity-only: drift (≈ 6 × 12 mm ≫ lc_max_dist = 20 mm) makes the
    # revisit unproposable — no closures, drift uncorrected
    assert len(off.closures) == 0
    # descriptor path: the revisit is nominated pose-free, verified from
    # identity, and the optimization collapses the injected drift
    assert len(on.closures) >= 1
    t_off, est_off = off.trajectory()
    t_on, est_on = on.trajectory()
    m_off = ate_rmse(t_off, est_off, ts, gt, max_difference=0.005)
    m_on = ate_rmse(t_on, est_on, ts, gt, max_difference=0.005)
    assert m_on["rmse"] < 0.5 * m_off["rmse"], (m_on, m_off)


def test_descriptor_with_deferred_backend(drifted_run_inputs):
    """The two round-5 features interact: descriptor candidates ride the
    same fused attempt the deferred backend defers — the drifted loop must
    close identically with async_backend on, bit-deterministically."""
    gt, depths = drifted_run_inputs
    ts = np.arange(FRAMES) / 30.0

    def run(async_b):
        slam = SlamSystem(K, _cfg(True), enable_loop_closure=True,
                          chunk_mode="boundary", async_backend=async_b)
        bias = np.eye(4, dtype=np.float32)
        bias[2, 3] = BIAS_PER_CHUNK
        for i in range(0, FRAMES, CHUNK):
            if i > 0:
                slam.odo.T_world_kf = (
                    bias @ slam.odo.T_world_kf.astype(np.float32))
            slam.process_chunk(depths[i:i + CHUNK], ts[i:i + CHUNK])
        slam.finalize()
        return slam

    sync = run(False)
    deferred = run(True)
    assert len(sync.closures) >= 1
    assert [(c.i, c.j) for c in deferred.closures] == [
        (c.i, c.j) for c in sync.closures]
    # NO bit-equality assertion here: this harness MUTATES T_world_kf
    # between chunks (the drift injection), which lands before the
    # deferred drain but after the sync drain — an external mutation
    # outside the determinism contract (test_chunked_slam covers the
    # unmutated byte-equality).  Both runs must still collapse the drift:
    m_sync = ate_rmse(*sync.trajectory(), ts, gt, max_difference=0.005)
    m_def = ate_rmse(*deferred.trajectory(), ts, gt, max_difference=0.005)
    assert m_sync["rmse"] < 0.02 and m_def["rmse"] < 0.02, (m_sync, m_def)


def test_descriptor_survives_checkpoint(tmp_path, drifted_run_inputs):
    from tpuslam.utils.checkpoint import load_checkpoint, save_checkpoint

    gt, depths = drifted_run_inputs
    ts = np.arange(FRAMES) / 30.0
    a = SlamSystem(K, _cfg(True), enable_loop_closure=True,
                   chunk_mode="boundary")
    for i in range(0, 24, CHUNK):
        a.process_chunk(depths[i:i + CHUNK], ts[i:i + CHUNK])
    n_desc = sum(1 for r in a.odo.keyframes if r.desc is not None)
    assert n_desc >= 1
    path = str(tmp_path / "ck.npz")
    save_checkpoint(path, a, a.odo.frame_idx)
    b = SlamSystem(K, _cfg(True), enable_loop_closure=True,
                   chunk_mode="boundary")
    load_checkpoint(path, b)
    assert sum(1 for r in b.odo.keyframes if r.desc is not None) == n_desc
    for ra, rb in zip(a.odo.keyframes, b.odo.keyframes):
        if ra.desc is not None:
            np.testing.assert_allclose(np.asarray(ra.desc),
                                       np.asarray(rb.desc), rtol=1e-6)
