"""Chunked device-side streaming for SlamSystem (VERDICT r3 #1).

`process_chunk` amortizes the per-frame dispatch floor through a
`lax.scan` carrying keyframe state; it must mirror the per-frame path's
bookkeeping exactly — same keyframe decisions, same closures, same
trajectory — and fall back to per-frame stepping on tracking loss.
"""

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

CFG = SLAMConfig(
    height=H,
    width=W,
    icp=ICPConfig(pyramid_levels=3, iters_per_level=(12, 8, 8),
                  max_corr_dist=0.25, huber_delta=0.05),
    keyframe=KeyframeConfig(max_translation=0.08, max_rotation=0.12),
    posegraph=PoseGraphConfig(max_nodes=64, max_edges=256, gn_iters=15,
                              lc_min_gap=3, lc_max_dist=0.6,
                              lc_max_residual=0.05, lc_min_inliers=0.3),
    voxel=VoxelConfig(capacity=1 << 13, map_capacity=1 << 15),
)

FRAMES = 48


@pytest.fixture(scope="module")
def two_lap_sequence():
    gt = loop_trajectory(FRAMES, cycles=2, radius=0.35)
    depths = np.stack(
        [render_depth(gt[i], K, H, W, seed=i) for i in range(FRAMES)]
    ).astype(np.float32)
    return gt, depths


def _run_per_frame(depths):
    slam = SlamSystem(K, CFG, enable_loop_closure=True)
    for i in range(len(depths)):
        slam.process(depths[i], timestamp=i / 30.0)
    slam.finalize()
    return slam


def _run_chunked(depths, chunk: int):
    slam = SlamSystem(K, CFG, enable_loop_closure=True)
    ts = np.arange(len(depths)) / 30.0
    for i in range(0, len(depths), chunk):
        slam.process_chunk(depths[i:i + chunk], ts[i:i + chunk])
    slam.finalize()
    return slam


def test_chunked_matches_per_frame(two_lap_sequence):
    gt, depths = two_lap_sequence
    ref = _run_per_frame(depths)
    chk = _run_chunked(depths, chunk=8)

    # identical keyframe decisions (the scan mirrors _promote_flags)
    assert len(chk.odo.keyframes) == len(ref.odo.keyframes)
    assert [r.index for r in chk.odo.keyframes] == [
        r.index for r in ref.odo.keyframes]
    # the loop must actually close in both drivers; the exact closure SET
    # is order-dependent (per-frame interleaves proposals with tracking,
    # chunked batches them at boundaries with the same per-promotion
    # opportunity count) — require comparable coverage, and below, the
    # metric that matters: the same trajectory
    assert len(ref.closures) >= 1
    assert len(chk.closures) >= max(1, len(ref.closures) // 2), (
        len(ref.closures), len(chk.closures))

    ts_r, est_r = ref.trajectory()
    ts_c, est_c = chk.trajectory()
    assert est_c.shape == est_r.shape
    gt_ts = np.arange(FRAMES) / 30.0
    m_r = ate_rmse(ts_r, est_r, gt_ts, gt, max_difference=0.005)
    m_c = ate_rmse(ts_c, est_c, gt_ts, gt, max_difference=0.005)
    assert m_r["rmse"] < 0.02 and m_c["rmse"] < 0.02, (m_r, m_c)
    # the two drivers track the same trajectory (same math, different
    # program — allow float-level divergence only)
    d = np.linalg.norm(est_c[:, :3, 3] - est_r[:, :3, 3], axis=-1)
    assert d.max() < 5e-3, d.max()


def test_chunked_async_backend_parity(two_lap_sequence):
    """chunk streaming + async backend worker (the combination the TPU
    benchmark reports as `slam_fps_chunked_async`): the worker gets one
    queued fused verify+optimize attempt per promotion — same opportunity
    count as the sync path — and finalize drains it, so keyframes and
    trajectory must match and the loop must close comparably."""
    gt, depths = two_lap_sequence
    ref = _run_chunked(depths, chunk=8)

    slam = SlamSystem(K, CFG, enable_loop_closure=True, async_backend=True)
    ts = np.arange(len(depths)) / 30.0
    for i in range(0, len(depths), 8):
        slam.process_chunk(depths[i:i + 8], ts[i:i + 8])
    slam.finalize()

    assert [r.index for r in slam.odo.keyframes] == [
        r.index for r in ref.odo.keyframes]
    assert len(slam.closures) >= max(1, len(ref.closures) // 2), (
        len(ref.closures), len(slam.closures))
    ts_a, est_a = slam.trajectory()
    gt_ts = np.arange(FRAMES) / 30.0
    m_a = ate_rmse(ts_a, est_a, gt_ts, gt, max_difference=0.005)
    assert m_a["rmse"] < 0.02, m_a


def test_chunked_resume_from_checkpoint(two_lap_sequence, tmp_path):
    """Checkpoint mid-sequence, restore into a fresh system, continue with
    process_chunk: the restored system has no packed keyframe tables
    (kf_packed is rebuilt lazily) and must keep tracking — the trajectory
    tail must match the uninterrupted chunked run."""
    from tpuslam.utils.checkpoint import load_checkpoint, save_checkpoint

    gt, depths = two_lap_sequence
    ref = _run_chunked(depths, chunk=8)

    half = 24
    a = SlamSystem(K, CFG, enable_loop_closure=True)
    ts = np.arange(len(depths)) / 30.0
    for i in range(0, half, 8):
        a.process_chunk(depths[i:i + 8], ts[i:i + 8])
    path = str(tmp_path / "ck.npz")
    save_checkpoint(path, a, a.odo.frame_idx)

    b = SlamSystem(K, CFG, enable_loop_closure=True)
    start = load_checkpoint(path, b)
    assert start == half
    for i in range(start, len(depths), 8):
        b.process_chunk(depths[i:i + 8], ts[i:i + 8])
    b.finalize()

    ts_b, est_b = b.trajectory()
    gt_ts = np.arange(FRAMES) / 30.0
    m_b = ate_rmse(ts_b[-(FRAMES - half):], est_b[-(FRAMES - half):],
                   gt_ts, gt, max_difference=0.005)
    assert m_b["rmse"] < 0.02, m_b
    # same keyframe decisions after the resume point as uninterrupted
    assert [r.index for r in b.odo.keyframes] == [
        r.index for r in ref.odo.keyframes]


def test_chunked_bootstrap_and_remainder(two_lap_sequence):
    """A fresh system's first chunk seeds the keyframe per-frame; odd-size
    remainder chunks work (each size is just a separate compile)."""
    gt, depths = two_lap_sequence
    slam = SlamSystem(K, CFG, enable_loop_closure=True)
    ts = np.arange(FRAMES) / 30.0
    out0 = slam.process_chunk(depths[:8], ts[:8])       # bootstrap chunk
    assert out0.shape == (8, 4, 4)
    assert len(slam.odo.keyframes) >= 1
    out1 = slam.process_chunk(depths[8:16], ts[8:16])   # scan chunk
    assert out1.shape == (8, 4, 4)
    out2 = slam.process_chunk(depths[16:21], ts[16:21])  # remainder size 5
    assert out2.shape == (5, 4, 4)
    assert len(slam.odo.trajectory) == 21
    assert len(slam.odo.frame_refs) == 21
    assert slam.graph.num_nodes == len(slam.odo.keyframes)


def _run_boundary(depths, chunk: int, async_backend: bool = False):
    slam = SlamSystem(K, CFG, enable_loop_closure=True,
                      chunk_mode="boundary", async_backend=async_backend)
    ts = np.arange(len(depths)) / 30.0
    for i in range(0, len(depths), chunk):
        slam.process_chunk(depths[i:i + chunk], ts[i:i + chunk])
    slam.finalize()
    return slam


def test_boundary_mode_tracks_and_closes(two_lap_sequence):
    """Boundary-promotion chunking (VERDICT r4 #1): the frozen-keyframe
    scan must track the loop at comparable ATE with sparser keyframes
    (at most one promotion per chunk) and still close the loop."""
    gt, depths = two_lap_sequence
    ref = _run_chunked(depths, chunk=8)          # inline-promotion baseline
    b = _run_boundary(depths, chunk=8)

    assert len(b.odo.keyframes) >= FRAMES // 8 - 1   # promotes regularly
    assert len(b.odo.keyframes) <= len(ref.odo.keyframes)
    assert len(b.closures) >= 1
    ts_b, est_b = b.trajectory()
    gt_ts = np.arange(FRAMES) / 30.0
    m_b = ate_rmse(ts_b, est_b, gt_ts, gt, max_difference=0.005)
    assert m_b["rmse"] < 0.02, m_b
    # one keyframe record per promotion flag the host committed
    promoted = sum(1 for s in b.odo.stats if s.get("promoted"))
    assert promoted == len(b.odo.keyframes)
    # promoted keyframe indices are consistent with their records
    for r in b.odo.keyframes:
        assert 0 <= r.index < FRAMES


def test_boundary_deferred_backend_bit_deterministic(two_lap_sequence):
    """The deferred backend (VERDICT r4 #5): closure set and trajectory
    must be BYTE-IDENTICAL to the synchronous boundary run, and identical
    across repeated deferred runs — the frozen-keyframe scan output is
    pose-correction-independent, so deferring the attempt readback one
    chunk cannot change any decision."""
    gt, depths = two_lap_sequence
    sync = _run_boundary(depths, chunk=8, async_backend=False)
    runs = [_run_boundary(depths, chunk=8, async_backend=True)
            for _ in range(3)]

    sync_set = [(c.i, c.j) for c in sync.closures]
    _, est_sync = sync.trajectory()
    for d in runs:
        assert [(c.i, c.j) for c in d.closures] == sync_set
        _, est_d = d.trajectory()
        np.testing.assert_array_equal(est_d, est_sync)
        assert [r.index for r in d.odo.keyframes] == [
            r.index for r in sync.odo.keyframes]


def test_superchunk_matches_chunk8(two_lap_sequence):
    """A super-chunk (N×8 frames per call) runs N sub-chunks in ONE
    dispatch with on-device boundary promotion — the tracking and
    keyframe decisions must be identical to N separate 8-frame calls
    (backend attempts run at call boundaries, so closure timing may
    differ; the trajectory must stay equivalent)."""
    gt, depths = two_lap_sequence
    ref = _run_boundary(depths, chunk=8)
    sup = _run_boundary(depths, chunk=24)         # 3 sub-chunks per call

    assert [r.index for r in sup.odo.keyframes] == [
        r.index for r in ref.odo.keyframes]
    assert len(sup.closures) >= 1
    ts_s, est_s = sup.trajectory()
    gt_ts = np.arange(FRAMES) / 30.0
    m_s = ate_rmse(ts_s, est_s, gt_ts, gt, max_difference=0.005)
    assert m_s["rmse"] < 0.02, m_s
    # deferred super-chunks stay bit-deterministic too
    d1 = _run_boundary(depths, chunk=24, async_backend=True)
    d2 = _run_boundary(depths, chunk=24, async_backend=True)
    np.testing.assert_array_equal(d1.trajectory()[1], d2.trajectory()[1])
    assert [(c.i, c.j) for c in d1.closures] == [
        (c.i, c.j) for c in d2.closures]


def test_boundary_odd_lengths_and_sub_fallback(two_lap_sequence):
    """Chunk lengths not divisible by chunk_sub fall back to one
    sub-chunk spanning the whole call; chunk_sub larger than the chunk
    likewise.  Library users may feed arbitrary lengths — the CLI only
    sends full chunks, but the fallback must stay correct."""
    gt, depths = two_lap_sequence
    slam = SlamSystem(K, CFG, enable_loop_closure=True,
                      chunk_mode="boundary", chunk_sub=8)
    ts = np.arange(FRAMES) / 30.0
    lengths = [8, 6, 12, 8, 5, 9]                     # sums to 48
    i = 0
    for ln in lengths:
        out = slam.process_chunk(depths[i:i + ln], ts[i:i + ln])
        assert out.shape == (ln, 4, 4)
        i += ln
    slam.finalize()
    assert len(slam.odo.trajectory) == FRAMES
    ts_e, est = slam.trajectory()
    m = ate_rmse(ts_e, est, ts, gt, max_difference=0.005)
    assert m["rmse"] < 0.02, m


def test_boundary_lost_replays_per_frame(two_lap_sequence):
    """Boundary mode keeps the lost-chunk per-frame replay semantics."""
    gt, depths = two_lap_sequence
    depths = depths.copy()
    depths[18:20] = 0.0
    slam = SlamSystem(K, CFG, enable_loop_closure=True,
                      chunk_mode="boundary")
    ts = np.arange(FRAMES) / 30.0
    for i in range(0, FRAMES, 8):
        slam.process_chunk(depths[i:i + 8], ts[i:i + 8])
    slam.finalize()
    assert len(slam.odo.trajectory) == FRAMES
    assert any(s.get("lost", False) for s in slam.odo.stats)
    ts_e, est = slam.trajectory()
    assert np.all(np.isfinite(est))
    m = ate_rmse(ts_e[24:], est[24:], np.arange(24, FRAMES) / 30.0, gt[24:],
                 max_difference=0.005)
    assert m["rmse"] < 0.05, m


def test_boundary_remainder_and_mode_mixing(two_lap_sequence):
    """Odd-size remainders step per-frame inside process_chunk; a deferred
    pending attempt outstanding at that point must drain first (the
    per-frame path and finalize both call _drain_pending)."""
    gt, depths = two_lap_sequence
    slam = SlamSystem(K, CFG, enable_loop_closure=True,
                      chunk_mode="boundary", async_backend=True)
    ts = np.arange(FRAMES) / 30.0
    for i in range(0, 40, 8):
        slam.process_chunk(depths[i:i + 8], ts[i:i + 8])
    # remainder frames per-frame, with a pending attempt possibly in flight
    for i in range(40, FRAMES):
        slam.process(depths[i], timestamp=ts[i])
    slam.finalize()
    assert slam._pending_attempt is None
    assert len(slam.odo.trajectory) == FRAMES
    ts_e, est = slam.trajectory()
    m = ate_rmse(ts_e, est, ts, gt, max_difference=0.005)
    assert m["rmse"] < 0.02, m


def test_boundary_raw_uint16_bit_equals_f32(two_lap_sequence):
    """--upload-raw through the chunked path: uint16 depth counts divided
    on device must produce the BIT-identical trajectory to f32 metres
    (same guarantee the scan-odometry test makes, here through
    process_chunk's superchunk scan + promotion bundles)."""
    gt, depths = two_lap_sequence
    scale = 5000.0
    raw = np.round(np.asarray(depths, np.float64) * scale).astype(np.uint16)
    host_divided = raw.astype(np.float32) / scale
    import dataclasses

    cfg = dataclasses.replace(CFG, depth_scale=scale)

    def run(d):
        slam = SlamSystem(K, cfg, enable_loop_closure=True,
                          chunk_mode="boundary")
        ts = np.arange(len(d)) / 30.0
        for i in range(0, len(d), 8):
            slam.process_chunk(d[i:i + 8], ts[i:i + 8])
        slam.finalize()
        return slam.trajectory()[1]

    np.testing.assert_array_equal(run(host_divided), run(raw))


def test_chunked_lost_replays_per_frame(two_lap_sequence):
    """A chunk containing an untrackable frame commits nothing and replays
    per-frame, so loss accounting and relocalization engage."""
    gt, depths = two_lap_sequence
    depths = depths.copy()
    depths[18:20] = 0.0                  # two garbage frames mid-sequence
    slam = SlamSystem(K, CFG, enable_loop_closure=True)
    ts = np.arange(FRAMES) / 30.0
    for i in range(0, FRAMES, 8):
        slam.process_chunk(depths[i:i + 8], ts[i:i + 8])
    slam.finalize()
    assert len(slam.odo.trajectory) == FRAMES
    lost = [s.get("lost", False) for s in slam.odo.stats]
    assert any(lost), "garbage frames must be recorded as lost"
    ts_e, est = slam.trajectory()
    assert np.all(np.isfinite(est))
    # tracking recovers after the dropout (relocalization or re-lock):
    # compare only the post-dropout segment against ground truth
    m = ate_rmse(ts_e[24:], est[24:], np.arange(24, FRAMES) / 30.0, gt[24:],
                 max_difference=0.005)
    assert m["rmse"] < 0.05, m
