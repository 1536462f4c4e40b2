"""TUM loader + trajectory I/O + ATE tests against an on-disk synthetic
TUM-format sequence (SURVEY.md §4 fixtures; BASELINE.json configs 2-3)."""

import numpy as np
import pytest

from tpuslam.config import Intrinsics
from tpuslam.data.synthetic import write_tum_sequence
from tpuslam.data.tum import (
    TumSequence,
    associate,
    read_trajectory,
    write_trajectory,
)
from tpuslam.eval.ate import ate_rmse, horn_align, rpe

K = Intrinsics(160.0, 160.0, 79.5, 59.5)
H, W = 120, 160


@pytest.fixture(scope="module")
def tum_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("synthetic_tum")
    poses = write_tum_sequence(str(root), num_frames=6, K=K, height=H, width=W)
    return str(root), poses


def test_sequence_roundtrip(tum_dir):
    root, poses = tum_dir
    seq = TumSequence(root)
    assert len(seq) == 6
    frame = seq.frame(0)
    assert frame.depth.shape == (H, W)
    assert frame.depth.dtype == np.float32
    # depth quantization error ≤ 1/5000 ≈ 0.2 mm (+ rounding)
    assert 0.5 < frame.depth[frame.depth > 0].mean() < 5.0
    assert frame.gt_pose is not None
    np.testing.assert_allclose(frame.gt_pose, poses[0], atol=1e-5)


def test_prefetch_iterator(tum_dir):
    root, _ = tum_dir
    seq = TumSequence(root)
    frames = list(seq.frames())
    assert len(frames) == 6
    assert frames[3].timestamp > frames[0].timestamp


def test_depth_quantization(tum_dir):
    root, _ = tum_dir
    seq = TumSequence(root)
    from tpuslam.data.synthetic import render_depth

    ref = render_depth(seq.frame(2).gt_pose, K, H, W)
    got = seq.frame(2).depth
    valid = ref > 0
    # PNG quantization (0.5/5000) + pose-text quantization (%.6f quaternion
    # re-rendered) bound the reconstruction error
    assert np.abs(got[valid] - ref[valid]).max() < 5e-4


def test_raw_uint16_frames(tum_dir, tmp_path):
    """frames(raw=True) yields the PNG's uint16 counts untouched (the
    --upload-raw wire format); a cached f32 sidecar must reconstruct the
    identical counts (÷scale error ~2⁻²⁴ ≪ the 0.5-count threshold)."""
    root, _ = tum_dir
    seq = TumSequence(root, depth_cache=False)
    f32 = seq.frame(1)
    raw = seq.frame(1, raw=True)
    assert raw.depth.dtype == np.uint16
    np.testing.assert_array_equal(
        raw.depth, np.round(f32.depth * 5000.0).astype(np.uint16))
    for f in seq.frames(raw=True):
        assert f.depth.dtype == np.uint16
    # cached reconstruction path: build the sidecar, re-read raw
    import shutil

    croot = str(tmp_path / "cached")
    shutil.copytree(root, croot)
    cseq = TumSequence(croot)
    for _ in cseq.frames():          # build + publish sidecar
        pass
    cseq2 = TumSequence(croot)
    assert cseq2._open_cache(5000.0) is not None
    raw_cached = cseq2.frame(1, raw=True)
    np.testing.assert_array_equal(raw_cached.depth, raw.depth)


def test_associate_greedy():
    a = [(1.0, []), (2.0, []), (3.0, [])]
    b = [(1.005, []), (2.5, []), (3.002, [])]
    m = associate(a, b, max_difference=0.02)
    assert m == [(0, 0), (2, 2)]


def test_trajectory_io(tmp_path, rng):
    from scipy.spatial.transform import Rotation

    n = 10
    poses = np.tile(np.eye(4), (n, 1, 1))
    poses[:, :3, :3] = Rotation.random(n, rng).as_matrix()
    poses[:, :3, 3] = rng.normal(size=(n, 3))
    ts = 100.0 + np.arange(n) / 30.0
    path = str(tmp_path / "traj.txt")
    write_trajectory(path, ts, poses)
    ts2, poses2 = read_trajectory(path)
    np.testing.assert_allclose(ts2, ts, atol=1e-5)
    np.testing.assert_allclose(poses2, poses, atol=1e-4)


def test_horn_align_exact(rng):
    from scipy.spatial.transform import Rotation

    R_true = Rotation.random(1, rng).as_matrix()[0]
    t_true = np.array([0.3, -0.2, 1.0])
    pts = rng.normal(size=(50, 3))
    moved = pts @ R_true.T + t_true
    R, t = horn_align(pts, moved)
    np.testing.assert_allclose(R, R_true, atol=1e-9)
    np.testing.assert_allclose(t, t_true, atol=1e-9)


def test_ate_zero_for_identical(rng):
    n = 20
    poses = np.tile(np.eye(4), (n, 1, 1))
    poses[:, :3, 3] = rng.normal(size=(n, 3))
    ts = np.arange(n) / 30.0
    m = ate_rmse(ts, poses, ts, poses)
    assert m["rmse"] < 1e-12
    r = rpe(ts, poses, ts, poses)
    assert r["trans_rmse"] < 1e-12


def test_ate_invariant_to_global_transform(rng):
    """ATE after Horn alignment ignores the arbitrary world frame."""
    from scipy.spatial.transform import Rotation

    n = 20
    poses = np.tile(np.eye(4), (n, 1, 1))
    poses[:, :3, 3] = rng.normal(size=(n, 3))
    G = np.eye(4)
    G[:3, :3] = Rotation.random(1, rng).as_matrix()[0]
    G[:3, 3] = [5.0, -2.0, 1.0]
    moved = np.einsum("ij,njk->nik", G, poses)
    ts = np.arange(n) / 30.0
    m = ate_rmse(ts, moved, ts, poses)
    assert m["rmse"] < 1e-9


def test_depth_cache_roundtrip_and_invalidation(tmp_path):
    """First full iteration publishes the raw-depth sidecar; cached reads
    are bit-exact; depth.txt mtime or scale changes invalidate it."""
    import os

    write_tum_sequence(str(tmp_path), 5, K, H, W)
    seq = TumSequence(str(tmp_path))
    assert seq._open_cache(5000.0) is None
    ref = [f.depth.copy() for f in seq.frames()]      # builds the sidecar
    assert (tmp_path / "depth_cache.npy").exists()
    assert (tmp_path / "depth_cache.json").exists()

    seq2 = TumSequence(str(tmp_path))
    assert seq2._open_cache(5000.0) is not None
    got = [f.depth for f in seq2.frames()]
    assert len(got) == 5
    for a, b in zip(ref, got):
        np.testing.assert_array_equal(a, b)
    # a different depth scale must not read the stale cache
    assert seq2._open_cache(1000.0) is None
    f_rescaled = seq2.frame(0, depth_scale=1000.0)
    np.testing.assert_allclose(f_rescaled.depth, ref[0] * 5.0, rtol=1e-6)

    # bump depth.txt's mtime → sidecar is stale
    p = tmp_path / "depth.txt"
    st = os.stat(p)
    os.utime(p, ns=(st.st_atime_ns, st.st_mtime_ns + 1_000_000))
    seq3 = TumSequence(str(tmp_path))
    assert seq3._open_cache(5000.0) is None
    # ... and a fresh full pass republishes a valid one
    list(seq3.frames())
    assert seq3._open_cache(5000.0) is not None

    # regenerating a PNG IN PLACE (same filename, depth.txt untouched)
    # must also invalidate: the stamp covers the PNG files themselves
    rel = seq3.depth_list[2][1][0]
    png = tmp_path / rel
    st = os.stat(png)
    os.utime(png, ns=(st.st_atime_ns, st.st_mtime_ns + 2_000_000_000))
    seq4 = TumSequence(str(tmp_path))
    assert seq4._open_cache(5000.0) is None


def test_depth_cache_partial_iteration_not_published(tmp_path):
    """An abandoned or windowed iteration must not publish a sidecar."""
    write_tum_sequence(str(tmp_path), 5, K, H, W)
    seq = TumSequence(str(tmp_path))
    gen = seq.frames()
    next(gen)
    gen.close()
    assert not (tmp_path / "depth_cache.npy").exists()
    assert not (tmp_path / "depth_cache.npy.tmp").exists()
    list(seq.frames(start=1))                # windowed: no build attempted
    assert not (tmp_path / "depth_cache.npy").exists()
    seq_off = TumSequence(str(tmp_path), depth_cache=False)
    list(seq_off.frames())
    assert not (tmp_path / "depth_cache.npy").exists()


def test_rgb_association_and_decode(tmp_path):
    """rgb.txt parsing + depth<->rgb timestamp association (SURVEY §2a R1)."""
    from tpuslam.config import Intrinsics
    from tpuslam.data.synthetic import write_tum_sequence
    from tpuslam.data.tum import TumSequence

    K = Intrinsics(80.0, 80.0, 39.5, 29.5)
    write_tum_sequence(str(tmp_path), 4, K, 60, 80, rgb=True)
    seq = TumSequence(str(tmp_path), load_rgb=True)
    assert seq.rgb_list is not None and len(seq.rgb_list) == 4
    f = seq.frame(0)
    assert f.rgb is not None and f.rgb.shape == (60, 80, 3)
    assert f.rgb.dtype.kind == "u"
    # depth-only loads are unaffected
    f2 = TumSequence(str(tmp_path)).frame(0)
    assert f2.rgb is None
