"""BASELINE config-5-SCALE end-to-end run (VERDICT r2 next-round #1).

2,000 frames — fr3/long_office length — through the `run_slam` CLI on a
multi-lap synthetic loop, with keyframe thresholds tightened so the
trajectory promotes ~300 keyframes: PAST the round-2 wall (GraphHost raised
RuntimeError at max_nodes=256; max_keyframes was unenforced).  Asserts:

  * no capacity exception — the pose graph grows (amortized doubling) and
    `optimize` auto-switches to the matrix-free CG solver past 256 nodes,
  * bounded memory — retained keyframe clouds ≤ budget + protected anchors,
  * ≥2 verified loop closures across the revisits,
  * ATE at the synthetic noise floor.

~60-90 s on the CI CPU backend (the single most expensive test in the
suite — it is the capacity proof, keep it).
"""

import json

from tpuslam.cli import main as cli_main
from tpuslam.config import (
    ICPConfig,
    Intrinsics,
    KeyframeConfig,
    PoseGraphConfig,
    SLAMConfig,
    VoxelConfig,
)
from tpuslam.data.synthetic import loop_trajectory, write_tum_sequence

FRAMES = 2000
H, W = 120, 160
K = Intrinsics(160.0, 160.0, 79.5, 59.5)

CFG = SLAMConfig(
    height=H,
    width=W,
    icp=ICPConfig(pyramid_levels=3, iters_per_level=(12, 8, 8),
                  max_corr_dist=0.25, huber_delta=0.05),
    # tight promotion thresholds → ~310 keyframes over the 5 laps,
    # exceeding the old 256-node wall by construction
    keyframe=KeyframeConfig(max_translation=0.015, max_rotation=0.03,
                            max_keyframes=48, sparsify_protect_recent=4),
    # deliberately tiny INITIAL capacities: the run must double node
    # storage 4× (32 → 512) and edge storage likewise
    posegraph=PoseGraphConfig(max_nodes=32, max_edges=64, gn_iters=15,
                              solver="auto", dense_max_nodes=256,
                              lc_min_gap=20, lc_max_dist=0.08,
                              lc_max_residual=0.05, lc_min_inliers=0.3),
    voxel=VoxelConfig(capacity=1 << 12, map_capacity=1 << 15),
)


def test_run_slam_2000_frames_capacity(tmp_path, capsys):
    seq = tmp_path / "seq"
    poses = loop_trajectory(FRAMES, cycles=5)
    write_tum_sequence(str(seq), FRAMES, K, H, W, poses=poses)
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(CFG.to_json())
    traj = tmp_path / "traj.txt"

    rc = cli_main([
        "run_slam",
        "--sequence", str(seq),
        "--config", str(cfg_path),
        "--traj-out", str(traj),
    ])
    out = capsys.readouterr().out.strip().splitlines()
    summary = json.loads(out[-1])
    assert rc == 0
    assert summary["frames"] == FRAMES
    # past the round-2 wall, no RuntimeError on the way
    assert summary["graph_nodes"] > 256, summary
    assert summary["keyframes"] == summary["graph_nodes"]
    # memory bounded: cloud retention stays near the budget (protected
    # loop-closure anchors may push it slightly above max_keyframes)
    assert summary["retained_clouds"] <= CFG.keyframe.max_keyframes + 24, (
        summary)
    # the revisits produced verified closures
    assert summary["loop_closures"] >= 2, summary
    # trajectory at the synthetic noise floor
    assert summary["ate_rmse_m"] < 0.02, summary
    # trajectory file covers every frame
    n_lines = sum(1 for line in traj.read_text().splitlines()
                  if line and not line.startswith("#"))
    assert n_lines == FRAMES
