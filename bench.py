#!/usr/bin/env python
"""Driver benchmark entry point: prints ONE JSON line with the headline
metric (ICP odometry frames/s/chip on TUM-shaped input; baseline target is
the BASELINE.json-pinned >=60 fps/chip — the reference publishes no numbers,
see BASELINE.md)."""

import json
import sys


def main() -> int:
    # 240-frame default (round 5; was 60): the scan is ONE dispatch, so a
    # short sequence carries the tunnel's fixed ~25-30 ms round trip as
    # ~0.4 ms/frame of phantom overhead — 60 frames read 694 fps where
    # 240 read 882 for identical code (device floor ≈970, BASELINE.md).
    # Real TUM sequences are 600-3000 frames; 240 is the more
    # representative point and still bounds compile/upload time.
    frames = int(sys.argv[1]) if len(sys.argv) > 1 else 240
    from tpuslam.bench.harness import run_bench

    r = run_bench(frames=frames, height=480, width=640)
    baseline_fps = 60.0  # BASELINE.json:5 target (no published reference numbers)
    detail = {
        "headline_variant": r.get("headline_variant", "classic"),
        "fps_classic": round(r["fps_per_chip"], 1),
        "ms_per_frame": round(r["ms_per_frame"], 3),
        "icp_iter_latency_ms": round(r["icp_iter_latency_ms"], 3),
        "ate_rmse_m": round(r["ate_rmse_m"], 6),
        "loader_fps": round(r["loader"]["decode_fps"], 1),
        "loader_cached_fps": round(r["loader"]["cached_fps"], 1),
        "device": r["device"],
        "frames": r["frames"],
    }
    if "fps_per_chip_boundary" in r:
        detail["fps_boundary"] = round(r["fps_per_chip_boundary"], 1)
        detail["ms_per_frame_boundary"] = round(r["ms_per_frame_boundary"], 3)
        detail["ate_rmse_m_boundary"] = round(r["ate_rmse_m_boundary"], 6)
    if "slam" in r:
        # full-system numbers (host-driven SlamSystem incl. loop closure +
        # optimization; latency-bound over the remote-TPU tunnel)
        detail["slam_fps"] = round(r["slam"]["slam_fps"], 1)
        detail["slam_fps_async"] = round(r["slam"]["slam_fps_async"], 1)
        detail["async_gain"] = round(r["slam"]["async_gain"], 3)
        detail["slam_fps_chunked"] = round(r["slam"]["slam_fps_chunked"], 1)
        detail["slam_fps_chunked_async"] = round(
            r["slam"]["slam_fps_chunked_async"], 1)
        detail["slam_fps_chunked_inline"] = round(
            r["slam"].get("slam_fps_chunked_inline", 0.0), 1)
        detail["slam_fps_reps"] = r["slam"].get("slam_fps_reps")
        detail["slam_loop_closures_chunked_async"] = (
            r["slam"]["loop_closures_chunked_async"])
        detail["slam_loop_closures_chunked_inline"] = (
            r["slam"].get("loop_closures_chunked_inline"))
        detail["upload_fps_equiv"] = round(r["slam"]["upload_fps_equiv"], 1)
        detail["slam_ate_rmse_m"] = round(r["slam"]["slam_ate_rmse_m"], 6)
        detail["slam_chunked_ate_rmse_m"] = round(
            r["slam"]["slam_chunked_ate_rmse_m"], 6)
        detail["slam_loop_closures"] = r["slam"]["loop_closures"]
        detail["slam_loop_closures_chunked"] = (
            r["slam"]["loop_closures_chunked"])
    fps = r.get("fps_headline", r["fps_per_chip"])
    print(
        json.dumps(
            {
                "metric": "icp_odometry_fps_per_chip",
                "value": round(fps, 3),
                "unit": "frames/s/chip@640x480",
                "vs_baseline": round(fps / baseline_fps, 3),
                "detail": detail,
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
