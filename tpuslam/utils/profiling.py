"""Tracing / profiling (SURVEY.md §5 "Tracing / profiling").

Reference status: wall-clock prints at best (SURVEY.md §5 [PK]).  Here:
`jax.profiler` trace capture (XProf/Perfetto-compatible) plus
`jax.named_scope` annotations on the pipeline stages so device traces read
as backproject → normals → correspond → gn_reduce → solve.
"""

from __future__ import annotations

import contextlib
import os

import jax


@contextlib.contextmanager
def trace(out_dir: str = "/tmp/tpuslam-trace"):
    """Capture a device trace viewable in XProf/Perfetto.

        with profiling.trace("/tmp/trace"):
            run_odometry(...)
    """
    os.makedirs(out_dir, exist_ok=True)
    jax.profiler.start_trace(out_dir)
    try:
        yield out_dir
    finally:
        jax.profiler.stop_trace()


scope = jax.named_scope  # re-export: pipeline stages annotate with this


def device_memory_stats() -> dict:
    """Per-device live-buffer stats (HBM watermark observability)."""
    out = {}
    for d in jax.devices():
        try:
            s = d.memory_stats()
        except Exception:
            s = None
        if s:
            out[str(d)] = {
                "bytes_in_use": s.get("bytes_in_use"),
                "peak_bytes_in_use": s.get("peak_bytes_in_use"),
                "bytes_limit": s.get("bytes_limit"),
            }
    return out
