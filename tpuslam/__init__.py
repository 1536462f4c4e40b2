"""tpuslam — a TPU-native dense RGB-D SLAM engine.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the
``BenniG123/icp-slam-prototype`` reference (a single-process CPU C++ ICP-SLAM
prototype; see SURVEY.md §1-2 — the reference mount was empty, so provenance
is the driver-pinned BASELINE.json north-star rather than file:line cites).

Pipeline (reference parity, SURVEY.md §2a R1-R15):
  depth → backprojection → normals → voxel downsample → point-to-plane ICP
  (projective/grid-hash correspondence, Huber-weighted 6x6 Gauss-Newton)
  → keyframes + voxel map → pose graph + loop closure → ATE evaluation.

TPU-native additions (SURVEY.md §2b-2d): fixed-shape/masked data discipline,
Pallas fused correspondence + GN-reduction kernels, `jax.sharding` mesh with
point-sharded ICP reduction and keyframe-sharded distributed pose-graph BA.
"""

__version__ = "0.1.0"

import os as _os

import jax as _jax

# This platform's default matmul precision is reduced (bf16-class): a 3x3
# `W @ W` differs from fp32 by ~1e-2, which silently wrecks SE(3) math and
# GN normal equations.  Geometry is metric (mm-scale accuracy at metre
# range), so full fp32 matmuls are the package default; hot kernels that can
# tolerate less opt down explicitly via `precision=`.
_jax.config.update("jax_default_matmul_precision", "highest")

# XLA compiles are slow in this environment (~0.5-1.5 s per tiny op);
# a persistent cache amortizes them across processes/test runs.
_cache_dir = _os.environ.get("TPUSLAM_COMPILE_CACHE", "/root/.cache/tpuslam-jax")
try:
    _jax.config.update("jax_compilation_cache_dir", _cache_dir)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
except Exception:  # pragma: no cover - older jax
    pass

from tpuslam.config import (  # noqa: F401
    Intrinsics,
    ICPConfig,
    VoxelConfig,
    KeyframeConfig,
    PoseGraphConfig,
    SLAMConfig,
)
