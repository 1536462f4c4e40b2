"""Shared backend-verification plumbing (loop closure + relocalization).

Both consumers verify a candidate alignment with the SAME evidence — an
ICP result's flat scalars plus the normal-coverage observability
eigenvalue, judged by the SAME four gates — so the row layout, the
on-device scalar packing, and the gate predicate live here exactly once.
The callers differ only in HOW they batch alignments (keyframe pairs vs a
fixed lost frame against candidate keyframes) and in what they do with an
accepted row.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from tpuslam.config import PoseGraphConfig
from tpuslam.icp import FlatICP, ICPResult, flat_icp_scalars

# column appended after the FlatICP block: smallest eigenvalue of the
# normalized inlier normal-coverage matrix (Σw·nnᵀ)/Σw — the observability
# gate, computed on device so ONE readback carries every gate input
COVERAGE_COL = FlatICP.SIZE
ROW_SIZE = FlatICP.SIZE + 1


def flat_verify_scalars(res: ICPResult) -> jnp.ndarray:
    """(ROW_SIZE,) f32: FlatICP scalars + the coverage eigenvalue (traceable)."""
    Hr = res.H[:3, :3]
    w_sum = jnp.maximum(jnp.trace(Hr), 1e-9)
    cov = jnp.linalg.eigvalsh(Hr / w_sum)[0]
    return jnp.concatenate(
        [flat_icp_scalars(res), cov[None].astype(jnp.float32)])


def uniform_verify_table(records, ids):
    """The shared VerifyTable meta of keyframe `ids` — or None.

    The projective verification batch stacks retained tables, so every
    candidate must carry one with IDENTICAL shape and (height, width,
    level); mixed records (e.g. restored from a checkpoint written under a
    different verify_level) make the caller fall back to the grid path
    rather than stacking ragged tables or mis-scaling intrinsics."""
    v0 = records[ids[0]].verify
    if v0 is None:
        return None
    for k in ids:
        v = records[k].verify
        if (v is None or v.packed.shape != v0.packed.shape
                or (v.height, v.width, v.level)
                != (v0.height, v0.width, v0.level)):
            return None
    return v0


def passes_gates_traced(rows: "jnp.ndarray", pg_cfg: PoseGraphConfig):
    """Traceable batch form of `passes_gates`: (B, ROW_SIZE) → (B,) f32
    accept mask, bit-identical decisions (same f32 values, same compares).

    Lets the pose-graph optimization consume freshly-verified candidate
    edges ON DEVICE (weight = 2·accept) in the same dispatch chain as the
    verification itself — the host then reads verification rows and
    optimized poses back in ONE sync and mirrors these exact decisions
    (slam.SlamSystem._attempt_loop_closure)."""
    import jax.numpy as jnp

    T = rows[:, FlatICP.T].reshape(-1, 4, 4)
    ok = (
        (rows[:, FlatICP.CONVERGED] > 0.5)
        & (rows[:, FlatICP.RMS] <= pg_cfg.lc_max_residual)
        & (rows[:, FlatICP.INLIER_FRACTION] >= pg_cfg.lc_min_inliers)
        & (rows[:, COVERAGE_COL] >= pg_cfg.lc_min_normal_coverage)
        & jnp.all(jnp.isfinite(T), axis=(1, 2))
    )
    return ok.astype(rows.dtype)


def passes_gates(row: np.ndarray, pg_cfg: PoseGraphConfig) -> bool:
    """Acceptance gates over one flat verification row: converged, residual
    RMS, inlier fraction, normal-coverage observability, finite pose.

    If the inlier normals don't span 3-D (featureless-wall overlap) the
    estimate can slide in-plane with tiny residual — such a "closure" would
    only re-encode drift, hence the coverage gate.

    Thresholds are compared at FLOAT32 so decisions are bit-identical to
    the device-side `passes_gates_traced` (which weights candidate edges
    in the fused verify+optimize dispatch): promoting the f32 row value to
    f64 against the python-float threshold flips knife-edge rows — e.g.
    f32(0.05) > 0.05 in f64 — and the host would then disagree with the
    solve it is mirroring."""
    T = row[FlatICP.T].reshape(4, 4)
    return (
        bool(row[FlatICP.CONVERGED] > 0.5)
        and np.float32(row[FlatICP.RMS]) <= np.float32(pg_cfg.lc_max_residual)
        and np.float32(row[FlatICP.INLIER_FRACTION])
        >= np.float32(pg_cfg.lc_min_inliers)
        and np.float32(row[COVERAGE_COL])
        >= np.float32(pg_cfg.lc_min_normal_coverage)
        and bool(np.all(np.isfinite(T)))
    )
