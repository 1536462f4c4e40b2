"""Relocalization after tracking loss (extends SURVEY.md §2a R9/R12).

Reference status: none — the reference prototype has no recovery path; a
lost track coasts and the trajectory diverges (SURVEY.md §2a has no
relocalization row).  A production system needs one, and every mechanism it
takes is already built: candidate search is the loop-closure proximity
proposal and verification is the same gated grid-hash ICP
(backend/loopclosure.py), just run between the *current frame's* cloud and
stored keyframe clouds instead of keyframe pairs.

Host-side control (a few candidates, each one jitted alignment); triggered
by the SLAM system after `reloc_after` consecutive lost frames.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Sequence

import numpy as np

from tpuslam.backend.loopclosure import verify_closure
from tpuslam.config import ICPConfig, PoseGraphConfig
from tpuslam.geom.cloud import PointCloud


class Relocalization(NamedTuple):
    kf_id: int               # keyframe the frame re-anchored on
    T_kf_cam: np.ndarray     # (4, 4) verified camera pose in that keyframe
    rms: float
    inlier_fraction: float


def relocalize(
    frame_cloud: PointCloud,
    keyframes,                      # Sequence[KeyframeRecord]
    T_last_world_cam: np.ndarray,
    icp_cfg: ICPConfig,
    pg_cfg: PoseGraphConfig,
    max_candidates: int = 4,
    max_dist: Optional[float] = None,
) -> Optional[Relocalization]:
    """Try to re-anchor a lost frame on a stored keyframe.

    Candidates are keyframes ordered by distance of their origin to the last
    known camera position (bounded by `max_dist`, default 2× the
    loop-closure radius — the camera can't have gone far during a short
    loss).  Each candidate is verified with the loop-closure ICP gates
    (convergence, residual, inliers, normal-coverage observability); the
    first that passes wins.
    """
    if max_dist is None:
        max_dist = 2.0 * pg_cfg.lc_max_dist
    p_last = np.asarray(T_last_world_cam, dtype=np.float64)[:3, 3]
    order = []
    for k, rec in enumerate(keyframes):
        if rec.cloud is None:
            continue
        d = float(np.linalg.norm(
            rec.T_world_kf.astype(np.float64)[:3, 3] - p_last))
        order.append((d, k))
    order.sort()
    # The radius prunes when the last estimate is trustworthy; when nothing
    # is inside it the estimate itself is the casualty (that is WHY we are
    # lost) — fall back to the nearest keyframes and let the ICP gates
    # decide.
    in_radius = [o for o in order if o[0] <= max_dist]
    order = in_radius if in_radius else order
    for _, k in order[:max_candidates]:
        rec = keyframes[k]
        T_est = (
            np.linalg.inv(rec.T_world_kf.astype(np.float64))
            @ np.asarray(T_last_world_cam, dtype=np.float64)
        )
        # Two initializations per candidate: the current estimate (valid
        # when loss was brief occlusion) and identity — the camera sat at
        # the keyframe's own pose when it was promoted, so identity is in
        # the ICP basin whenever the camera has RETURNED somewhere mapped,
        # which is exactly the case where the estimate itself is garbage.
        for T_init in (T_est, np.eye(4)):
            v = verify_closure(rec.cloud, frame_cloud, T_init, icp_cfg,
                               pg_cfg)
            if v is not None:
                return Relocalization(kf_id=k, T_kf_cam=v.T_ij, rms=v.rms,
                                      inlier_fraction=v.inlier_fraction)
    return None
