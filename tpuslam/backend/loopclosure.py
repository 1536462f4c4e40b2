"""Loop-closure detection + verification (SURVEY.md §2a R12, §2b N12).

Reference status: propose closures between revisited keyframes by geometric
proximity, verify with ICP (SURVEY.md §2a R12; provenance [B:5], [B:11]).

Design: proposal is trivial host-side numpy (pairwise keyframe positions —
K ≤ a few hundred); verification re-uses the jitted grid-hash ICP
(`align_clouds`, SURVEY.md §3.2) on the stored voxel-downsampled keyframe
clouds.  Acceptance gates on converged + residual RMS + inlier fraction.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import jax.numpy as jnp
import numpy as np

from tpuslam.config import ICPConfig, PoseGraphConfig
from tpuslam.geom import se3
from tpuslam.geom.cloud import PointCloud
from tpuslam.icp import align_clouds_jit


class ClosureCandidate(NamedTuple):
    i: int                  # earlier keyframe id
    j: int                  # later keyframe id
    dist: float             # metric distance between keyframe origins


class Closure(NamedTuple):
    i: int
    j: int
    T_ij: np.ndarray        # verified relative pose: node_i ← node_j
    rms: float
    inlier_fraction: float


def propose_candidates(
    kf_poses: Sequence[np.ndarray],
    cfg: PoseGraphConfig,
    exclude_pairs: set[tuple[int, int]] | None = None,
    max_candidates: int = 4,
) -> list[ClosureCandidate]:
    """Proximity-gated candidate pairs (i < j − lc_min_gap, |Δt| < radius).

    Returns closest-first, at most `max_candidates` (ICP verification is the
    expensive step — don't flood it)."""
    exclude_pairs = exclude_pairs or set()
    pos = np.asarray([T[:3, 3] for T in kf_poses], dtype=np.float32)
    k = len(pos)
    cands: list[ClosureCandidate] = []
    if k < 2:
        return cands
    # Fully vectorized proposal — no Python pair loop (a K² scan at
    # thousands of keyframes).  Eligible pairs: i < j − lc_min_gap and
    # within the proximity radius.
    d = np.linalg.norm(pos[:, None, :] - pos[None, :, :], axis=-1)
    ii, jj = np.nonzero(
        (d < cfg.lc_max_dist)
        & (np.arange(k)[None, :] - np.arange(k)[:, None] > cfg.lc_min_gap)
    )
    order = np.argsort(d[ii, jj], kind="stable")
    for o in order:
        i, j = int(ii[o]), int(jj[o])
        if (i, j) in exclude_pairs:
            continue
        cands.append(ClosureCandidate(i=i, j=j, dist=float(d[i, j])))
        if len(cands) >= max_candidates:
            break
    return cands


def verify_closure(
    cloud_i: PointCloud,
    cloud_j: PointCloud,
    T_init_ij: np.ndarray,
    icp_cfg: ICPConfig,
    pg_cfg: PoseGraphConfig,
) -> Closure | None:
    """ICP-verify candidate: align keyframe-j cloud onto keyframe-i cloud.

    Clouds are in their own keyframe camera frames; `T_init_ij` is the
    current graph estimate of node_i ← node_j (the initial guess).
    """
    res = align_clouds_jit(
        cloud_j, cloud_i, jnp.asarray(T_init_ij, dtype=jnp.float32),
        icp_cfg, use_grid=True,
    )
    rms = float(res.rms)
    inl = float(res.inlier_fraction)
    if not bool(res.converged):
        return None
    if rms > pg_cfg.lc_max_residual or inl < pg_cfg.lc_min_inliers:
        return None
    # Observability gate: H[:3,:3] = Σw·nnᵀ.  If the inlier normals don't
    # span 3-D (featureless-wall overlap), the estimate can slide in-plane
    # with tiny residual — such a closure would only re-encode drift.
    H = np.asarray(res.H, dtype=np.float64)
    w_sum = max(float(np.trace(H[:3, :3])), 1e-9)
    coverage = float(np.linalg.eigvalsh(H[:3, :3] / w_sum)[0])
    if coverage < pg_cfg.lc_min_normal_coverage:
        return None
    T = np.asarray(res.T, dtype=np.float64)
    if not np.all(np.isfinite(T)):
        return None
    return Closure(i=-1, j=-1, T_ij=T, rms=rms, inlier_fraction=inl)


def find_closures(
    keyframes,
    kf_poses: Sequence[np.ndarray],
    icp_cfg: ICPConfig,
    pg_cfg: PoseGraphConfig,
    exclude_pairs: set[tuple[int, int]] | None = None,
    max_candidates: int = 4,
) -> tuple[list[Closure], set[tuple[int, int]]]:
    """Full propose→verify pass over the current keyframe set.

    `keyframes[k].cloud` must hold the stored downsampled cloud of node k
    (None = sparsified away — skipped).  Returns (verified closures,
    ALL attempted pairs) so the caller can remember failures and not
    re-pay the ICP verification for the same pair every promotion — the
    clouds never change, so a failed pair can only start passing after an
    optimization moves the initial guess (SlamSystem clears its failure
    memory on every optimize).
    """
    out: list[Closure] = []
    attempted: set[tuple[int, int]] = set()
    cands = propose_candidates(kf_poses, pg_cfg, exclude_pairs, max_candidates)
    for c in cands:
        ci = keyframes[c.i].cloud
        cj = keyframes[c.j].cloud
        if ci is None or cj is None:
            continue
        attempted.add((c.i, c.j))
        T_init = np.linalg.inv(np.asarray(kf_poses[c.i])) @ np.asarray(
            kf_poses[c.j]
        )
        v = verify_closure(ci, cj, T_init, icp_cfg, pg_cfg)
        if v is not None:
            out.append(Closure(i=c.i, j=c.j, T_ij=v.T_ij, rms=v.rms,
                               inlier_fraction=v.inlier_fraction))
    return out, attempted
