"""Trajectory evaluation: Horn alignment + ATE RMSE + RPE (SURVEY.md §2a R13).

Reference status: trajectory dump + ATE RMSE vs groundtruth, the pinned
behavioural metric ([B:2] "ATE RMSE vs reference"; SURVEY.md §3.4).

Pure host-side numpy (float64): evaluation runs once per sequence, precision
matters more than speed here.  Mirrors the standard TUM evaluation tools:
timestamp association → closed-form Horn (SVD) rigid alignment → RMSE of
translational residuals; RPE over fixed frame deltas as the drift metric.
"""

from __future__ import annotations

import numpy as np


def horn_align(est: np.ndarray, gt: np.ndarray):
    """Closed-form rigid alignment (Horn/Umeyama, scale fixed to 1).

    Args:
      est, gt: (N, 3) matched translation samples.
    Returns:
      (R, t) minimizing Σ|R·est + t − gt|².
    """
    mu_e = est.mean(axis=0)
    mu_g = gt.mean(axis=0)
    E = est - mu_e
    G = gt - mu_g
    W = E.T @ G
    U, _, Vt = np.linalg.svd(W)
    S = np.eye(3)
    S[2, 2] = np.sign(np.linalg.det(U @ Vt).round(12) or 1.0)
    R = (U @ S @ Vt).T
    t = mu_g - R @ mu_e
    return R, t


def ate_rmse(est_ts, est_poses, gt_ts, gt_poses, max_difference: float = 0.02):
    """Absolute trajectory error RMSE after time association + Horn alignment.

    Args:
      est_ts: (F,) timestamps; est_poses: (F, 4, 4) world←cam.
      gt_ts / gt_poses: likewise for groundtruth.
    Returns:
      dict with rmse, mean, median, max (metres) and num_pairs.
    """
    from tpuslam.data.tum import associate

    a = [(float(t), []) for t in est_ts]
    b = [(float(t), []) for t in gt_ts]
    matches = associate(a, b, max_difference=max_difference)
    if len(matches) < 3:
        raise ValueError(f"only {len(matches)} matched timestamps")
    e = np.asarray([est_poses[i][:3, 3] for i, _ in matches])
    g = np.asarray([gt_poses[j][:3, 3] for _, j in matches])
    R, t = horn_align(e, g)
    res = (e @ R.T + t) - g
    norms = np.linalg.norm(res, axis=1)
    return {
        "rmse": float(np.sqrt(np.mean(norms**2))),
        "mean": float(norms.mean()),
        "median": float(np.median(norms)),
        "max": float(norms.max()),
        "num_pairs": len(matches),
    }


def rpe(est_ts, est_poses, gt_ts, gt_poses, delta: int = 1,
        max_difference: float = 0.02):
    """Relative pose error over a fixed index delta (drift per frame-step).

    Returns dict with translational rmse (m) and rotational rmse (rad).
    """
    from tpuslam.data.tum import associate

    a = [(float(t), []) for t in est_ts]
    b = [(float(t), []) for t in gt_ts]
    matches = associate(a, b, max_difference=max_difference)
    est = np.asarray([est_poses[i] for i, _ in matches])
    gt = np.asarray([gt_poses[j] for _, j in matches])
    t_errs, r_errs = [], []
    for k in range(len(est) - delta):
        de = np.linalg.inv(est[k]) @ est[k + delta]
        dg = np.linalg.inv(gt[k]) @ gt[k + delta]
        err = np.linalg.inv(dg) @ de
        t_errs.append(np.linalg.norm(err[:3, 3]))
        r_errs.append(
            np.arccos(np.clip((np.trace(err[:3, :3]) - 1.0) / 2.0, -1.0, 1.0))
        )
    return {
        "trans_rmse": float(np.sqrt(np.mean(np.square(t_errs)))),
        "rot_rmse": float(np.sqrt(np.mean(np.square(r_errs)))),
        "num_pairs": len(t_errs),
    }
