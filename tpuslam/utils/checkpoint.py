"""Checkpoint / resume (SURVEY.md §5 "Checkpoint / resume").

Reference status: none — the reference writes the final trajectory only
(SURVEY.md §5 [PK]).  Here: an npz snapshot of the full SLAM state
{keyframe poses + clouds, pose-graph edges, per-frame refs, frame index},
used by `run_slam --resume`, fault-recovery tests, and long-sequence
benchmarking.  Plain npz (not orbax) — the state is a few MB of arrays,
and single-file atomic-rename semantics are all we need.
"""

from __future__ import annotations

import os
import tempfile

import jax.numpy as jnp
import numpy as np

from tpuslam.frontend import KeyframeRecord, Odometry
from tpuslam.geom.cloud import PointCloud

# v2: keyframe clouds are stored as a kf_cloud_ids-keyed SUBSET (holes from
# sparsification) + optional verification tables; v1 stored a dense
# per-keyframe stack.  Loading accepts both; writing always emits v2 so a
# v1-only binary refuses the file instead of mis-assigning cloud rows.
_FORMAT_VERSION = 2
_READABLE_VERSIONS = (1, 2)


def _is_slam(system) -> bool:
    return hasattr(system, "odo")


def save_checkpoint(path: str, system, frame_idx: int) -> None:
    """Snapshot an `Odometry` or `SlamSystem` to an npz (atomic rename)."""
    if hasattr(system, "_drain_pending"):
        # a deferred loop-closure attempt in flight holds pose corrections
        # the snapshot must include (SlamSystem boundary chunk mode)
        system._drain_pending()
    odo: Odometry = system.odo if _is_slam(system) else system
    data: dict = {
        "version": _FORMAT_VERSION,
        "frame_idx": frame_idx,
        "timestamps": np.asarray(odo.timestamps),
        "trajectory": np.stack(odo.trajectory) if odo.trajectory else np.zeros((0, 4, 4)),
        "T_world_kf": np.asarray(odo.T_world_kf),
        "T_kf_cam": np.asarray(odo.T_kf_cam),
        "last_delta": np.asarray(odo.last_delta),
        "kf_indices": np.asarray([k.index for k in odo.keyframes]),
        "kf_timestamps": np.asarray([k.timestamp for k in odo.keyframes]),
        "kf_poses": np.stack([k.T_world_kf for k in odo.keyframes])
        if odo.keyframes else np.zeros((0, 4, 4)),
        "frame_ref_ids": np.asarray([r[0] for r in odo.frame_refs]),
        "frame_ref_T": np.stack([r[1] for r in odo.frame_refs])
        if odo.frame_refs else np.zeros((0, 4, 4)),
    }
    # keyframe pyramid (device arrays) — needed to keep tracking after resume
    if odo.kf_pyr is not None:
        for li, f in enumerate(odo.kf_pyr):
            data[f"kf_pyr_{li}_points"] = np.asarray(f.points)
            data[f"kf_pyr_{li}_normals"] = np.asarray(f.normals)
            data[f"kf_pyr_{li}_mask"] = np.asarray(f.mask)
        data["kf_pyr_levels"] = len(odo.kf_pyr)
    # keyframe clouds (for loop closure) — sparsification can leave holes
    # (frontend._enforce_cloud_budget), so store the retained subset plus
    # its keyframe ids
    retained = [(k, r.cloud) for k, r in enumerate(odo.keyframes)
                if r.cloud is not None]
    if retained:
        data["kf_cloud_ids"] = np.asarray([k for k, _ in retained],
                                          dtype=np.int32)
        data["kf_cloud_points"] = np.stack(
            [np.asarray(c.points) for _, c in retained])
        data["kf_cloud_normals"] = np.stack(
            [np.asarray(c.normals) for _, c in retained])
        data["kf_cloud_mask"] = np.stack(
            [np.asarray(c.mask) for _, c in retained])
    data["protected_kf_ids"] = np.asarray(sorted(odo.protected_kf_ids),
                                          dtype=np.int32)
    # projective-verification tables (a keyframe's retained tracking table;
    # without them a resumed run falls back to the slow grid-hash verify)
    vt = [(k, r.verify) for k, r in enumerate(odo.keyframes)
          if r.verify is not None]
    if vt:
        # one meta triple covers the stack — skip tables that don't match
        # the first's shape/level (possible after resuming a checkpoint
        # written under a different verify_level; mixed shapes can't stack)
        v0 = vt[0][1]
        vt = [(k, v) for k, v in vt
              if v.packed.shape == v0.packed.shape
              and (v.height, v.width, v.level) == (v0.height, v0.width,
                                                   v0.level)]
        data["kf_verify_ids"] = np.asarray([k for k, _ in vt], dtype=np.int32)
        data["kf_verify_packed"] = np.stack(
            [np.asarray(v.packed) for _, v in vt])
        data["kf_verify_meta"] = np.asarray(
            [v0.height, v0.width, v0.level], dtype=np.int32)
    # pose-free loop-closure descriptors (lc_descriptor) — tiny; a resumed
    # run keeps its drift-robust proposal coverage
    descs = [(k, getattr(r, "desc", None)) for k, r in
             enumerate(odo.keyframes)]
    descs = [(k, d) for k, d in descs if d is not None]
    if descs:
        data["kf_desc_ids"] = np.asarray([k for k, _ in descs],
                                         dtype=np.int32)
        data["kf_desc"] = np.stack([np.asarray(d) for _, d in descs])
    if _is_slam(system):
        g = system.graph
        data.update(
            graph_num_nodes=g.num_nodes,
            graph_num_edges=g.num_edges,
            graph_poses=g._poses[: g.num_nodes],
            graph_edge_i=g._edge_i[: g.num_edges],
            graph_edge_j=g._edge_j[: g.num_edges],
            graph_edge_T=g._edge_T[: g.num_edges],
            graph_edge_w=g._edge_w[: g.num_edges],
        )
    # NB: np.savez appends ".npz" unless the name already ends with it, which
    # would silently break the atomic-rename (verified the hard way) — write
    # through the open fd instead.
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path) or ".",
                               suffix=".npz.tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            np.savez_compressed(f, **data)
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


def load_checkpoint(path: str, system) -> int:
    """Restore state saved by `save_checkpoint`; returns next frame index."""
    from tpuslam.icp import Frame

    z = np.load(path, allow_pickle=False)
    if int(z["version"]) not in _READABLE_VERSIONS:
        raise ValueError(f"unknown checkpoint version {z['version']}")
    odo: Odometry = system.odo if _is_slam(system) else system
    odo.timestamps = [float(t) for t in z["timestamps"]]
    odo.trajectory = [T for T in z["trajectory"]]
    odo.T_world_kf = z["T_world_kf"].astype(np.float32)
    odo.T_kf_cam = jnp.asarray(z["T_kf_cam"])
    odo.last_delta = jnp.asarray(z["last_delta"])
    odo.frame_idx = int(z["frame_idx"])
    odo.frame_refs = [
        (int(i), T) for i, T in zip(z["frame_ref_ids"], z["frame_ref_T"])
    ]
    odo.kf_packed = None  # rebuilt lazily from kf_pyr on the next track
    if "kf_pyr_levels" in z:
        odo.kf_pyr = tuple(
            Frame(
                points=jnp.asarray(z[f"kf_pyr_{li}_points"]),
                normals=jnp.asarray(z[f"kf_pyr_{li}_normals"]),
                mask=jnp.asarray(z[f"kf_pyr_{li}_mask"]),
            )
            for li in range(int(z["kf_pyr_levels"]))
        )
    n_kf = len(z["kf_indices"])
    cloud_row = {}           # keyframe id → row in the stored cloud stack
    if "kf_cloud_points" in z:
        ids = (z["kf_cloud_ids"] if "kf_cloud_ids" in z
               else np.arange(n_kf))    # pre-sparsification checkpoints
        cloud_row = {int(k): r for r, k in enumerate(ids)}
    verify_row = {}
    if "kf_verify_ids" in z:
        verify_row = {int(k): r for r, k in enumerate(z["kf_verify_ids"])}
        vh, vw, vlvl = (int(v) for v in z["kf_verify_meta"])
    desc_row = {}
    if "kf_desc_ids" in z:
        desc_row = {int(k): r for r, k in enumerate(z["kf_desc_ids"])}
    odo.keyframes = []
    for k in range(n_kf):
        cloud = None
        if k in cloud_row:
            r = cloud_row[k]
            cloud = PointCloud(
                points=jnp.asarray(z["kf_cloud_points"][r]),
                normals=jnp.asarray(z["kf_cloud_normals"][r]),
                mask=jnp.asarray(z["kf_cloud_mask"][r]),
            )
        verify = None
        if k in verify_row:
            from tpuslam.frontend import VerifyTable

            verify = VerifyTable(
                packed=jnp.asarray(z["kf_verify_packed"][verify_row[k]]),
                height=vh, width=vw, level=vlvl)
        odo.keyframes.append(
            KeyframeRecord(
                index=int(z["kf_indices"][k]),
                timestamp=float(z["kf_timestamps"][k]),
                T_world_kf=z["kf_poses"][k].astype(np.float32),
                cloud=cloud,
                verify=verify,
                desc=(z["kf_desc"][desc_row[k]] if k in desc_row else None),
            )
        )
    # recency sequence is not persisted — restored anchors start equal
    odo.protected_kf_ids = (
        {int(i): 0 for i in z["protected_kf_ids"]}
        if "protected_kf_ids" in z else {})
    if _is_slam(system) and "graph_num_nodes" in z:
        g = system.graph
        g.num_nodes = int(z["graph_num_nodes"])
        g.num_edges = int(z["graph_num_edges"])
        g.ensure_capacity(nodes=g.num_nodes, edges=g.num_edges)
        g._poses[: g.num_nodes] = z["graph_poses"]
        g._edge_i[: g.num_edges] = z["graph_edge_i"]
        g._edge_j[: g.num_edges] = z["graph_edge_j"]
        g._edge_T[: g.num_edges] = z["graph_edge_T"]
        g._edge_w[: g.num_edges] = z["graph_edge_w"]
        system._num_graph_nodes = g.num_nodes
        system._known_edges = {
            (int(g._edge_i[e]), int(g._edge_j[e])) for e in range(g.num_edges)
        }
    # The voxel map is a derived product of the keyframes; the snapshot
    # stores only keyframes, so rebuild the map by re-fusing them — without
    # this, map tracking / map BA silently run against an empty map after
    # --resume (the graph sync loop sees nothing new to insert).
    if _is_slam(system) and getattr(system, "map", None) is not None:
        for rec in odo.keyframes:
            if rec.cloud is not None:
                system.map.insert(rec.cloud, rec.T_world_kf)
        system._map_index = None
    return int(z["frame_idx"])
