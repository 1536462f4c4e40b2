"""Full SLAM orchestration: odometry + keyframe graph + loop closure
(SURVEY.md §3.1 call stack; BASELINE.json config 5).

Reference status: `main()` over a sequence — track, promote keyframes,
attempt loop closures, optimize the pose graph, dump trajectory
(SURVEY.md §2a R14; provenance [B:5]).

Host-driven control loop (the only host logic in the system — everything
compute-heavy underneath is jitted): per frame, one `track_step` call; per
promoted keyframe, graph bookkeeping + a bounded loop-closure
propose/verify pass + a pose-graph GN solve.  The final trajectory
re-anchors every frame on its (optimized) keyframe pose.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from tpuslam.backend.loopclosure import find_closures
from tpuslam.backend.posegraph import GraphHost, optimize_pose_graph
from tpuslam.config import Intrinsics, SLAMConfig
from tpuslam.frontend import Odometry
from tpuslam.mapping import VoxelMap


class SlamSystem:
    """Odometry frontend + pose-graph backend with loop closure."""

    def __init__(self, K: Intrinsics, cfg: SLAMConfig,
                 enable_loop_closure: bool = True,
                 enable_map: bool = False):
        self.cfg = cfg
        self.odo = Odometry(K, cfg, keep_keyframe_clouds=True)
        self.graph = GraphHost(cfg.posegraph)
        self.enable_loop_closure = enable_loop_closure
        self.map: Optional[VoxelMap] = VoxelMap(cfg.voxel) if enable_map else None
        self._known_edges: set[tuple[int, int]] = set()
        self._num_graph_nodes = 0
        self.closures: list = []

    def _sync_graph_with_keyframes(self) -> bool:
        """Add any newly promoted keyframes as nodes + odometry edges."""
        added = False
        while self._num_graph_nodes < len(self.odo.keyframes):
            k = self._num_graph_nodes
            rec = self.odo.keyframes[k]
            self.graph.add_node(rec.T_world_kf)
            if k > 0:
                prev = self.odo.keyframes[k - 1]
                T_ij = np.linalg.inv(prev.T_world_kf.astype(np.float64)) @ (
                    rec.T_world_kf.astype(np.float64)
                )
                self.graph.add_edge(k - 1, k, T_ij, weight=1.0)
                self._known_edges.add((k - 1, k))
            self._num_graph_nodes += 1
            added = True
            if self.map is not None and rec.cloud is not None:
                self.map.insert(rec.cloud, rec.T_world_kf)
        return added

    def _attempt_loop_closure(self) -> bool:
        kf_poses = [
            self.graph._poses[k].astype(np.float64)
            for k in range(self._num_graph_nodes)
        ]
        closures = find_closures(
            self.odo.keyframes, kf_poses, self.cfg.icp, self.cfg.posegraph,
            exclude_pairs=self._known_edges,
        )
        for c in closures:
            self.graph.add_edge(c.i, c.j, c.T_ij, weight=2.0)
            self._known_edges.add((c.i, c.j))
            self.closures.append(c)
        return bool(closures)

    def _optimize(self) -> None:
        graph = self.graph.graph()
        poses, _cost = optimize_pose_graph(graph, self.cfg.posegraph)
        poses = np.asarray(poses, dtype=np.float32)
        self.graph.set_poses(poses)
        # re-anchor the frontend on the corrected keyframe pose
        k = self._num_graph_nodes - 1
        self.odo.T_world_kf = poses[k]
        for idx in range(self._num_graph_nodes):
            rec = self.odo.keyframes[idx]
            self.odo.keyframes[idx] = rec._replace(T_world_kf=poses[idx])

    def process(self, depth: np.ndarray, timestamp: float = 0.0) -> np.ndarray:
        self.odo.process(depth, timestamp)
        if self._sync_graph_with_keyframes():
            if self.enable_loop_closure and self._attempt_loop_closure():
                self._optimize()
        kf_id, T_rel = self.odo.frame_refs[-1]
        T = self.odo.keyframes[kf_id].T_world_kf.astype(np.float64) @ T_rel
        return T

    def trajectory(self) -> tuple[np.ndarray, np.ndarray]:
        """(timestamps (F,), poses (F, 4, 4)) with all frames re-anchored on
        the current (optimized) keyframe poses."""
        poses = np.zeros((len(self.odo.frame_refs), 4, 4))
        for f, (kf_id, T_rel) in enumerate(self.odo.frame_refs):
            poses[f] = (
                self.odo.keyframes[kf_id].T_world_kf.astype(np.float64) @ T_rel
            )
        return np.asarray(self.odo.timestamps), poses
