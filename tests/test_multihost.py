"""Multi-host (multi-process) smoke test: 2 local processes, loopback
coordinator, real cross-process collectives + the distributed pose-graph
path (SURVEY.md §4 "Multi-host logic ... launching ≥2 local processes")."""

import os
import socket
import subprocess
import sys

import pytest

_CHILD = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
coordinator, pid = sys.argv[1], int(sys.argv[2])
jax.distributed.initialize(coordinator_address=coordinator,
                           num_processes=2, process_id=pid)
import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

devs = jax.devices()
assert len(devs) == 2, devs
mesh = Mesh(np.array(devs), ("shard",))

# --- collective smoke: psum across the two processes ---
local = np.full((4,), float(jax.process_index() + 1), np.float32)
arr = jax.make_array_from_process_local_data(
    NamedSharding(mesh, P("shard")), local
)
f = jax.shard_map(lambda a: jax.lax.psum(a, "shard"), mesh=mesh,
                  in_specs=P("shard"), out_specs=P())
out = np.asarray(jax.jit(f)(arr).addressable_data(0))
print("PSUM", out.tolist(), flush=True)

# --- distributed pose graph across processes ---
sys.path.insert(0, os.getcwd())
from tpuslam.backend.distba import optimize_pose_graph_spmd
from tpuslam.backend.posegraph import GraphHost, optimize_pose_graph
from tpuslam.config import PoseGraphConfig

cfg = PoseGraphConfig(max_nodes=8, max_edges=16, gn_iters=5)
g = GraphHost(cfg)
rng = np.random.default_rng(0)
prev = np.eye(4, dtype=np.float32)
g.add_node(prev)
for k in range(1, 6):
    step = np.eye(4, dtype=np.float32)
    step[:3, 3] = rng.normal(scale=0.05, size=3)
    cur = prev @ step
    g.add_node(cur)
    g.add_edge(k - 1, k, step)
    prev = cur
graph = g.graph()
poses_ref, _ = optimize_pose_graph(graph, cfg)   # local single-device
poses_spmd, cost = optimize_pose_graph_spmd(graph, cfg, mesh)
err = float(np.abs(np.asarray(poses_spmd.addressable_data(0))
                   - np.asarray(poses_ref)).max())
print("DISTBA_ERR", err, flush=True)

# --- all-to-all owner-routed map fusion across the two processes ---
from tpuslam.config import VoxelConfig
from tpuslam.dist.map_fusion import ShardedVoxelMap
from tpuslam.geom.cloud import PointCloud
from tpuslam.mapping import VoxelMap

vcfg = VoxelConfig(map_voxel_size=0.05, map_capacity=1 << 10,
                   origin=-2.0, extent=4.0)
rng2 = np.random.default_rng(7)
pts = rng2.uniform(-1.5, 1.5, size=(512, 3)).astype(np.float32)
nrm = rng2.normal(size=(512, 3)).astype(np.float32)
nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
cloud = PointCloud(points=jnp.asarray(pts), normals=jnp.asarray(nrm),
                   mask=jnp.ones((512,), bool))
svm = ShardedVoxelMap(vcfg, mesh, new_capacity=512)
stats = svm.insert(cloud, np.eye(4, dtype=np.float32))
ref = VoxelMap(vcfg)
ref.insert(cloud, np.eye(4, dtype=np.float32))
print("FUSION", int(stats.dropped), svm.size(), int(ref.cloud.count()),
      flush=True)

# --- ring-sharded frame-to-map ICP across the two processes: map shards
# ppermute between REAL processes each iteration; must recover the pose ---
from tpuslam.config import ICPConfig
from tpuslam.dist.ring_map import align_to_map_ring
from tpuslam.geom import se3

icp_cfg = ICPConfig(pyramid_levels=1, iters_per_level=(30,),
                    max_corr_dist=0.25)
tau = jnp.array([0.01, -0.008, 0.012, 0.01, -0.006, 0.008])
T_true = se3.exp(tau)
moved = cloud.transform(T_true)
res = align_to_map_ring(moved, cloud, jnp.eye(4), icp_cfg, mesh)
T_est = np.asarray(jax.device_get(res.T))
err = float(np.abs(T_est @ np.asarray(T_true) - np.eye(4)).max())
print("RING_ERR", err, flush=True)
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_collectives_and_distba(tmp_path):
    child = tmp_path / "child.py"
    child.write_text(_CHILD)
    coordinator = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, str(child), coordinator, str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            env=env, text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=150)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"child failed:\n{err[-3000:]}"
        outs.append(out)
    for out in outs:
        assert "PSUM [3.0, 3.0, 3.0, 3.0]" in out, out
        line = [ln for ln in out.splitlines() if ln.startswith("DISTBA_ERR")][0]
        assert float(line.split()[1]) < 5e-4, line
        line = [ln for ln in out.splitlines() if ln.startswith("FUSION")][0]
        dropped, got, want = (int(v) for v in line.split()[1:4])
        assert dropped == 0, line
        assert got == want, f"fusion voxel count differs across hosts: {line}"
        line = [ln for ln in out.splitlines() if ln.startswith("RING_ERR")][0]
        assert float(line.split()[1]) < 5e-3, line
