"""Data-parallel batched alignment (SURVEY.md §2c "DP" row).

Reference status: none — the reference processes one frame pair at a time.
Here: ICP over a *batch* of frame pairs (parameter sweeps, benchmark
throughput runs, multi-sequence evaluation) vmapped into one program and
sharded over the mesh's device axis — classic data parallelism; each device
solves its own frame pairs, no cross-device traffic at all.

The while_loop under vmap runs until every batch member converges (XLA
batches the predicate with OR) — worst-case iterations dominate, which is
fine for evaluation sweeps.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tpuslam.config import ICPConfig, Intrinsics
from tpuslam.dist.mesh import SHARD_AXIS
from tpuslam.icp import align_frames


def shard_batch(tree, mesh: Mesh, axis: str = SHARD_AXIS):
    """Shard every leaf's leading (batch) dimension over the mesh."""

    def put(x):
        spec = P(axis, *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(put, tree)


def make_batched_aligner(mesh: Mesh, cfg: ICPConfig,
                         axis: str = SHARD_AXIS):
    """Returns fn(src_pyrs, dst_pyrs, K, T0s) -> batched ICPResult.

    Every pytree leaf of src/dst pyramids and T0s carries a leading batch
    dimension (use `shard_batch` to lay it out over the mesh; batch size
    should be a multiple of the device count).
    """

    def single(src_pyr, dst_pyr, K: Intrinsics, T0: jnp.ndarray):
        return align_frames(src_pyr, dst_pyr, K, T0, cfg)

    vf = jax.vmap(single, in_axes=(0, 0, None, 0))
    return jax.jit(vf)
