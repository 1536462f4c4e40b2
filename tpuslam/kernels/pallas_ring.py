"""Pallas ring map-exchange NN kernel (SURVEY.md §2c "Ring attention" row,
§2d "hand-rolled Pallas async remote DMA"; pallas_guide §10-11, §18).

Reference status: none — the reference is single-process CPU (SURVEY.md §2d);
this is the new framework's scaling path for maps larger than one chip's HBM.

The XLA path (`dist/ring_map.py`) expresses the ring as `lax.ppermute`
between ICP iterations: correspondence of the local frame shard against the
held map shard, then rotate.  XLA serializes the permute against the
compute.  This kernel fuses ALL `D` ring hops into ONE `pallas_call` and
overlaps each hop's ICI transfer with the distance computation on the shard
currently held (double buffering, pallas_guide §17-18):

    step s:  [ send buf[s%2] → right, recv ← left into buf[(s+1)%2] ]
             [ brute-force NN of frame block against buf[s%2]        ]   ← overlapped
             wait(send, recv); grant buf[s%2] to left for its next send

Flow control is a credit handshake: a device may only RDMA into its right
neighbor's buffer slot after the neighbor has finished computing on that
slot.  Interpret mode does not implement remote `semaphore_signal`, so the
grant is a 1-element "token" remote DMA (same semantics, still
interpret-testable; on hardware the token DMA costs ~µs per hop and rides
the same ICI link).

Compute layout (TPU-idiomatic): clouds are packed as (8, M) column-major
rows [x y z nx ny nz valid pad], so the N×M distance matrix is one MXU
`dot_general` per (frame, map-block) pair via the expansion
|x−q|² = |x|² + |q|² − 2·x·q, and the winning row (point+normal+flag in one)
is recovered with an argmin one-hot matmul — no gathers anywhere.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROW_DIM = 8          # packed row: [x y z nx ny nz valid pad]
_BIG = 1e30          # pushes invalid map columns out of every argmin


def pack_cloud_columns(points: jnp.ndarray, normals: jnp.ndarray,
                       mask: jnp.ndarray) -> jnp.ndarray:
    """(M, 3)+(M, 3)+(M,) → (8, M) f32 column-per-point table."""
    return jnp.stack(
        [
            points[:, 0], points[:, 1], points[:, 2],
            normals[:, 0], normals[:, 1], normals[:, 2],
            mask.astype(points.dtype),
            jnp.zeros_like(points[:, 0]),
        ],
        axis=0,
    )


def pack_query_columns(x: jnp.ndarray) -> jnp.ndarray:
    """(N, 3) → (8, N) f32 with zeros in the non-coordinate rows, so the
    contraction against a packed cloud table computes exactly x·q."""
    z = jnp.zeros_like(x[:, 0])
    return jnp.stack([x[:, 0], x[:, 1], x[:, 2], z, z, z, z, z], axis=0)


def _nn_merge_block(x_cols, q_cols, out_row_ref, out_score_ref):
    """Merge one (frame, map-block) brute-force NN into the running best.

    x_cols: (8, N) packed queries; q_cols: (8, BM) packed map block.
    Score is |q|² − 2·x·q (the per-query |x|² offset is rank-preserving and
    added back outside the kernel).
    """
    n = x_cols.shape[1]
    bm = q_cols.shape[1]
    qq = jnp.sum(q_cols[0:3, :] * q_cols[0:3, :], axis=0, keepdims=True)
    invalid = 1.0 - q_cols[6:7, :]
    # (N, BM) = −2 xᵀq via MXU; rows 3..7 of x_cols are zero.
    g = jax.lax.dot_general(
        x_cols, q_cols,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    scores = qq + invalid * _BIG - 2.0 * g
    m = jnp.min(scores, axis=1, keepdims=True)                   # (N, 1)
    j = jnp.argmin(scores, axis=1).reshape(n, 1)                 # (N, 1)
    onehot = (
        jax.lax.broadcasted_iota(jnp.int32, (n, bm), 1) == j
    ).astype(jnp.float32)
    # winning packed row (point+normal+valid) in one matmul — no gather
    row = jax.lax.dot_general(
        onehot, q_cols,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                            # (N, 8)
    better = m < out_score_ref[:]
    out_score_ref[:] = jnp.where(better, m, out_score_ref[:])
    out_row_ref[:] = jnp.where(better, row, out_row_ref[:])


def _ring_nn_kernel(x_ref, shard_ref, out_row_ref, out_score_ref,
                    buf, tok, send_sem, recv_sem, tok_send, tok_recv,
                    *, n_dev: int, block_m: int, axis_name: str):
    my = jax.lax.axis_index(axis_name)
    left = jax.lax.rem(my - 1 + n_dev, n_dev)
    right = jax.lax.rem(my + 1, n_dev)
    m_pts = shard_ref.shape[1]
    n_blocks = m_pts // block_m

    def _token(device_id):
        return pltpu.make_async_remote_copy(
            src_ref=tok, dst_ref=tok,
            send_sem=tok_send, recv_sem=tok_recv,
            device_id=device_id,
            device_id_type=pltpu.DeviceIdType.LOGICAL,
        )

    buf[0] = shard_ref[:]
    out_score_ref[:] = jnp.full_like(out_score_ref, jnp.inf)
    out_row_ref[:] = jnp.zeros_like(out_row_ref)
    x_cols = x_ref[:]

    for s in range(n_dev):
        cur, nxt = s % 2, (s + 1) % 2
        if s + 1 < n_dev:
            if s > 0:
                # Credit: right neighbor finished computing on its slot
                # `nxt` (token it sent at the end of its step s-1).  wait()
                # also retires our own step s-1 token send.
                _token(left).wait()
            rdma = pltpu.make_async_remote_copy(
                src_ref=buf.at[cur], dst_ref=buf.at[nxt],
                send_sem=send_sem.at[cur], recv_sem=recv_sem.at[nxt],
                device_id=right,
                device_id_type=pltpu.DeviceIdType.LOGICAL,
            )
            rdma.start()  # transfer overlaps the block loop below

        def block_body(b, _):
            q_cols = buf[cur, :, pl.ds(b * block_m, block_m)]
            _nn_merge_block(x_cols, q_cols, out_row_ref, out_score_ref)
            return 0

        jax.lax.fori_loop(0, n_blocks, block_body, 0)

        if s + 1 < n_dev:
            rdma.wait()  # slot `cur` sent; slot `nxt` holds the next shard
            if s + 2 < n_dev:
                # Grant slot `cur` to the left neighbor for its next send.
                _token(left).start()


@functools.partial(
    jax.jit,
    static_argnames=("n_dev", "axis_name", "block_m", "interpret"),
)
def ring_nn(x_cols: jnp.ndarray, shard_cols: jnp.ndarray, *, n_dev: int,
            axis_name: str, block_m: int = 512, interpret: bool = False):
    """All-shards nearest neighbor of local queries over a ring of map shards.

    Must be called inside `shard_map` over `axis_name`.

    Args:
      x_cols: (8, N) local packed queries (`pack_query_columns`).
      shard_cols: (8, M) local packed map shard (`pack_cloud_columns`);
        M must be a multiple of `block_m` after padding (pad with valid=0).
      interpret: run the interpreter (CPU tests); compiled Mosaic on TPU.
    Returns:
      (best_row (N, 8), best_score (N, 1)) — winning packed map row per
      query and its |q|²−2x·q score (add |x|² for the true distance²).
    """
    n = x_cols.shape[1]
    m = shard_cols.shape[1]
    bm = min(block_m, m)
    if m % bm != 0:
        raise ValueError(f"map shard size {m} not a multiple of block {bm}")
    kernel = functools.partial(
        _ring_nn_kernel, n_dev=n_dev, block_m=bm, axis_name=axis_name)
    # Cost model (SURVEY.md §5 tracing row): per ring hop the dominant work
    # is two MXU matmuls per block — the (8, N)·(8, BM) distance gram and
    # the (N, BM)·(BM, 8) one-hot winner-row recovery — ≈ 2·N·M·16 flops,
    # plus ~6 VPU ops per score cell; ICI moves 8·M·4 B per hop (counted
    # into bytes_accessed alongside the one-time HBM reads/writes).
    cost = pl.CostEstimate(
        flops=n_dev * n * m * (2 * 16 + 6),
        bytes_accessed=4 * (8 * n + 8 * m + 9 * n + (n_dev - 1) * 8 * m),
        transcendentals=0,
    )
    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((n, ROW_DIM), jnp.float32),
            jax.ShapeDtypeStruct((n, 1), jnp.float32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, ROW_DIM, m), jnp.float32),   # double buffer
            pltpu.VMEM((1, 1), jnp.float32),            # credit token
            pltpu.SemaphoreType.DMA((2,)),              # send per slot
            pltpu.SemaphoreType.DMA((2,)),              # recv per slot
            pltpu.SemaphoreType.DMA(()),                # token send
            pltpu.SemaphoreType.DMA(()),                # token recv
        ],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, collective_id=1),
        cost_estimate=cost,
        interpret=interpret,
    )(x_cols, shard_cols)
