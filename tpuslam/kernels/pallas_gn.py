"""Pallas TPU kernel: fused point-to-plane GN reduction (SURVEY.md §2b N8).

North-star requirement: "fuse the weighted-least-squares reduction into a
single Pallas pass" [B:5].  The jnp path (tpuslam/kernels/gn_reduce.py)
materializes the (N, 6) Jacobian in HBM and runs an (N,6)ᵀ(N,6) matmul that
leaves the MXU almost idle; this kernel instead streams the 10 input
component planes through VMEM once and reduces residual → Huber weight →
Jᵢ Jᵢᵀ outer products → (6×6 H, 6 b, stats) entirely on-chip.  HBM traffic
drops to the information-theoretic minimum (read each input float once,
write 30 floats per grid step).

Layout: point arrays are viewed as (N/128, 128) component planes — sublane
× lane native tiling, no transposes.  The grid walks row-blocks of
`_BLOCK_ROWS`×128 points; each step writes its partial sums into its own row
of a (G, 128) output, summed by the caller (cheap: G ≤ a few dozen).

The kernel runs compiled on TPU and in `interpret=True` mode on CPU, where
it is validated against the jnp oracle (SURVEY.md §4 "Pallas kernels ... vs
pure-jnp reference ... interpret=True mode on CPU").
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BLOCK_ROWS = 32           # 32×128 = 4096 points per grid step
_LANES = 128
_NUM_OUT = 30              # 21 H + 6 b + wr² + Σvalid + Σw
_OUT_ROWS = 32             # _NUM_OUT padded up to the (8,128)-tile multiple


def _kernel(hd_ref, x0, x1, x2, q0, q1, q2, n0, n1, n2, w_ref, out_ref):
    """One grid step: reduce a (BLOCK_ROWS, 128) slab of points.

    Reductions stop at LANE PARTIALS: each of the 30 outputs is a (128,)
    sublane-sum, written as one row of the step's (32, 128) output block,
    and the caller folds grid and lanes in one cheap XLA reduce.  Full
    scalar sums in-kernel were measured 25% slower (0.120 → 0.090 ms at
    153k points) — 30 sequential cross-lane reductions per step serialize
    on the VPU's shuffle path, while sublane sums stay element-parallel.
    """
    huber_delta = hd_ref[0, 0]
    x = (x0[:], x1[:], x2[:])
    q = (q0[:], q1[:], q2[:])
    n = (n0[:], n1[:], n2[:])
    wv = w_ref[:]

    # residual r = n · (x − q)
    r = (
        n[0] * (x[0] - q[0])
        + n[1] * (x[1] - q[1])
        + n[2] * (x[2] - q[2])
    )
    # Huber IRLS weight times validity
    ar = jnp.abs(r)
    hub = jnp.where(ar <= huber_delta, 1.0, huber_delta / jnp.maximum(ar, 1e-12))
    w = wv * hub

    # J = [n, x × n]
    j3 = x[1] * n[2] - x[2] * n[1]
    j4 = x[2] * n[0] - x[0] * n[2]
    j5 = x[0] * n[1] - x[1] * n[0]
    j = (n[0], n[1], n[2], j3, j4, j5)

    vals = []
    for a in range(6):
        wja = w * j[a]
        for b in range(a, 6):
            vals.append(jnp.sum(wja * j[b], axis=0))  # 21 upper-tri H rows
    wr = w * r
    for a in range(6):
        vals.append(jnp.sum(wr * j[a], axis=0))       # 6 b rows
    vals.append(jnp.sum(wr * r, axis=0))              # Σ w r²
    vals.append(jnp.sum(wv, axis=0))                  # Σ validity (inliers)
    vals.append(jnp.sum(w, axis=0))                   # Σ robust weight
    mat = jnp.stack(vals)                             # (30, 128) lane partials
    out_ref[:] = jnp.concatenate(
        [mat, jnp.zeros((_OUT_ROWS - _NUM_OUT, _LANES), dtype=mat.dtype)],
        axis=0,
    )


def _pad_plane(v: jnp.ndarray, rows: int) -> jnp.ndarray:
    """(N,) -> (rows, 128) zero-padded component plane."""
    n = v.shape[0]
    pad = rows * _LANES - n
    if pad:
        v = jnp.pad(v, (0, pad))
    return v.reshape(rows, _LANES)


@functools.partial(jax.jit, static_argnames=("interpret",))
def gn_reduce_partials_pallas(x: jnp.ndarray, q: jnp.ndarray, n: jnp.ndarray,
                              w_valid: jnp.ndarray, huber_delta: jnp.ndarray,
                              interpret: bool = False):
    """The reduce kernel, returning RAW (G·32, 128) lane partials.

    Feed these straight to `kernels/pallas_epilogue.gn_epilogue_pallas` to
    keep the fold + 6×6 solve + SE(3) update in one launch (the XLA-side
    fold/solve lowers to ~100 tiny ops at ~0.14 ms of launch overhead per
    GN step — the round-4 roofline's dominant non-gather cost).  Use
    `gn_reduce_pallas` below when you want folded (H, b, stats) directly.

    Args:
      x, q, n: (N, 3) transformed source / matched target / target normals.
      w_valid: (N,) {0,1} validity (padding rows must be 0).
      huber_delta: scalar (traced — no recompile when tuning).
    """
    N = x.shape[0]
    rows = -(-N // _LANES)
    rows = -(-rows // _BLOCK_ROWS) * _BLOCK_ROWS
    grid = rows // _BLOCK_ROWS

    planes = [
        _pad_plane(x[:, 0], rows), _pad_plane(x[:, 1], rows), _pad_plane(x[:, 2], rows),
        _pad_plane(q[:, 0], rows), _pad_plane(q[:, 1], rows), _pad_plane(q[:, 2], rows),
        _pad_plane(n[:, 0], rows), _pad_plane(n[:, 1], rows), _pad_plane(n[:, 2], rows),
        _pad_plane(w_valid.astype(x.dtype), rows),
    ]
    hd = jnp.asarray(huber_delta, dtype=x.dtype).reshape(1, 1)

    plane_spec = pl.BlockSpec(
        (_BLOCK_ROWS, _LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    # Cost model for the Mosaic scheduler (SURVEY.md §5 tracing row):
    # ~130 VPU flops/point (residual 8, Huber 4, cross product 9, 21 H
    # outer-product terms + 6 b terms + wr² at ~3 each incl. the reduce);
    # HBM traffic is the design point — each input float read once, 32·128
    # lane-partial floats written per grid step.
    n_padded = rows * _LANES
    cost = pl.CostEstimate(
        flops=130 * n_padded,
        bytes_accessed=4 * (10 * n_padded + grid * _OUT_ROWS * _LANES),
        transcendentals=0,
    )
    partials = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((grid * _OUT_ROWS, _LANES), x.dtype),
        grid=(grid,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [plane_spec] * 10,
        out_specs=pl.BlockSpec((_OUT_ROWS, _LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=cost,
        interpret=interpret,
    )(hd, *planes)
    return partials


@functools.partial(jax.jit, static_argnames=("interpret",))
def gn_reduce_pallas(x: jnp.ndarray, q: jnp.ndarray, n: jnp.ndarray,
                     w_valid: jnp.ndarray, huber_delta: jnp.ndarray,
                     interpret: bool = False):
    """Folded reduction; same math as `gn_reduce` minus `num_valid_src`.

    Returns:
      (H (6,6), b (6,), num_inliers (), weighted_sq_sum (), w_sum ()).
    """
    partials = gn_reduce_partials_pallas(x, q, n, w_valid, huber_delta,
                                         interpret=interpret)
    grid = partials.shape[0] // _OUT_ROWS
    # fold grid steps and lanes (rows _NUM_OUT.._OUT_ROWS are zero padding)
    sums = partials.reshape(grid, _OUT_ROWS, _LANES).sum(axis=(0, 2))
    iu, ju = jnp.triu_indices(6)
    H = jnp.zeros((6, 6), dtype=x.dtype).at[iu, ju].set(sums[:21])
    H = H + jnp.triu(H, 1).T
    b = sums[21:27]
    return H, b, sums[28], sums[27], sums[29]
