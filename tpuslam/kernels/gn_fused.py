"""Fully-fused projective GN step: transform + gates + Huber + reduction
in ONE Pallas VMEM pass (SURVEY.md §2b N7/N8; BASELINE.md roofline,
VERDICT r3 "spend the remaining roofline headroom").

The legacy per-GN-solve chain (tpuslam/icp.py `_icp_loop` body) pays four
separate XLA passes over point-sized arrays between the association gather
and the Pallas reduction: transform_points, rotate_vectors, the validity
gates, and the 10-plane padding relayout feeding the reduce kernel —
0.196 ms of the measured 0.75 ms ICP body at 640×480 (BASELINE.md:42),
nearly all of it HBM round trips on (N,3) intermediates.

This kernel removes every one of those passes.  Inputs are the RAW source
cloud component planes (loop-invariant — padded once via
`prepare_source_planes`; XLA's LICM does NOT hoist them out of a while
body) and the gathered target-row planes; the pose, intrinsics and gate
thresholds ride in SMEM.  Per point, in registers:

MEASURED OUTCOME (round 4, TPU v5e; see BASELINE.md roofline): the kernel
itself is 14× faster than the unfused reduce (8.7 µs vs 0.12 ms at 153k
points, bandwidth-bound at block_rows=128) — but the path is OFF by
default (`ICPConfig.fused_gn=False`) because feeding it loses more than
the kernel wins: per-component planes require lane-deinterleaving the
(N, 8) gather output (~0.5 ms/iteration of relayout in every strategy
tried: per-column slice, transpose+slice, reduce-based extract), and the
extra intermediates push the 4.9 MB f16 packed table out of VMEM, where
XLA pins it on the legacy path (VMEM-resident gather: 0.29 ms; HBM:
1.70 ms).  The design is environment-bound, not wrong — revisit when
Mosaic grows f16 VMEM refs or a cheap lane deinterleave.

    x_g = R_g p + t_g                 # gate-time transform (association pose)
    u,v = project(x_g); bounds gates  # recomputed — cheaper than carrying w
    n_r = R_g n_src                   # normal-compatibility gate
    w   = mask · tgt_mask · gates     # {0,1} validity
    x_r = R_r p + t_r                 # residual-time transform
    r   = n·(x_r − q); Huber; J = [n, x_r×n]; Σ wJJᵀ, Σ wrJ, stats

TWO transforms keep the frozen-association semantics of inner/outer ICP
bit-compatible with the legacy path: gates are evaluated at the pose that
produced the gather (T_gate) while residuals use the freshly-updated pose
(T_res); for the first inner solve they coincide.

The association gather itself stays OUTSIDE the kernel, materialized in
XLA: a gather fused into a reduction consumer was measured 3.4× slower
than materialized (BASELINE.md roofline #2), and the row-gather is already
issue-rate-bound at ~3 ns/row — the kernel boundary after it is
load-bearing.

Reference parity: replaces the inner-loop math of SURVEY.md §2a R7 (the
C++ residual/Huber/6×6 accumulation loop); same math as
`kernels/gn_reduce.gn_reduce` composed with the gate logic of
`kernels/correspond.projective_correspond_packed`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# single definition of the (N,) → (rows, 128) zero-pad/reshape helper —
# this kernel shares pallas_gn's plane tiling by construction
from tpuslam.kernels.pallas_gn import _pad_plane

_LANES = 128
_NUM_OUT = 30              # 21 H + 6 b + Σwr² + Σvalid + Σw
_OUT_ROWS = 32             # padded to the f32 (8,128) tile multiple

# SMEM parameter-vector layout (f32 (1, 40)).
_P_RG = 0       # 0..8   gate rotation, row-major
_P_TG = 9       # 9..11  gate translation
_P_RR = 12      # 12..20 residual rotation
_P_TR = 21      # 21..23 residual translation
_P_FX, _P_FY, _P_CX, _P_CY = 24, 25, 26, 27
_P_W, _P_H = 28, 29        # image bounds as floats (exact for any real size)
_P_MAXD2 = 30
_P_NDMIN = 31
_P_HUBER = 32
_P_SIZE = 40


def _gates_and_residual(params, p, sn, m, q, n, dm):
    """Shared elementwise math (kernel body AND jnp oracle — identical ops).

    `params` is indexable as params[i] scalars; p/sn/q/n are 3-tuples of
    same-shape arrays; m/dm are {0,1} validity arrays.
    Returns (w, r, xr) with w the gated Huber-free validity, r the
    point-to-plane residual at the residual-time pose, xr its transform.
    """
    rg = [params[_P_RG + i] for i in range(9)]
    tg = [params[_P_TG + i] for i in range(3)]
    rr = [params[_P_RR + i] for i in range(9)]
    tr = [params[_P_TR + i] for i in range(3)]

    # gate-time transform
    xg0 = rg[0] * p[0] + rg[1] * p[1] + rg[2] * p[2] + tg[0]
    xg1 = rg[3] * p[0] + rg[4] * p[1] + rg[5] * p[2] + tg[1]
    xg2 = rg[6] * p[0] + rg[7] * p[1] + rg[8] * p[2] + tg[2]

    # projection gates — same formulation as geom.backproject.project
    in_front = xg2 > 1e-6
    zsafe = jnp.where(in_front, xg2, 1.0)
    u = xg0 / zsafe * params[_P_FX] + params[_P_CX]
    v = xg1 / zsafe * params[_P_FY] + params[_P_CY]
    ui = jnp.round(u)
    vi = jnp.round(v)
    in_bounds = (
        (ui >= 0.0) & (ui <= params[_P_W] - 1.0)
        & (vi >= 0.0) & (vi <= params[_P_H] - 1.0)
    )

    # distance + normal-compatibility gates at the gate-time pose
    dq0, dq1, dq2 = xg0 - q[0], xg1 - q[1], xg2 - q[2]
    d2 = dq0 * dq0 + dq1 * dq1 + dq2 * dq2
    nr0 = rg[0] * sn[0] + rg[1] * sn[1] + rg[2] * sn[2]
    nr1 = rg[3] * sn[0] + rg[4] * sn[1] + rg[5] * sn[2]
    nr2 = rg[6] * sn[0] + rg[7] * sn[1] + rg[8] * sn[2]
    ndot = n[0] * nr0 + n[1] * nr1 + n[2] * nr2

    valid = (
        (m > 0.5) & (dm > 0.5) & in_front & in_bounds
        & (d2 < params[_P_MAXD2]) & (ndot > params[_P_NDMIN])
    )
    w = valid.astype(p[0].dtype)

    # residual-time transform
    xr0 = rr[0] * p[0] + rr[1] * p[1] + rr[2] * p[2] + tr[0]
    xr1 = rr[3] * p[0] + rr[4] * p[1] + rr[5] * p[2] + tr[1]
    xr2 = rr[6] * p[0] + rr[7] * p[1] + rr[8] * p[2] + tr[2]
    r = n[0] * (xr0 - q[0]) + n[1] * (xr1 - q[1]) + n[2] * (xr2 - q[2])
    return w, r, (xr0, xr1, xr2)


def _reduce_outputs(w_valid, r, x, n, huber_delta):
    """Huber + J outer products → list of 30 lane-partial (or scalar) sums."""
    ar = jnp.abs(r)
    hub = jnp.where(ar <= huber_delta, 1.0,
                    huber_delta / jnp.maximum(ar, 1e-12))
    w = w_valid * hub
    j3 = x[1] * n[2] - x[2] * n[1]
    j4 = x[2] * n[0] - x[0] * n[2]
    j5 = x[0] * n[1] - x[1] * n[0]
    j = (n[0], n[1], n[2], j3, j4, j5)
    vals = []
    for a in range(6):
        wja = w * j[a]
        for b in range(a, 6):
            vals.append(jnp.sum(wja * j[b], axis=0))   # 21 upper-tri H
    wr = w * r
    for a in range(6):
        vals.append(jnp.sum(wr * j[a], axis=0))        # 6 b
    vals.append(jnp.sum(wr * r, axis=0))               # Σ w r²
    vals.append(jnp.sum(w_valid, axis=0))              # Σ validity (inliers)
    vals.append(jnp.sum(w, axis=0))                    # Σ robust weight
    return vals


def _kernel(params_ref, p0, p1, p2, sn0, sn1, sn2, m_ref,
            q0, q1, q2, n0, n1, n2, dm_ref, out_ref):
    """One grid step over a (block_rows, 128) slab.

    Reductions stop at LANE PARTIALS (each output row is a (128,) sublane
    sum) — full in-kernel scalar sums were measured 25% slower on the
    unfused kernel (pallas_gn.py): 30 sequential cross-lane reductions
    serialize on the VPU shuffle path while sublane sums stay
    element-parallel.  The caller folds grid × lanes in one XLA reduce.
    """
    # SMEM only serves scalar loads — pull the parameter vector out one
    # scalar at a time (33 loads, trivially cheap vs the vector work).
    params = [params_ref[0, i] for i in range(_P_HUBER + 1)]
    p = (p0[:], p1[:], p2[:])
    sn = (sn0[:], sn1[:], sn2[:])
    q = (q0[:].astype(p0.dtype), q1[:].astype(p0.dtype), q2[:].astype(p0.dtype))
    n = (n0[:].astype(p0.dtype), n1[:].astype(p0.dtype), n2[:].astype(p0.dtype))
    w_valid, r, xr = _gates_and_residual(
        params, p, sn, m_ref[:], q, n, dm_ref[:].astype(p0.dtype))
    vals = _reduce_outputs(w_valid, r, xr, n, params[_P_HUBER])
    mat = jnp.stack(vals)                              # (30, 128)
    out_ref[:] = jnp.concatenate(
        [mat, jnp.zeros((_OUT_ROWS - _NUM_OUT, _LANES), dtype=mat.dtype)],
        axis=0,
    )




def _params_vector(T_gate, T_res, K, width, height, max_dist,
                   normal_dot_min, huber_delta, dtype):
    p = jnp.zeros((_P_SIZE,), dtype=dtype)
    p = p.at[_P_RG:_P_RG + 9].set(T_gate[:3, :3].reshape(9).astype(dtype))
    p = p.at[_P_TG:_P_TG + 3].set(T_gate[:3, 3].astype(dtype))
    p = p.at[_P_RR:_P_RR + 9].set(T_res[:3, :3].reshape(9).astype(dtype))
    p = p.at[_P_TR:_P_TR + 3].set(T_res[:3, 3].astype(dtype))
    statics = jnp.array(
        [0.0, 0.0, 0.0, 0.0, float(width), float(height), 0.0, 0.0, 0.0],
        dtype=dtype,
    ).at[0].set(K.fx).at[1].set(K.fy).at[2].set(K.cx).at[3].set(K.cy)
    statics = statics.at[6].set(
        jnp.asarray(max_dist, dtype) ** 2
    ).at[7].set(jnp.asarray(normal_dot_min, dtype)).at[8].set(
        jnp.asarray(huber_delta, dtype))
    return p.at[_P_FX:_P_HUBER + 1].set(statics).reshape(1, _P_SIZE)


def _fold_partials(partials, grid, dtype):
    sums = partials.reshape(grid, _OUT_ROWS, _LANES).sum(axis=(0, 2))
    iu, ju = jnp.triu_indices(6)
    H = jnp.zeros((6, 6), dtype=dtype).at[iu, ju].set(sums[:21])
    H = H + jnp.triu(H, 1).T
    b = sums[21:27]
    return H, b, sums[28], sums[27]      # H, b, num_inliers, weighted_sq_sum


def prepare_source_planes(points, normals, mask, block_rows: int = 128):
    """Pad the LOOP-INVARIANT source-cloud planes once, OUTSIDE the ICP
    while_loop.  XLA's loop-invariant code motion does NOT hoist this
    multi-output slice/pad fusion out of a while body (measured 0.47 ms
    re-paid per iteration at 153k points) — hoist it by construction and
    pass the result through the loop closure instead."""
    N = points.shape[0]
    rows = -(-N // _LANES)
    rows = -(-rows // block_rows) * block_rows
    m = mask.astype(points.dtype)
    return (
        _pad_plane(points[:, 0], rows),
        _pad_plane(points[:, 1], rows),
        _pad_plane(points[:, 2], rows),
        _pad_plane(normals[:, 0], rows),
        _pad_plane(normals[:, 1], rows),
        _pad_plane(normals[:, 2], rows),
        _pad_plane(m, rows),
    )


@functools.partial(
    jax.jit, static_argnames=("width", "height", "interpret", "block_rows"))
def gn_fused_pallas(points, normals, mask, rows_gathered,
                    T_gate, T_res, K, width: int, height: int,
                    max_dist, normal_dot_min, huber_delta,
                    interpret: bool = False, block_rows: int = 128,
                    src_planes=None):
    """Fused gate+transform+Huber+GN reduction (Pallas TPU kernel).

    Args:
      points/normals: (N, 3) RAW source cloud (camera/world frame — NOT
        pre-transformed; the kernel applies T_gate/T_res itself).
      mask: (N,) bool/{0,1} source validity.
      rows_gathered: (N, 8) packed target rows from the association gather
        (pack_organized_target layout: qx qy qz nx ny nz mask pad), any
        float dtype (f16 production tables upcast in-register).
      T_gate: (4,4) pose the gather indices were computed at (gates).
      T_res: (4,4) pose residuals are linearized at.
      K / width / height: target camera (width/height static).
      max_dist / normal_dot_min / huber_delta: gate + robust-loss params
        (traced scalars — tuning never recompiles).
      src_planes: optional pre-padded source planes from
        `prepare_source_planes` (pass from outside an ICP loop so the
        padding isn't re-paid per iteration).
    Returns:
      (H (6,6), b (6,), num_inliers (), weighted_sq_sum ()).
    """
    N = points.shape[0]
    dtype = points.dtype
    rows = -(-N // _LANES)
    rows = -(-rows // block_rows) * block_rows
    grid = rows // block_rows

    if src_planes is None:
        src_planes = prepare_source_planes(points, normals, mask, block_rows)
    planes = list(src_planes)
    # Target-row unpack: ONE transpose relayout, then sublane (major-dim)
    # slices.  Per-column extraction (`rows_gathered[:, i]`) is the
    # lane-index trap: each column becomes its own fusion and XLA
    # *duplicates the producing gather into all seven* (measured 7× the
    # gather cost — same pathology as the decimate2 fix, ROADMAP round 3).
    # The upcast to f32 rides the transpose: Mosaic has no f16 VMEM type
    # on this backend, so f16 tables must become f32 planes here anyway.
    rt = rows_gathered.T.astype(dtype)               # (8, N) — one relayout
    planes += [_pad_plane(rt[i], rows) for i in range(7)]
    params = _params_vector(T_gate, T_res, K, width, height, max_dist,
                            normal_dot_min, huber_delta, dtype)

    n_padded = rows * _LANES
    tgt_bytes = rows_gathered.dtype.itemsize
    # ~210 VPU flops/point: two 3×3 transforms (36), projection+gates (~20),
    # normal rotation+dot (24), residual (8), Huber (4), cross (9), 21 H +
    # 6 b + wr² terms with their sublane accumulation (~120).
    cost = pl.CostEstimate(
        flops=210 * n_padded,
        bytes_accessed=(4 * 7 + tgt_bytes * 7) * n_padded
        + 4 * grid * _OUT_ROWS * _LANES,
        transcendentals=0,
    )

    def spec():
        return pl.BlockSpec((block_rows, _LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    partials = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((grid * _OUT_ROWS, _LANES), dtype),
        grid=(grid,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + [spec()] * 14,
        out_specs=pl.BlockSpec((_OUT_ROWS, _LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=cost,
        interpret=interpret,
    )(params, *planes)
    return _fold_partials(partials, grid, dtype)


def gn_fused_reference(points, normals, mask, rows_gathered,
                       T_gate, T_res, K, width: int, height: int,
                       max_dist, normal_dot_min, huber_delta):
    """Pure-jnp oracle with the kernel's EXACT elementwise formulation
    (scalar-broadcast transforms, not dot_general) — the CPU production
    path and the interpret-mode test oracle (SURVEY.md §4)."""
    dtype = points.dtype
    params = _params_vector(T_gate, T_res, K, width, height, max_dist,
                            normal_dot_min, huber_delta, dtype)[0]
    p = (points[:, 0], points[:, 1], points[:, 2])
    sn = (normals[:, 0], normals[:, 1], normals[:, 2])
    q = tuple(rows_gathered[:, i].astype(dtype) for i in range(3))
    n = tuple(rows_gathered[:, i].astype(dtype) for i in range(3, 6))
    dm = rows_gathered[:, 6].astype(dtype)
    w_valid, r, xr = _gates_and_residual(
        params, p, sn, mask.astype(dtype), q, n, dm)
    vals = _reduce_outputs(w_valid, r, xr, n, params[_P_HUBER])
    sums = jnp.stack(vals)
    iu, ju = jnp.triu_indices(6)
    H = jnp.zeros((6, 6), dtype=dtype).at[iu, ju].set(sums[:21])
    H = H + jnp.triu(H, 1).T
    return H, sums[21:27], sums[28], sums[27]


def gn_fused_auto(points, normals, mask, rows_gathered,
                  T_gate, T_res, K, width: int, height: int,
                  max_dist, normal_dot_min, huber_delta,
                  use_pallas: bool = False, src_planes=None):
    """Backend selector: fused Pallas pass on TPU, jnp oracle elsewhere
    (mirrors kernels/gn_reduce.gn_reduce_auto)."""
    if not use_pallas:
        return gn_fused_reference(
            points, normals, mask, rows_gathered, T_gate, T_res, K,
            width, height, max_dist, normal_dot_min, huber_delta)
    interpret = jax.default_backend() != "tpu"
    return gn_fused_pallas(
        points, normals, mask, rows_gathered, T_gate, T_res, K,
        width, height, max_dist, normal_dot_min, huber_delta,
        interpret=interpret, src_planes=src_planes)
