"""Pallas TPU kernel: the GN-step EPILOGUE — partial-sum fold, damped 6×6
solve, trust-region clamp, SE(3) exp and pose compose in ONE kernel.

Why this exists (round-4 roofline, BASELINE.md): after the association
gather (0.29 ms, VMEM-speed-of-light) and the Pallas GN reduction (µs),
the remaining cost of an ICP GN step is ~0.14 ms of *op-launch overhead*:
the 6×6 `jnp.linalg.solve` (LU + pivot gathers), `se3.exp` (sinc-series
scalar soup) and the fold/assembly lower to ~50-100 tiny HLO ops at a few
µs each — measured 139 µs/iteration for solve+exp+compose alone in a
dispatch-amortized fori_loop, invariant across LU/Cholesky/Gauss variants
(it is launch count, not math).  Coarse pyramid levels are almost
entirely this soup.  This kernel collapses all of it into one launch.

In-kernel math is VECTOR-only (Mosaic has no general scalar extraction
from vectors): (1,1)-shaped "scalars" broadcast against (6,6)/(4,4)
tiles, one-hot constant patterns instead of scatters, generator matrices
instead of element writes:

  * fold: (G·32, 128) lane partials → 30 sums as a (32, 1) column
    (one axis-0 add-reduce + one lane reduce),
  * assemble H (6,6 symmetric) and b from constant index patterns,
  * damp: multiplicative λ·diag(H) + absolute λ_abs·(tr H/6)·I
    (same two-damping scheme as kernels/gn_reduce.solve_gn_step),
  * solve: UNROLLED Gauss elimination without pivoting (H is damped SPD;
    masked rank-1 updates, 6 forward + 6 back-substitution steps),
  * guard: non-finite δ → 0 (rank-collapse safety, as solve_gn_step),
  * trust region: scale the twist so ‖ρ‖ ≤ max_trans, ‖φ‖ ≤ max_rot,
  * exp: Rodrigues via so(3) generator matrices G_x/G_y/G_z embedded in
    4×4, V·ρ translation, sinc-series branches below θ < 0.25 (the same
    f32 cancellation threshold as geom/se3.py),
  * compose: T_new = exp(δ)·T (left update, se3.py convention).

Outputs: T_new (4,4), H (6,6) (undamped — observability gating reads it),
and a scalar row [δ², Σwr², Σvalid, Σw] for the convergence carry.

Reference parity: replaces the solve/update lines of SURVEY.md §2a R7
("solve Hδ=−b; T ← exp(δ)·T") and R8; oracle `gn_epilogue_reference`
mirrors the kernel op-for-op and is itself tested against
solve_gn_step + se3.exp (SURVEY.md §4 kernel-oracle strategy).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128
_OUT_ROWS = 32          # partials layout of kernels/pallas_gn.py
_NUM_OUT = 30

# Constant patterns are built IN-KERNEL from iota comparisons with Python
# ints — Pallas kernels cannot capture array constants (they would need to
# be operands), and scalar-immediate compares lower fine in Mosaic.
_IU, _JU = np.triu_indices(6)            # 21 upper-tri positions (trace time)


_SINC_SERIES_THETA_SQ = 0.0625           # geom/se3.py threshold (θ < 0.25)


def _epilogue_math(sums, T, damping, damping_abs, max_trans, max_rot):
    """Shared vector-land math (kernel body AND jnp oracle, identical ops).

    Mosaic constraints shape everything here: no captured array constants
    (patterns come from iota compares), no broadcasts of offset (1,1)
    vectors (every "scalar" is a genuine 0-d value produced by a masked
    full reduce, which Mosaic lowers; offset slices like `aug[k:k+1,k:k+1]`
    do NOT broadcast), and no rank-1 arrays (1-D iota doesn't lower).

    Args:
      sums: (32, 1) column of folded partials (rows ≥ _NUM_OUT are junk).
      T: (4, 4) current pose; damping/...: 0-d scalars.
    Returns: (T_new (4,4), H (6,6), delta_sq, wsq, ninl, wsum — 0-d).
    """
    f32 = sums.dtype
    i6 = jax.lax.broadcasted_iota(jnp.int32, (6, 6), 0)
    j6 = jax.lax.broadcasted_iota(jnp.int32, (6, 6), 1)
    i4 = jax.lax.broadcasted_iota(jnp.int32, (4, 4), 0)
    j4 = jax.lax.broadcasted_iota(jnp.int32, (4, 4), 1)
    i67 = jax.lax.broadcasted_iota(jnp.int32, (6, 7), 0)
    j67 = jax.lax.broadcasted_iota(jnp.int32, (6, 7), 1)
    rows6 = jax.lax.broadcasted_iota(jnp.int32, (6, 1), 0)
    rows32 = jax.lax.broadcasted_iota(jnp.int32, (32, 1), 0)

    def pat(cond):
        return cond.astype(f32)

    def s_at(k):
        """Partial-sum row k as a 0-d scalar (origin-aligned by reduce)."""
        return jnp.sum(sums * pat(rows32 == k))

    # --- assemble H (6,6 symmetric) and b (6,1) from index patterns ---
    H = jnp.zeros((6, 6), f32)
    for k, (pi, pj) in enumerate(zip(_IU, _JU)):
        mask = ((i6 == int(pi)) & (j6 == int(pj))) | (
            (i6 == int(pj)) & (j6 == int(pi)))
        H = H + s_at(k) * pat(mask)
    b = jnp.zeros((6, 1), f32)
    for k in range(6):
        b = b + s_at(21 + k) * pat(rows6 == k)
    wsq = s_at(27)
    ninl = s_at(28)
    wsum = s_at(29)

    # --- damping (solve_gn_step parity) ---
    eye6 = pat(i6 == j6)
    diag = H * eye6
    trace = jnp.sum(diag)
    lam_abs = damping_abs * (trace / 6.0) + 1e-9
    A = H + damping * diag + lam_abs * eye6

    # --- augmented Gauss elimination, no pivoting (damped SPD) ---
    aug = jnp.concatenate([A, -b], axis=1)                    # (6, 7)
    for k in range(6):
        akk = jnp.sum(aug * pat((i67 == k) & (j67 == k)))     # 0-d pivot
        colk = jnp.sum(aug * pat(j67 == k), axis=1, keepdims=True)  # (6,1)
        rowk = jnp.sum(aug * pat(i67 == k), axis=0, keepdims=True)  # (1,7)
        below = pat(rows6 > k)
        aug = aug - (below * colk / akk) * rowk
    # back substitution: eliminate above the pivot, normalize pivot rows
    for k in range(5, -1, -1):
        akk = jnp.sum(aug * pat((i67 == k) & (j67 == k)))
        rowk = jnp.sum(aug * pat(i67 == k), axis=0, keepdims=True) / akk
        colk = jnp.sum(aug * pat(j67 == k), axis=1, keepdims=True)
        above = pat(rows6 < k)
        aug = aug - (above * colk) * rowk
        sel = pat(i67 == k)
        aug = aug * (1.0 - sel) + sel * rowk
    delta = jnp.sum(aug * pat(j67 == 6), axis=1, keepdims=True)  # (6, 1)

    # --- non-finite guard + trust region ---
    # Two stages: the elementwise where() removes inf/NaN entries FIRST
    # (0·inf = NaN — a bare multiply by the flag would propagate the very
    # values it is guarding against), then the all-finite flag zeroes the
    # whole step, matching solve_gn_step's where(ok, delta, 0).
    finite = jnp.min(jnp.isfinite(delta).astype(f32))
    delta = jnp.where(jnp.isfinite(delta), delta, 0.0) * finite
    rho_mask = pat(rows6 < 3)
    t_norm = jnp.sqrt(jnp.sum((delta * rho_mask) ** 2))
    r_norm = jnp.sqrt(jnp.sum((delta * (1.0 - rho_mask)) ** 2))
    scale = jnp.minimum(
        jnp.float32(1.0).astype(f32),
        jnp.minimum(max_trans / jnp.maximum(t_norm, 1e-12),
                    max_rot / jnp.maximum(r_norm, 1e-12)),
    )
    delta = delta * scale
    delta_sq = jnp.sum(delta * delta)

    # --- SE(3) exp via 4x4 generators (se3.py series thresholds) ---
    phx = jnp.sum(delta * pat(rows6 == 3))
    phy = jnp.sum(delta * pat(rows6 == 4))
    phz = jnp.sum(delta * pat(rows6 == 5))
    # so(3) generators from index patterns: W[1,2]=-phx, W[2,1]=+phx, ...
    gx = pat((i4 == 2) & (j4 == 1)) - pat((i4 == 1) & (j4 == 2))
    gy = pat((i4 == 0) & (j4 == 2)) - pat((i4 == 2) & (j4 == 0))
    gz = pat((i4 == 1) & (j4 == 0)) - pat((i4 == 0) & (j4 == 1))
    W = phx * gx + phy * gy + phz * gz                        # (4, 4)
    W2 = W @ W
    theta_sq = phx * phx + phy * phy + phz * phz
    ts_safe = jnp.maximum(theta_sq, _SINC_SERIES_THETA_SQ)
    theta = jnp.sqrt(ts_safe)
    small = theta_sq < _SINC_SERIES_THETA_SQ
    t2 = theta_sq
    a_co = jnp.where(small, 1.0 - t2 / 6.0 + t2 * t2 / 120.0,
                     jnp.sin(theta) / theta)
    b_co = jnp.where(small, 0.5 - t2 / 24.0 + t2 * t2 / 720.0,
                     (1.0 - jnp.cos(theta)) / ts_safe)
    c_co = jnp.where(small,
                     1.0 / 6.0 - t2 / 120.0 + t2 * t2 / 5040.0,
                     (theta - jnp.sin(theta)) / (ts_safe * theta))
    i3_4 = pat((i4 == j4) & (i4 < 3))                         # diag(1,1,1,0)
    R4 = i3_4 + a_co * W + b_co * W2                          # rotation block
    V4 = i3_4 + b_co * W + c_co * W2
    rho4 = jnp.concatenate([delta[0:3, 0:1], jnp.zeros((1, 1), f32)], axis=0)
    t4 = V4 @ rho4                                            # (4, 1)
    e3row = (jax.lax.broadcasted_iota(jnp.int32, (1, 4), 1) == 3).astype(f32)
    e33 = pat((i4 == 3) & (j4 == 3))
    E = R4 + t4 @ e3row + e33                                 # exp(delta)
    T_new = E @ T
    return T_new, H, delta_sq, wsq, ninl, wsum


def _kernel(params_ref, partials_ref, t_ref, tnew_ref, h_ref, scal_ref):
    mat = partials_ref[:]                                     # (G*32, 128)
    g = mat.shape[0] // _OUT_ROWS
    acc = mat.reshape(g, _OUT_ROWS, _LANES).sum(axis=0)       # (32, 128)
    sums = jnp.sum(acc, axis=1, keepdims=True)                # (32, 1)
    # SMEM serves scalar loads only — parameters come out as 0-d scalars.
    damping = params_ref[0, 0]
    damping_abs = params_ref[0, 1]
    max_trans = params_ref[0, 2]
    max_rot = params_ref[0, 3]
    T_new, H, delta_sq, wsq, ninl, wsum = _epilogue_math(
        sums, t_ref[:], damping, damping_abs, max_trans, max_rot)
    tnew_ref[:] = T_new
    h_ref[:] = H
    scal_ref[0, 0] = delta_sq                                 # SMEM scalar
    scal_ref[0, 1] = wsq                                      # stores
    scal_ref[0, 2] = ninl
    scal_ref[0, 3] = wsum


@functools.partial(jax.jit, static_argnames=("interpret",))
def gn_epilogue_pallas(partials, T, damping, damping_abs,
                       max_trans, max_rot, interpret: bool = False):
    """One-launch GN-step epilogue.

    Args:
      partials: (G*32, 128) lane partials from the GN reduce kernel
        (pallas_gn layout: 21 H + 6 b + sum(wr^2) + sum(valid) + sum(w)).
      T: (4, 4) current pose estimate.
      damping/damping_abs/max_trans/max_rot: solve_gn_step parameters
        (traced scalars — tuning never recompiles).
    Returns:
      (T_new (4,4), H (6,6), delta_sq (), wsq (), ninl (), wsum ()).
    """
    f32 = partials.dtype
    params = jnp.stack([
        jnp.asarray(damping, f32), jnp.asarray(damping_abs, f32),
        jnp.asarray(max_trans, f32), jnp.asarray(max_rot, f32),
    ]).reshape(1, 4)
    T_new, H, scal = pl.pallas_call(
        _kernel,
        out_shape=(
            jax.ShapeDtypeStruct((4, 4), f32),
            jax.ShapeDtypeStruct((6, 6), f32),
            jax.ShapeDtypeStruct((1, 4), f32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        interpret=interpret,
    )(params, partials, T.astype(f32))
    return (T_new, H, scal[0, 0], scal[0, 1], scal[0, 2], scal[0, 3])


def gn_epilogue_reference(partials, T, damping, damping_abs,
                          max_trans, max_rot):
    """Pure-jnp oracle with the kernel's exact op sequence (CPU production
    uses the legacy solve_gn_step chain instead — this exists as the
    interpret-mode test oracle, SURVEY.md §4)."""
    f32 = partials.dtype
    g = partials.shape[0] // _OUT_ROWS
    acc = partials.reshape(g, _OUT_ROWS, _LANES).sum(axis=0)
    sums = jnp.sum(acc, axis=1, keepdims=True)
    return _epilogue_math(
        sums, T.astype(f32), jnp.asarray(damping, f32),
        jnp.asarray(damping_abs, f32), jnp.asarray(max_trans, f32),
        jnp.asarray(max_rot, f32))
