"""SE(3) / SO(3) Lie-group math (SURVEY.md §2a R8).

Reference status: C++ 4x4 pose matrices with exp/log for the GN update
(SURVEY.md §2a R8; reference mount empty — provenance [B:5], GN-on-SE(3)).

Design: poses are plain (4, 4) float32 arrays; twists are (6,) arrays ordered
``(rho, phi)`` = (translation part, rotation part).  All functions are pure
`jnp`, broadcast over leading batch dimensions, and are numerically safe at
the identity via Taylor-series branches selected with `jnp.where` (no
data-dependent control flow — everything jits and vmaps).

Convention: ``exp(delta) @ T`` is a *left* (world-frame) update, which is what
the ICP solver uses (tpuslam/icp.py).
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-8


def hat(w: jnp.ndarray) -> jnp.ndarray:
    """so(3) hat operator: (..., 3) -> (..., 3, 3) skew-symmetric matrix."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    z = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([z, -wz, wy], axis=-1),
            jnp.stack([wz, z, -wx], axis=-1),
            jnp.stack([-wy, wx, z], axis=-1),
        ],
        axis=-2,
    )


def vee(W: jnp.ndarray) -> jnp.ndarray:
    """Inverse of `hat`: (..., 3, 3) -> (..., 3)."""
    return jnp.stack([W[..., 2, 1], W[..., 0, 2], W[..., 1, 0]], axis=-1)


# Series-vs-exact switch for the sinc-family coefficients.  The threshold is
# an f32 CANCELLATION bound, not an underflow bound: the exact branches
# compute 1−cosθ and θ−sinθ, which lose ALL mantissa bits once θ²/2 (resp.
# θ³/6) drops below eps(1)≈6e-8 — at θ ≈ 1e-4, f32 cos θ rounds to exactly
# 1.0 and the "exact" b is 0 instead of 0.5 (this corrupted log() of
# near-identity poses by 7 orders of magnitude before the bound was raised).
# At θ = 0.25 the 3-term series' truncation error (next term θ⁶/5040 ≈ 5e-8
# relative) and the exact branch's cancellation error (eps/(θ²/2) ≈ 2e-6
# relative) are both at the f32 noise floor — crossover chosen there.
_SINC_SERIES_THETA_SQ = 0.0625  # θ < 0.25


def _sinc_coeffs(theta_sq: jnp.ndarray):
    """Return (A, B, C) = (sinθ/θ, (1−cosθ)/θ², (θ−sinθ)/θ³), Taylor-safe.

    Both branches of every `where` are finite for all inputs (the series
    branch is evaluated on the clamped θ²), so gradients are NaN-free.
    """
    # Clamp at the series-branch threshold so the exact branch is only ever
    # *evaluated* at θ ≥ 0.25 — keeping its backward pass (which divides by
    # up to θ⁶) clear of f32 underflow AND its value clear of cancellation.
    theta_sq_safe = jnp.maximum(theta_sq, _SINC_SERIES_THETA_SQ)
    theta = jnp.sqrt(theta_sq_safe)
    small = theta_sq < _SINC_SERIES_THETA_SQ
    t2 = theta_sq
    a = jnp.where(
        small,
        1.0 - t2 / 6.0 + t2 * t2 / 120.0,
        jnp.sin(theta) / theta,
    )
    b = jnp.where(
        small,
        0.5 - t2 / 24.0 + t2 * t2 / 720.0,
        (1.0 - jnp.cos(theta)) / theta_sq_safe,
    )
    c = jnp.where(
        small,
        1.0 / 6.0 - t2 / 120.0 + t2 * t2 / 5040.0,
        (theta - jnp.sin(theta)) / (theta_sq_safe * theta),
    )
    return a, b, c


def so3_exp(phi: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues: (..., 3) axis-angle -> (..., 3, 3) rotation matrix."""
    theta_sq = jnp.sum(phi * phi, axis=-1)
    a, b, _ = _sinc_coeffs(theta_sq)
    W = hat(phi)
    W2 = W @ W
    eye = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), W.shape)
    return eye + a[..., None, None] * W + b[..., None, None] * W2


def so3_log(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix -> axis-angle, safe for θ ∈ [0, π].

    Differentiable at the identity (needed: pose-graph GN linearizes edge
    residuals log(...) at *zero* residual).  The scale θ/sinθ is written as
    a function of cosθ with a series branch in u = 1−cosθ near u=0, and
    every unselected branch is kept finite in value AND backward pass (the
    0·inf→NaN `where` trap).  θ = π is the cut locus — value is correct,
    gradient is (mathematically) undefined there.
    """
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_theta = jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0)
    w = vee(R - jnp.swapaxes(R, -1, -2)) * 0.5  # = sinθ · axis
    u = 1.0 - cos_theta
    # θ/sinθ = f(cosθ): series 1 + u/3 + 2u²/15 for u < 1e-3, else
    # arccos(c)/√(1−c²) with c clamped away from ±1 so the exact branch's
    # value and gradient stay finite when unselected.
    c_safe = jnp.clip(cos_theta, -1.0 + 1e-6, 1.0 - 1e-6)
    s_exact = jnp.arccos(c_safe) / jnp.sqrt(1.0 - c_safe * c_safe)
    s_series = 1.0 + u / 3.0 + (2.0 / 15.0) * u * u
    scale = jnp.where(u < 1e-3, s_series, s_exact)
    phi = w * scale[..., None]
    theta = jnp.arccos(jnp.clip(cos_theta, -1.0, -0.5))  # only near-π uses it
    # Near-π branch: the symmetric part satisfies (R+Rᵀ)/2 − cosθ·I =
    # (1−cosθ)·aaᵀ, whose largest column is exactly ∝ axis (the noisy
    # antisymmetric sinθ·W term is projected out).  Sign chosen to agree
    # with the antisymmetric part (sinθ·a, valid for θ<π); at exactly π
    # either sign is a correct logarithm.
    near_pi = theta > 3.0
    M = 0.5 * (R + jnp.swapaxes(R, -1, -2)) - cos_theta[..., None, None] * jnp.broadcast_to(
        jnp.eye(3, dtype=R.dtype), R.shape
    )
    col_sq = jnp.sum(M * M, axis=-2)
    k = jnp.argmax(col_sq, axis=-1)
    idx = jnp.broadcast_to(k[..., None, None], M.shape[:-1] + (1,)).astype(jnp.int32)
    axis = jnp.take_along_axis(M, idx, axis=-1)[..., 0]
    axis = axis * jnp.where(jnp.sum(axis * w, axis=-1, keepdims=True) < 0, -1.0, 1.0)
    # sqrt(max(·)) keeps the backward pass finite when axis ≡ 0 (identity
    # input, branch unselected).
    n2 = jnp.sum(axis * axis, axis=-1, keepdims=True)
    axis = axis / jnp.sqrt(jnp.maximum(n2, 1e-12))
    phi_pi = axis * theta[..., None]
    return jnp.where(near_pi[..., None], phi_pi, phi)


def _left_jacobian(phi: jnp.ndarray) -> jnp.ndarray:
    """SO(3) left Jacobian V: exp twist translation block (…,3,3)."""
    theta_sq = jnp.sum(phi * phi, axis=-1)
    _, b, c = _sinc_coeffs(theta_sq)
    W = hat(phi)
    W2 = W @ W
    eye = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), W.shape)
    return eye + b[..., None, None] * W + c[..., None, None] * W2


def _left_jacobian_inv(phi: jnp.ndarray) -> jnp.ndarray:
    theta_sq = jnp.sum(phi * phi, axis=-1)
    a, b, _ = _sinc_coeffs(theta_sq)
    W = hat(phi)
    W2 = W @ W
    # Same crossover as _sinc_coeffs: below it the exact form's numerator
    # 1 − A/(2B) is a difference of two near-1 f32 values (catastrophic
    # cancellation, then divided by θ²); the 3-term series is exact to f32
    # there (next term θ⁴/30240 ≈ 1e-7 relative at θ = 0.25).
    small = theta_sq < _SINC_SERIES_THETA_SQ
    coeff = jnp.where(
        small,
        1.0 / 12.0 + theta_sq / 720.0 + theta_sq * theta_sq / 30240.0,
        (1.0 - a / (2.0 * jnp.maximum(b, _EPS)))
        / jnp.maximum(theta_sq, _SINC_SERIES_THETA_SQ),
    )
    eye = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), W.shape)
    return eye - 0.5 * W + coeff[..., None, None] * W2


def exp(tau: jnp.ndarray) -> jnp.ndarray:
    """se(3) exp: (..., 6) twist (rho, phi) -> (..., 4, 4) transform."""
    rho, phi = tau[..., :3], tau[..., 3:]
    R = so3_exp(phi)
    t = (_left_jacobian(phi) @ rho[..., None])[..., 0]
    return from_rt(R, t)


def log(T: jnp.ndarray) -> jnp.ndarray:
    """(..., 4, 4) -> (..., 6) twist (rho, phi)."""
    R, t = to_rt(T)
    phi = so3_log(R)
    rho = (_left_jacobian_inv(phi) @ t[..., None])[..., 0]
    return jnp.concatenate([rho, phi], axis=-1)


def from_rt(R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Assemble (..., 4, 4) from rotation (..., 3, 3) and translation (..., 3)."""
    batch = jnp.broadcast_shapes(R.shape[:-2], t.shape[:-1])
    R = jnp.broadcast_to(R, batch + (3, 3))
    t = jnp.broadcast_to(t, batch + (3,))
    top = jnp.concatenate([R, t[..., None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=R.dtype), batch + (4,)
    )[..., None, :]
    return jnp.concatenate([top, bottom], axis=-2)


def to_rt(T: jnp.ndarray):
    return T[..., :3, :3], T[..., :3, 3]


def identity(dtype=jnp.float32) -> jnp.ndarray:
    return jnp.eye(4, dtype=dtype)


def inv(T: jnp.ndarray) -> jnp.ndarray:
    """Closed-form rigid-transform inverse (no linear solve)."""
    R, t = to_rt(T)
    Rt = jnp.swapaxes(R, -1, -2)
    return from_rt(Rt, -(Rt @ t[..., None])[..., 0])


def compose(A: jnp.ndarray, B: jnp.ndarray) -> jnp.ndarray:
    return A @ B


def transform_points(T: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Apply (..., 4, 4) to points (..., N, 3) (or any leading shape on pts)."""
    R, t = to_rt(T)
    return pts @ jnp.swapaxes(R, -1, -2) + t[..., None, :]


def rotate_vectors(T: jnp.ndarray, vecs: jnp.ndarray) -> jnp.ndarray:
    """Apply only the rotation block (for normals)."""
    R, _ = to_rt(T)
    return vecs @ jnp.swapaxes(R, -1, -2)


def relative(T_a: jnp.ndarray, T_b: jnp.ndarray) -> jnp.ndarray:
    """T_a⁻¹ ∘ T_b — pose of b expressed in a's frame."""
    return inv(T_a) @ T_b


def orthonormalize(T: jnp.ndarray) -> jnp.ndarray:
    """Project the rotation block back onto SO(3) via SVD (drift control
    after long compose chains)."""
    R, t = to_rt(T)
    u, _, vt = jnp.linalg.svd(R)
    det = jnp.linalg.det(u @ vt)
    d = jnp.ones_like(t).at[..., 2].set(det)
    R_fixed = (u * d[..., None, :]) @ vt
    return from_rt(R_fixed, t)


def rotation_angle(T: jnp.ndarray) -> jnp.ndarray:
    """Geodesic rotation magnitude of the pose (rad)."""
    R, _ = to_rt(T)
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    return jnp.arccos(jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0))


def translation_norm(T: jnp.ndarray) -> jnp.ndarray:
    return jnp.linalg.norm(T[..., :3, 3], axis=-1)
