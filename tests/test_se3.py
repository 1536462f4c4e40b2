"""SE(3)/SO(3) unit tests vs closed forms (SURVEY.md §4 test pyramid, Unit row 1)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from tpuslam.geom import se3


def random_twists(rng, n=64, scale=1.0):
    return jnp.asarray(rng.normal(size=(n, 6)) * scale, dtype=jnp.float32)


def test_hat_vee_roundtrip(rng):
    w = jnp.asarray(rng.normal(size=(10, 3)), dtype=jnp.float32)
    np.testing.assert_allclose(se3.vee(se3.hat(w)), w, atol=1e-6)


def test_so3_exp_matches_scipy(rng):
    phi = rng.normal(size=(32, 3)).astype(np.float32)
    R = np.asarray(se3.so3_exp(jnp.asarray(phi)))
    R_ref = Rotation.from_rotvec(phi).as_matrix().astype(np.float32)
    np.testing.assert_allclose(R, R_ref, atol=1e-5)


def test_so3_log_roundtrip(rng):
    # includes small angles and near-pi angles
    axes = rng.normal(size=(64, 3))
    axes /= np.linalg.norm(axes, axis=-1, keepdims=True)
    angles = np.concatenate([
        rng.uniform(0, np.pi - 1e-3, size=48),
        rng.uniform(1e-9, 1e-4, size=8),
        rng.uniform(np.pi - 1e-2, np.pi - 1e-4, size=8),
    ])
    phi = (axes * angles[:, None]).astype(np.float32)
    R = se3.so3_exp(jnp.asarray(phi))
    phi_back = np.asarray(se3.so3_log(R))
    R_back = np.asarray(se3.so3_exp(jnp.asarray(phi_back)))
    np.testing.assert_allclose(R_back, np.asarray(R), atol=5e-4)


def test_se3_exp_log_roundtrip(rng):
    tau = random_twists(rng, scale=0.8)
    T = se3.exp(tau)
    tau_back = se3.log(T)
    np.testing.assert_allclose(np.asarray(tau_back), np.asarray(tau), atol=2e-4)


def test_exp_zero_is_identity():
    T = se3.exp(jnp.zeros(6))
    np.testing.assert_allclose(np.asarray(T), np.eye(4), atol=1e-7)


def test_inv_compose(rng):
    tau = random_twists(rng, n=16)
    T = se3.exp(tau)
    eye = jnp.broadcast_to(jnp.eye(4), T.shape)
    np.testing.assert_allclose(np.asarray(T @ se3.inv(T)), np.asarray(eye), atol=1e-5)
    np.testing.assert_allclose(np.asarray(se3.inv(T) @ T), np.asarray(eye), atol=1e-5)


def test_transform_points_matches_homogeneous(rng):
    tau = random_twists(rng, n=4)
    T = se3.exp(tau)
    pts = jnp.asarray(rng.normal(size=(4, 100, 3)), dtype=jnp.float32)
    out = se3.transform_points(T, pts)
    hom = jnp.concatenate([pts, jnp.ones_like(pts[..., :1])], axis=-1)
    ref = jnp.einsum("bij,bnj->bni", T, hom)[..., :3]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_exp_is_jittable_and_gradable(rng):
    tau = random_twists(rng, n=1)[0]

    @jax.jit
    def loss(t):
        return jnp.sum(se3.exp(t) ** 2)

    g = jax.grad(loss)(tau)
    assert np.all(np.isfinite(np.asarray(g)))
    g0 = jax.grad(loss)(jnp.zeros(6))
    assert np.all(np.isfinite(np.asarray(g0)))


def test_left_update_convention(rng):
    """exp(δ)·T moves points by δ in the world frame (ICP update model)."""
    T = se3.exp(random_twists(rng, n=1)[0])
    delta = jnp.array([0.01, 0.0, 0.0, 0.0, 0.0, 0.0], dtype=jnp.float32)
    T2 = se3.exp(delta) @ T
    p = jnp.asarray(rng.normal(size=(5, 3)), dtype=jnp.float32)
    moved = se3.transform_points(T2, p) - se3.transform_points(T, p)
    np.testing.assert_allclose(np.asarray(moved[:, 0]), 0.01, atol=1e-6)
    np.testing.assert_allclose(np.asarray(moved[:, 1:]), 0.0, atol=1e-6)


def test_orthonormalize(rng):
    T = se3.exp(random_twists(rng, n=8))
    noisy = T.at[..., :3, :3].add(
        jnp.asarray(rng.normal(size=(8, 3, 3)) * 1e-3, dtype=jnp.float32)
    )
    fixed = se3.orthonormalize(noisy)
    R = np.asarray(fixed[..., :3, :3])
    np.testing.assert_allclose(
        R @ R.transpose(0, 2, 1), np.broadcast_to(np.eye(3), (8, 3, 3)), atol=1e-5
    )


def test_rotation_angle_translation_norm(rng):
    axis = np.array([0.0, 0.0, 1.0])
    for angle in [0.0, 0.3, 1.5]:
        T = se3.from_rt(
            se3.so3_exp(jnp.asarray(axis * angle, dtype=jnp.float32)),
            jnp.array([3.0, 4.0, 0.0]),
        )
        assert np.asarray(se3.rotation_angle(T)) == pytest.approx(angle, abs=1e-5)
        assert np.asarray(se3.translation_norm(T)) == pytest.approx(5.0, abs=1e-5)


def test_log_near_identity_no_cancellation(rng):
    """Regression: log() of a near-identity transform must return a twist of
    the input's magnitude, not explode.  With the sinc-series threshold at
    θ² < 1e-8, f32 cosθ rounds to exactly 1.0 just ABOVE the threshold
    (θ ≈ 1e-4), the 'exact' (1−cosθ)/θ² evaluated to 0, and the left-Jacobian
    inverse amplified millimetre translations to kilometres."""
    axes = rng.normal(size=(40, 3))
    axes /= np.linalg.norm(axes, axis=-1, keepdims=True)
    # sweep straight through the old θ = 1e-4 threshold and up to the new one
    angles = np.geomspace(1e-6, 0.5, 40)
    t = rng.normal(size=(40, 3)).astype(np.float32) * 1e-3
    for i in range(40):
        phi = (axes[i] * angles[i]).astype(np.float32)
        T = se3.from_rt(se3.so3_exp(jnp.asarray(phi)), jnp.asarray(t[i]))
        tau = np.asarray(se3.log(T))
        # rho is bounded by ~|t|·(1 + θ/2 corrections); kilometres = bug
        assert np.linalg.norm(tau[:3]) < 10 * np.linalg.norm(t[i]) + 1e-6, (
            angles[i], tau)
        # and the round trip reproduces T
        T_back = np.asarray(se3.exp(jnp.asarray(tau)))
        np.testing.assert_allclose(T_back, np.asarray(T), atol=1e-6)
