"""Backprojection / projection / normals unit tests (SURVEY.md §4, Unit row 2)."""

import jax.numpy as jnp
import numpy as np

from tpuslam.config import Intrinsics
from tpuslam.geom.backproject import backproject, project
from tpuslam.geom.normals import organized_normals


K = Intrinsics(100.0, 100.0, 32.0, 24.0)


def test_backproject_hand_computed():
    depth = jnp.full((48, 64), 2.0)
    pts, mask = backproject(depth, K)
    assert bool(mask.all())
    # principal point maps to (0, 0, z)
    np.testing.assert_allclose(np.asarray(pts[24, 32]), [0.0, 0.0, 2.0], atol=1e-6)
    # pixel one to the right of principal point: x = z/fx
    np.testing.assert_allclose(np.asarray(pts[24, 33]), [0.02, 0.0, 2.0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(pts[25, 32]), [0.0, 0.02, 2.0], atol=1e-6)


def test_backproject_invalid_depth():
    depth = jnp.zeros((48, 64)).at[5, 5].set(2.0).at[6, 6].set(50.0)
    pts, mask = backproject(depth, K, depth_min=0.1, depth_max=10.0)
    assert int(mask.sum()) == 1
    assert bool(mask[5, 5])
    np.testing.assert_allclose(np.asarray(pts[0, 0]), 0.0)


def test_project_backproject_roundtrip(rng):
    depth = jnp.asarray(rng.uniform(0.5, 4.0, size=(48, 64)), dtype=jnp.float32)
    pts, mask = backproject(depth, K)
    uv, valid = project(pts, K)
    assert bool(valid.all())
    u_ref = np.broadcast_to(np.arange(64), (48, 64))
    v_ref = np.broadcast_to(np.arange(48)[:, None], (48, 64))
    np.testing.assert_allclose(np.asarray(uv[..., 0]), u_ref, atol=1e-3)
    np.testing.assert_allclose(np.asarray(uv[..., 1]), v_ref, atol=1e-3)


def test_normals_on_plane():
    """A fronto-parallel plane has normals (0,0,-1) (toward camera)."""
    depth = jnp.full((48, 64), 3.0)
    pts, mask = backproject(depth, K)
    normals, nmask = organized_normals(pts, mask)
    inner = np.asarray(normals[2:-2, 2:-2])
    np.testing.assert_allclose(
        inner, np.broadcast_to([0.0, 0.0, -1.0], inner.shape), atol=1e-4
    )
    assert bool(nmask[2:-2, 2:-2].all())
    # border invalid
    assert not bool(nmask[0].any())


def test_normals_on_slanted_plane():
    """Plane z = 2 + 0.5x ⇒ normal ∝ (0.5, 0, -1)/√1.25 toward camera."""
    h, w = 48, 64
    u = np.broadcast_to(np.arange(w, dtype=np.float32), (h, w))
    # z = 2 + 0.5 x and x = (u-cx) z / fx ⇒ z (1 - 0.5 (u-cx)/fx) = 2
    denom = 1.0 - 0.5 * (u - K.cx) / K.fx
    depth = jnp.asarray(2.0 / denom)
    pts, mask = backproject(depth, K)
    normals, nmask = organized_normals(pts, mask, depth_disc=1.0)
    expected = np.array([0.5, 0.0, -1.0]) / np.sqrt(1.25)
    inner = np.asarray(normals[5:-5, 5:-5])
    np.testing.assert_allclose(
        inner, np.broadcast_to(expected, inner.shape), atol=1e-3
    )


def test_normals_depth_discontinuity():
    depth = jnp.full((48, 64), 2.0).at[:, 32:].set(4.0)
    pts, mask = backproject(depth, K)
    normals, nmask = organized_normals(pts, mask, depth_disc=0.1)
    # pixels adjacent to the jump are masked out
    assert not bool(nmask[10, 31])
    assert not bool(nmask[10, 32])
    assert bool(nmask[10, 10])
