"""Voxel-grid downsample unit tests (SURVEY.md §4, Unit row 2)."""

import jax.numpy as jnp
import numpy as np

from tpuslam.geom.cloud import PointCloud
from tpuslam.geom.voxel import voxel_downsample


def make_cloud(pts, normals=None, mask=None, capacity=None):
    return PointCloud.from_points(
        jnp.asarray(pts, dtype=jnp.float32),
        None if normals is None else jnp.asarray(normals, dtype=jnp.float32),
        None if mask is None else jnp.asarray(mask),
        capacity=capacity,
    )


def test_centroids_and_counts():
    pts = [
        [0.01, 0.01, 0.01],
        [0.03, 0.03, 0.03],   # same 0.05-voxel as above
        [0.30, 0.30, 0.30],   # different voxel
    ]
    out = voxel_downsample(make_cloud(pts), voxel_size=0.05, capacity=8,
                           origin=0.0, extent=1.0)
    assert int(out.count()) == 2
    got = np.sort(np.asarray(out.points)[np.asarray(out.mask)], axis=0)
    np.testing.assert_allclose(got[0], [0.02, 0.02, 0.02], atol=1e-6)
    np.testing.assert_allclose(got[1], [0.30, 0.30, 0.30], atol=1e-6)


def test_masked_points_ignored():
    pts = [[0.01, 0.01, 0.01], [0.5, 0.5, 0.5]]
    out = voxel_downsample(
        make_cloud(pts, mask=[True, False]),
        voxel_size=0.05, capacity=8, origin=0.0, extent=1.0,
    )
    assert int(out.count()) == 1
    np.testing.assert_allclose(
        np.asarray(out.points)[np.asarray(out.mask)][0], [0.01, 0.01, 0.01], atol=1e-6
    )


def test_out_of_box_dropped():
    pts = [[0.01, 0.01, 0.01], [5.0, 5.0, 5.0]]
    out = voxel_downsample(make_cloud(pts), voxel_size=0.05, capacity=8,
                           origin=0.0, extent=1.0)
    assert int(out.count()) == 1


def test_capacity_overflow_masks_tail(rng):
    pts = rng.uniform(0.0, 1.0, size=(256, 3))
    out = voxel_downsample(make_cloud(pts), voxel_size=0.01, capacity=16,
                           origin=0.0, extent=1.0)
    # ≤ capacity survivors, all marked valid
    assert int(out.count()) <= 16
    assert out.points.shape == (16, 3)


def test_normals_averaged():
    pts = [[0.01, 0.01, 0.01], [0.02, 0.02, 0.02]]
    normals = [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]]
    out = voxel_downsample(make_cloud(pts, normals=normals), voxel_size=0.05,
                           capacity=4, origin=0.0, extent=1.0)
    n = np.asarray(out.normals)[np.asarray(out.mask)][0]
    np.testing.assert_allclose(n, np.array([1.0, 1.0, 0.0]) / np.sqrt(2), atol=1e-6)


def test_random_matches_numpy_oracle(rng):
    pts = rng.uniform(-1.0, 1.0, size=(500, 3)).astype(np.float32)
    vs = 0.1
    out = voxel_downsample(make_cloud(pts), voxel_size=vs, capacity=1024,
                           origin=-2.0, extent=4.0)
    # numpy oracle
    keys = np.floor((pts - (-2.0)) / vs).astype(np.int64)
    uniq, inv = np.unique(keys, axis=0, return_inverse=True)
    centroids = np.zeros((len(uniq), 3))
    np.add.at(centroids, inv, pts)
    counts = np.bincount(inv)
    centroids /= counts[:, None]
    assert int(out.count()) == len(uniq)
    got = np.asarray(out.points)[np.asarray(out.mask)]
    got_sorted = got[np.lexsort(got.T)]
    ref_sorted = centroids[np.lexsort(centroids.T)]
    np.testing.assert_allclose(got_sorted, ref_sorted, atol=1e-5)
