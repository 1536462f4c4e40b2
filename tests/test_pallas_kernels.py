"""Pallas kernel vs jnp-oracle equivalence (SURVEY.md §4 "Pallas kernels
(N7, N8) vs pure-jnp reference implementations ... interpret=True on CPU")."""

import jax.numpy as jnp
import numpy as np
import pytest

from tpuslam.kernels.gn_reduce import gn_reduce
from tpuslam.kernels.pallas_gn import gn_reduce_pallas


def random_inputs(rng, n, valid_frac=0.8):
    x = jnp.asarray(rng.normal(size=(n, 3)), dtype=jnp.float32)
    q = x + jnp.asarray(rng.normal(scale=0.05, size=(n, 3)), dtype=jnp.float32)
    nrm = jnp.asarray(rng.normal(size=(n, 3)), dtype=jnp.float32)
    nrm = nrm / jnp.linalg.norm(nrm, axis=-1, keepdims=True)
    w = jnp.asarray(rng.uniform(size=n) < valid_frac, dtype=jnp.float32)
    return x, q, nrm, w


@pytest.mark.parametrize("n", [128, 4096, 5000])
def test_gn_reduce_pallas_matches_oracle(rng, n):
    x, q, nrm, w = random_inputs(rng, n)
    mask = w > 0
    ref = gn_reduce(x, q, nrm, w, mask, 0.05)
    H, b, inliers, wsq, wsum = gn_reduce_pallas(
        x, q, nrm, w, 0.05, interpret=True
    )
    np.testing.assert_allclose(np.asarray(H), np.asarray(ref.H),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(b), np.asarray(ref.b),
                               rtol=1e-4, atol=1e-4)
    assert float(inliers) == pytest.approx(float(ref.num_inliers))
    assert float(wsq) == pytest.approx(float(ref.weighted_sq_sum), rel=1e-4)


def test_gn_reduce_pallas_huber_kicks_in(rng):
    """Outliers must be downweighted identically to the oracle."""
    x, q, nrm, w = random_inputs(rng, 1024, valid_frac=1.0)
    # inject gross outliers
    q = q.at[:100].add(10.0)
    mask = w > 0
    ref = gn_reduce(x, q, nrm, w, mask, 0.05)
    H, b, *_ = gn_reduce_pallas(x, q, nrm, w, 0.05, interpret=True)
    np.testing.assert_allclose(np.asarray(H), np.asarray(ref.H),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(b), np.asarray(ref.b),
                               rtol=1e-4, atol=1e-4)


def test_gn_reduce_pallas_all_invalid(rng):
    x, q, nrm, _ = random_inputs(rng, 256)
    w = jnp.zeros((256,))
    H, b, inliers, wsq, wsum = gn_reduce_pallas(x, q, nrm, w, 0.05,
                                                interpret=True)
    np.testing.assert_allclose(np.asarray(H), 0.0)
    np.testing.assert_allclose(np.asarray(b), 0.0)
    assert float(inliers) == 0.0


def test_icp_with_forced_pallas_matches(rng, monkeypatch):
    """End-to-end: ICP with the (interpreted) Pallas reduction converges to
    the same pose as the jnp path."""
    monkeypatch.setenv("TPUSLAM_FORCE_PALLAS", "1")
    from tests.test_icp_synthetic import make_clouds, pose_error
    from tpuslam.config import ICPConfig
    from tpuslam.geom import se3
    from tpuslam.icp import align_clouds

    src_world, dst = make_clouds(n=1024)
    tau = jnp.array([0.03, -0.02, 0.04, 0.015, -0.02, 0.02])
    T_true = se3.exp(tau)
    src = src_world.transform(se3.inv(T_true))
    cfg = ICPConfig(max_iters=25, max_corr_dist=0.3, huber_delta=0.1)
    res = align_clouds(src, dst, se3.identity(), cfg, use_grid=False)
    t_err, r_err = pose_error(res.T, T_true)
    assert t_err < 8e-3 and r_err < 8e-3
