"""DP batched alignment vs per-item results (SURVEY.md §2c DP row)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.test_icp_synthetic import K, depth_frame
from tpuslam.config import ICPConfig
from tpuslam.dist.batch_eval import make_batched_aligner, shard_batch
from tpuslam.dist.mesh import make_mesh
from tpuslam.geom import se3
from tpuslam.icp import align_frames, build_pyramid

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 2, reason="needs multi-device backend"
)


def test_batched_alignment_matches_individual():
    cfg = ICPConfig(pyramid_levels=2, iters_per_level=(8, 8),
                    max_corr_dist=0.25, huber_delta=0.05)
    rng = np.random.default_rng(0)
    batch = 8
    taus = rng.normal(scale=[0.02, 0.02, 0.02, 0.01, 0.01, 0.01],
                      size=(batch, 6)).astype(np.float32)
    pyr_ref = build_pyramid(depth_frame(np.eye(4)), cfg.pyramid_levels)
    src_pyrs, dst_pyrs, refs = [], [], []
    for b in range(batch):
        T_b = np.asarray(se3.exp(jnp.asarray(taus[b])))
        pyr_b = build_pyramid(depth_frame(T_b), cfg.pyramid_levels)
        src_pyrs.append(tuple(pyr_b))
        dst_pyrs.append(tuple(pyr_ref))
        refs.append(align_frames(tuple(pyr_b), tuple(pyr_ref), K,
                                 se3.identity(), cfg))

    stack = lambda trees: jax.tree.map(lambda *xs: jnp.stack(xs), *trees)
    src_b = stack(src_pyrs)
    dst_b = stack(dst_pyrs)
    T0s = jnp.tile(jnp.eye(4), (batch, 1, 1))

    mesh = make_mesh()
    fn = make_batched_aligner(mesh, cfg)
    out = fn(shard_batch(src_b, mesh), shard_batch(dst_b, mesh), K,
             shard_batch(T0s, mesh))

    for b in range(batch):
        np.testing.assert_allclose(
            np.asarray(out.T[b]), np.asarray(refs[b].T), atol=2e-4
        )
    # batch executed across all devices
    assert len(out.T.sharding.device_set) >= 1
