"""Fused projective GN step (kernels/gn_fused.py) vs the legacy
correspond→gn_reduce chain and the interpret-mode Pallas kernel
(SURVEY.md §4 kernel-oracle strategy; BASELINE.md roofline item)."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from tpuslam.config import ICPConfig, Intrinsics
from tpuslam.geom import se3
from tpuslam.kernels.correspond import (
    pack_organized_target,
    projective_correspond_packed,
)
from tpuslam.kernels.gn_fused import (
    gn_fused_pallas,
    gn_fused_reference,
)
from tpuslam.kernels.gn_reduce import gn_reduce

H, W = 24, 32
K = Intrinsics(20.0, 20.0, W / 2 - 0.5, H / 2 - 0.5)


def organized_scene(rng):
    """A bumpy organized target + a perturbed source cloud that projects
    into it (so every gate — bounds, distance, normals — has both
    passing and failing members)."""
    u, v = np.meshgrid(np.arange(W), np.arange(H))
    z = 2.0 + 0.2 * np.sin(u / 5.0) * np.cos(v / 4.0)
    x = (u - K.cx) / K.fx * z
    y = (v - K.cy) / K.fy * z
    pts = np.stack([x, y, z], axis=-1).astype(np.float32)
    # central-difference normals (any smooth field works for the test)
    n = np.zeros_like(pts)
    n[1:-1, 1:-1] = np.cross(
        pts[1:-1, 2:] - pts[1:-1, :-2], pts[2:, 1:-1] - pts[:-2, 1:-1]
    )
    nn = np.linalg.norm(n, axis=-1, keepdims=True)
    n = np.where(nn > 1e-9, n / np.maximum(nn, 1e-9), 0.0).astype(np.float32)
    mask = np.ones((H, W), bool)
    mask[:2] = False                       # some invalid target rows
    packed = pack_organized_target(
        jnp.asarray(pts), jnp.asarray(n), jnp.asarray(mask))

    m = H * W
    src_pts = pts.reshape(m, 3) + rng.normal(scale=0.01, size=(m, 3))
    src_n = n.reshape(m, 3)
    src_mask = rng.uniform(size=m) < 0.9
    # a few wild outliers to exercise the distance gate + Huber
    src_pts[:17] += 5.0
    return (packed, jnp.asarray(src_pts.astype(np.float32)),
            jnp.asarray(src_n), jnp.asarray(src_mask))


def legacy_stats(packed, p, sn, m, T_gate, T_res, cfg):
    """The unfused production math: transform in XLA, gate via
    projective_correspond_packed, reduce via gn_reduce — with gates frozen
    at T_gate and residuals at T_res (inner/outer ICP semantics)."""
    xg = se3.transform_points(T_gate, p)
    n_rot = se3.rotate_vectors(T_gate, sn)
    corr = projective_correspond_packed(
        xg, m, packed, H, W, K, cfg.max_corr_dist,
        src_normals_in_dst=n_rot, normal_dot_min=cfg.normal_dot_min)
    xr = se3.transform_points(T_res, p)
    return gn_reduce(xr, corr.q, corr.n, corr.w, m, cfg.huber_delta)


def fused_args(packed, p, sn, m, T_gate, T_res, cfg):
    xg = se3.transform_points(T_gate, p)
    from tpuslam.geom.backproject import project

    uv, _ = project(xg, K)
    ui = jnp.round(uv[..., 0]).astype(jnp.int32)
    vi = jnp.round(uv[..., 1]).astype(jnp.int32)
    flat = jnp.clip(vi, 0, H - 1) * W + jnp.clip(ui, 0, W - 1)
    rows = packed[flat]
    return (p, sn, m, rows, T_gate, T_res, K, W, H,
            cfg.max_corr_dist, cfg.normal_dot_min, cfg.huber_delta)


@pytest.mark.parametrize("same_pose", [True, False])
def test_fused_reference_matches_legacy_chain(rng, same_pose):
    cfg = ICPConfig()
    packed, p, sn, m = organized_scene(rng)
    T_gate = np.asarray(se3.exp(jnp.asarray([0.02, -0.01, 0.015, 0.01, -0.02, 0.005])))
    T_res = T_gate if same_pose else np.asarray(
        se3.exp(jnp.asarray([0.01, 0.0, -0.01, 0.0, 0.01, 0.0]))) @ T_gate
    T_gate, T_res = jnp.asarray(T_gate), jnp.asarray(T_res)

    ref = legacy_stats(packed, p, sn, m, T_gate, T_res, cfg)
    Hm, b, ninl, wsq = gn_fused_reference(
        *fused_args(packed, p, sn, m, T_gate, T_res, cfg))

    assert float(ninl) == pytest.approx(float(ref.num_inliers))
    np.testing.assert_allclose(np.asarray(Hm), np.asarray(ref.H),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(b), np.asarray(ref.b),
                               rtol=2e-4, atol=2e-4)
    assert float(wsq) == pytest.approx(float(ref.weighted_sq_sum), rel=2e-4)
    assert float(ninl) > 100  # the scene must actually exercise the gates


def test_fused_kernel_matches_reference(rng):
    """Pallas kernel (interpret mode) vs the jnp oracle — same formulation,
    so agreement is tight."""
    cfg = ICPConfig()
    packed, p, sn, m = organized_scene(rng)
    T_gate = se3.exp(jnp.asarray([0.02, -0.01, 0.015, 0.01, -0.02, 0.005]))
    T_res = se3.exp(jnp.asarray([0.0, 0.01, 0.0, 0.005, 0.0, -0.01])) @ T_gate
    args = fused_args(packed, p, sn, m, T_gate, T_res, cfg)
    Hr, br, ir, wr = gn_fused_reference(*args)
    Hk, bk, ik, wk = gn_fused_pallas(*args, interpret=True)
    np.testing.assert_allclose(np.asarray(Hk), np.asarray(Hr),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(bk), np.asarray(br),
                               rtol=1e-5, atol=1e-5)
    assert float(ik) == pytest.approx(float(ir))
    assert float(wk) == pytest.approx(float(wr), rel=1e-5)


def test_fused_kernel_f16_rows(rng):
    """Production tables are float16 — the kernel upcasts in-register and
    must agree with the oracle fed the same quantized rows."""
    cfg = ICPConfig()
    packed, p, sn, m = organized_scene(rng)
    T = se3.exp(jnp.asarray([0.01, 0.0, 0.01, 0.0, -0.01, 0.0]))
    args = list(fused_args(packed, p, sn, m, T, T, cfg))
    args[3] = args[3].astype(jnp.float16)
    Hr, br, ir, _ = gn_fused_reference(*args)
    Hk, bk, ik, _ = gn_fused_pallas(*args, interpret=True)
    np.testing.assert_allclose(np.asarray(Hk), np.asarray(Hr),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(bk), np.asarray(br),
                               rtol=1e-5, atol=1e-5)
    assert float(ik) == pytest.approx(float(ir))


def test_fused_normal_gate_disabled_matches_legacy(rng):
    """normal_dot_min=0 disables the gate in the legacy path; the fused
    driver maps it to an always-pass threshold."""
    cfg = dataclasses.replace(ICPConfig(), normal_dot_min=0.0)
    packed, p, sn, m = organized_scene(rng)
    T = se3.exp(jnp.asarray([0.01, -0.005, 0.01, 0.005, 0.0, 0.0]))
    ref = legacy_stats(packed, p, sn, m, T, T, cfg)
    args = list(fused_args(packed, p, sn, m, T, T, cfg))
    args[10] = -2.0                        # what the driver passes
    Hm, b, ninl, _ = gn_fused_reference(*args)
    assert float(ninl) == pytest.approx(float(ref.num_inliers))
    np.testing.assert_allclose(np.asarray(Hm), np.asarray(ref.H),
                               rtol=2e-4, atol=2e-4)


def test_align_frames_fused_matches_legacy(rng):
    """End-to-end: coarse-to-fine alignment converges to the same pose with
    fused_gn on and off (the production parity that matters)."""
    import jax

    from tpuslam.config import SLAMConfig
    from tpuslam.data.synthetic import orbit_trajectory, render_depth
    from tpuslam.frontend import preprocess_jit
    from tpuslam.icp import align_frames_jit

    h, w = 120, 160
    Kf = Intrinsics(525.0 * w / 640, 525.0 * h / 480, w / 2 - 0.5, h / 2 - 0.5)
    cfg = SLAMConfig(height=h, width=w)
    poses = orbit_trajectory(4)
    d0 = render_depth(poses[0], Kf, h, w, seed=0)
    d1 = render_depth(poses[1], Kf, h, w, seed=1)
    pyr_a = preprocess_jit(jnp.asarray(d0), Kf, cfg)
    pyr_b = preprocess_jit(jnp.asarray(d1), Kf, cfg)
    T0 = jnp.eye(4)
    rf = align_frames_jit(pyr_b, pyr_a, Kf, T0,
                          dataclasses.replace(cfg.icp, fused_gn=True))
    rl = align_frames_jit(pyr_b, pyr_a, Kf, T0,
                          dataclasses.replace(cfg.icp, fused_gn=False))
    np.testing.assert_allclose(np.asarray(rf.T), np.asarray(rl.T), atol=1e-6)
    assert int(rf.iters) == int(rl.iters)
    assert float(rf.inlier_fraction) == pytest.approx(
        float(rl.inlier_fraction), rel=1e-5)
    gt = np.linalg.inv(np.asarray(poses[0])) @ np.asarray(poses[1])
    np.testing.assert_allclose(np.asarray(rf.T), gt, atol=5e-4)
