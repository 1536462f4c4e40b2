"""Config system round trip (SURVEY.md §5 "Config / flag system"): configs
are static jit arguments, so JSON loading must restore hashable tuples."""

from tpuslam.config import ICPConfig, SLAMConfig


def test_json_roundtrip_restores_tuples():
    cfg = SLAMConfig().replace(
        icp=ICPConfig(iters_per_level=(10, 6, 4),
                      inner_steps_per_level=(2, 4, 4),
                      finest_subsample=2),
    )
    back = SLAMConfig.from_json(cfg.to_json())
    assert back == cfg
    assert isinstance(back.icp.iters_per_level, tuple)
    assert isinstance(back.icp.inner_steps_per_level, tuple)
    hash(back.icp)  # must stay usable as a static jit arg


def test_partial_json_overrides_defaults():
    cfg = SLAMConfig.from_json(
        '{"icp": {"inner_steps": 1, "packed_dtype": "float32"}}'
    )
    assert cfg.icp.inner_steps == 1
    assert cfg.icp.packed_dtype == "float32"
    # untouched knobs keep their defaults
    assert cfg.icp.max_corr_dist == ICPConfig().max_corr_dist
    assert cfg.height == SLAMConfig().height
