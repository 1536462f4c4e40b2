from tpuslam.eval.ate import ate_rmse, horn_align, rpe  # noqa: F401
