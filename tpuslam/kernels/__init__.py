from tpuslam.kernels.correspond import (  # noqa: F401
    brute_force_correspond,
    projective_correspond,
)
from tpuslam.kernels.gn_reduce import gn_reduce  # noqa: F401
