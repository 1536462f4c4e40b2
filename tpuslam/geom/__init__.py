from tpuslam.geom import se3  # noqa: F401
from tpuslam.geom.cloud import PointCloud  # noqa: F401
from tpuslam.geom.backproject import backproject, project  # noqa: F401
from tpuslam.geom.normals import organized_normals  # noqa: F401
from tpuslam.geom.voxel import voxel_downsample  # noqa: F401
