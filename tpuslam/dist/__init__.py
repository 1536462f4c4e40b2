from tpuslam.dist.mesh import make_mesh, shard_cloud, replicate  # noqa: F401
