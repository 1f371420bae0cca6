from structure_slam_pointline_tpu.utils import camera, lie, robust  # noqa: F401
