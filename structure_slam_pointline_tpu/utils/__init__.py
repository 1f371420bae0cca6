from structure_slam_pointline_tpu.utils import camera, lie, metrics, robust  # noqa: F401
