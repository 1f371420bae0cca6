import jax.numpy as jnp
import numpy as np

from structure_slam_pointline_tpu.config import CameraConfig
from structure_slam_pointline_tpu.utils import camera


def make_intr(**kw):
    return camera.Intrinsics.from_config(CameraConfig(**kw))


class TestProjection:
    def test_project_backproject_roundtrip(self):
        intr = make_intr()
        g = np.random.default_rng(0)
        p = np.stack(
            [g.uniform(-2, 2, 128), g.uniform(-1.5, 1.5, 128), g.uniform(0.5, 5.0, 128)], axis=1
        ).astype(np.float32)
        uv, z = camera.project(intr, jnp.asarray(p))
        p2 = camera.backproject(intr, uv, z)
        np.testing.assert_allclose(p, p2, atol=1e-4)

    def test_negative_fy_convention(self):
        intr = make_intr()  # ICL fy = -480
        p_up = jnp.asarray([0.0, 1.0, 2.0])  # +y in camera frame
        uv, _ = camera.project(intr, p_up)
        assert uv[1] < 239.5  # negative fy flips v

    def test_principal_point(self):
        intr = make_intr()
        uv, z = camera.project(intr, jnp.asarray([0.0, 0.0, 3.0]))
        np.testing.assert_allclose(uv, [319.5, 239.5], atol=1e-5)
        np.testing.assert_allclose(z, 3.0)


class TestDistortion:
    def test_undistort_inverts_distort(self):
        intr = make_intr(k1=-0.28, k2=0.07, p1=1e-4, p2=-2e-4, fy=480.0)
        g = np.random.default_rng(1)
        xn = jnp.asarray(g.uniform(-0.4, 0.4, size=(256, 2)).astype(np.float32))
        xd = camera.distort(intr, xn)
        xu = camera.undistort_normalized(intr, xd, iters=8)
        np.testing.assert_allclose(xn, xu, atol=1e-4)

    def test_zero_distortion_is_identity(self):
        intr = make_intr()
        uv = jnp.asarray([[100.0, 200.0], [320.0, 240.0]])
        np.testing.assert_allclose(camera.undistort_pixels(intr, uv), uv, atol=1e-4)


def test_in_image():
    cfg = CameraConfig()
    uv = jnp.asarray([[0.0, 0.0], [639.9, 479.9], [-1.0, 5.0], [640.0, 100.0]])
    np.testing.assert_array_equal(
        camera.in_image(cfg, uv), [True, True, False, False]
    )
