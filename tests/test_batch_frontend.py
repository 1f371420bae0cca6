"""Data-parallel front-end over the 8-virtual-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from structure_slam_pointline_tpu.config import CameraConfig, FrontendConfig
from structure_slam_pointline_tpu.io import synthetic
from structure_slam_pointline_tpu.parallel import batch_frontend


class TestBatchFrontend:
    def test_sharded_extraction_matches_single(self):
        cfg = FrontendConfig(n_keypoints=256, n_levels=4)
        cam = CameraConfig(fy=480.0, width=320, height=240, cx=159.5, cy=119.5, fx=240.0)
        scene = synthetic.make_room_scene(n_points=60, n_lines=6, seed=2, extent=2.0,
                                          depth_range=(3.0, 6.0))
        poses = synthetic.circular_trajectory(8, radius=0.2)
        imgs = synthetic.render_sequence(scene, poses, cam, noise=1.5)

        mesh = batch_frontend.frame_mesh(8)
        run = batch_frontend.make_batch_extractor(mesh, cfg, with_lines=False)
        kp_b = run(jnp.asarray(imgs, jnp.float32))
        assert kp_b.xy.shape[0] == 8
        # per-frame results identical to the single-frame kernel
        from structure_slam_pointline_tpu.ops import extract

        for i in (0, 3, 7):
            kp1 = extract.extract_orb(jnp.asarray(imgs[i], jnp.float32), cfg)
            np.testing.assert_allclose(np.asarray(kp_b.xy[i]), np.asarray(kp1.xy), atol=1e-4)
            np.testing.assert_array_equal(np.asarray(kp_b.desc[i]), np.asarray(kp1.desc))

    def test_with_lines(self):
        cfg = FrontendConfig(n_keypoints=128, n_levels=3)
        cam = CameraConfig(fy=480.0, width=320, height=240, cx=159.5, cy=119.5, fx=240.0)
        scene = synthetic.make_room_scene(n_points=30, n_lines=8, seed=5, extent=2.0,
                                          depth_range=(3.0, 6.0))
        poses = synthetic.circular_trajectory(8, radius=0.2)
        imgs = synthetic.render_sequence(scene, poses, cam, noise=1.5)
        mesh = batch_frontend.frame_mesh(4)
        run = batch_frontend.make_batch_extractor(mesh, cfg, with_lines=True)
        kp_b, ln_b, ldesc_b = run(jnp.asarray(imgs, jnp.float32))
        assert ln_b.endpoints.shape == (8, cfg.n_lines, 4)
        assert ldesc_b.shape == (8, cfg.n_lines, 8)
        assert int(ln_b.valid.sum()) > 0
