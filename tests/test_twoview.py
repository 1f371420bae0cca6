import jax.numpy as jnp
import numpy as np
import pytest

from structure_slam_pointline_tpu.config import CameraConfig
from structure_slam_pointline_tpu.ops import twoview
from structure_slam_pointline_tpu.utils.camera import Intrinsics

CAM = CameraConfig(fy=480.0)
INTR = Intrinsics.from_config(CAM)


def make_pair(seed=0, n=200, planar=False, noise=0.3, outlier_frac=0.0,
              baseline=0.3, yaw=0.05):
    g = np.random.default_rng(seed)
    if planar:
        # points on a plane z = 5 + 0.02x
        x = g.uniform(-3, 3, n)
        y = g.uniform(-2, 2, n)
        z = 5.0 + 0.02 * x
        pts = np.stack([x, y, z], 1)
    else:
        pts = np.stack([g.uniform(-3, 3, n), g.uniform(-2, 2, n), g.uniform(3, 9, n)], 1)
    R = np.array(
        [
            [np.cos(yaw), 0, np.sin(yaw)],
            [0, 1, 0],
            [-np.sin(yaw), 0, np.cos(yaw)],
        ]
    )
    t = np.array([-baseline, 0.02, 0.01])
    t = t / np.linalg.norm(t) * baseline

    def proj(p):
        u = p[:, 0] / p[:, 2] * CAM.fx + CAM.cx
        v = p[:, 1] / p[:, 2] * CAM.fy + CAM.cy
        return np.stack([u, v], 1), p[:, 2]

    uv1, z1 = proj(pts)
    p2 = pts @ R.T + t
    uv2, z2 = proj(p2)
    uv1 += g.normal(0, noise, uv1.shape)
    uv2 += g.normal(0, noise, uv2.shape)
    n_out = int(outlier_frac * n)
    if n_out:
        uv2[:n_out] += g.uniform(15, 60, (n_out, 2)) * g.choice([-1, 1], (n_out, 2))
    mask = (z1 > 0) & (z2 > 0)
    return (
        jnp.asarray(uv1.astype(np.float32)),
        jnp.asarray(uv2.astype(np.float32)),
        jnp.asarray(mask),
        R, t, pts,
    )


def ransac_sets(mask, iters=200, seed=0):
    g = np.random.default_rng(seed)
    valid = np.nonzero(np.asarray(mask))[0]
    return jnp.asarray(
        np.stack([g.choice(valid, 8, replace=False) for _ in range(iters)])
    )


def angle_between(R1, R2):
    c = (np.trace(R1.T @ R2) - 1) / 2
    return np.degrees(np.arccos(np.clip(c, -1, 1)))


class TestTriangulate:
    def test_exact(self):
        uv1, uv2, mask, R, t, pts = make_pair(noise=0.0)
        K = np.asarray(INTR.K)
        P1 = K @ np.hstack([np.eye(3), np.zeros((3, 1))])
        P2 = K @ np.hstack([R, t[:, None]])
        X = twoview.triangulate(jnp.asarray(P1), jnp.asarray(P2), uv1, uv2)
        np.testing.assert_allclose(np.asarray(X), pts, atol=1e-2)


class TestInitialize:
    def test_general_scene_recovers_pose(self):
        uv1, uv2, mask, R, t, pts = make_pair(noise=0.3)
        out = twoview.initialize_two_view(uv1, uv2, mask, ransac_sets(mask), INTR)
        assert bool(out.success)
        assert angle_between(np.asarray(out.R), R) < 0.5
        # translation up to scale
        t_est = np.asarray(out.t)
        cos = abs(t_est @ t) / np.linalg.norm(t)
        assert cos > 0.995
        assert int(out.good_mask.sum()) > 150
        # triangulated points match GT up to the global scale
        s = np.median(pts[:, 2]) / np.median(np.asarray(out.points3d)[np.asarray(out.good_mask), 2])
        X = np.asarray(out.points3d) * s
        err = np.linalg.norm(X[np.asarray(out.good_mask)] - pts[np.asarray(out.good_mask)], axis=1)
        # depth std at z~6, f=481, b=0.3, sigma=0.3px is ~0.1-0.2 world units
        assert np.median(err) < 0.35

    def test_planar_scene_selects_homography(self):
        uv1, uv2, mask, R, t, pts = make_pair(noise=0.3, planar=True, seed=2)
        out = twoview.initialize_two_view(uv1, uv2, mask, ransac_sets(mask, seed=2), INTR)
        assert bool(out.used_homography)
        assert bool(out.success)
        assert angle_between(np.asarray(out.R), R) < 1.0
        t_est = np.asarray(out.t)
        cos = abs(t_est @ t) / np.linalg.norm(t)
        assert cos > 0.99

    def test_outliers_rejected(self):
        uv1, uv2, mask, R, t, pts = make_pair(noise=0.3, outlier_frac=0.25, seed=3)
        out = twoview.initialize_two_view(uv1, uv2, mask, ransac_sets(mask, seed=3), INTR)
        assert bool(out.success)
        assert angle_between(np.asarray(out.R), R) < 1.0
        good = np.asarray(out.good_mask)
        assert good[:50].sum() < 10  # outlier rows rejected

    def test_pure_rotation_fails_gracefully(self):
        # zero baseline -> no parallax -> must not report success
        uv1, uv2, mask, R, t, pts = make_pair(noise=0.3, baseline=1e-5, seed=4)
        out = twoview.initialize_two_view(uv1, uv2, mask, ransac_sets(mask, seed=4), INTR)
        assert not bool(out.success)
