import jax.numpy as jnp
import numpy as np
import pytest

from structure_slam_pointline_tpu.config import CameraConfig, OptimConfig
from structure_slam_pointline_tpu.optim import pose_opt, residuals
from structure_slam_pointline_tpu.utils import lie
from structure_slam_pointline_tpu.utils.camera import Intrinsics


CAM = CameraConfig(fy=480.0)
INTR = Intrinsics.from_config(CAM)
CFG = OptimConfig()


def synth_problem(seed=0, n_pts=200, n_lines=24, noise=0.5, outlier_frac=0.0):
    g = np.random.default_rng(seed)
    pts = np.stack(
        [g.uniform(-2, 2, n_pts), g.uniform(-1.5, 1.5, n_pts), g.uniform(3, 8, n_pts)], 1
    ).astype(np.float32)
    T_gt = np.asarray(
        lie.se3_exp(jnp.asarray([0.03, -0.02, 0.01, 0.1, -0.05, 0.08], jnp.float32))
    )
    p_cam = pts @ T_gt[:3, :3].T + T_gt[:3, 3]
    u = p_cam[:, 0] / p_cam[:, 2] * CAM.fx + CAM.cx
    v = p_cam[:, 1] / p_cam[:, 2] * CAM.fy + CAM.cy
    obs = np.stack([u, v], 1) + g.normal(0, noise, (n_pts, 2))
    n_out = int(outlier_frac * n_pts)
    if n_out:
        obs[:n_out] += g.uniform(20, 80, (n_out, 2)) * g.choice([-1, 1], (n_out, 2))

    # lines: random 3D segments; observed 2D line from GT projection
    sw = np.stack([g.uniform(-2, 2, n_lines), g.uniform(-1.5, 1.5, n_lines), g.uniform(3, 8, n_lines)], 1)
    d = g.normal(size=(n_lines, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    ew = sw + d * 1.0
    def proj(p):
        pc = p @ T_gt[:3, :3].T + T_gt[:3, 3]
        return np.stack([pc[:, 0] / pc[:, 2] * CAM.fx + CAM.cx, pc[:, 1] / pc[:, 2] * CAM.fy + CAM.cy], 1)
    ps, pe = proj(sw), proj(ew)
    sp_h = np.concatenate([ps, np.ones((n_lines, 1))], 1)
    ep_h = np.concatenate([pe, np.ones((n_lines, 1))], 1)
    l = np.cross(sp_h, ep_h)
    l /= np.linalg.norm(l[:, :2], axis=1, keepdims=True)

    return (
        jnp.asarray(T_gt),
        jnp.asarray(pts),
        jnp.asarray(obs.astype(np.float32)),
        jnp.asarray(sw.astype(np.float32)),
        jnp.asarray(ew.astype(np.float32)),
        jnp.asarray(l.astype(np.float32)),
    )


def run(T0, pts, obs, sw, ew, l, **kw):
    n, m = pts.shape[0], sw.shape[0]
    return pose_opt.pose_optimize(
        T0, pts, obs, jnp.ones(n, bool), jnp.ones(n, jnp.float32),
        sw, ew, l, jnp.ones(m, bool), jnp.ones(m, jnp.float32),
        INTR, CFG,
    )


class TestResiduals:
    def test_zero_at_gt(self):
        T_gt, pts, obs, sw, ew, l = synth_problem(noise=0.0)
        p = residuals.point_residuals(T_gt, pts, obs, INTR)
        assert float(jnp.abs(p.r).max()) < 1e-2
        lr = residuals.line_residuals(T_gt, sw, ew, l, INTR)
        assert float(jnp.abs(lr.r).max()) < 1e-2

    def test_jacobian_vs_autodiff(self):
        import jax

        T_gt, pts, obs, sw, ew, l = synth_problem(noise=0.0, n_pts=5, n_lines=3)

        def r_of_xi(xi):
            T = lie.se3_exp(xi) @ T_gt
            return residuals.point_residuals(T, pts, obs, INTR).r

        J_auto = jax.jacfwd(r_of_xi)(jnp.zeros(6))  # [N, 2, 6]
        J_ana = residuals.point_residuals(T_gt, pts, obs, INTR).J_pose
        np.testing.assert_allclose(J_auto, J_ana, atol=1e-2, rtol=1e-3)

        def rl_of_xi(xi):
            T = lie.se3_exp(xi) @ T_gt
            return residuals.line_residuals(T, sw, ew, l, INTR).r

        Jl_auto = jax.jacfwd(rl_of_xi)(jnp.zeros(6))
        Jl_ana = residuals.line_residuals(T_gt, sw, ew, l, INTR).J_pose
        np.testing.assert_allclose(Jl_auto, Jl_ana, atol=1e-2, rtol=1e-3)


class TestPoseOpt:
    def test_converges_from_perturbed_init(self):
        T_gt, pts, obs, sw, ew, l = synth_problem(noise=0.3)
        dT = lie.se3_exp(jnp.asarray([0.02, 0.01, -0.015, 0.05, 0.03, -0.04]))
        out = run(dT @ T_gt, pts, obs, sw, ew, l)
        err = np.asarray(lie.se3_log(out.T_cw @ lie.se3_inverse(T_gt)))
        assert np.abs(err[:3]).max() < 2e-3   # rotation ~0.1 deg
        assert np.abs(err[3:]).max() < 8e-3   # translation < 8mm
        assert int(out.n_inliers) > 200

    def test_outlier_rejection(self):
        T_gt, pts, obs, sw, ew, l = synth_problem(noise=0.3, outlier_frac=0.2)
        dT = lie.se3_exp(jnp.asarray([0.01, -0.01, 0.01, 0.03, -0.02, 0.02]))
        out = run(dT @ T_gt, pts, obs, sw, ew, l)
        err = np.asarray(lie.se3_log(out.T_cw @ lie.se3_inverse(T_gt)))
        assert np.abs(err[:3]).max() < 3e-3
        assert np.abs(err[3:]).max() < 1e-2
        # first 20% of points are outliers; they must be classified out
        inl = np.asarray(out.point_inliers)
        assert inl[:40].sum() < 8
        assert inl[40:].mean() > 0.9

    def test_identity_init_large_offset(self):
        T_gt, pts, obs, sw, ew, l = synth_problem(noise=0.2)
        out = run(jnp.eye(4), pts, obs, sw, ew, l)
        err = np.asarray(lie.se3_log(out.T_cw @ lie.se3_inverse(T_gt)))
        assert np.abs(err).max() < 2e-2

    def test_points_only(self):
        T_gt, pts, obs, sw, ew, l = synth_problem(noise=0.3)
        n, m = pts.shape[0], sw.shape[0]
        out = pose_opt.pose_optimize(
            T_gt, pts, obs, jnp.ones(n, bool), jnp.ones(n, jnp.float32),
            sw, ew, l, jnp.zeros(m, bool), jnp.ones(m, jnp.float32),
            INTR, CFG,
        )
        err = np.asarray(lie.se3_log(out.T_cw @ lie.se3_inverse(T_gt)))
        assert np.abs(err).max() < 1e-2
        assert int(out.line_inliers.sum()) == 0
