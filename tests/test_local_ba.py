import jax.numpy as jnp
import numpy as np

from structure_slam_pointline_tpu.config import CameraConfig, OptimConfig
from structure_slam_pointline_tpu.optim import local_ba
from structure_slam_pointline_tpu.utils import lie
from structure_slam_pointline_tpu.utils.camera import Intrinsics

CAM = CameraConfig(fy=480.0)
INTR = Intrinsics.from_config(CAM)
CFG = OptimConfig()


def build_problem(seed=0, n_kf=6, n_pts=300, noise=0.4, pose_pert=0.01, pt_pert=0.05,
                  outlier_frac=0.0):
    g = np.random.default_rng(seed)
    pts_gt = np.stack(
        [g.uniform(-3, 3, n_pts), g.uniform(-2, 2, n_pts), g.uniform(4, 9, n_pts)], 1
    ).astype(np.float32)
    # camera ring
    T_gt = []
    for i in range(n_kf):
        xi = np.array([0.0, 0.02 * i, 0.0, 0.25 * i, 0.01 * i, 0.0], np.float32)
        T_gt.append(np.asarray(lie.se3_exp(jnp.asarray(xi))))
    T_gt = np.stack(T_gt)

    F = n_pts  # one feature slot per point per kf
    obs_uv = np.zeros((n_kf, F, 2), np.float32)
    edge_valid = np.zeros((n_kf, F), bool)
    for k in range(n_kf):
        pc = pts_gt @ T_gt[k, :3, :3].T + T_gt[k, :3, 3]
        u = pc[:, 0] / pc[:, 2] * CAM.fx + CAM.cx
        v = pc[:, 1] / pc[:, 2] * CAM.fy + CAM.cy
        ok = (pc[:, 2] > 0.5) & (u > 10) & (u < 630) & (v > 10) & (v < 470)
        obs_uv[k] = np.stack([u, v], 1) + g.normal(0, noise, (F, 2))
        edge_valid[k] = ok
    n_out = int(outlier_frac * F)
    if n_out:
        obs_uv[:, :n_out] += g.uniform(15, 50, (n_kf, n_out, 2)) * g.choice(
            [-1, 1], (n_kf, n_out, 2)
        )

    # perturb only the free cameras (0 and 1 are held fixed at GT below)
    T_init = T_gt.copy()
    for k in range(2, n_kf):
        xi = g.normal(0, pose_pert, 6).astype(np.float32)
        T_init[k] = np.asarray(lie.se3_exp(jnp.asarray(xi))) @ T_gt[k]
    pts_init = pts_gt + g.normal(0, pt_pert, pts_gt.shape).astype(np.float32)

    edge_mp = np.tile(np.arange(F, dtype=np.int32), (n_kf, 1))
    prob = local_ba.BAProblem(
        kf_T_cw=jnp.asarray(T_init),
        kf_free=jnp.asarray(np.arange(n_kf) >= 2),  # first two fixed (gauge)
        kf_valid=jnp.ones(n_kf, bool),
        obs_uv=jnp.asarray(obs_uv),
        obs_sigma2=jnp.ones((n_kf, F), jnp.float32),
        edge_mp=jnp.asarray(edge_mp),
        edge_valid=jnp.asarray(edge_valid),
        mp_xyz=jnp.asarray(pts_init),
        mp_valid=jnp.ones(F, bool),
    )
    return prob, T_gt, pts_gt


def reproj_rmse(T, xyz, prob):
    """masked reprojection rmse in px"""
    errs = []
    for k in range(T.shape[0]):
        pc = np.asarray(xyz) @ np.asarray(T)[k, :3, :3].T + np.asarray(T)[k, :3, 3]
        u = pc[:, 0] / pc[:, 2] * CAM.fx + CAM.cx
        v = pc[:, 1] / pc[:, 2] * CAM.fy + CAM.cy
        e = np.stack([u, v], 1) - np.asarray(prob.obs_uv[k])
        m = np.asarray(prob.edge_valid[k])
        errs.append((e[m] ** 2).sum(1))
    return np.sqrt(np.concatenate(errs).mean())


class TestLocalBA:
    def test_reduces_reprojection_error(self):
        prob, T_gt, pts_gt = build_problem()
        rmse0 = reproj_rmse(prob.kf_T_cw, prob.mp_xyz, prob)
        out = local_ba.bundle_adjust(prob, INTR, CFG)
        rmse1 = reproj_rmse(out.kf_T_cw, out.mp_xyz, prob)
        assert rmse1 < rmse0 * 0.5
        assert rmse1 < 1.0  # close to the 0.4px noise floor

    def test_poses_approach_gt(self):
        prob, T_gt, pts_gt = build_problem(seed=1)
        out = local_ba.bundle_adjust(prob, INTR, CFG)
        for k in range(2, T_gt.shape[0]):
            err = np.asarray(lie.se3_log(out.kf_T_cw[k] @ lie.se3_inverse(jnp.asarray(T_gt[k]))))
            assert np.abs(err[:3]).max() < 2e-3, k
            assert np.abs(err[3:]).max() < 1.5e-2, k

    def test_fixed_cameras_untouched(self):
        prob, T_gt, _ = build_problem(seed=2)
        out = local_ba.bundle_adjust(prob, INTR, CFG)
        np.testing.assert_allclose(out.kf_T_cw[0], prob.kf_T_cw[0], atol=1e-7)
        np.testing.assert_allclose(out.kf_T_cw[1], prob.kf_T_cw[1], atol=1e-7)

    def test_outlier_cut(self):
        prob, T_gt, pts_gt = build_problem(seed=3, outlier_frac=0.1)
        out = local_ba.bundle_adjust(prob, INTR, CFG)
        inl = np.asarray(out.edge_inlier)
        ev = np.asarray(prob.edge_valid)
        # outlier edges (first 10% of columns) must mostly be cut
        assert inl[:, :30][ev[:, :30]].mean() < 0.2
        assert inl[:, 30:][ev[:, 30:]].mean() > 0.9
        rmse = reproj_rmse(out.kf_T_cw, out.mp_xyz, prob)
        # rmse over *inlier* edges close to noise floor
        errs = []
        T = np.asarray(out.kf_T_cw)
        for k in range(T.shape[0]):
            pc = np.asarray(out.mp_xyz) @ T[k, :3, :3].T + T[k, :3, 3]
            u = pc[:, 0] / pc[:, 2] * CAM.fx + CAM.cx
            v = pc[:, 1] / pc[:, 2] * CAM.fy + CAM.cy
            e = np.stack([u, v], 1) - np.asarray(prob.obs_uv[k])
            m = inl[k]
            errs.append((e[m] ** 2).sum(1))
        assert np.sqrt(np.concatenate(errs).mean()) < 1.0


def build_lines(T_gt, seed=7, n_ln=40, noise_coef=0.0, ep_pert=0.12):
    """GT 3D segments + per-KF observed infinite-line coefficients."""
    g = np.random.default_rng(seed)
    n_kf = T_gt.shape[0]
    S_gt = np.stack([g.uniform(-3, 3, n_ln), g.uniform(-2, 2, n_ln),
                     g.uniform(4, 9, n_ln)], 1).astype(np.float32)
    d = g.normal(size=(n_ln, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    E_gt = S_gt + d * g.uniform(1.0, 2.5, (n_ln, 1)).astype(np.float32)

    obs_l = np.zeros((n_kf, n_ln, 3), np.float32)
    edge_valid = np.zeros((n_kf, n_ln), bool)
    for k in range(n_kf):
        def proj(P):
            pc = P @ T_gt[k, :3, :3].T + T_gt[k, :3, 3]
            return (pc[:, 0] / pc[:, 2] * CAM.fx + CAM.cx,
                    pc[:, 1] / pc[:, 2] * CAM.fy + CAM.cy, pc[:, 2])
        us, vs, zs = proj(S_gt)
        ue, ve, ze = proj(E_gt)
        sp = np.stack([us, vs, np.ones(n_ln)], 1)
        ep = np.stack([ue, ve, np.ones(n_ln)], 1)
        l = np.cross(sp, ep)
        l /= np.maximum(np.hypot(l[:, 0], l[:, 1]), 1e-9)[:, None]
        obs_l[k] = l
        edge_valid[k] = (zs > 0.5) & (ze > 0.5)

    S_init = S_gt + g.normal(0, ep_pert, S_gt.shape).astype(np.float32)
    E_init = E_gt + g.normal(0, ep_pert, E_gt.shape).astype(np.float32)
    lines = local_ba.BALineProblem(
        ln_start=jnp.asarray(S_init),
        ln_end=jnp.asarray(E_init),
        ln_valid=jnp.ones(n_ln, bool),
        obs_l=jnp.asarray(obs_l),
        obs_sigma2=jnp.ones((n_kf, n_ln), jnp.float32),
        edge_ln=jnp.tile(jnp.arange(n_ln, dtype=jnp.int32), (n_kf, 1)),
        edge_valid=jnp.asarray(edge_valid),
    )
    return lines, S_gt, E_gt, S_init, E_init


def perp_dist(P, S, E):
    """Perpendicular distance of points P to the GT infinite lines (S, E).
    The residual only constrains endpoints transverse to the line —
    position ALONG it is gauge — so this is the right error metric."""
    u = E - S
    u /= np.linalg.norm(u, axis=1, keepdims=True)
    rel = P - S
    t = (rel * u).sum(1, keepdims=True)
    return np.linalg.norm(rel - t * u, axis=1)


class TestLineBA:
    def test_line_edges_reduce_line_error(self):
        """Map-line endpoints join the Schur system (reference global-BA
        line edges, Optimizer.cc:436-505) and converge back onto the
        observed lines."""
        prob, T_gt, pts_gt = build_problem(noise=0.2)
        lines, S_gt, E_gt, S_init, E_init = build_lines(T_gt)
        out = local_ba.bundle_adjust(prob, INTR, CFG, lines=lines)
        e0 = np.concatenate([perp_dist(S_init, S_gt, E_gt),
                             perp_dist(E_init, S_gt, E_gt)])
        e1 = np.concatenate([perp_dist(np.asarray(out.ln_start), S_gt, E_gt),
                             perp_dist(np.asarray(out.ln_end), S_gt, E_gt)])
        assert e1.mean() < 0.15 * e0.mean(), (e0.mean(), e1.mean())
        assert np.asarray(out.line_inlier).sum() > 0.9 * np.asarray(
            lines.edge_valid).sum()
        # poses still converge with the line blocks present
        rmse = reproj_rmse(out.kf_T_cw, out.mp_xyz, prob)
        assert rmse < 0.6

    def test_line_outliers_gated(self):
        """Corrupted line observations are cut by the per-line 2x chi2
        gate between phases and excluded from the final inlier set."""
        prob, T_gt, pts_gt = build_problem(noise=0.2)
        lines, S_gt, E_gt, S_init, E_init = build_lines(T_gt)
        g = np.random.default_rng(11)
        obs = np.asarray(lines.obs_l).copy()
        # rotate the first 8 lines' observed coefficients badly in one KF...
        # in ALL KFs so they cannot be satisfied
        bad = np.arange(8)
        rot = g.normal(0, 0.4, (obs.shape[0], 8, 3)).astype(np.float32)
        obs[:, bad] += rot
        obs[..., :2] /= np.maximum(
            np.hypot(obs[..., 0], obs[..., 1]), 1e-9)[..., None]
        obs[..., 2] = np.asarray(lines.obs_l)[..., 2] + g.normal(
            0, 40.0, obs[..., 2].shape)
        lines2 = lines._replace(obs_l=jnp.asarray(obs.astype(np.float32)))
        # restore the good columns
        obs_good = np.asarray(lines.obs_l)
        obs_mix = obs.copy()
        obs_mix[:, 8:] = obs_good[:, 8:]
        lines2 = lines._replace(obs_l=jnp.asarray(obs_mix.astype(np.float32)))
        out = local_ba.bundle_adjust(prob, INTR, CFG, lines=lines2)
        inl = np.asarray(out.line_inlier)
        ev = np.asarray(lines.edge_valid)
        assert inl[:, :8][ev[:, :8]].mean() < 0.3
        assert inl[:, 8:][ev[:, 8:]].mean() > 0.8
