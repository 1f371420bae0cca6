import jax.numpy as jnp
import numpy as np

from structure_slam_pointline_tpu.config import CameraConfig
from structure_slam_pointline_tpu.optim import pose_graph, sim3_solver
from structure_slam_pointline_tpu.utils import lie
from structure_slam_pointline_tpu.utils.camera import Intrinsics

CAM = CameraConfig(fy=480.0)
INTR = Intrinsics.from_config(CAM)


class TestHornSim3:
    def test_exact_alignment(self):
        g = np.random.default_rng(0)
        p2 = g.normal(size=(30, 3)).astype(np.float32)
        s_gt, ang = 1.4, 0.4
        R_gt = np.asarray(lie.so3_exp(jnp.asarray([0.1, ang, -0.2])))
        t_gt = np.array([0.5, -1.0, 2.0], np.float32)
        p1 = s_gt * p2 @ R_gt.T + t_gt
        s, R, t = sim3_solver.horn_sim3(jnp.asarray(p1), jnp.asarray(p2))
        np.testing.assert_allclose(float(s), s_gt, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(R), R_gt, atol=1e-4)
        np.testing.assert_allclose(np.asarray(t), t_gt, atol=1e-3)

    def test_fix_scale(self):
        g = np.random.default_rng(1)
        p2 = g.normal(size=(20, 3)).astype(np.float32)
        R_gt = np.asarray(lie.so3_exp(jnp.asarray([0.0, 0.3, 0.0])))
        p1 = p2 @ R_gt.T + np.array([1.0, 0, 0], np.float32)
        s, R, t = sim3_solver.horn_sim3(jnp.asarray(p1), jnp.asarray(p2), fix_scale=True)
        assert float(s) == 1.0
        np.testing.assert_allclose(np.asarray(R), R_gt, atol=1e-4)

    def test_ransac_with_outliers(self):
        g = np.random.default_rng(2)
        n = 80
        p2 = np.stack([g.uniform(-2, 2, n), g.uniform(-2, 2, n), g.uniform(3, 7, n)], 1).astype(np.float32)
        s_gt = 1.2
        R_gt = np.asarray(lie.so3_exp(jnp.asarray([0.05, -0.1, 0.08])))
        t_gt = np.array([0.3, 0.1, -0.4], np.float32)
        p1 = s_gt * p2 @ R_gt.T + t_gt
        p1[:20] += g.uniform(1, 3, (20, 3)) * g.choice([-1, 1], (20, 3))  # outliers
        sets = np.stack([g.choice(np.arange(20, n), 3, replace=False) for _ in range(64)])
        out = sim3_solver.ransac_sim3(
            jnp.asarray(p1), jnp.asarray(p2), jnp.ones(n, bool), jnp.asarray(sets), INTR
        )
        assert bool(out.success)
        S = np.asarray(out.S12)
        np.testing.assert_allclose(np.linalg.norm(S[0, :3]), s_gt, rtol=0.02)
        inl = np.asarray(out.inliers)
        assert inl[:20].sum() < 5
        assert inl[20:].mean() > 0.9


class TestPoseGraph:
    def test_loop_drift_correction(self):
        """Classic loop: odometry with accumulated drift + one loop edge.
        After optimization, the chain should close."""
        K = 20
        g = np.random.default_rng(3)
        # GT: cameras on a circle (world->cam transforms)
        S_gt = []
        for k in range(K):
            a = 2 * np.pi * k / K
            xi = np.array([0.0, 0.0, a, np.cos(a), np.sin(a), 0.0, 0.0], np.float32)
            S_gt.append(np.asarray(lie.sim3_exp(jnp.asarray(xi))))
        S_gt = np.stack(S_gt)
        # odometry edges with drift: S_ji_meas = S_j S_i^-1 (true), but the
        # initial estimates accumulate noise
        S_init = S_gt.copy()
        drift = np.eye(4, dtype=np.float32)
        for k in range(1, K):
            noise = np.asarray(
                lie.sim3_exp(jnp.asarray(np.concatenate([
                    g.normal(0, 0.01, 3), g.normal(0, 0.02, 3), g.normal(0, 0.01, 1)
                ]).astype(np.float32)))
            )
            drift = noise @ drift
            S_init[k] = drift @ S_gt[k]

        edges_i, edges_j, S_meas = [], [], []
        for k in range(K - 1):
            edges_i.append(k)
            edges_j.append(k + 1)
            S_meas.append(S_gt[k + 1] @ np.linalg.inv(S_gt[k]))
        # loop edge K-1 -> 0
        edges_i.append(K - 1)
        edges_j.append(0)
        S_meas.append(S_gt[0] @ np.linalg.inv(S_gt[K - 1]))

        E = len(edges_i)
        prob = pose_graph.PoseGraphProblem(
            S_cw=jnp.asarray(S_init),
            kf_valid=jnp.ones(K, bool),
            kf_fixed=jnp.asarray(np.arange(K) == 0),
            edge_i=jnp.asarray(edges_i, jnp.int32),
            edge_j=jnp.asarray(edges_j, jnp.int32),
            edge_Sji=jnp.asarray(np.stack(S_meas)),
            edge_valid=jnp.ones(E, bool),
            edge_weight=jnp.ones(E, jnp.float32),
        )
        S_opt = pose_graph.optimize_pose_graph(prob, n_iters=25)
        S_opt = np.asarray(S_opt)

        def err(Sa, Sb):
            d = np.asarray(lie.sim3_log(jnp.asarray(Sa @ np.linalg.inv(Sb))))
            return np.abs(d).max()

        e_init = max(err(S_init[k], S_gt[k]) for k in range(K))
        e_opt = max(err(S_opt[k], S_gt[k]) for k in range(K))
        assert e_opt < 0.25 * e_init
        assert e_opt < 0.02
