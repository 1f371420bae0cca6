"""Loop closing on a synthetic drifted circular map."""

import jax.numpy as jnp
import numpy as np
import pytest

from structure_slam_pointline_tpu.config import CameraConfig, SLAMConfig
from structure_slam_pointline_tpu.models.loop_closing import LoopCloser
from structure_slam_pointline_tpu.utils import lie
from structure_slam_pointline_tpu.utils.camera import Intrinsics
from structure_slam_pointline_tpu.world import map_store

CAM = CameraConfig(fy=480.0)
CFG = SLAMConfig(camera=CAM)
INTR = Intrinsics.from_config(CAM)


def clustered_descs(n, n_proto=80, noise_bits=20, seed=0):
    g = np.random.default_rng(seed)
    protos = g.integers(0, 2 ** 32, (n_proto, 8), dtype=np.uint32)
    base = protos[g.choice(n_proto, n)]
    bits = np.unpackbits(base.view(np.uint8), axis=1)
    for i in range(n):
        idx = g.choice(256, noise_bits, replace=False)
        bits[i, idx] ^= 1
    return np.packbits(bits, axis=1).view(np.uint32)


def kf_angle2(k, n_kf):
    return 2 * np.pi * k / n_kf


def build_loop_map(drift_mag=0.02, n_kf=24, n_pts=800, seed=0):
    """Cameras on a circle looking outward; landmarks on a surrounding
    cylinder, each visible from a ~90deg arc. Drift accumulates from KF 6.
    Returns (state, cursors_nkf, T_gt)."""
    g = np.random.default_rng(seed)
    state = map_store.init_map(CFG)
    F = state.kf_xy.shape[1]
    K = state.kf_valid.shape[0]

    # GT poses: camera centers on r=2 circle, z axis (view) pointing outward
    T_gt = []
    for k in range(n_kf):
        th = 2 * np.pi * k / n_kf
        c = np.array([2 * np.cos(th), 0.0, 2 * np.sin(th)])
        fwd = np.array([np.cos(th), 0.0, np.sin(th)])     # outward
        up = np.array([0.0, 1.0, 0.0])
        right = np.cross(up, fwd)
        R_wc = np.stack([right, up, fwd], axis=1)  # columns = camera axes in world
        T = np.eye(4)
        T[:3, :3] = R_wc.T
        T[:3, 3] = -R_wc.T @ c
        T_gt.append(T)
    T_gt = np.stack(T_gt).astype(np.float32)

    # landmarks on a cylinder r=6
    phi = g.uniform(0, 2 * np.pi, n_pts)
    y = g.uniform(-1.5, 1.5, n_pts)
    r = 6.0 + g.uniform(-0.5, 0.5, n_pts)
    pts_gt = np.stack([r * np.cos(phi), y, r * np.sin(phi)], 1).astype(np.float32)
    descs = clustered_descs(n_pts, seed=seed + 1)

    # drift: monotonically accumulating SE3 error from KF 6 onward
    # (a systematic per-step bias + noise; a pure random walk can wander
    # back to zero by the loop end, leaving nothing observable to correct)
    T_est = T_gt.copy()
    drift = np.eye(4, dtype=np.float32)
    bias = np.array([0.001, 0.003, 0.0005, drift_mag, drift_mag * 0.4, 0.0], np.float32)
    for k in range(6, n_kf):
        step = np.asarray(lie.se3_exp(jnp.asarray(
            bias + np.concatenate(
                [g.normal(0, drift_mag * 0.1, 3), g.normal(0, drift_mag * 0.3, 3)]
            ).astype(np.float32)
        )))
        drift = step @ drift
        T_est[k] = drift @ T_gt[k]

    # landmark "first KF" = first GT-visible KF; estimated landmark position
    # is drifted along with that KF's error
    kf_angle = 2 * np.pi * np.arange(n_kf) / n_kf
    first_kf = np.full(n_pts, -1, np.int32)
    for k in range(n_kf):
        vis = np.abs(np.mod(phi - kf_angle[k] + np.pi, 2 * np.pi) - np.pi) < np.pi / 4
        first_kf[(first_kf < 0) & vis] = k
    first_kf[first_kf < 0] = 0
    pts_est = pts_gt.copy()
    for k in range(6, n_kf):
        sel = first_kf == k
        C = np.linalg.inv(T_est[k]) @ T_gt[k]  # X_est = T_est^-1 T_gt X_gt
        pts_est[sel] = pts_gt[sel] @ C[:3, :3].T + C[:3, 3]

    # Clone every landmark for the second half of the trajectory: after
    # drift, tracking does NOT re-recognize old landmarks on revisit — the
    # revisited region is mapped with fresh (duplicated, drifted) points.
    # Without this the loop region would be covisibility-connected and
    # correctly excluded from loop detection.
    half = n_kf // 2
    clone_first_kf = np.full(n_pts, -1, np.int32)
    for k in range(half, n_kf):
        vis = np.abs(np.mod(phi - kf_angle2(k, n_kf) + np.pi, 2 * np.pi) - np.pi) < np.pi / 4
        clone_first_kf[(clone_first_kf < 0) & vis] = k
    clone_used = clone_first_kf >= 0
    pts_clone = pts_gt.copy()
    for k in range(half, n_kf):
        sel = clone_first_kf == k
        C = np.linalg.inv(T_est[k]) @ T_gt[k]
        pts_clone[sel] = pts_gt[sel] @ C[:3, :3].T + C[:3, 3]
    clone_first_kf[clone_first_kf < 0] = 0

    st = state
    st = st._replace(
        mp_xyz=st.mp_xyz.at[:n_pts].set(jnp.asarray(pts_est))
               .at[n_pts : 2 * n_pts].set(jnp.asarray(pts_clone)),
        mp_valid=st.mp_valid.at[:n_pts].set(True)
                 .at[n_pts : 2 * n_pts].set(jnp.asarray(clone_used)),
        mp_desc=st.mp_desc.at[:n_pts].set(jnp.asarray(descs))
                .at[n_pts : 2 * n_pts].set(jnp.asarray(descs)),
        mp_first_kf=st.mp_first_kf.at[:n_pts].set(jnp.asarray(first_kf))
                    .at[n_pts : 2 * n_pts].set(jnp.asarray(clone_first_kf)),
        mp_last_kf=st.mp_last_kf.at[:n_pts].set(half - 1)
                   .at[n_pts : 2 * n_pts].set(n_kf - 1),
    )

    # keyframe feature snapshots: project the ESTIMATED geometry with the
    # ESTIMATED poses — a real drifted map is internally consistent
    # (local BA keeps observation residuals ~0; the drift lives in poses
    # and points TOGETHER). The loop signal is purely 3D: the same
    # physical point exists twice (original + clone) at drift-separated
    # estimated positions. Visibility is still decided from GT geometry.
    kf_T = np.array(st.kf_T_cw)
    kf_T[:n_kf] = T_est
    kf_xy = np.zeros((K, F, 2), np.float32)
    kf_desc = np.zeros((K, F, 8), np.uint32)
    kf_kp_valid = np.zeros((K, F), bool)
    kf_kp_mp = np.full((K, F), -1, np.int32)
    for k in range(n_kf):
        pc_gt = pts_gt @ T_gt[k][:3, :3].T + T_gt[k][:3, 3]
        u_gt = pc_gt[:, 0] / np.maximum(pc_gt[:, 2], 1e-6) * CAM.fx + CAM.cx
        v_gt = pc_gt[:, 1] / np.maximum(pc_gt[:, 2], 1e-6) * CAM.fy + CAM.cy
        vis = (pc_gt[:, 2] > 1.0) & (u_gt > 10) & (u_gt < 630) & (v_gt > 10) & (v_gt < 470)
        ids = np.nonzero(vis)[0][:F]
        n = len(ids)
        bound = pts_est[ids] if k < n_kf // 2 else pts_clone[ids]
        pc = bound @ T_est[k][:3, :3].T + T_est[k][:3, 3]
        u = pc[:, 0] / np.maximum(pc[:, 2], 1e-6) * CAM.fx + CAM.cx
        v = pc[:, 1] / np.maximum(pc[:, 2], 1e-6) * CAM.fy + CAM.cy
        kf_xy[k, :n] = np.stack([u, v], 1)
        kf_desc[k, :n] = descs[ids]
        kf_kp_valid[k, :n] = True
        # second half of the trajectory observes the cloned landmark ids
        kf_kp_mp[k, :n] = ids if k < n_kf // 2 else ids + n_pts
    st = st._replace(
        kf_T_cw=jnp.asarray(kf_T),
        kf_valid=st.kf_valid.at[:n_kf].set(True),
        kf_xy=jnp.asarray(kf_xy),
        kf_desc=jnp.asarray(kf_desc),
        kf_kp_valid=jnp.asarray(kf_kp_valid),
        kf_kp_mp=jnp.asarray(kf_kp_mp),
    )
    return st, n_kf, T_gt


class TestLoopClosing:
    def test_detect_verify_correct(self):
        state, n_kf, T_gt = build_loop_map()
        lc = LoopCloser(CFG, INTR)
        lc.consistency_th = 2  # short synthetic loop: overlap builds late
        # feed the consistency filter with the closing keyframes
        cands = []
        for k in (21, 22, 23):
            cands = lc.detect(state, n_kf, k)
        assert cands, "no loop candidates after 3 consecutive detections"
        # the candidate should be near the loop start (KFs 0-3 wrap region)
        best = max(cands, key=lambda c: c.score)
        assert best.kf_id <= 4, [c.kf_id for c in cands]

        out = lc.verify(state, 23, best.kf_id)
        assert out is not None, "Sim3 verification failed"
        S, n_matches = out
        assert n_matches >= 40
        # scale should be ~1 (drift is mostly rigid)
        assert abs(np.linalg.norm(S[0, :3]) - 1.0) < 0.1

        # drift error before vs after correction
        def pose_err(T_est):
            errs = []
            for k in range(n_kf):
                d = np.asarray(lie.se3_log(jnp.asarray(
                    (T_est[k] @ np.linalg.inv(T_gt[k])).astype(np.float32))))
                errs.append(np.abs(d).max())
            return max(errs)

        def kf_err(T_est, kk):
            d = np.asarray(lie.se3_log(jnp.asarray(
                (T_est[kk] @ np.linalg.inv(T_gt[kk])).astype(np.float32))))
            return np.abs(d).max()

        T_before = np.asarray(state.kf_T_cw)
        e0 = pose_err(T_before[:n_kf])
        state2 = lc.correct(state, n_kf, 23, best.kf_id, S)
        T_after = np.asarray(state2.kf_T_cw)
        e1 = pose_err(T_after[:n_kf])
        # overall drift shrinks (mid-chain drift is only partially
        # observable from a single endpoint loop edge)
        assert e1 < 0.7 * e0, (e0, e1)
        # the loop-end keyframe — what the loop edge directly observes —
        # must improve substantially
        assert kf_err(T_after, 23) < 0.4 * kf_err(T_before, 23), (
            kf_err(T_before, 23), kf_err(T_after, 23))

    def test_no_false_loop_without_revisit(self):
        state, n_kf, T_gt = build_loop_map()
        lc = LoopCloser(CFG, INTR)
        lc.consistency_th = 2
        # mid-trajectory keyframes should not produce consistent loops
        for k in (11, 12, 13):
            cands = lc.detect(state, n_kf, k)
        assert not cands

    def test_correct_fuses_duplicate_landmarks(self):
        """SearchAndFuse (reference LoopClosing.cc:525-547): after the
        correction aligns both sides of the loop, the cloned landmarks the
        revisit created must merge into the originals."""
        state, n_kf, T_gt = build_loop_map()
        lc = LoopCloser(CFG, INTR)
        lc.consistency_th = 2
        for k in (21, 22, 23):
            cands = lc.detect(state, n_kf, k)
        best = max(cands, key=lambda c: c.score)
        out = lc.verify(state, 23, best.kf_id)
        assert out is not None
        S, _ = out
        n_valid_before = int(np.asarray(state.mp_valid).sum())
        state2 = lc.correct(state, n_kf, 23, best.kf_id, S)
        n_valid_after = int(np.asarray(state2.mp_valid).sum())
        assert n_valid_after < n_valid_before - 20, (n_valid_before, n_valid_after)
        # fused bindings in the loop-closing keyframe now point at ORIGINAL
        # landmark ids (< n_pts), and each row stays a 1:1 landmark map
        mp23 = np.asarray(state2.kf_kp_mp[23])
        n_pts = 800
        bound = mp23[mp23 >= 0]
        assert (bound < n_pts).sum() > 20, "no bindings redirected to originals"
        assert len(np.unique(bound)) == len(bound), "duplicate landmark in row"
        # persisted loop edge recorded for future essential-graph solves
        assert len(lc.loop_edges) == 1 and lc.n_corrections == 1

    def test_second_correction_keeps_first_loop_edge(self):
        """Two sequential corrections: the second essential-graph solve
        must include the first loop's persisted edge
        (Optimizer.cc:1683-1710, KeyFrame::GetLoopEdges)."""
        state, n_kf, T_gt = build_loop_map()
        lc = LoopCloser(CFG, INTR)
        lc.consistency_th = 2
        for k in (21, 22, 23):
            cands = lc.detect(state, n_kf, k)
        best = max(cands, key=lambda c: c.score)
        S, _ = lc.verify(state, 23, best.kf_id)
        state2 = lc.correct(state, n_kf, 23, best.kf_id, S)
        # second closure at KF 22 against a neighboring early KF: feed the
        # (already corrected) relative pose as the verified Sim3
        cand2 = min(best.kf_id + 1, 4)
        T22 = np.asarray(state2.kf_T_cw[22])
        Tc2 = np.asarray(state2.kf_T_cw[cand2])
        S2 = (T22 @ np.linalg.inv(Tc2)).astype(np.float32)
        state3 = lc.correct(state2, n_kf, 22, cand2, S2)
        assert len(lc.loop_edges) == 2
        # both constraints hold in the final graph: relative poses along
        # each loop edge match their measurements
        for (a, b, S_ab), tol in zip(lc.loop_edges, (0.08, 0.08)):
            Ta = np.asarray(state3.kf_T_cw[a])
            Tb = np.asarray(state3.kf_T_cw[b])
            rel = Tb @ np.linalg.inv(Ta)
            S_se3 = S_ab.copy()
            s = np.linalg.norm(S_ab[0, :3])
            S_se3[:3, :3] /= s
            d = np.asarray(lie.se3_log(jnp.asarray(
                (rel @ np.linalg.inv(S_se3)).astype(np.float32))))
            assert np.abs(d).max() < tol, (a, b, d)


class TestOptimizeSim3Pair:
    def test_refines_and_gates_outliers(self):
        """optimize_sim3_pair recovers a known Sim3 from projections and
        rejects planted wrong matches — a case a single un-gated Horn
        refit cannot handle (Horn averages the outliers in)."""
        from structure_slam_pointline_tpu.optim.pose_graph import optimize_sim3_pair
        from structure_slam_pointline_tpu.optim.sim3_solver import horn_sim3
        from structure_slam_pointline_tpu.utils import lie as _lie

        g = np.random.default_rng(4)
        N = 120
        X2 = np.stack([g.uniform(-2, 2, N), g.uniform(-1.5, 1.5, N),
                       g.uniform(3, 8, N)], 1).astype(np.float32)
        xi = np.array([0.03, -0.05, 0.02, 0.2, -0.1, 0.15, np.log(1.12)],
                      np.float32)
        S_true = np.asarray(_lie.sim3_exp(jnp.asarray(xi)))
        X1 = X2 @ S_true[:3, :3].T + S_true[:3, 3]

        def proj(p):
            z = p[:, 2]
            return np.stack([p[:, 0] / z * INTR.fx + INTR.cx,
                             p[:, 1] / z * INTR.fy + INTR.cy], -1)

        uv1 = proj(X1).astype(np.float32)
        uv2 = proj(X2).astype(np.float32)
        # plant 30 wrong correspondences (features matched to the wrong
        # landmark): shuffle X2/uv2 rows among themselves
        n_bad = 30
        bad = g.choice(N, n_bad, replace=False)
        perm = np.roll(bad, 7)
        X2_o, uv2_o = X2.copy(), uv2.copy()
        X2_o[bad] = X2[perm]
        uv2_o[bad] = uv2[perm]
        # perturbed init (what a noisy RANSAC hands over)
        dxi = np.array([0.02, -0.01, 0.015, 0.05, 0.05, -0.05, 0.02], np.float32)
        S0 = np.asarray(_lie.sim3_exp(jnp.asarray(dxi))) @ S_true
        sig = np.ones(N, np.float32)
        out = optimize_sim3_pair(
            jnp.asarray(S0), jnp.asarray(X1), jnp.asarray(X2_o),
            jnp.asarray(uv1), jnp.asarray(uv2_o), jnp.ones(N, bool),
            jnp.asarray(sig), jnp.asarray(sig),
            INTR.fx, INTR.fy, INTR.cx, INTR.cy)
        S_opt = np.asarray(out.S12)
        inl = np.asarray(out.inliers)
        # every planted outlier gated out; (almost) all true pairs kept
        assert not inl[bad].any()
        assert inl.sum() >= N - n_bad - 5
        d = np.asarray(_lie.sim3_log(jnp.asarray(
            (S_opt @ np.linalg.inv(S_true)).astype(np.float32))))
        assert np.abs(d).max() < 5e-3, d
        # the un-gated Horn refit over the same contaminated set is
        # visibly worse — the gating is what OptimizeSim3 adds
        s_h, R_h, t_h = horn_sim3(jnp.asarray(X1[None]), jnp.asarray(X2_o[None]))
        S_h = np.eye(4, dtype=np.float32)
        S_h[:3, :3] = float(s_h[0]) * np.asarray(R_h[0])
        S_h[:3, 3] = np.asarray(t_h[0])
        d_h = np.asarray(_lie.sim3_log(jnp.asarray(
            (S_h @ np.linalg.inv(S_true)).astype(np.float32))))
        assert np.abs(d_h).max() > 5 * np.abs(d).max()
