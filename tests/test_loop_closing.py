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

    # keyframe feature snapshots: project GT geometry with GT poses (the
    # observations are what the camera actually saw)
    kf_T = np.array(st.kf_T_cw)
    kf_T[:n_kf] = T_est
    kf_xy = np.zeros((K, F, 2), np.float32)
    kf_desc = np.zeros((K, F, 8), np.uint32)
    kf_kp_valid = np.zeros((K, F), bool)
    kf_kp_mp = np.full((K, F), -1, np.int32)
    for k in range(n_kf):
        pc = pts_gt @ T_gt[k][:3, :3].T + T_gt[k][:3, 3]
        u = pc[:, 0] / np.maximum(pc[:, 2], 1e-6) * CAM.fx + CAM.cx
        v = pc[:, 1] / np.maximum(pc[:, 2], 1e-6) * CAM.fy + CAM.cy
        vis = (pc[:, 2] > 1.0) & (u > 10) & (u < 630) & (v > 10) & (v < 470)
        ids = np.nonzero(vis)[0][:F]
        n = len(ids)
        kf_xy[k, :n] = np.stack([u[ids], v[ids]], 1)
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
