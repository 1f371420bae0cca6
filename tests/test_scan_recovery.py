"""Scan-path failure recovery: the host reactions between lax.scan chunks
must relocalize after blackouts/teleports (reference relocalizes on every
lost frame, Tracking.cc:217) — exercised through the SAME track_sequence
path the benchmark runs, not the per-frame demo path.
"""

import numpy as np
import pytest

from structure_slam_pointline_tpu.config import CameraConfig, SLAMConfig
from structure_slam_pointline_tpu.io import synthetic
from structure_slam_pointline_tpu.models.system import SLAMSystem

CAM = CameraConfig(fy=480.0)


def _init_system(cfg, imgs):
    slam = SLAMSystem(cfg)
    i = 0
    while slam.carry is None and i < 12:
        slam.track(imgs[i], i)
        i += 1
    assert slam.carry is not None, "two-view init failed"
    return slam, i


class TestScanRelocalization:
    def test_blackout_teleport_recovers_in_scan_mode(self):
        """Blackout + teleport to a previously mapped view: the scan
        coasts (lost), the between-chunk reaction relocalizes via
        BoW+PnP, and the scan resumes tracking from the recovered pose."""
        cfg = SLAMConfig(camera=CAM)
        scene = synthetic.make_room_scene(n_points=300, n_lines=12, seed=3)
        poses = synthetic.circular_trajectory(48, radius=0.5)
        imgs = synthetic.render_sequence(scene, poses[:32], CAM, noise=2.0)
        g = np.random.default_rng(0)
        # frames 0..26 normal; 27-29 pure noise; then teleport back to the
        # start of the mapped arc (re-renders of poses 8..15)
        gt = np.concatenate([poses[:30], poses[8:16]])
        seq = np.concatenate([imgs[:30], imgs[8:16]]).copy()
        seq[27:30] = g.uniform(0, 255, seq[27:30].shape).astype(np.float32)

        slam, i0 = _init_system(cfg, seq)
        slam.SCAN_CHUNK = 12
        T, ok, inl, kf = slam.track_sequence(seq[i0:], i0)

        def rel(f):
            return f - i0

        # blackout frames lost
        assert not ok[rel(28)] and not ok[rel(29)]
        # recovered after the teleport: the tail is tracked again
        assert ok[-6:].sum() >= 5, ok.astype(int)
        # and the recovered poses are consistent with ground truth
        est_ids = [i for i in range(i0, len(seq)) if ok[rel(i)]]
        est_wc = np.linalg.inv(np.stack([T[rel(i)] for i in est_ids]))
        ate = synthetic.ate_rmse(est_wc, gt[est_ids])
        assert ate < 0.08, ate
        # the log records the lost frames as untracked
        logged = {e.frame_id: e for e in slam.log}
        assert logged[28].T_cw is None
        assert logged[len(seq) - 1].T_cw is not None
