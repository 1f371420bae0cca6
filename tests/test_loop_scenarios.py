"""Loop-closing scenario machinery at system level: the outward-looking
cylinder lap (io/synthetic.make_cylinder_scene + loop_trajectory) drives
the PRODUCTION scan path with loop closing enabled; the BoW pipeline
must index keyframes, maintain the vocabulary lifecycle and surface
candidates for revisited views without false corrections on the
first (not-yet-revisited) arc.

Full-lap correction e2e remains tracked in scripts/dev_loop_e2e.py: the
residual blocker is sustained-rotation tracking robustness (three root
causes fixed from its diagnostics this round: unconditional ratio-test
pruning, fuse acceptance gates, keyframe-trigger deadlock)."""

import numpy as np

from structure_slam_pointline_tpu.config import CameraConfig, SLAMConfig
from structure_slam_pointline_tpu.io import synthetic
from structure_slam_pointline_tpu.models.system import SLAMSystem

CAM = CameraConfig(fy=480.0)


class TestLoopScanPath:
    def test_scan_path_with_loop_closing_stays_healthy_on_first_arc(self):
        sc = synthetic.make_cylinder_scene(n_points=800, n_lines=48, seed=0,
                                           radius=5.0)
        sc = sc._replace(patch_size=0.18)
        n = 140
        poses = synthetic.loop_trajectory(n, laps=0.38, cam_radius=1.5)
        imgs = synthetic.render_sequence(sc, poses, CAM, noise=1.0)
        slam = SLAMSystem(SLAMConfig(camera=CAM, enable_loop_closing=True))
        i = 0
        while slam.carry is None and i < 45:
            slam.track(imgs[i], i)
            i += 1
        assert slam.carry is not None
        slam.SCAN_CHUNK = 25
        T, ok, inl, kf = slam.track_sequence(imgs[i:], i)
        # the rotating arc tracks end-to-end through the scan path with
        # the loop closer active between chunks
        assert ok.sum() >= len(ok) - 6, int(ok.sum())
        # keyframes were BoW-indexed as they were fed to the loop closer
        lc = slam._get_loop_closer()
        slam.sync_cursors()
        assert lc.voc is not None
        assert len(lc.kf_words) >= slam.cur.n_kf - 2
        # a first pass over a new area must not hallucinate corrections
        assert slam.metrics.counters.get("loop_corrected", 0) == 0
        traj = slam.trajectory()
        ids = sorted(traj.keys())
        est = np.stack([np.linalg.inv(traj[k]) for k in ids])
        ate = synthetic.ate_rmse(est, poses[ids])
        assert ate < 0.05, ate
