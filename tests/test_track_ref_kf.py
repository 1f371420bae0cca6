"""BoW-vs-reference-keyframe recovery rung (reference
Tracking::TrackReferenceKeyFrame, src/Tracking.cc:1005-1095).

A fast in-place rotation blows every projection window — the motion
model's and the in-jit 2.5x wide re-track's — but the scene is still in
view, so BoW-gated matching against the newest keyframe plus a pose LM
from the last pose recovers WITHOUT paying full relocalization
(database query + PnP RANSAC)."""

import numpy as np

from structure_slam_pointline_tpu.config import CameraConfig, SLAMConfig
from structure_slam_pointline_tpu.io import synthetic
from structure_slam_pointline_tpu.models.system import SLAMSystem

CAM = CameraConfig(fy=480.0)


def _yaw(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)


class TestTrackReferenceKeyframe:
    def test_fast_rotation_recovers_via_ref_kf_not_full_reloc(self):
        import dataclasses

        cfg = SLAMConfig(camera=CAM)
        # denser keyframe cadence so the map holds > 5 keyframes by the
        # rotation jump (<= 5 lost triggers a full reset, Tracking.cc:291)
        cfg = cfg.replace(keyframe=dataclasses.replace(
            cfg.keyframe, max_frames=6))
        scene = synthetic.make_room_scene(n_points=400, n_lines=12, seed=5)
        poses = synthetic.circular_trajectory(42, radius=0.5)
        # sudden in-place yaw from frame 32 on: ~0.17 rad => ~80 px of
        # feature displacement (fx ~ 481), far beyond the wide re-track's
        # 2.5 * 15 px window, while the view content stays shared
        for j in range(32, len(poses)):
            poses[j] = poses[j].copy()
            poses[j][:3, :3] = poses[j][:3, :3] @ _yaw(0.17)
        imgs = synthetic.render_sequence(scene, poses, CAM, noise=2.0)

        slam = SLAMSystem(cfg)
        for j in range(len(imgs)):
            slam.track(imgs[j], j)
        c = slam.metrics.counters
        # the rung fired and did the recovery; the full BoW+PnP ladder
        # step was never needed
        assert c.get("reloc_ref_kf", 0) >= 1, dict(c)
        # tracking resumed after the jump
        tracked_late = [e for e in slam.log if e.frame_id >= 33 and e.T_cw is not None]
        assert len(tracked_late) >= 6, len(tracked_late)
        # recovered trajectory is consistent with ground truth
        traj = slam.trajectory()
        ids = sorted(traj.keys())
        est = np.stack([np.linalg.inv(traj[k]) for k in ids])
        ate = synthetic.ate_rmse(est, poses[ids])
        assert ate < 0.08, ate
