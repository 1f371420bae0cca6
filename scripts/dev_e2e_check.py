"""Dev end-to-end check: run the full SLAM pipeline on a synthetic sequence."""
import os, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax

jax.config.update("jax_platforms", "cpu")
import numpy as np

from structure_slam_pointline_tpu.config import SLAMConfig, CameraConfig
from structure_slam_pointline_tpu.io import synthetic
from structure_slam_pointline_tpu.models.system import SLAMSystem, TrackingState

cam = CameraConfig(fy=480.0)
cfg = SLAMConfig(camera=cam)
scene = synthetic.make_room_scene(n_points=350, n_lines=20, seed=0)
N = 60
poses = synthetic.circular_trajectory(N, radius=0.5)
print("rendering...")
t0 = time.time()
imgs = synthetic.render_sequence(scene, poses, cam, noise=2.0)
print(f"rendered {N} frames in {time.time()-t0:.1f}s")

sys_ = SLAMSystem(cfg)
t0 = time.time()
for i in range(N):
    T = sys_.track(imgs[i], i)
    e = sys_.log[-1]
    if i < 5 or i % 10 == 0 or e.is_keyframe:
        print(f"frame {i}: state={sys_.state.name} inl={e.n_inliers} kf={e.is_keyframe} "
              f"n_kf={sys_.cur.n_kf} n_mp={sys_.cur.n_mp}")
print(f"tracking: {time.time()-t0:.1f}s total")

traj = sys_.trajectory()
print(f"tracked {len(traj)}/{N} frames, {sys_.cur.n_kf} KFs, {sys_.cur.n_mp} points")
if len(traj) > 10:
    ids = sorted(traj.keys())
    est = np.stack([np.linalg.inv(traj[i]) for i in ids])
    gt = poses[ids]
    ate = synthetic.ate_rmse(est, gt)
    print(f"ATE RMSE (Sim3-aligned): {ate:.4f} (trajectory span ~{np.ptp(gt[:,:3,3],0)})")
