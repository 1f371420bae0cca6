"""Dev smoke test for the feature front-end on a synthetic scene (CPU)."""
import os, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from structure_slam_pointline_tpu.config import SLAMConfig, CameraConfig
from structure_slam_pointline_tpu.io import synthetic
from structure_slam_pointline_tpu.ops import extract, hamming

cam = CameraConfig(fy=480.0)
cfg = SLAMConfig(camera=cam)
scene = synthetic.make_room_scene(n_points=250, n_lines=16, seed=0)
poses = synthetic.circular_trajectory(8)
t0 = time.time()
img0 = synthetic.render(scene, poses[0], cam)
img1 = synthetic.render(scene, poses[1], cam)
print(f"render: {time.time()-t0:.2f}s, img range {img0.min():.0f}..{img0.max():.0f}")

t0 = time.time()
kp0 = extract.extract_orb(jnp.asarray(img0), cfg.frontend)
kp1 = extract.extract_orb(jnp.asarray(img1), cfg.frontend)
jax.block_until_ready(kp1.desc)
print(f"extract (incl compile): {time.time()-t0:.1f}s")
print(f"valid kp0: {int(kp0.valid.sum())}/{kp0.capacity}  kp1: {int(kp1.valid.sum())}")
print("octave histogram:", np.bincount(np.asarray(kp0.octave[kp0.valid]), minlength=8))

# matching between consecutive frames
D = hamming.hamming_matrix(kp0.desc, kp1.desc)
D = jnp.where(kp0.valid[:, None] & kp1.valid[None, :], D, 256)
idx, ok = hamming.mutual_best(D, max_dist=64, ratio=0.8)
ok = np.asarray(ok & kp0.valid)
print(f"mutual matches @dist<=64: {ok.sum()}")
md = np.asarray(D)[np.arange(len(idx)), np.asarray(idx)][ok]
print(f"match dist mean {md.mean():.1f}")
# geometric sanity: matched displacement should be small & consistent
d_xy = np.asarray(kp1.xy)[np.asarray(idx)[ok]] - np.asarray(kp0.xy)[ok]
print(f"median flow: {np.median(d_xy, axis=0)}, mad {np.median(np.abs(d_xy - np.median(d_xy,0)),0)}")
inl = (np.abs(d_xy - np.median(d_xy, 0)) < 30).all(1).mean()
print(f"flow-consistent fraction: {inl:.2f}")
