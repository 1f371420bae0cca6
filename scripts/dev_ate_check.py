"""Dev: wall-scene ATE/fps check with config overrides, for quality
bisects of perf changes. Usage:
  python scripts/dev_ate_check.py [pass1_full] [seed]
"""

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    pass1_full = "pass1_full" in sys.argv[1:]
    import jax.numpy as jnp

    from structure_slam_pointline_tpu.config import CameraConfig, SLAMConfig
    from structure_slam_pointline_tpu.io import synthetic
    from structure_slam_pointline_tpu.models.system import SLAMSystem

    cam = CameraConfig(fy=480.0)
    cfg = SLAMConfig(camera=cam)
    if pass1_full:
        cfg = cfg.replace(optim=dataclasses.replace(
            cfg.optim, pose_rounds_pass1=cfg.optim.pose_rounds,
            pose_iters_pass1=cfg.optim.pose_iters))
    CHUNK = SLAMSystem.SCAN_CHUNK
    scene = synthetic.make_room_scene(n_points=350, n_lines=20, seed=0)
    n_frames = 10 + 6 * CHUNK
    poses = synthetic.circular_trajectory(n_frames, radius=0.5)
    imgs = synthetic.render_sequence(scene, poses, cam, noise=2.0)
    slam = SLAMSystem(cfg)
    i = 0
    while slam.carry is None and i < 40:
        slam.track(imgs[i], i)
        i += 1
    imgs_dev = jnp.asarray(imgs, jnp.float32)
    slam.track_sequence(imgs_dev[i : i + CHUNK], i)
    i += CHUNK
    t0 = time.time()
    nb = 0
    while i + CHUNK <= n_frames:
        slam.track_sequence(imgs_dev[i : i + CHUNK], i)
        i += CHUNK
        nb += CHUNK
    fps = nb / (time.time() - t0)
    traj = slam.trajectory()
    ids = sorted(traj.keys())
    est = np.stack([np.linalg.inv(traj[k]) for k in ids])
    ate = synthetic.ate_rmse(est, poses[ids])
    slam.sync_cursors()
    print(json.dumps({
        "pass1_full": pass1_full, "fps": round(fps, 2),
        "ate": round(ate, 4), "n_kf": slam.cur.n_kf,
        "n_mp": slam.cur.n_mp, "n_ml": slam.cur.n_ml,
    }), flush=True)


if __name__ == "__main__":
    main()
