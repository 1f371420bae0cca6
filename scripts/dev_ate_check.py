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
    if "parallax2" in sys.argv[1:]:
        cfg = cfg.replace(init=dataclasses.replace(
            cfg.init, min_parallax_deg=2.0))
    if "init2048" in sys.argv[1:]:
        cfg = cfg.replace(frontend=dataclasses.replace(
            cfg.frontend, n_keypoints_init=2048))
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
    # per-frame aligned residuals: is the ATE a floor or a few outliers?
    e_pos = est[:, :3, 3]
    g_pos = poses[ids][:, :3, 3]
    mu_e, mu_g = e_pos.mean(0), g_pos.mean(0)
    ec, gc = e_pos - mu_e, g_pos - mu_g
    U, D, Vt = np.linalg.svd(gc.T @ ec / len(ec))
    S = np.eye(3)
    if np.linalg.det(U) * np.linalg.det(Vt) < 0:
        S[2, 2] = -1
    R = U @ S @ Vt
    s = np.trace(np.diag(D) @ S) / max((ec ** 2).sum() / len(ec), 1e-12)
    aligned = (s * (R @ e_pos.T)).T + (mu_g - s * R @ mu_e)
    err = np.linalg.norm(aligned - g_pos, axis=1)
    worst = np.argsort(err)[-5:]
    slam.sync_cursors()
    print(json.dumps({
        "pass1_full": pass1_full, "fps": round(fps, 2),
        "ate": round(ate, 4),
        "err_p50": round(float(np.percentile(err, 50)), 4),
        "err_p90": round(float(np.percentile(err, 90)), 4),
        "err_max": round(float(err.max()), 4),
        "worst_frames": [int(ids[w]) for w in worst],
        "n_kf": slam.cur.n_kf,
        "n_mp": slam.cur.n_mp, "n_ml": slam.cur.n_ml,
    }), flush=True)


if __name__ == "__main__":
    main()
