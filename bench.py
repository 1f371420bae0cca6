"""Benchmark: steady-state tracked frames/s of the full SLAM pipeline.

Runs the end-to-end system (feature extraction -> projection matching ->
two pose LMs, plus keyframe insertion / triangulation / local BA when
triggered) on a pre-rendered synthetic 640x480 sequence, on whatever
device JAX selects (the real TPU chip under the driver).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline = the reference's real-time target of 30 fps on a desktop CPU
(reference README.md:13, Examples/ICL.yaml:22) — vs_baseline is our
frames/s divided by 30.
"""

import json
import time

import numpy as np


def main():
    import jax

    from structure_slam_pointline_tpu.config import CameraConfig, SLAMConfig
    from structure_slam_pointline_tpu.io import synthetic
    from structure_slam_pointline_tpu.models.system import SLAMSystem

    cam = CameraConfig(fy=480.0)
    cfg = SLAMConfig(camera=cam)
    scene = synthetic.make_room_scene(n_points=350, n_lines=20, seed=0)
    n_frames = 80
    poses = synthetic.circular_trajectory(n_frames, radius=0.5)
    imgs = synthetic.render_sequence(scene, poses, cam, noise=2.0)

    slam = SLAMSystem(cfg)
    # warmup: initialize + compile every path (init, track, KF, BA)
    warm = 12
    for i in range(warm):
        slam.track(imgs[i], i)

    t0 = time.time()
    tracked = 0
    for i in range(warm, n_frames):
        T = slam.track(imgs[i], i)
        if T is not None:
            tracked += 1
    jax.effects_barrier()
    dt = time.time() - t0
    fps = (n_frames - warm) / dt

    traj = slam.trajectory()
    ate = float("nan")
    if len(traj) > 10:
        ids = sorted(traj.keys())
        est = np.stack([np.linalg.inv(traj[i]) for i in ids])
        ate = synthetic.ate_rmse(est, poses[ids])

    print(json.dumps({
        "metric": "tracked_frames_per_second",
        "value": round(fps, 2),
        "unit": "fps",
        "vs_baseline": round(fps / 30.0, 3),
        "extra": {
            "tracked_frames": tracked,
            "total_frames": n_frames - warm,
            "ate_rmse_sim3": round(ate, 4),
            "n_keyframes": slam.cur.n_kf,
            "n_map_points": slam.cur.n_mp,
            "device": str(jax.devices()[0]),
        },
    }))


if __name__ == "__main__":
    main()
