"""Reference-scale long-sequence validation: 1510 frames end-to-end.

The reference's own validation sequences are 881-1509 frames
(Examples/dataset/lr-k0/mono-normal.txt). This drives a synthetic
sequence of the same length through the production scan path and reports
tracking health, pool pressure (compactions, clipped landmarks), ATE,
and throughput as one JSON line.

Usage: python scripts/run_long_sequence.py [n_frames]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1510
    import numpy as np

    from structure_slam_pointline_tpu.config import CameraConfig, SLAMConfig
    from structure_slam_pointline_tpu.io import synthetic
    from structure_slam_pointline_tpu.models.system import SLAMSystem

    t0 = time.time()
    cam = CameraConfig(fy=480.0)
    cfg = SLAMConfig(camera=cam)
    if os.environ.get("SSPL_INIT_KP"):
        import dataclasses
        cfg = cfg.replace(frontend=dataclasses.replace(
            cfg.frontend, n_keypoints_init=int(os.environ["SSPL_INIT_KP"])))
    scene = synthetic.make_room_scene(n_points=350, n_lines=20, seed=0)
    # several laps of a ~300-frame arc (the bench's scene/trajectory
    # parameters): bench-like inter-frame parallax, long-horizon
    # revisits, steady KF turnover
    lap = max(n // 5, 150)
    lap_poses = synthetic.circular_trajectory(lap, radius=0.5)
    reps = (n + lap - 1) // lap
    poses = np.concatenate([lap_poses] * reps)[:n]
    imgs = synthetic.render_sequence(scene, poses, cam, noise=2.0)
    t_setup = time.time() - t0

    slam = SLAMSystem(cfg)
    i = 0
    while slam.carry is None and i < 60:
        slam.track(imgs[i], i)
        i += 1
    CHUNK = SLAMSystem.SCAN_CHUNK
    t1 = time.time()
    n_scan = ((n - i) // CHUNK) * CHUNK
    j = i
    while j + CHUNK <= i + n_scan:
        _, okk, _, _ = slam.track_sequence(np.asarray(imgs[j : j + CHUNK]), j)
        slam.sync_cursors()
        print(f"frame {j + CHUNK}: ok={int(okk.sum())}/{CHUNK} "
              f"kf={slam.cur.n_kf} mp={slam.cur.n_mp} "
              f"t={time.time() - t1:.0f}s", flush=True)
        j += CHUNK
    dt = time.time() - t1
    traj = slam.trajectory()
    ids = sorted(k for k in traj
                 if np.all(np.isfinite(traj[k])))
    n_nonfinite = len(traj) - len(ids)
    est = np.stack([np.linalg.inv(traj[k]) for k in ids])
    try:
        ate = float(synthetic.ate_rmse(est, poses[ids]))
    except np.linalg.LinAlgError:
        ate = float("nan")
    slam.sync_cursors()
    print(json.dumps({
        "n_frames": n,
        "tracked": len(ids),
        "nonfinite_poses": n_nonfinite,
        "ate_rmse_sim3": round(ate, 4),
        "wall_s": {"setup": round(t_setup, 1), "run": round(dt, 1)},
        "fps_incl_compile": round(n_scan / dt, 1),
        "n_kf": slam.cur.n_kf, "n_mp": slam.cur.n_mp, "n_ml": slam.cur.n_ml,
        "counters": dict(slam.metrics.counters),
    }), flush=True)


if __name__ == "__main__":
    main()
