"""Dev driver: loop closing end-to-end through track_sequence.

Outward-looking cylinder lap scenario (io/synthetic.make_cylinder_scene +
loop_trajectory): lap 2 revisits lap 1's views after the start has been
out of the field of view for most of a lap, so the system must detect and
correct the loop through the production scan path.

Usage: python scripts/dev_loop_e2e.py [n_frames] [laps] [on|off|both]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def run(enable_lc: bool, imgs, poses, cam, chunk: int, n_kp: int = 0):
    import dataclasses

    import jax.numpy as jnp

    from structure_slam_pointline_tpu.config import SLAMConfig
    from structure_slam_pointline_tpu.models.system import SLAMSystem

    import os

    cfg = SLAMConfig(camera=cam, enable_loop_closing=enable_lc)
    if n_kp:
        cfg = cfg.replace(frontend=dataclasses.replace(
            cfg.frontend, n_keypoints=n_kp, n_keypoints_init=n_kp))
    if os.environ.get("SSPL_NO_LINES"):
        cfg = cfg.replace(use_lines=False)
    if os.environ.get("SSPL_ABLATE"):
        cfg = cfg.replace(ablate=os.environ["SSPL_ABLATE"])
    slam = SLAMSystem(cfg)
    slam.SCAN_CHUNK = chunk
    i = 0
    while slam.carry is None and i < 12:
        slam.track(imgs[i], i)
        i += 1
    assert slam.carry is not None, "init failed"
    t0 = time.time()
    Tt, okk, inl, kfk = slam.track_sequence(imgs[i:], i)
    dt = time.time() - t0
    np.savez("/tmp/lap_trace.npz", ok=okk, inl=inl, kf=kfk, i0=i, T=Tt)
    runs = []
    j = 0
    while j < len(okk):
        k = j
        while k < len(okk) and okk[k] == okk[j]:
            k += 1
        runs.append(("ok" if okk[j] else "LOST") + f"[{j+i}:{k+i}]")
        j = k
    print(" ".join(runs), flush=True)
    print("inliers at 10-frame marks:",
          [int(x) for x in inl[::10]], flush=True)
    traj = slam.trajectory()
    ids = sorted(traj.keys())
    est = np.stack([np.linalg.inv(traj[k]) for k in ids])
    from structure_slam_pointline_tpu.io import synthetic
    ate = synthetic.ate_rmse(est, poses[ids])
    # ATE of the drifted middle: frames in the final half-lap before the
    # revisit show the loop correction most strongly
    slam.sync_cursors()
    print(json.dumps({
        "loop_closing": enable_lc,
        "ate": round(ate, 4),
        "tracked": len(ids), "total": len(imgs),
        "n_kf": slam.cur.n_kf, "n_mp": slam.cur.n_mp, "n_ml": slam.cur.n_ml,
        "wall_s": round(dt, 1),
        "counters": dict(slam.metrics.counters),
    }), flush=True)
    return ate, slam


def main():
    n_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 350
    laps = float(sys.argv[2]) if len(sys.argv) > 2 else 2.2
    which = sys.argv[3] if len(sys.argv) > 3 else "both"
    n_kp = int(sys.argv[4]) if len(sys.argv) > 4 else 0
    from structure_slam_pointline_tpu.config import CameraConfig
    from structure_slam_pointline_tpu.io import synthetic

    cam = CameraConfig(fy=480.0)
    scene = synthetic.make_cylinder_scene(n_points=700, n_lines=48, seed=0)
    poses = synthetic.loop_trajectory(n_frames, laps=laps)
    t0 = time.time()
    imgs = synthetic.render_sequence(scene, poses, cam, noise=2.0)
    print(f"rendered {n_frames} frames in {time.time()-t0:.0f}s", flush=True)
    if which in ("off", "both"):
        run(False, imgs, poses, cam, chunk=25, n_kp=n_kp)
    if which in ("on", "both"):
        run(True, imgs, poses, cam, chunk=25, n_kp=n_kp)


if __name__ == "__main__":
    main()
