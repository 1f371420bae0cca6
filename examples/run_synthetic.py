"""Synthetic end-to-end demo: render a scene, run SLAM, report ATE, draw the map.

This is the runnable artifact for environments without dataset files
(the reference's Examples/dataset ships only manifests). It exercises
the full pipeline — point+line front-end, tracking, mapping, BA — and
writes trajectory + map visualizations.

Usage: python examples/run_synthetic.py [--frames N] [--out-dir out] [--scan]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=60)
    ap.add_argument("--out-dir", default="out_synthetic")
    ap.add_argument("--scan", action="store_true", help="use lax.scan batch mode")
    ap.add_argument("--localize", type=int, default=0, metavar="N",
                    help="after mapping, re-track the last N frames in "
                         "localization-only mode (frozen map)")
    args = ap.parse_args()

    from structure_slam_pointline_tpu.config import CameraConfig, SLAMConfig
    from structure_slam_pointline_tpu.io import synthetic
    from structure_slam_pointline_tpu.models.system import SLAMSystem
    from structure_slam_pointline_tpu.viz import viewer

    cam = CameraConfig(fy=480.0)
    cfg = SLAMConfig(camera=cam)
    scene = synthetic.make_room_scene(n_points=350, n_lines=20, seed=0)
    poses = synthetic.circular_trajectory(args.frames, radius=0.5)
    print("rendering...")
    imgs = synthetic.render_sequence(scene, poses, cam, noise=2.0)

    slam = SLAMSystem(cfg)
    t0 = time.time()
    if args.scan:
        i = 0
        while slam.carry is None and i < 10:
            slam.track(imgs[i], i)
            i += 1
        if i < args.frames:
            slam.track_sequence(imgs[i:], i)
    else:
        for i in range(args.frames):
            slam.track(imgs[i], i)
    wall = time.time() - t0
    slam.sync_cursors()

    traj = slam.trajectory()
    ids = sorted(traj.keys())
    if not ids:
        print(f"tracked 0/{args.frames} | map never initialized "
              f"(two-view init needs ~10+ frames of parallax)")
        return
    est_wc = np.stack([np.linalg.inv(traj[i]) for i in ids])
    ate = synthetic.ate_rmse(est_wc, poses[ids])
    print(f"tracked {len(ids)}/{args.frames} | ATE RMSE (Sim3) {ate:.4f} | "
          f"{args.frames / wall:.1f} fps | KFs {slam.cur.n_kf} points {slam.cur.n_mp}")

    if args.localize > 0:
        n_loc = min(args.localize, args.frames)
        slam.activate_localization_mode()
        kf_before = slam.cur.n_kf
        ok_loc = 0
        for j in range(args.frames - n_loc, args.frames):
            if slam.track(imgs[j], j) is not None:
                ok_loc += 1
        slam.sync_cursors()
        print(f"localization-only re-track: {ok_loc}/{n_loc} frames, "
              f"KFs {kf_before} -> {slam.cur.n_kf} (map frozen)")
        slam.deactivate_localization_mode()

    slam.shutdown()
    os.makedirs(args.out_dir, exist_ok=True)
    slam.save_trajectory_tum(os.path.join(args.out_dir, "MonoTrajectory.txt"))
    slam.save_keyframe_trajectory_tum(os.path.join(args.out_dir, "KeyFrameTrajectory.txt"))
    viewer.draw_map(slam.map, slam.cur.n_kf, os.path.join(args.out_dir, "map.png"),
                    trajectory=est_wc, gt_trajectory=poses[ids])
    print(f"outputs in {args.out_dir}/")


if __name__ == "__main__":
    main()
