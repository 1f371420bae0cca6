"""Dataset driver: run the TPU SLAM system on a TUM / ICL-NUIM sequence.

Equivalent of the reference's `Examples/Structure-SLAM.cc` driver
(arg parsing at :21-25, LoadImages :110-136, per-frame loop :50-90,
trajectory writers :94-106), rebuilt around the native prefetching
loader and the device-resident pipeline.

Usage:
    python examples/run_slam.py --seq PATH [--config icl|tum3]
        [--manifest rgb.txt] [--out-dir out] [--max-frames N]
        [--realtime] [--viz]

Writes `MonoTrajectory.txt` and `KeyFrameTrajectory.txt` (TUM format)
into --out-dir; `--viz` additionally renders the final map.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seq", required=True, help="sequence directory (TUM layout) or ICL manifest file")
    ap.add_argument("--config", default="icl", choices=["icl", "tum3"])
    ap.add_argument("--manifest", default="rgb.txt")
    ap.add_argument("--out-dir", default="out")
    ap.add_argument("--max-frames", type=int, default=0)
    ap.add_argument("--realtime", action="store_true",
                    help="sleep to the camera frame rate like the reference driver")
    ap.add_argument("--viz", action="store_true")
    args = ap.parse_args()

    from structure_slam_pointline_tpu.config import icl_nuim_config, tum3_config
    from structure_slam_pointline_tpu.io import datasets, native_loader
    from structure_slam_pointline_tpu.models.system import SLAMSystem

    cfg = icl_nuim_config() if args.config == "icl" else tum3_config()
    if os.path.isdir(args.seq):
        seq = datasets.load_tum_rgb_manifest(args.seq, args.manifest)
    else:
        seq = datasets.load_icl_manifest(args.seq)
    n = len(seq) if args.max_frames <= 0 else min(len(seq), args.max_frames)
    print(f"sequence: {n} frames")

    slam = SLAMSystem(cfg)
    loader = native_loader.PrefetchingLoader(seq.image_paths[:n], n_threads=3, ring=8)
    frame_dt = 1.0 / cfg.camera.fps

    t_start = time.time()
    times = []
    for i, img in loader:
        t0 = time.time()
        slam.track(img, i)
        dt = time.time() - t0
        times.append(dt)
        if args.realtime and dt < frame_dt:
            time.sleep(frame_dt - dt)
        if i % 100 == 0:
            e = slam.log[-1]
            print(f"frame {i}: {e.state.name} inliers={e.n_inliers} "
                  f"({1.0 / max(dt, 1e-6):.1f} fps inst)")
    loader.close()
    total = time.time() - t_start
    slam.sync_cursors()

    os.makedirs(args.out_dir, exist_ok=True)
    ts = seq.timestamps
    slam.save_trajectory_tum(os.path.join(args.out_dir, "MonoTrajectory.txt"), ts)
    # keyframe trajectory from the map itself
    st = slam.map
    kf_ids = [k for k in range(slam.cur.n_kf) if bool(st.kf_valid[k])]
    kf_T = np.stack([np.asarray(st.kf_T_cw[k]) for k in kf_ids]) if kf_ids else np.zeros((0, 4, 4))
    kf_ts = [float(ts[int(st.kf_frame_id[k])]) for k in kf_ids]
    datasets.write_trajectory_tum(
        os.path.join(args.out_dir, "KeyFrameTrajectory.txt"), kf_ts, kf_T
    )

    tracked = sum(1 for e in slam.log if e.T_cw is not None)
    med = float(np.median(times)) if times else float("nan")
    print(f"tracked {tracked}/{n} frames | median frame time {med*1000:.1f} ms "
          f"({1.0/max(med,1e-9):.1f} fps) | wall {total:.1f}s | "
          f"KFs {slam.cur.n_kf} points {slam.cur.n_mp}")

    if args.viz:
        from structure_slam_pointline_tpu.viz import viewer

        traj = slam.trajectory()
        ids = sorted(traj.keys())
        T_wc = np.stack([np.linalg.inv(traj[i]) for i in ids]) if ids else None
        viewer.draw_map(st, slam.cur.n_kf, os.path.join(args.out_dir, "map.png"),
                        trajectory=T_wc)
        print(f"map render: {args.out_dir}/map.png")


if __name__ == "__main__":
    main()
