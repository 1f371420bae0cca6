"""Profile the scan pipeline on the current device and print top ops.

Captures a jax.profiler trace around one 25-frame scan chunk and
aggregates device op durations from the exported Chrome trace.

Usage: python scripts/profile_scan.py [trace_dir]
"""

import collections
import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sspl_trace"
    import jax
    import jax.numpy as jnp

    from structure_slam_pointline_tpu.config import CameraConfig, SLAMConfig
    from structure_slam_pointline_tpu.io import synthetic
    from structure_slam_pointline_tpu.models.system import SLAMSystem

    cam = CameraConfig(fy=480.0)
    cfg = SLAMConfig(camera=cam)
    scene = synthetic.make_room_scene(n_points=350, n_lines=20, seed=0)
    poses = synthetic.circular_trajectory(30, radius=0.5)
    imgs = synthetic.render_sequence(scene, poses, cam, noise=2.0)
    s = SLAMSystem(cfg)
    i = 0
    while s.carry is None and i < 6:
        s.track(imgs[i], i)
        i += 1
    imgs_dev = jnp.asarray(imgs, jnp.float32)
    s.track_sequence(imgs_dev[i : i + 25], i)  # warm/compile
    jax.profiler.start_trace(trace_dir)
    s.track_sequence(imgs_dev[i : i + 25], i)
    jax.profiler.stop_trace()

    traces = sorted(glob.glob(f"{trace_dir}/plugins/profile/*/*.trace.json.gz"))
    with gzip.open(traces[-1]) as f:
        data = json.load(f)
    tot = collections.Counter()
    cnt = collections.Counter()
    for e in data.get("traceEvents", []):
        if e.get("ph") == "X" and "dur" in e:
            tot[e.get("name", "?")] += e["dur"]
            cnt[e.get("name", "?")] += 1
    print("top device/host ops by total time (25 frames):")
    for name, us in tot.most_common(40):
        print(f"{us/1000:9.1f} ms  x{cnt[name]:5d}  {name[:100]}")


if __name__ == "__main__":
    main()
