"""Profile ONE full scan chunk and aggregate device-side XLA op times.

Unlike profile_scan.py (which mixes host events in), this filters trace
events to TPU/device processes only and groups by op-name prefix, so the
output ranks actual on-device compute inside the compiled scan.

Usage: python scripts/profile_device_ops.py [trace_dir]
"""

import collections
import glob
import gzip
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sspl_devtrace"
    import jax
    import jax.numpy as jnp

    from structure_slam_pointline_tpu.config import CameraConfig, SLAMConfig
    from structure_slam_pointline_tpu.io import synthetic
    from structure_slam_pointline_tpu.models.system import SLAMSystem

    cam = CameraConfig(fy=480.0)
    cfg = SLAMConfig(camera=cam)
    scene = synthetic.make_room_scene(n_points=350, n_lines=20, seed=0)
    chunk = SLAMSystem.SCAN_CHUNK
    poses = synthetic.circular_trajectory(90 + 2 * chunk, radius=0.5)
    imgs = synthetic.render_sequence(scene, poses, cam, noise=2.0)
    s = SLAMSystem(cfg)
    i = 0
    # the 2-deg parallax init gate needs a few dozen frames on this
    # slow circle (bench.py uses the same 90-frame allowance)
    while s.carry is None and i < 90:
        s.track(imgs[i], i)
        i += 1
    imgs_dev = jnp.asarray(imgs, jnp.float32)
    s.track_sequence(imgs_dev[i : i + chunk], i)  # warm/compile
    i += chunk
    jax.profiler.start_trace(trace_dir)
    s.track_sequence(imgs_dev[i : i + chunk], i)
    jax.profiler.stop_trace()

    traces = sorted(glob.glob(f"{trace_dir}/plugins/profile/*/*.trace.json.gz"))
    with gzip.open(traces[-1]) as f:
        data = json.load(f)

    # Identify device-side pids from process_name metadata.
    dev_pids = set()
    for e in data.get("traceEvents", []):
        if e.get("ph") == "M" and e.get("name") == "process_name":
            nm = e.get("args", {}).get("name", "")
            if "TPU" in nm or "/device:" in nm or "XLA Op" in nm:
                dev_pids.add(e["pid"])
    tot = collections.Counter()
    cnt = collections.Counter()
    grand = 0.0
    for e in data.get("traceEvents", []):
        if e.get("ph") == "X" and "dur" in e and e.get("pid") in dev_pids:
            name = e.get("name", "?")
            # collapse numeric suffixes: fusion.123 -> fusion
            key = re.sub(r"\.\d+$", "", name)
            tot[key] += e["dur"]
            cnt[key] += 1
            grand += e["dur"]
    print(f"device pids: {sorted(dev_pids)}; total device-op time "
          f"{grand/1000:.1f} ms over {chunk} frames "
          f"({grand/1000/chunk:.2f} ms/frame)")
    for name, us in tot.most_common(45):
        print(f"{us/1000:9.2f} ms  x{cnt[name]:5d}  {name[:110]}")


if __name__ == "__main__":
    main()
