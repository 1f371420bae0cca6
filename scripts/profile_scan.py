"""Profile the scan pipeline on the current device and print top ops.

Captures a jax.profiler trace around one SCAN_CHUNK-frame scan chunk and
aggregates device op durations from the exported Chrome trace, both by
named_scope stage (frontend / track / pass1 / pass2 / covis / kf
pipeline ...) and by individual op.

Usage: python scripts/profile_scan.py [trace_dir]
"""

import collections
import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STAGES = (
    "frontend", "lsd", "lbd", "track", "pass1", "pass2", "covis_local_map",
    "counters", "kf_insert", "triangulate", "fuse", "gather_ba", "ba",
    "cull", "obs_bits",
)


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
    CHUNK = SLAMSystem.SCAN_CHUNK
    n = 10 + 2 * CHUNK
    poses = synthetic.circular_trajectory(n, radius=0.5)
    imgs = synthetic.render_sequence(scene, poses, cam, noise=2.0)
    s = SLAMSystem(cfg)
    i = 0
    while s.carry is None and i < 60:
        s.track(imgs[i], i)
        i += 1
    imgs_dev = jnp.asarray(imgs, jnp.float32)
    s.track_sequence(imgs_dev[i : i + CHUNK], i)  # warm/compile
    i += CHUNK
    jax.profiler.start_trace(trace_dir)
    s.track_sequence(imgs_dev[i : i + CHUNK], i)
    jax.profiler.stop_trace()

    traces = sorted(glob.glob(f"{trace_dir}/plugins/profile/*/*.trace.json.gz"))
    with gzip.open(traces[-1]) as f:
        data = json.load(f)
    # Aggregate DEVICE events by their compiler metadata: `tf_op` carries
    # the full jit/named_scope path and `source` the python file:line.
    # (Post-fusion event NAMES are opaque `fusion.NNNN`; named scopes do
    # not survive into them on XLA:TPU.)
    stage_tot = collections.Counter()
    src_tot = collections.Counter()
    total = 0.0
    for e in data.get("traceEvents", []):
        if e.get("ph") != "X" or "args" not in e:
            continue
        a = e["args"]
        if "device_duration_ps" not in a or "tf_op" not in a:
            continue
        ms = int(a["device_duration_ps"]) / 1e9
        total += ms
        op = a["tf_op"]
        hit = "other:" + op.split("/")[-1].split(":")[0][:24]
        for st in STAGES:
            if f"/{st}/" in op:
                hit = st
                break
        stage_tot[hit] += ms
        src_tot[a.get("source", "?")] += ms
    print(f"total device ms over {CHUNK} frames: {total:.1f}")
    print(f"per-stage device time ({CHUNK} frames):")
    for st, ms in stage_tot.most_common(25):
        print(f"{ms:9.1f} ms  {ms/CHUNK*1000:8.0f} us/frame  {st}")
    print(f"\ntop sources by device time ({CHUNK} frames):")
    for name, ms in src_tot.most_common(40):
        print(f"{ms:9.1f} ms  {name}")


if __name__ == "__main__":
    main()
