"""Benchmark: steady-state tracked frames/s of the full SLAM pipeline.

Runs the end-to-end system — feature extraction, projection matching,
two chi2-gated pose LMs, plus the conditional keyframe pipeline
(triangulation + Schur local BA + culling) — on a synthetic 640x480
sequence on whatever device JAX selects (the real TPU chip under the
driver). Sequence mode: frames stream through `lax.scan` in chunks, so
steady-state throughput has no per-frame host round-trips (the
TPU-native replacement for the reference's 3-thread pipeline).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} —
immediately after the steady-state measurement, so the headline result
never depends on optional diagnostics completing. The wall-clock
breakdown (`extra.wall_s`: setup / init / scan-compile / steady) makes a
compile-time regression visible in every BENCH_r*.json. Optional
per-stage device timing (extra standalone XLA compiles!) only runs with
SSPL_BENCH_STAGES=1, printed as a SECOND line.

Baseline = the reference's real-time target of 30 fps on a desktop CPU
(reference README.md:13, Examples/ICL.yaml:22) — vs_baseline is our
frames/s divided by 30.
"""

import json
import os
import time

import numpy as np

def main():
    t_origin = time.time()
    import jax
    import jax.numpy as jnp

    from structure_slam_pointline_tpu.config import CameraConfig, SLAMConfig
    from structure_slam_pointline_tpu.io import synthetic
    from structure_slam_pointline_tpu.models.system import SLAMSystem

    CHUNK = SLAMSystem.SCAN_CHUNK  # scan-sized chunks: no remainder frames

    cam = CameraConfig(fy=480.0)
    cfg = SLAMConfig(camera=cam)
    scene = synthetic.make_room_scene(n_points=350, n_lines=40, seed=0)
    # steady window = 5 chunks (500 frames): a single keyframe event swung
    # the old 200-frame window by several fps (round-3 verdict item 4)
    n_frames = 10 + 6 * CHUNK  # init can take up to ~10 frames of parallax
    poses = synthetic.circular_trajectory(n_frames, radius=0.5)
    imgs = synthetic.render_sequence(scene, poses, cam, noise=2.0)
    t_setup = time.time() - t_origin

    slam = SLAMSystem(cfg)
    # bootstrap (two-view init; shares the runtime frontend program).
    # The 610-frame circle moves ~0.5 deg/frame, so the 2-deg parallax
    # gate needs a few dozen frames of baseline.
    t0 = time.time()
    i = 0
    while slam.carry is None and i < 90:
        slam.track(imgs[i], i)
        i += 1
    t_init = time.time() - t0
    imgs_dev = jnp.asarray(imgs, jnp.float32)
    t0 = time.time()
    slam.track_sequence(imgs_dev[i : i + CHUNK], i)  # warmup/compile
    t_scan_compile = time.time() - t0
    i += CHUNK

    t0 = time.time()
    n_bench = 0
    while i + CHUNK <= n_frames:
        slam.track_sequence(imgs_dev[i : i + CHUNK], i)
        i += CHUNK
        n_bench += CHUNK
    dt = time.time() - t0
    fps = n_bench / dt

    traj = slam.trajectory()
    ate = float("nan")
    if len(traj) > 10:
        ids = sorted(traj.keys())
        est = np.stack([np.linalg.inv(traj[k]) for k in ids])
        ate = synthetic.ate_rmse(est, poses[ids])
    tracked = sum(1 for e in slam.log if e.T_cw is not None)
    slam.sync_cursors()
    n_kf_final, n_mp_final, n_ml_final = (slam.cur.n_kf, slam.cur.n_mp,
                                          slam.cur.n_ml)
    # LIVE landmark counts (cursors count creations; culled slots stay
    # allocated until compaction) — line-subsystem health is judged on
    # the live count, not the creation cursor
    import jax as _jx
    n_mp_live, n_ml_live = map(int, _jx.device_get(
        (slam.map.mp_valid.sum(), slam.map.ml_valid.sum())))
    counters_final = dict(slam.metrics.counters)

    # ---- stage attribution (round-3 verdict item 1): ONE extra traced
    # chunk re-using frames already consumed; device events carry tf_op
    # scope + source metadata, aggregated to a per-stage us/frame table.
    # Best-effort: any failure leaves stage_us_per_frame empty. ----
    stage_us = {}
    try:
        import collections
        import glob
        import gzip
        import tempfile

        tdir = tempfile.mkdtemp(prefix="sspl_bench_trace")
        jax.profiler.start_trace(tdir)
        slam.track_sequence(imgs_dev[i - CHUNK : i], i - CHUNK)
        jax.profiler.stop_trace()
        traces = sorted(glob.glob(f"{tdir}/plugins/profile/*/*.trace.json.gz"))
        with gzip.open(traces[-1]) as f:
            tdata = json.load(f)
        STAGES = ("lsd", "lbd", "frontend", "pass1", "pass2", "covis_local_map", "counters",
                  "kf_insert", "triangulate", "fuse", "gather_ba", "ba",
                  "cull", "obs_bits", "local_sets", "track")
        agg = collections.Counter()
        other_agg = collections.Counter()
        for e in tdata.get("traceEvents", []):
            a = e.get("args")
            if not a or e.get("ph") != "X" or "device_duration_ps" not in a \
                    or "tf_op" not in a:
                continue
            us = int(a["device_duration_ps"]) / 1e6
            # control-flow PARENT spans (cond/while/closed_call) cover
            # their branch bodies inclusively, double-counting the leaf
            # ops already attributed to stages — skip them (measured:
            # the keyframe-pipeline cond span alone re-counted ~1.1
            # ms/frame as "other")
            leaf = a["tf_op"].rstrip(":").split("/")[-1]
            if leaf.split(".")[0] in ("cond", "while", "closed_call",
                                      "body", "branch"):
                continue
            hit = "other"
            for stg in STAGES:
                if f"/{stg}/" in a["tf_op"]:
                    hit = stg
                    break
            agg[hit] += us
            if hit == "other":
                # name the unattributed consumers so no bucket stays
                # opaque (round-4 verdict item 5): group by the leading
                # path segments of the op
                parts = [p for p in a["tf_op"].split("/")
                         if p not in ("jit(slam_scan)", "jit(slam_step)",
                                      "while", "body", "transpose")]
                other_agg["/".join(parts[:2])] += us
        stage_us = {k: round(v / CHUNK, 1) for k, v in agg.most_common()}
        stage_us.update({f"other:{k}": round(v / CHUNK, 1)
                         for k, v in other_agg.most_common(6)})
    except Exception:
        pass


    print(json.dumps({
        "metric": "tracked_frames_per_second",
        "value": round(fps, 2),
        "unit": "fps",
        # NOTE: the denominator is the reference's 30 fps REAL-TIME TARGET
        # (its README/yaml fps), not a measured run of the C++ reference —
        # the reference toolchain does not build in this image (BASELINE.md)
        "vs_baseline": round(fps / 30.0, 3),
        "baseline_kind": "reference 30 fps real-time target (not measured)",
        "extra": {
            "tracked_frames": tracked,
            "total_frames": n_frames,
            "ate_rmse_sim3": round(ate, 4),
            "n_keyframes": n_kf_final,
            "n_map_points": n_mp_final,
            "n_map_lines": n_ml_final,
            "n_map_points_live": n_mp_live,
            "n_map_lines_live": n_ml_live,
            "device": str(jax.devices()[0]),
            # wall-clock breakdown: setup = scene render + imports;
            # init = two-view bootstrap incl. frontend compiles;
            # scan_compile = first slam_scan chunk (XLA compile dominated);
            # steady = the measured steady-state window
            "wall_s": {
                "setup": round(t_setup, 1),
                "init": round(t_init, 1),
                "scan_compile": round(t_scan_compile, 1),
                "steady": round(dt, 1),
                "total": round(time.time() - t_origin, 1),
            },
            "counters": counters_final,
            # measured per-stage device time (us/frame) from one traced
            # chunk after the steady window — where the time goes
            "stage_us_per_frame": stage_us,
        },
    }), flush=True)

    if os.environ.get("SSPL_BENCH_STAGES"):
        # ---- per-stage device-time breakdown: each jitted stage timed
        # alone on one representative frame (blocked; dispatch overhead
        # included). These are FRESH standalone XLA compiles — opt-in so
        # the headline bench never pays for them. ----
        from structure_slam_pointline_tpu.models import pipeline, tracking

        img0 = imgs_dev[n_frames // 2]
        frame = pipeline.build_frame_jit(img0, slam.intr, cfg)
        jax.block_until_ready(frame.xy)

        def _time_ms(fn, reps=10):
            fn()  # warm
            t = time.time()
            for _ in range(reps):
                out = fn()
            jax.block_until_ready(out)
            return (time.time() - t) / reps * 1000.0

        t_frontend = _time_ms(lambda: pipeline.build_frame_jit(
            img0, slam.intr, cfg).xy)
        T_pred = slam.carry.T_last
        t_track = _time_ms(lambda: tracking.track_step(
            slam.carry.state, frame, T_pred, jnp.asarray(0), slam.intr, cfg,
            n_kf=slam.carry.n_kf).T_cw)
        print(json.dumps({
            "metric": "stage_ms",
            "value": {"frontend": round(t_frontend, 2),
                      "track": round(t_track, 2)},
            "unit": "ms/frame",
        }), flush=True)


if __name__ == "__main__":
    main()
