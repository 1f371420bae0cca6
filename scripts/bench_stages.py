"""Keyframe-pipeline stage attribution by ablation.

Named-scope metadata does not survive XLA:TPU fusion, so per-stage wall
time inside the compiled scan is measured by DIFFERENCING ablated scan
variants (`SLAMConfig.ablate`): each variant skips one pipeline stage,
runs the same steady-state window, and the fps delta vs baseline prices
that stage. One process, one scene; the two-view init programs hash
identically across variants so a persistent compilation cache
(JAX_COMPILATION_CACHE_DIR) pays their compile once.

Usage: python scripts/bench_stages.py [n_chunks]
Prints one JSON line per variant + a summary table.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache_sspl")

VARIANTS = [
    "",            # baseline: full pipeline
    "no_kf",       # tracking-only floor (whole keyframe pipeline skipped)
    "nb1",         # point triangulation vs 1 neighbor instead of 4
    "no_line_tri",
    "no_fuse",
    "no_obs_bits",
    "no_ba",
    "no_cull",
]


def main():
    n_chunks = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    import jax
    import jax.numpy as jnp

    from structure_slam_pointline_tpu.config import CameraConfig, SLAMConfig
    from structure_slam_pointline_tpu.io import synthetic
    from structure_slam_pointline_tpu.models.system import SLAMSystem

    cam = CameraConfig(fy=480.0)
    scene = synthetic.make_room_scene(n_points=350, n_lines=20, seed=0)
    CHUNK = SLAMSystem.SCAN_CHUNK
    n_frames = 10 + (1 + n_chunks) * CHUNK
    poses = synthetic.circular_trajectory(n_frames, radius=0.5)
    imgs = synthetic.render_sequence(scene, poses, cam, noise=2.0)
    imgs_dev = jnp.asarray(imgs, jnp.float32)

    results = {}
    for ab in VARIANTS:
        cfg = SLAMConfig(camera=cam, ablate=ab)
        slam = SLAMSystem(cfg)
        i = 0
        while slam.carry is None and i < 10:
            slam.track(imgs[i], i)
            i += 1
        t0 = time.time()
        slam.track_sequence(imgs_dev[i : i + CHUNK], i)  # compile + warm
        t_compile = time.time() - t0
        i += CHUNK
        t0 = time.time()
        n = 0
        while i + CHUNK <= n_frames:
            slam.track_sequence(imgs_dev[i : i + CHUNK], i)
            i += CHUNK
            n += CHUNK
        dt = time.time() - t0
        fps = n / dt
        results[ab or "base"] = fps
        print(json.dumps({
            "variant": ab or "base", "fps": round(fps, 2),
            "ms_per_frame": round(1000.0 / fps, 3),
            "compile_s": round(t_compile, 1),
            "n_kf": slam.cur.n_kf, "n_mp": slam.cur.n_mp,
            "n_ml": slam.cur.n_ml,
        }), flush=True)

    base_ms = 1000.0 / results["base"]
    print("\nstage cost vs baseline (ms/frame amortized):")
    for ab, fps in results.items():
        if ab == "base":
            continue
        d = base_ms - 1000.0 / fps
        print(f"  {ab:14s} {d:+7.3f} ms/frame  ({fps:.1f} fps)")


if __name__ == "__main__":
    main()
