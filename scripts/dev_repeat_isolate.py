"""Isolate the repeatability losses: selection vs detection, and
rotation-bank vs tap instability. Companion to dev_repeatability.py."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    off = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    import jax
    import jax.numpy as jnp
    from structure_slam_pointline_tpu.config import CameraConfig, SLAMConfig
    from structure_slam_pointline_tpu.io import synthetic
    from structure_slam_pointline_tpu.ops import extract, fast, orb, pyramid

    cam = CameraConfig(fy=480.0)
    cfg = SLAMConfig(camera=cam)
    fe = cfg.frontend
    scene = synthetic.make_cylinder_scene(n_points=700, n_lines=48, seed=0)
    poses = synthetic.loop_trajectory(300, laps=2.2)

    bases = [0, 40, 80, 120, 160, 200]
    from scripts.dev_repeatability import projections  # noqa: F401

    n_vis = n_det = n_dense = 0
    bits_est, bits_forced = [], []
    for b in bases:
        ia = synthetic.render(scene, poses[b], cam, noise=2.0, seed=b)
        ib = synthetic.render(scene, poses[b + off], cam, noise=2.0, seed=b + off)
        kpa = extract.extract_orb(jnp.asarray(ia), fe)
        kpb = extract.extract_orb(jnp.asarray(ib), fe)
        kpa = {k: np.asarray(getattr(kpa, k)) for k in
               ("xy", "desc", "valid", "octave", "angle")}
        kpb = {k: np.asarray(getattr(kpb, k)) for k in
               ("xy", "desc", "valid", "octave", "angle")}

        # lift frame-A octave-0 detections to world via patch planes
        import scripts.dev_repeatability as dr
        dr_scene = scene

        def lift(kp, T_wc):
            sel = kp["valid"]
            xy = kp["xy"][sel]
            desc = kp["desc"][sel]
            ang = kp["angle"][sel]
            R_wc, t_wc = T_wc[:3, :3], T_wc[:3, 3]
            R_cw = R_wc.T
            t_cw = -R_cw @ t_wc
            p_cam = scene.points @ R_cw.T + t_cw
            z = p_cam[:, 2]
            u = p_cam[:, 0] / np.maximum(z, 1e-6) * cam.fx + cam.cx
            v = p_cam[:, 1] / np.maximum(z, 1e-6) * cam.fy + cam.cy
            anch = np.where((z > 0.5)[:, None], np.stack([u, v], 1), 1e9)
            d = np.linalg.norm(xy[:, None, :] - anch[None, :, :], axis=2)
            pi = d.argmin(1)
            rays = np.stack([(xy[:, 0] - cam.cx) / cam.fx,
                             (xy[:, 1] - cam.cy) / cam.fy,
                             np.ones(len(xy))], 1)
            a0 = scene.patch_axes[pi, 0] @ R_cw.T
            a1 = scene.patch_axes[pi, 1] @ R_cw.T
            n = np.cross(a0, a1)
            pc = p_cam[pi]
            denom = (rays * n).sum(1)
            denom = np.where(np.abs(denom) < 1e-9, 1e-9, denom)
            lam = (pc * n).sum(1) / denom
            hit_c = rays * lam[:, None]
            rel = hit_c - pc
            s = (rel * a0).sum(1) / scene.patch_size
            t = (rel * a1).sum(1) / scene.patch_size
            on = (np.abs(s) <= 1.0) & (np.abs(t) <= 1.0) & (lam > 0.5)
            w = hit_c @ R_wc.T + t_wc
            return w[on], desc[on], ang[on]

        w, desc_a, ang_a = lift(kpa, poses[b])
        pb, vis = dr.__dict__.get("project", None) or (None, None)
        # project into frame B
        T = poses[b + off]
        R_cw = T[:3, :3].T
        t_cw = -R_cw @ T[:3, 3]
        p = w @ R_cw.T + t_cw
        z = p[:, 2]
        u = p[:, 0] / np.maximum(z, 1e-6) * cam.fx + cam.cx
        v = p[:, 1] / np.maximum(z, 1e-6) * cam.fy + cam.cy
        vis = (z > 0.5) & (u > 24) & (u < cam.width - 24) & \
              (v > 24) & (v < cam.height - 24)
        pb = np.stack([u, v], 1)
        n_vis += vis.sum()

        xyb = kpb["xy"][kpb["valid"]]
        descb = kpb["desc"][kpb["valid"]]
        angb = kpb["angle"][kpb["valid"]]
        d = np.linalg.norm(pb[:, None, :] - xyb[None, :, :], axis=2)
        j = d.argmin(1)
        dmin = d[np.arange(len(pb)), j]
        det = vis & (dmin <= 3.0)
        n_det += det.sum()

        # dense availability: does a FAST corner (>= min threshold, post-NMS)
        # exist within 3px of the reprojection at octave 0?
        score = np.asarray(fast.nms3(fast.fast_score(
            jnp.asarray(ib, jnp.bfloat16))))
        miss = vis & ~det
        have = np.zeros(miss.sum(), bool)
        H, W = score.shape
        for kk, (uu, vv) in enumerate(pb[miss]):
            x0, x1 = int(uu) - 3, int(uu) + 4
            y0, y1 = int(vv) - 3, int(vv) + 4
            if x0 < 0 or y0 < 0 or x1 > W or y1 > H:
                continue
            have[kk] = (score[y0:y1, x0:x1] >= fe.fast_min_threshold).any()
        n_dense += have.sum()

        # descriptor: estimated-angle descriptors (pipeline output) vs
        # FORCED same-bank (recompute frame-B descriptor with frame-A angle)
        if det.sum():
            d0 = desc_a[det]
            d1 = descb[j[det]]
            bits = np.unpackbits((d0 ^ d1).view(np.uint8), axis=1).sum(1)
            bits_est.extend(bits.tolist())
            # recompute with forced angle (octave-0 approx: use blurred level0)
            levels, blurred = pyramid.build_blurred_pyramid(
                jnp.asarray(ib, jnp.bfloat16), fe.n_levels, fe.scale_factor,
                fe.blur_sigma)
            patches = orb.gather_patches(blurred[0], jnp.asarray(xyb[j[det]]))
            d1f = np.asarray(orb.describe(patches, jnp.asarray(ang_a[det])))
            bitsf = np.unpackbits((d0 ^ d1f).view(np.uint8), axis=1).sum(1)
            bits_forced.extend(bitsf.tolist())

    be = np.asarray(bits_est)
    bf = np.asarray(bits_forced)
    print(f"off={off}: vis={n_vis} det={n_det} ({n_det/max(n_vis,1):.3f}) "
          f"missed-with-dense-corner={n_dense}/{n_vis - n_det} "
          f"(selection loss {n_dense/max(n_vis - n_det,1):.2f})")
    print(f"desc est-angle:    mean={be.mean():.1f} "
          f"p50={np.percentile(be,50):.0f} <=50:{(be<=50).mean():.3f} "
          f"<=100:{(be<=100).mean():.3f}")
    print(f"desc forced-angle: mean={bf.mean():.1f} "
          f"p50={np.percentile(bf,50):.0f} <=50:{(bf<=50).mean():.3f} "
          f"<=100:{(bf<=100).mean():.3f}")


if __name__ == "__main__":
    main()
