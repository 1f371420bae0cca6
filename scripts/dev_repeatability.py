"""Frontend repeatability diagnostic under viewpoint rotation.

Measures, on the outward-looking cylinder lap scene (the scenario where
tracking dies mid-lap), as a function of view separation:

  - detection recall: fraction of GT-visible landmarks with a FAST
    detection within `det_r` px of their projection;
  - descriptor repeatability: of landmarks detected in BOTH views, the
    fraction whose nearest-detection descriptors match within 50/100 bits
    (TH_LOW/TH_HIGH, reference ORBmatcher.h:49-50).

Usage: python scripts/dev_repeatability.py [det_r]
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def projections(scene, T_wc, cam, margin=24.0):
    R_cw = T_wc[:3, :3].T
    t_cw = -R_cw @ T_wc[:3, 3]
    p_cam = scene.points @ R_cw.T + t_cw
    z = p_cam[:, 2]
    u = p_cam[:, 0] / np.maximum(z, 1e-6) * cam.fx + cam.cx
    v = p_cam[:, 1] / np.maximum(z, 1e-6) * cam.fy + cam.cy
    vis = (z > 0.5) & (u > margin) & (u < cam.width - margin) & \
          (v > margin) & (v < cam.height - margin)
    return np.stack([u, v], 1), vis


def main():
    det_r = float(sys.argv[1]) if len(sys.argv) > 1 else 3.0
    n_kp = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    import dataclasses

    import jax.numpy as jnp
    from structure_slam_pointline_tpu.config import CameraConfig, SLAMConfig
    from structure_slam_pointline_tpu.io import synthetic
    from structure_slam_pointline_tpu.ops import extract, hamming

    cam = CameraConfig(fy=480.0)
    cfg = SLAMConfig(camera=cam)
    if n_kp:
        cfg = cfg.replace(frontend=dataclasses.replace(
            cfg.frontend, n_keypoints=n_kp))
    scene = synthetic.make_cylinder_scene(n_points=700, n_lines=48, seed=0)
    poses = synthetic.loop_trajectory(300, laps=2.2)
    deg_per_frame = 2.2 * 360.0 / 300.0

    bases = [0, 40, 80, 120, 160, 200]
    offsets = [1, 2, 4, 8, 16]
    need = sorted({b for b in bases} | {b + o for b in bases for o in offsets})
    imgs = {i: synthetic.render(scene, poses[i], cam, noise=2.0, seed=i)
            for i in need}

    kps = {}
    for i in need:
        kp = extract.extract_orb(jnp.asarray(imgs[i]), cfg.frontend)
        kps[i] = {
            "xy": np.asarray(kp.xy), "desc": np.asarray(kp.desc),
            "valid": np.asarray(kp.valid), "octave": np.asarray(kp.octave),
        }

    def lift_to_world(kp, T_wc, margin=2.0):
        """Back-project frame detections onto the patch planes they sit on.

        Returns (world_pts [M,3], desc [M,8], kp_idx [M]) for detections
        whose ray hits a patch plane inside the patch footprint."""
        sel = kp["valid"]
        xy = kp["xy"][sel]
        desc = kp["desc"][sel]
        kidx = np.nonzero(sel)[0]
        R_wc, t_wc = T_wc[:3, :3], T_wc[:3, 3]
        R_cw = R_wc.T
        t_cw = -R_cw @ t_wc
        # candidate patch per detection = nearest projected anchor
        p_cam = scene.points @ R_cw.T + t_cw
        z = p_cam[:, 2]
        u = p_cam[:, 0] / np.maximum(z, 1e-6) * cam.fx + cam.cx
        v = p_cam[:, 1] / np.maximum(z, 1e-6) * cam.fy + cam.cy
        anch = np.stack([u, v], 1)
        anch = np.where((z > 0.5)[:, None], anch, 1e9)
        d = np.linalg.norm(xy[:, None, :] - anch[None, :, :], axis=2)
        pi = d.argmin(1)
        rays = np.stack([(xy[:, 0] - cam.cx) / cam.fx,
                         (xy[:, 1] - cam.cy) / cam.fy,
                         np.ones(len(xy))], 1)
        a0 = scene.patch_axes[pi, 0]
        a1 = scene.patch_axes[pi, 1]
        n = np.cross(a0, a1)
        n_c = n @ R_cw.T
        pc = p_cam[pi]
        denom = (rays * n_c).sum(1)
        denom = np.where(np.abs(denom) < 1e-9, 1e-9, denom)
        lam = (pc * n_c).sum(1) / denom
        hit_c = rays * lam[:, None]
        rel = hit_c - pc
        a0c = a0 @ R_cw.T
        a1c = a1 @ R_cw.T
        s = (rel * a0c).sum(1) / scene.patch_size
        t = (rel * a1c).sum(1) / scene.patch_size
        on = (np.abs(s) <= 1.0) & (np.abs(t) <= 1.0) & (lam > 0.5)
        w = hit_c @ R_wc.T + t_wc
        return w[on], desc[on], kidx[on]

    def project(w, T_wc, margin=24.0):
        R_cw = T_wc[:3, :3].T
        t_cw = -R_cw @ T_wc[:3, 3]
        p = w @ R_cw.T + t_cw
        z = p[:, 2]
        u = p[:, 0] / np.maximum(z, 1e-6) * cam.fx + cam.cx
        v = p[:, 1] / np.maximum(z, 1e-6) * cam.fy + cam.cy
        vis = (z > 0.5) & (u > margin) & (u < cam.width - margin) & \
              (v > margin) & (v < cam.height - margin)
        return np.stack([u, v], 1), vis

    print(f"det_r={det_r}px; deg/frame={deg_per_frame:.2f}")
    for off in offsets:
        n_vis, n_det, m50, m100, npair = 0, 0, 0, 0, 0
        for b in bases:
            w, desc_a, _ = lift_to_world(kps[b], poses[b])
            pb, vis = project(w, poses[b + off])
            n_vis += vis.sum()
            kb = kps[b + off]
            xyb = kb["xy"][kb["valid"]]
            descb = kb["desc"][kb["valid"]]
            d = np.linalg.norm(pb[:, None, :] - xyb[None, :, :], axis=2)
            j = d.argmin(1)
            dmin = d[np.arange(len(pb)), j]
            det = vis & (dmin <= det_r)
            n_det += det.sum()
            npair += det.sum()
            if det.sum():
                d0 = desc_a[det]
                d1 = descb[j[det]]
                bits = np.unpackbits(
                    (d0 ^ d1).view(np.uint8), axis=1).sum(1)
                m50 += (bits <= 50).sum()
                m100 += (bits <= 100).sum()
        print(json.dumps({
            "dtheta_deg": round(off * deg_per_frame, 1),
            "det_repeat": round(n_det / max(n_vis, 1), 3),
            "pairs": int(npair),
            "match100": round(m100 / max(npair, 1), 3),
            "match50": round(m50 / max(npair, 1), 3),
            "e2e_match100": round(m100 / max(n_vis, 1), 3),
        }), flush=True)


if __name__ == "__main__":
    main()
