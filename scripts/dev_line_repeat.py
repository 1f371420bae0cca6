"""Line detection + LBD matching diagnostic under viewpoint rotation.

For view pairs at keyframe-like separations on the cylinder lap scene:
  - detection: fraction of GT-visible wall lines with a detected segment
    aligned within tol (midpoint-to-infinite-line distance + angle);
  - LBD: Hamming distance distribution between the detections of the
    SAME GT line in the two views, vs the matcher gates (th_low=50 for
    KF-KF triangulation, th_high=100 for tracking).

Usage: [JAX_PLATFORMS=cpu] python scripts/dev_line_repeat.py [off ...]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def project_line(l6, T_wc, cam):
    R_cw = T_wc[:3, :3].T
    t_cw = -R_cw @ T_wc[:3, 3]
    a = R_cw @ l6[:3] + t_cw
    b = R_cw @ l6[3:] + t_cw
    if a[2] < 0.3 or b[2] < 0.3:
        return None
    ua = a[:2] / a[2] * [cam.fx, cam.fy] + [cam.cx, cam.cy]
    ub = b[:2] / b[2] * [cam.fx, cam.fy] + [cam.cx, cam.cy]
    return ua, ub


def main():
    offsets = [int(a) for a in sys.argv[1:]] or [2, 5, 10]
    import jax.numpy as jnp
    from structure_slam_pointline_tpu.config import CameraConfig, SLAMConfig
    from structure_slam_pointline_tpu.io import synthetic
    from structure_slam_pointline_tpu.ops import lbd, lsd

    cam = CameraConfig(fy=480.0)
    fe = SLAMConfig(camera=cam).frontend
    scene = synthetic.make_cylinder_scene(n_points=700, n_lines=48, seed=0)
    poses = synthetic.loop_trajectory(300, laps=2.2)
    W, H = cam.width, cam.height

    def detect(i):
        img = synthetic.render(scene, poses[i], cam, noise=2.0, seed=i)
        ln = lsd.detect_lines_pyramid(jnp.asarray(img, jnp.float32), fe)
        ld, _ = lbd.describe_lines(jnp.asarray(img, jnp.float32),
                                   ln.endpoints, ln.valid)
        return (np.asarray(ln.endpoints), np.asarray(ln.valid),
                np.asarray(ld))

    def gt_assoc(ep, valid, T_wc):
        """detected segment index per GT line (-1): midpoint within 4 px
        of the projected GT infinite line, angle within 10 deg, overlap."""
        out = np.full(len(scene.lines), -1, np.int32)
        for gi, l6 in enumerate(scene.lines):
            pr = project_line(l6, T_wc, cam)
            if pr is None:
                continue
            ua, ub = pr
            if not (0 <= (ua[0] + ub[0]) / 2 < W and
                    0 <= (ua[1] + ub[1]) / 2 < H):
                continue
            d = ub - ua
            L = np.hypot(*d)
            if L < fe.line_min_length:
                continue
            nrm = np.array([-d[1], d[0]]) / L
            ga = np.arctan2(d[1], d[0]) % np.pi
            best, bestd = -1, 1e9
            for j in np.nonzero(valid)[0]:
                sx, sy, ex, ey = ep[j]
                mid = np.array([(sx + ex) / 2, (sy + ey) / 2])
                dist = abs((mid - ua) @ nrm)
                da = np.arctan2(ey - sy, ex - sx) % np.pi
                dang = min(abs(da - ga), np.pi - abs(da - ga))
                t0 = (mid - ua) @ d / (L * L)
                if dist < 4.0 and dang < 0.18 and -0.2 < t0 < 1.2 \
                        and dist < bestd:
                    best, bestd = j, dist
            out[gi] = best
        return out

    dets = {}
    for i in sorted({0, 40, 80} | {b + o for b in (0, 40, 80)
                                   for o in offsets}):
        dets[i] = detect(i)

    for off in offsets:
        n_vis = n_both = 0
        bits_all = []
        for b in (0, 40, 80):
            epa, va, lda = dets[b]
            epb, vb, ldb = dets[b + off]
            aa = gt_assoc(epa, va, poses[b])
            ab = gt_assoc(epb, vb, poses[b + off])
            seen = (aa >= 0) | (ab >= 0)
            n_vis += seen.sum()
            both = (aa >= 0) & (ab >= 0)
            n_both += both.sum()
            if both.any():
                d0 = lda[aa[both]]
                d1 = ldb[ab[both]]
                bits = np.unpackbits(np.ascontiguousarray(d0 ^ d1).view(
                    np.uint8), axis=1).sum(1)
                bits_all.extend(bits.tolist())
        bits_all = np.asarray(bits_all)
        det_a = [int((dets[b][1]).sum()) for b in (0, 40, 80)]
        print(f"off={off} ({off*2.64:.0f}deg): det/frame={det_a} "
              f"gt-seen={n_vis} both={n_both} "
              f"lbd mean={bits_all.mean() if len(bits_all) else -1:.0f} "
              f"<=50:{(bits_all <= 50).mean() if len(bits_all) else 0:.2f} "
              f"<=100:{(bits_all <= 100).mean() if len(bits_all) else 0:.2f}",
              flush=True)


if __name__ == "__main__":
    main()
