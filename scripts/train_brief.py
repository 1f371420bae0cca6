"""Train the 256-pair BRIEF test set with the reference's greedy recipe
(ORBextractor.cc:150-408 / ORB paper section 4.3 — variance + pairwise
decorrelation — NOT the table) EXTENDED with a cross-view stability
objective: candidate single-pixel test pairs are scored on a corpus of
CORRESPONDED steered patch pairs (same physical point seen from two
views of rendered synthetic scenes), ranked by how often the bit AGREES
across the views (subject to a bit-mean variance window), and accepted
greedily under a correlation cap.

Rationale: the paper's pure variance/decorrelation objective, trained on
this corpus, selected rim-heavy taps and REGRESSED matched-pair Hamming
distance (match50 0.60 -> 0.41 at 2.6 deg view separation) — stability
across views, not entropy alone, is what the tracking front-end needs.

Writes structure_slam_pointline_tpu/data/brief_pattern.npy ([256, 2, 2]
float32 canonical-frame (dx, dy) pairs) which ops/orb.py loads at import.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

MAX_OFF = 13          # keep rotated taps inside the 31x31 patch (ops/orb.py)
GRID_STEP = 1         # candidate tap positions on a 1px grid inside the disc
CORR_CAP0 = 0.30      # initial correlation acceptance threshold
MEAN_WIN = 0.35       # accept candidates with bit mean in 0.5 +/- MEAN_WIN
N_PAIRS = 256


def build_pair_corpus():
    """Corresponded steered patch pairs (A-view, B-view) + per-patch
    angles, from rendered synthetic scenes with known patch planes."""
    import jax.numpy as jnp

    from structure_slam_pointline_tpu.config import CameraConfig, SLAMConfig
    from structure_slam_pointline_tpu.io import synthetic
    from structure_slam_pointline_tpu.ops import extract, orb, pyramid

    cam = CameraConfig(fy=480.0)
    fe = SLAMConfig(camera=cam).frontend
    pa_all, pb_all, aa_all, ab_all = [], [], [], []

    scenes = [
        (synthetic.make_cylinder_scene(700, 48, seed=2),
         synthetic.loop_trajectory(300, laps=2.2), [0, 60, 120, 180], 2),
        (synthetic.make_room_scene(300, 16, seed=0),
         synthetic.circular_trajectory(24), [0, 6, 12, 18], 1),
        (synthetic.make_room_scene(260, 12, seed=5, natural_tex=True,
                                   contrast=0.6),
         synthetic.circular_trajectory(24, radius=0.5), [0, 8, 16], 1),
    ]
    for scene, poses, bases, off in scenes:
        for b in bases:
            Ta, Tb = poses[b], poses[b + off]
            img_a = synthetic.render(scene, Ta, cam, noise=2.0, seed=b)
            img_b = synthetic.render(scene, Tb, cam, noise=2.0, seed=b + 1000)
            kp = extract.extract_orb(jnp.asarray(img_a), fe)
            sel = np.asarray(kp.valid) & (np.asarray(kp.octave) == 0)
            xy = np.asarray(kp.xy)[sel]
            ang = np.asarray(kp.angle)[sel]
            # lift via the patch plane under each detection
            R_wa, t_wa = Ta[:3, :3], Ta[:3, 3]
            R_aw = R_wa.T
            t_aw = -R_aw @ t_wa
            p_cam = scene.points @ R_aw.T + t_aw
            z = p_cam[:, 2]
            u = p_cam[:, 0] / np.maximum(z, 1e-6) * cam.fx + cam.cx
            v = p_cam[:, 1] / np.maximum(z, 1e-6) * cam.fy + cam.cy
            anch = np.where((z > 0.5)[:, None], np.stack([u, v], 1), 1e9)
            d = np.linalg.norm(xy[:, None, :] - anch[None, :, :], axis=2)
            pi = d.argmin(1)
            rays = np.stack([(xy[:, 0] - cam.cx) / cam.fx,
                             (xy[:, 1] - cam.cy) / cam.fy,
                             np.ones(len(xy))], 1)
            a0 = scene.patch_axes[pi, 0] @ R_aw.T
            a1 = scene.patch_axes[pi, 1] @ R_aw.T
            nrm = np.cross(a0, a1)
            pc = p_cam[pi]
            den = (rays * nrm).sum(1)
            den = np.where(np.abs(den) < 1e-9, 1e-9, den)
            lam = (pc * nrm).sum(1) / den
            hit = rays * lam[:, None]
            rel = hit - pc
            s = (rel * a0).sum(1) / scene.patch_size
            t = (rel * a1).sum(1) / scene.patch_size
            on = (np.abs(s) <= 0.9) & (np.abs(t) <= 0.9) & (lam > 0.5)
            w = hit @ R_wa.T + t_wa
            # reproject into B
            R_bw = Tb[:3, :3].T
            t_bw = -R_bw @ Tb[:3, 3]
            pb = w @ R_bw.T + t_bw
            zb = pb[:, 2]
            ub = pb[:, 0] / np.maximum(zb, 1e-6) * cam.fx + cam.cx
            vb = pb[:, 1] / np.maximum(zb, 1e-6) * cam.fy + cam.cy
            vis = ((zb > 0.5) & (ub > 20) & (ub < cam.width - 20)
                   & (vb > 20) & (vb < cam.height - 20) & on)
            if not vis.any():
                continue
            _, bl_a = pyramid.build_blurred_pyramid(
                jnp.asarray(img_a, jnp.bfloat16), fe.n_levels,
                fe.scale_factor, fe.blur_sigma)
            _, bl_b = pyramid.build_blurred_pyramid(
                jnp.asarray(img_b, jnp.bfloat16), fe.n_levels,
                fe.scale_factor, fe.blur_sigma)
            p_a = np.asarray(orb.gather_patches(
                bl_a[0], jnp.asarray(xy[vis])), np.float32)
            p_b = np.asarray(orb.gather_patches(
                bl_b[0], jnp.asarray(np.stack([ub, vb], 1)[vis])), np.float32)
            ang_b = np.asarray(orb.ic_angle(jnp.asarray(p_b)))
            pa_all.append(p_a)
            pb_all.append(p_b)
            aa_all.append(ang[vis])
            ab_all.append(ang_b)
    return (np.concatenate(pa_all), np.concatenate(pb_all),
            np.concatenate(aa_all), np.concatenate(ab_all))


def steered_values(patches, angles, positions):
    """Bilinear samples of each patch at its steering-rotated candidate
    positions. [n_pos, N] float32."""
    N = patches.shape[0]
    ca, sa = np.cos(angles), np.sin(angles)
    px = positions[None, :, 0] * ca[:, None] - positions[None, :, 1] * sa[:, None]
    py = positions[None, :, 0] * sa[:, None] + positions[None, :, 1] * ca[:, None]
    x = np.clip(px + 15.0, 0.0, 29.999)
    y = np.clip(py + 15.0, 0.0, 29.999)
    x0 = x.astype(np.int32)
    y0 = y.astype(np.int32)
    fx = x - x0
    fy = y - y0
    idx = np.arange(N)[:, None]
    v = (patches[idx, y0, x0] * (1 - fx) * (1 - fy)
         + patches[idx, y0, x0 + 1] * fx * (1 - fy)
         + patches[idx, y0 + 1, x0] * (1 - fx) * fy
         + patches[idx, y0 + 1, x0 + 1] * fx * fy)
    return v.T.astype(np.float32)  # [P, N]


def main():
    pa, pb, aa, ab = build_pair_corpus()
    print(f"corpus: {len(pa)} corresponded patch pairs", flush=True)

    g_ = np.arange(-MAX_OFF, MAX_OFF + 1, GRID_STEP)
    gx, gy = np.meshgrid(g_, g_)
    keep = gx ** 2 + gy ** 2 <= MAX_OFF ** 2
    pos = np.stack([gx[keep], gy[keep]], 1).astype(np.float32)  # [P, 2]
    P = len(pos)
    Va = steered_values(pa, aa, pos)  # [P, N]
    Vb = steered_values(pb, ab, pos)
    N = Va.shape[1]
    print(f"{P} tap positions -> {P * (P - 1) // 2} candidate tests over "
          f"{N} pairs", flush=True)

    # per-candidate bit mean (view A) and cross-view agreement
    M = np.zeros((P, P), np.float32)
    S = np.zeros((P, P), np.float32)
    for i in range(P):
        ba = Va[i][None, :] < Va
        bb = Vb[i][None, :] < Vb
        M[i] = ba.mean(1)
        S[i] = (ba == bb).mean(1)
    iu, ju = np.triu_indices(P, k=1)
    means = M[iu, ju]
    stab = S[iu, ju]
    usable = np.abs(means - 0.5) <= MEAN_WIN
    order = np.argsort(np.where(usable, -stab, np.inf), kind="stable")
    order = order[usable[order]]
    print(f"{len(order)} candidates in the mean window; stability "
          f"p50={np.percentile(stab[usable], 50):.3f} "
          f"p90={np.percentile(stab[usable], 90):.3f}", flush=True)

    sel_bits = np.zeros((N_PAIRS, N), np.float32)
    sel_pairs = []
    corr_cap = CORR_CAP0
    cursor = 0
    while len(sel_pairs) < N_PAIRS:
        if cursor >= len(order):
            corr_cap += 0.05
            cursor = 0
            print(f"raising corr cap to {corr_cap:.2f} "
                  f"({len(sel_pairs)} selected)", flush=True)
            continue
        cand = order[cursor]
        cursor += 1
        i, j = iu[cand], ju[cand]
        if any(p == (i, j) for p in sel_pairs):
            continue
        bits = (Va[i] < Va[j]).astype(np.float32)
        mu = bits.mean()
        k = len(sel_pairs)
        if k:
            a = sel_bits[:k]
            am = a.mean(1)
            cov = (a @ bits) / N - am * mu
            sd = np.sqrt(np.maximum(am * (1 - am), 1e-9)) * \
                np.sqrt(max(mu * (1 - mu), 1e-9))
            if np.max(np.abs(cov / sd)) > corr_cap:
                continue
        sel_bits[k] = bits
        sel_pairs.append((i, j))

    pat = np.stack([np.stack([pos[i], pos[j]]) for i, j in sel_pairs])
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))),
        "structure_slam_pointline_tpu", "data", "brief_pattern.npy")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    np.save(out, pat.astype(np.float32))
    sel_idx = [np.nonzero((iu == i) & (ju == j))[0][0] for i, j in sel_pairs]
    print(f"saved {out}: {len(sel_pairs)} pairs, stability "
          f"mean={stab[sel_idx].mean():.3f}, final corr cap {corr_cap:.2f}")


if __name__ == "__main__":
    main()
